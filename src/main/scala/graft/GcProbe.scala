package graft

import org.apache.spark.sql.SparkSession

/** Per-window GC attribution for a single gate (VERDICT r14 #3): runs the
  * gate N times at one dir and prints, per window, wall seconds, the GC
  * time that elapsed INSIDE the window, and heap high-water — so a spread
  * like a2@100x's 16.4–40.4× can be pinned on collector/page-cache
  * pressure (GC seconds tracking the slow windows) or exonerated (flat GC,
  * spread must come from elsewhere).
  *
  * Usage: `runMain graft.GcProbe <gate> <dir> [reps]`
  */
object GcProbe {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val dir = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    val memory = java.lang.management.ManagementFactory.getMemoryMXBean

    val fn = SparkEntry.queries(gate)
    (1 to reps).foreach { i =>
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis() - gc0) / 1e3
      val heapMb = memory.getHeapMemoryUsage.getUsed / (1024 * 1024)
      println(f"""{"gate":"$gate","dir":"$dir","rep":$i,"sec":$sec%.3f,"gc_sec":$gcSec%.3f,"heap_used_mb":$heapMb}""")
    }
    spark.stop()
  }
}
