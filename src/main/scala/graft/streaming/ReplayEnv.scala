package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared environment for BOUNDED streaming replays (the st-gate harness
  * form: MemoryStream in, memory sink out, a handful of micro-batches).
  * Production queries keep the session's partitioning and durable
  * checkpoints; a bounded replay wants the opposite, and the difference
  * is measurable (NOTES r13 — st12 stage attribution):
  *
  *   - `spark.sql.shuffle.partitions` → `partitions` (default 1): every
  *     stateful level commits one state file PER PARTITION per
  *     micro-batch, and task scheduling across 32 one-row partitions
  *     dwarfs the actual work. Append/update results are partitioning-
  *     independent, so gate hashes cannot change.
  *   - checkpoints on /dev/shm tmpfs when present: HDFSBackedStateStore
  *     delta/snapshot I/O is pure overhead for throwaway state. Unique
  *     dir per call (a reused dir makes the next query try to RECOVER
  *     from it and fail) and recursively deleted after.
  *   - optional `codegen = false` for deep stateful chains whose
  *     generated methods blow the JVM 64 KB limit (NOTES r06/r13 — the
  *     fallback is silent but logs a stack trace per task).
  */
object ReplayEnv {

  /** The harness defaults, EXPORTED so bench artifacts can record them
    * (VERDICT r13 #7: the r13 replay-harness changes — partitions=1, tmpfs
    * checkpoints — legitimately moved the suite numbers, but BENCH_rN.json
    * did not say so; a future regression hunt could not tell harness config
    * from code drift). */
  val DefaultPartitions: Int = 1

  /** Which checkpoint backend a replay on this host will use. */
  def checkpointBackend: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "tmpfs" else "local"
  }

  def withReplayEnv[A](
      spark: SparkSession,
      partitions: Int = DefaultPartitions,
      codegen: Boolean = true)(body: => A): A = {
    val pKey = "spark.sql.shuffle.partitions"
    val cKey = "spark.sql.codegen.wholeStage"
    val kKey = "spark.sql.streaming.checkpointLocation"
    val prevP = spark.conf.get(pKey)
    val prevC = spark.conf.get(cKey)
    val prevK = spark.conf.getOption(kKey)
    spark.conf.set(pKey, partitions.toString)
    spark.conf.set(cKey, codegen.toString)
    val shm = new java.io.File("/dev/shm")
    val ckptDir: Option[java.nio.file.Path] =
      if (shm.isDirectory && shm.canWrite)
        Some(java.nio.file.Files.createTempDirectory(shm.toPath, "graft-replay-ckpt-"))
      else None
    ckptDir.foreach(d => spark.conf.set(kKey, d.toString))
    try body finally {
      spark.conf.set(pKey, prevP)
      spark.conf.set(cKey, prevC)
      prevK match { case Some(v) => spark.conf.set(kKey, v); case None => spark.conf.unset(kKey) }
      // BEST-EFFORT cleanup that can never mask the body's result (ADVICE
      // r13): state-store maintenance threads may still drop snapshot files
      // for a moment after query.stop(), making the walk/delete race a
      // FileNotFound/DirectoryNotEmpty — retry once after a short pause,
      // then log and leave the tmpfs orphan rather than throw from finally
      ckptDir.foreach { d =>
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        def sweep(): Unit = {
          val s = Files.walk(d)
          try s.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.deleteIfExists(p))
          finally s.close()
        }
        try sweep()
        catch {
          case _: java.io.IOException | _: java.io.UncheckedIOException =>
            try { Thread.sleep(100); sweep() }
            catch {
              case e: InterruptedException =>
                // don't swallow a cancellation signal: restore the flag so
                // callers above the finally still observe the interrupt
                Thread.currentThread().interrupt()
                System.err.println(s"[replay] checkpoint cleanup left orphan $d: $e")
              case e @ (_: java.io.IOException | _: java.io.UncheckedIOException) =>
                System.err.println(s"[replay] checkpoint cleanup left orphan $d: $e")
            }
        }
      }
    }
  }
}
