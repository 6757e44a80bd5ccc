package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization — the classic event-stream operator:
  * consecutive events of one key belong to the same session while the gap
  * between them stays under a threshold; a gap at or above it starts a new
  * session. The canonical window formulation (flag session starts with
  * `lag`, number them with a running sum) is also the scale-correct Spark
  * shape: ONE key-hash shuffle, then every window is partitioned BY KEY —
  * narrow, bounded by one user's history, never a global sort. The
  * follow-up session rollup groups on (key, session_idx), a superset of
  * the window's hash partitioning, so Catalyst reuses the exchange and the
  * whole pass is one shuffle end-to-end (pinned in PlanShapeSpec). The
  * streaming analog is `session_window` / `flatMapGroupsWithState` over
  * the same key; the batch semantics here are its replay.
  *
  * All gap arithmetic runs on `unix_micros` BIGINTs — exact, and
  * replayable bit-for-bit by a DuckDB `epoch_us` oracle. Event-time ties
  * are broken by `tieCol`, making session numbering fully deterministic.
  */
object Sessionize {

  /** Tag each event with its 0-based `session_idx` per key. A gap
    * STRICTLY greater than `gapSeconds` opens a new session (the usual
    * "30 minutes of inactivity" reading). */
  def assign(
      events: DataFrame,
      gapSeconds: Long,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val gapUs = gapSeconds * 1000000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol))
    events
      .withColumn("__us", us)
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull
          || col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(run) - lit(1L))
      .drop("__new")
  }

  /** Session summary: one row per (key, session) with start/end (epoch
    * µs), event count, id span and duration. Integer-only outputs so the
    * artifact hashes identically across engines. */
  def summarize(
      events: DataFrame,
      gapSeconds: Long,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame =
    assign(events, gapSeconds, keyCol, tsCol, tieCol)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(col("__us")).as("session_start_us"),
        max(col("__us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        min(col(tieCol)).as("min_event_id"),
        max(col(tieCol)).as("max_event_id"))
      .withColumn("duration_us", col("session_end_us") - col("session_start_us"))
}
