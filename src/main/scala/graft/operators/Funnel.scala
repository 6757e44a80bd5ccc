package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analysis — the two classic
  * event-analytics operators over a (key, event_type, ts) stream.
  *
  * Funnel: for an ordered step list (e.g. view → click → purchase), find
  * each key's EARLIEST completion chain: t1 = first step-1 event, t2 =
  * first step-2 event strictly after t1, and so on (the standard greedy
  * funnel semantics — greedy-earliest is optimal: taking the earliest
  * feasible step never forecloses a later completion). Expressed as one
  * keyed aggregation per step with a strictly-after join back onto the
  * accumulating chain — `steps.length` keyed aggs over an ever-smaller
  * frame, all hashing on the same key (exchange-reusable), never a
  * per-key sort of full history.
  *
  * Retention: cohort each key by its first-seen day, then count distinct
  * keys active at each (cohort, day-offset) — two keyed aggs and one
  * broadcast-friendly join. Day arithmetic on epoch-day integers
  * (`floor(epoch_us / 86400e6)`), exact in BIGINT.
  */
object Funnel {

  /** Earliest-completion funnel. Emits one row per key that completed
    * step 1, with `t<i>_us` the chain timestamps (NULL once the chain
    * stalls), `steps_completed`, and `converted` when the final step fired
    * within `windowSeconds` of t1. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      windowSeconds: Long,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    require(windowSeconds > 0, s"windowSeconds must be positive: $windowSeconds")
    val us = unix_micros(col(tsCol))
    val base = events.select(col(keyCol), col(typeCol).as("__type"), us.as("__us"))
    // step 1: first occurrence per key
    var chain = base.filter(col("__type") === steps.head)
      .groupBy(col(keyCol)).agg(min(col("__us")).as("t1_us"))
    steps.zipWithIndex.tail.foreach { case (step, i) =>
      val prev = s"t${i}_us"
      val cur = s"t${i + 1}_us"
      // first occurrence of this step STRICTLY after the chain's previous
      // timestamp; left join keeps stalled chains with NULL
      val nxt = base.filter(col("__type") === step)
        .join(chain.select(col(keyCol), col(prev)), Seq(keyCol))
        .filter(col("__us") > col(prev))
        .groupBy(col(keyCol)).agg(min(col("__us")).as(cur))
      chain = chain.join(nxt, Seq(keyCol), "left")
    }
    val stepCols = steps.indices.map(i => col(s"t${i + 1}_us"))
    val completed = stepCols.tail.foldLeft(lit(1L)) { (acc, c) =>
      acc + when(c.isNotNull, 1L).otherwise(0L)
    }
    chain
      .withColumn("steps_completed", completed)
      .withColumn("converted",
        stepCols.last.isNotNull &&
          stepCols.last - col("t1_us") <= windowSeconds * 1000000L)
  }

  /** Cohort retention triangle: (cohort_day, day_offset, n_users) with
    * cohort_day the key's first active epoch-day and one row per observed
    * (cohort, offset) cell. */
  def retention(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val day = expr(s"unix_micros($tsCol) div ${86400L * 1000000}L")
    val active = events.select(col(keyCol), day.as("__day")).distinct()
    val cohort = active.groupBy(col(keyCol)).agg(min(col("__day")).as("cohort_day"))
    active
      .join(cohort, Seq(keyCol))
      .groupBy(col("cohort_day"), (col("__day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
