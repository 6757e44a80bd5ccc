package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match point rows into the intervals
  * that contain them, without an all-pairs plan. Spark's optimizer turns a
  * raw `a.ts BETWEEN b.lo AND b.hi` theta join into
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * fits), so the scale-correct formulation is the standard GRID-BUCKET
  * equi-join: every interval is exploded onto the fixed-width grid cells
  * it overlaps, every point keys to its single cell, and the join runs as
  * a plain (key..., cell) hash equi-join followed by the exact range
  * filter. Candidate fan-out per interval is `span / cellWidth + 1` —
  * bounded and tunable; the plan is one hash-shuffle join Catalyst/AQE
  * can reason about, never a nested loop.
  *
  * Pick `cellWidth` near the TYPICAL interval span: much smaller wastes
  * explode rows on long intervals, much larger packs many intervals per
  * cell (wider verify fan-in). Degenerate long intervals (a session
  * spanning thousands of cells) are the skew hatch — cap them upstream or
  * split the interval table by span and broadcast the long tail. */
object IntervalJoin {

  /** Join each `points` row (at `tsCol`) to every `intervals` row whose
    * `[loCol, hiCol]` (inclusive both ends) contains it, equi-matching
    * `keyCols` first. Columns of both frames are preserved; name
    * collisions beyond `keyCols` must be resolved by the caller. Inner
    * semantics: unmatched points drop. */
  def containmentJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      loCol: String,
      hiCol: String,
      cellWidth: Long): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive: $cellWidth")
    def cellOf(c: Column): Column = floorDiv(c, lit(cellWidth))
    val cells = intervals
      .withColumn("__cell",
        explode(sequence(cellOf(col(loCol)), cellOf(col(hiCol)))))
    points
      .withColumn("__cell", cellOf(col(tsCol)))
      .join(cells, keyCols :+ "__cell")
      .filter(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("__cell")
  }

  private def floorDiv(c: Column, divisor: Column): Column =
    // floor division in pure integer math (`div` truncates toward zero,
    // which would mis-cell negative epochs): subtract the non-negative
    // remainder first, then the division is exact
    ((c.cast("long") - pmod(c.cast("long"), divisor)) / divisor).cast("long")
}
