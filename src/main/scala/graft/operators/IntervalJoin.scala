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

  /** Span-split containment join — the long-interval skew hatch
    * [[containmentJoin]]'s scaladoc calls for. A degenerate long interval
    * (a week-long "session", an always-open validity range) explodes onto
    * `span / cellWidth + 1` grid cells; past a few thousand cells that one
    * row dominates the explode output and its cell rows all hash to hot
    * buckets. Here the interval table is SPLIT by span:
    *
    *   - intervals spanning at most `maxCells` grid cells take the normal
    *     grid-bucket equi-join;
    *   - the long tail is BROADCAST and joined on `keyCols` + the exact
    *     BETWEEN predicate — a BroadcastHashJoin (the equi keys keep it
    *     off the nested-loop path), no explode at all.
    *
    * Each interval goes through exactly one path, so the union is exactly
    * [[containmentJoin]]'s result. The broadcast bounds the long tail
    * loudly: if "rare degenerate intervals" turns out to be a corpus-scale
    * population, the broadcast build fails instead of silently exploding
    * the grid — cap or clamp spans upstream in that case. */
  def containmentJoinSplit(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      loCol: String,
      hiCol: String,
      cellWidth: Long,
      maxCells: Long): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive: $cellWidth")
    require(maxCells > 0, s"maxCells must be positive: $maxCells")
    def cellOf(c: Column): Column = floorDiv(c, lit(cellWidth))
    val nCells = cellOf(col(hiCol)) - cellOf(col(loCol)) + 1
    val short = intervals.filter(nCells <= maxCells)
    val long = intervals.filter(nCells > maxCells)
    val gridPart = containmentJoin(points, short, keyCols, tsCol, loCol, hiCol, cellWidth)
    val longPart = points
      .join(broadcast(long), keyCols)
      .filter(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .select(gridPart.columns.map(col).toIndexedSeq: _*)
    gridPart.unionByName(longPart)
  }

  /** Skew-aware containment join: span-split ([[containmentJoinSplit]])
    * only when some interval actually spans more than `maxCells` grid
    * cells (one cheap map-side count over the interval table — the
    * [[graft.operators.AsofJoin.backwardAuto]] dispatch convention), else
    * the plain grid join with no split machinery. Both paths are
    * hash-identical, so the dispatch can only change the plan. */
  def containmentJoinAuto(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      loCol: String,
      hiCol: String,
      cellWidth: Long,
      maxCells: Long): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive: $cellWidth")
    require(maxCells > 0, s"maxCells must be positive: $maxCells")
    def cellOf(c: Column): Column = floorDiv(c, lit(cellWidth))
    val hasLong = !intervals
      .filter(cellOf(col(hiCol)) - cellOf(col(loCol)) + 1 > maxCells)
      .isEmpty
    if (hasLong)
      containmentJoinSplit(points, intervals, keyCols, tsCol, loCol, hiCol, cellWidth, maxCells)
    else
      containmentJoin(points, intervals, keyCols, tsCol, loCol, hiCol, cellWidth)
  }

  private def floorDiv(c: Column, divisor: Column): Column =
    TimeCells.floorDiv(c, divisor)
}
