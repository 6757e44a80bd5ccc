package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-assembly primitive time-series
  * and training-data pipelines need constantly (join every observation to
  * the LATEST reference row at or before it) and one Spark has no built-in
  * for. Expressed Spark-first as the UNION-MERGE algorithm rather than a
  * per-row range probe or a custom physical operator:
  *
  *   1. tag both sides and union them into one (key, ts)-ordered stream,
  *      reference rows sorting BEFORE probe rows at equal timestamps
  *      (inclusive `ref.ts <= probe.ts` semantics);
  *   2. per key, carry the reference payload forward with
  *      `last(value, ignoreNulls = true)` over rows-unbounded-preceding;
  *   3. keep the probe rows: each now holds the latest visible reference.
  *
  * ONE key-hash shuffle + per-key sorts — no all-pairs, no broadcast
  * requirement on either side, no range-bucketing tuning knob; the merge
  * scales with (probe + reference) like a sort-merge join would. Catalyst
  * sees a plain window plan, so AQE/skew handling applies as usual. Ties
  * inside one side are broken by `refOrder` (max wins), making the result
  * fully deterministic on duplicate reference timestamps. */
object AsofJoin {

  /** Backward as-of join: for each `probe` row, the `reference` row with
    * the greatest `tsCol` satisfying `ref.ts <= probe.ts` on the same
    * `keyCols`; probe rows with no visible reference keep NULL (left-join
    * semantics). `payloadCols` are the reference columns carried onto the
    * probe side (must not collide with probe column names). */
  def backward(
      probe: DataFrame,
      reference: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must name at least one reference column")
    val probeCols = probe.columns.toSeq
    require(payloadCols.forall(!probeCols.contains(_)),
      s"payload columns collide with probe columns: ${payloadCols.filter(probeCols.contains)}")
    val pay = struct(payloadCols.map(col): _*)
    // reference rows: side 0 (visible at equal ts); probe rows: side 1
    val refSide = reference
      .select((keyCols.map(col) :+ col(tsCol) :+ lit(0).as("__side") :+ pay.as("__pay")) ++
        probeCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeSide = probe
      .select((keyCols.map(col) :+ col(tsCol) :+ lit(1).as("__side") :+
        lit(null).cast(refSide.schema("__pay").dataType).as("__pay")) ++
        probeCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    // total order inside one (key, ts): reference first, then by payload —
    // duplicate reference timestamps resolve to the MAX payload struct
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    refSide.unionByName(probeSide)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        payloadCols.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
