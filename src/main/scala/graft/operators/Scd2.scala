package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.ReferenceSchemas.MaxUid

/** SCD Type-2 versioned-dimension engine (SURVEY.md §2.5 O21;
  * `mod.rs:583-767`, `pg.rs:229-256`, `pg.rs:328-359`).
  *
  * Version rows carry (entity key, uid, superseded_by); the current row has
  * `superseded_by = 9223372036854775806` (`pg.rs:31`). The reference's
  * 60-line reverse-iteration close/insert dance collapses to one `lead()`
  * window expression. The window partitions by entity key — at 100 TB the
  * shuffle is keyed on asset_id and each partition holds only that asset's
  * version chain, so no partition can exceed the per-entity history size.
  */
object Scd2 {

  /** Link an incoming batch internally: within each key, `superseded_by` =
    * next version's uid, last row ⇒ MAX_UID (`mod.rs:626-646`). */
  def linkBatch(batch: DataFrame, key: String = "asset_id", uidCol: String = "uid"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(uidCol))
    batch.withColumn("superseded_by", lead(col(uidCol), 1, MaxUid).over(w))
  }

  /** Apply a linked batch to the dimension: close currently-open rows whose
    * key appears in the batch (point them at the batch's first uid per key —
    * `pg.rs:229-242`), then append the batch rows. */
  def applyBatch(dim: DataFrame, batch: DataFrame, key: String = "asset_id", uidCol: String = "uid"): DataFrame = {
    val linked = linkBatch(batch, key, uidCol)
    val firstUids = linked.groupBy(col(key)).agg(min(col(uidCol)).as("__first_uid"))
    val closed = dim
      .join(broadcast(firstUids), Seq(key), "left")
      .withColumn("superseded_by",
        when(col("superseded_by") === MaxUid && col("__first_uid").isNotNull, col("__first_uid"))
          .otherwise(col("superseded_by")))
      .drop("__first_uid")
      // a USING join reorders output keys-first; restore the dim's order so
      // positional consumers (exceptAll, parquet round-trips) stay stable
      .select(dim.columns.map(col).toIndexedSeq: _*)
    closed.unionByName(linked.select(dim.columns.map(col).toIndexedSeq: _*))
  }

  /** Rollback re-open (`pg.rs:244-256`, `mod.rs:823-859`): after deleting
    * version rows with `block_uid` > cut, rows that pointed at a deleted
    * successor become current again (superseded_by → MAX_UID). */
  def rollback(dim: DataFrame, blockUidCut: Long, uidCol: String = "uid"): DataFrame = {
    val (kept, _) = Merge.deleteWhere(dim, col("block_uid") > blockUidCut)
    // Self-join on the successor pointer — left to AQE (the surviving-uid
    // side is the whole dimension, so no broadcast hint here).
    val survivingUids = kept.select(col(uidCol).as("__uid"))
    kept
      .join(survivingUids, kept("superseded_by") === col("__uid"), "left")
      .withColumn("superseded_by",
        when(col("superseded_by") =!= MaxUid && col("__uid").isNull, lit(MaxUid))
          .otherwise(col("superseded_by")))
      .drop("__uid")
  }

  /** Current snapshot of the dimension. */
  def current(dim: DataFrame): DataFrame = dim.filter(col("superseded_by") === MaxUid)
}
