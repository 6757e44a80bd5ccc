package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mutation semantics of the reference's Postgres sinks, re-expressed as pure
  * DataFrame transforms over immutable storage (SURVEY.md §2.1 S5-S10).
  *
  * At scale these run inside `foreachBatch` against a transactional table
  * format (Delta-style MERGE) or a JDBC staging upsert; the *semantics* live
  * here so they are testable and reusable. Updates are expected to be small
  * relative to the base (a micro-batch), so the join side is broadcast.
  */
object Merge {

  /** ON CONFLICT (keys) DO UPDATE — `pg.rs:721-730`, `pg.rs:764-773`.
    * Rows in `updates` replace base rows sharing the key; others append. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    // a USING-columns join reorders output keys-first; restore base order so
    // positional consumers (union/except/checkpointed schemas) stay stable
    val kept = base.join(broadcast(updates.select(keys.map(col): _*).distinct()), keys, "left_anti")
      .select(cols.map(col): _*)
    kept.unionByName(updates.select(cols.map(col): _*))
  }

  /** ON CONFLICT DO NOTHING — `pg.rs:176-214` (waves_data, asset_origins).
    * Only update rows whose key is absent from the base are appended. */
  def insertIgnore(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val fresh = updates
      .join(broadcast(base.select(keys.map(col): _*).distinct()), keys, "left_anti")
      .select(updates.columns.toSeq.map(col): _*)
      // in-batch dedup on the key, first writer wins (Postgres insert order)
      .dropDuplicates(keys)
    base.unionByName(fresh.select(cols.map(col): _*))
  }

  /** DELETE WHERE p — `pg.rs:160-174`, `pg.rs:392-398`, `pg.rs:833-838`.
    * Returns (remaining, deleted) — deleted mirrors DELETE..RETURNING (S7). */
  def deleteWhere(base: DataFrame, predicate: Column): (DataFrame, DataFrame) =
    (base.filter(!coalesce(predicate, lit(false))), base.filter(coalesce(predicate, lit(false))))

  /** UPDATE SET col = value WHERE p — `pg.rs:151-158`, `216-223`, `315-322`. */
  def updateWhere(base: DataFrame, predicate: Column, assignments: Map[String, Column]): DataFrame =
    assignments.foldLeft(base) { case (df, (name, value)) =>
      df.withColumn(name, when(predicate, value).otherwise(col(name)))
    }

  /** Bulk keyed UPDATE via UNNEST join — `pg.rs:229-242`, `347-359` (S10/J5):
    * `UPDATE t SET <valueCol> = u.value FROM unnest-pairs u WHERE t.<keyCol> = u.key [AND extra]`.
    * `updates` carries (keyCol, valueCol); unmatched base rows pass through. */
  def bulkKeyedUpdate(
      base: DataFrame,
      updates: DataFrame,
      keyCol: String,
      valueCol: String,
      extraFilter: Column = lit(true)): DataFrame = {
    val u = broadcast(updates.select(col(keyCol), col(valueCol).as("__new_value")).dropDuplicates(keyCol))
    base
      .join(u, Seq(keyCol), "left")
      .withColumn(valueCol,
        when(col("__new_value").isNotNull && extraFilter, col("__new_value")).otherwise(col(valueCol)))
      .drop("__new_value")
  }
}
