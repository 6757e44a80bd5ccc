package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents whose word n-grams
  * overlap an evaluation/benchmark set, report the overlap, and drop the
  * contaminated ones — the standard guard against test-set leakage into a
  * training corpus (n-gram overlap à la GPT-3/PaLM decontamination; real
  * pipelines use 8–13-gram windows, the fixtures' short docs use 3).
  *
  * Scale shape (the asymmetry is the whole design): the eval side is SMALL
  * by construction — benchmarks are thousands of documents against a
  * multi-billion-document corpus — so its distinct n-gram set is
  * `broadcast()` and the 100 TB training side is probed map-side, never
  * shuffled for the match. The only shuffle is the per-document
  * re-aggregation keyed on `doc_id`, which partial-aggregates map-side
  * (count/sum combine before the exchange).
  */
object Decontaminate {

  /** Per-document contamination stats against `evalDocs`:
    * `n_ngrams` (distinct n-grams in the doc), `n_contaminated` (of those,
    * how many appear anywhere in the eval set), `contamination_frac`.
    * Documents too short to form an n-gram get (0, 0, 0.0).
    */
  def contamination(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.shingles(col(textCol), n)).as("__gram"))
      .distinct()
      .withColumn("__hit", lit(1))
    val docGrams = docs
      .select(col(idCol),
        explode_outer(array_distinct(Dedup.shingles(col(textCol), n))).as("__gram"))
    docGrams
      .join(broadcast(evalGrams), Seq("__gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__gram")).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_frac",
        round(col("n_contaminated").cast("double")
          / greatest(col("n_ngrams").cast("double"), lit(1.0)), 6))
  }

  /** Training corpus minus documents with ≥ `threshold` n-gram overlap
    * with the eval set. Anti-join on the flagged id set keeps the corpus
    * scan single-pass. */
  def decontaminate(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 3,
      threshold: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val flagged = contamination(docs, evalDocs, n, idCol, textCol)
      .filter(col("contamination_frac") >= threshold)
      .select(col(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
