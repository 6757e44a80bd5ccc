package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level statistics — the aggregate views a data-curation team
  * reads before and after every filter pass. Unlike [[TextAnalysis]]
  * (row-local), these genuinely aggregate across the corpus; the design
  * constraint is that every one of them partial-aggregates map-side so
  * the single shuffle carries (key, partial-count) pairs, not rows.
  */
object CorpusStats {

  /** Exact top-k most frequent word n-grams with a total order
    * (frequency desc, n-gram asc — deterministic across engines and
    * partitionings). Shape: explode → hash-aggregate with map-side
    * partials → TakeOrdered(k); the full n-gram distribution is never
    * collected or globally sorted. */
  def topNgrams(
      docs: DataFrame,
      n: Int = 2,
      k: Int = 20,
      textCol: String = "text"): DataFrame =
    docs.select(explode(Dedup.shingles(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(k)

  /** Per-stratum corpus profile: document count, token sum, mean doc
    * length — one shuffle keyed on the stratum column. */
  def strataProfile(
      docs: DataFrame,
      strataCol: String,
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("__tok", TextAnalysis.tokenCountWhitespace(col(textCol)).cast("long"))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        round(avg(col("__tok")), 6).as("mean_tokens"))
}
