package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009 —
  * reciprocal rank fusion). A training-data pipeline fuses a lexical
  * ranking (BM25, [[Bm25.topK]]) with a dense ranking
  * ([[Similarity.bruteForceTopK]] / IVF) for hard-negative mining and
  * retrieval-augmented example construction; RRF is the standard
  * score-free combiner (no per-system score calibration needed — only
  * ranks are consumed).
  *
  * Cross-engine determinism: each system's contribution 1/(k0+rank) is
  * rounded to integer NANO-units before the per-(query, doc) sum, so the
  * fused score is a BIGINT independent of aggregation order (the same
  * by-construction fix as [[Bm25]]'s score_micro — a float sum over an
  * unbounded system set would be order-dependent).
  *
  * Scale shape: each input ranking is already top-k per query (bounded
  * fan-in of k rows per query per system); the union is
  * (query, doc)-keyed — one hash aggregation with map-side partials —
  * and the final rank window partitions by query, bounded by
  * systems×k candidates per query. No global sort anywhere.
  */
object Fusion {

  /** Fuse rankings (each with columns query_id, doc_id, rank) into
    * (query_id, doc_id, rrf_nano, n_systems, rank), keeping `topK` fused
    * results per query ordered by (rrf_nano desc, doc_id). `k0` is the
    * standard RRF damping constant (60 in the paper).
    *
    * A ranking carrying DUPLICATE (query_id, doc_id) rows is tolerated:
    * each system contributes its BEST (min-rank ⇔ max-contribution — the
    * contribution is monotone in rank) row exactly once, enforced by a
    * per-(query, doc, system) max-aggregation on the tagged union. At
    * worst one bounded exchange, independent of the system count — and
    * zero when every input ranking arrives partitioned by query_id (the
    * top-k rank windows guarantee it), since the union propagates the
    * common partitioning and {query_id} clusters every downstream key.
    * A duplicate can no longer silently double-contribute or inflate
    * n_systems. */
  def rrf(rankings: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(topK > 0, s"topK must be positive: $topK")
    val contrib = rankings.zipWithIndex
      .map { case (r, i) => r.select(col("query_id"), col("doc_id"),
        lit(i).as("__sys"),
        round(lit(1.0e9) / (lit(k0).cast("double") + col("rank").cast("double")), 0)
          .cast("long").as("__rrf_c")) }
      .reduce(_.unionByName(_))
      .groupBy("query_id", "doc_id", "__sys")
      .agg(max(col("__rrf_c")).as("__rrf_c"))
    val fused = contrib
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__rrf_c")).as("rrf_nano"), count(lit(1)).as("n_systems"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_nano").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
