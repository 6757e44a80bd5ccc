package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson-Sparck Jones / Okapi BM25; public
  * method) — the lexical scorer a training-data pipeline uses for hard-
  * negative mining, targeted decontamination and retrieval-augmented
  * example construction.
  *
  * Scale shape: the classic INVERTED-INDEX join. One corpus pass builds
  * the postings table (doc_id, term, tf, dl) — at 100 TB this is the
  * persisted index, bucketed by term (`TableStore.writeBucketedIndex`
  * convention) so query batches join co-located. Scoring is a term-keyed
  * equi-join of the (tiny) query-term side against the postings, then a
  * (query, doc)-keyed aggregation — fan-out per query term is bounded by
  * that term's document frequency. Stopword-class terms are the skew
  * hatch: cap or drop terms whose df exceeds a budget upstream (the
  * capped-bucket convention), or split-and-broadcast the hot tail.
  *
  * Cross-engine determinism: the per-term BM25 contribution is IEEE
  * double math (identical formula both engines), but the per-document SUM
  * is made order-independent by scaling each contribution to integer
  * micro-units first — `sum(round(c * 1e6) :: BIGINT)` — so the score is
  * a BIGINT that hashes identically regardless of aggregation order (the
  * float-sum nondeterminism class, avoided by construction). */
object Bm25 {

  /** One corpus pass → the postings index: (doc_id, term, tf, dl) with dl
    * the document's total term count. The explode and the tf agg key on
    * (doc_id, term) — map-side partials throughout. dl is a window sum
    * over the tf rows (one hash(doc_id) exchange) rather than the r14
    * agg-then-join shape, which paid a second aggregation AND a join
    * reshuffle of the tf side for the identical (doc_id, term, tf, dl)
    * rows — guide §2.4, two operations keyed the same way share one
    * exchange. Measured on llm_bm25 at sf0.1: 17 → fewer AQE job rounds,
    * plan loses one Exchange + one SortMergeJoin. */
  def postings(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = docs
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = words.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    tf.withColumn("dl", sum(col("tf")).over(Window.partitionBy(col(idCol))))
  }

  /** Score `queries` (query_id, text) against `docs` and keep the top
    * `topK` documents per query, ranked by (score desc, doc id). Emits
    * (query_id, doc_id, score_micro, rank) with the score in integer
    * micro-units. The rank window partitions by query — bounded by one
    * query's candidate count, never a global sort. */
  def topK(
      docs: DataFrame,
      queries: DataFrame,
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    // materialize the index once: stats, df and the probe all read it (the
    // multi-consumer model-table lesson — without the lineage cut each
    // consumer re-runs the corpus explode)
    val post = postings(docs, idCol, textCol).localCheckpoint()
    // corpus stats: N and avgdl are one-row scalar aggregates (broadcast
    // composition, the llm_lm_score class)
    val stats = post.groupBy(col(idCol)).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl").cast("double")).as("avgdl"))
    val qTerms = queries
      .select(col("query_id"), explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    // document frequency is only ever consumed for QUERY terms, so filter
    // the postings with a broadcast semi-join BEFORE the term-keyed agg
    // (guide §2.3, shuffle fewer bytes): the full-vocabulary hash(term)
    // exchange of the r14 shape becomes an exchange over just the matching
    // rows, with map-side partials. df(term) over the filtered postings is
    // identical to full-corpus df for every term that survives the join.
    val df = post
      .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    // (query term, df) is bounded by the query batch — broadcast it into
    // the postings probe so the index side NEVER shuffles for a query
    val qdf = qTerms.join(df, Seq("term"))
    val contrib = post
      .join(broadcast(qdf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf", log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      // parenthesization mirrors the oracle SQL exactly; scalar-scalar
      // subexpressions (k1+1, 1-b) fold to the same IEEE doubles there
      .withColumn("__c",
        col("__idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + (lit(1.0 - b) + (col("dl").cast("double") * b) / col("avgdl")) * k1))
      .withColumn("__cu", round(col("__c") * 1e6, 0).cast("long"))
    val scored = contrib
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__cu")).as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
