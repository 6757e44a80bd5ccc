package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
  * 2023; public method): select raw-corpus documents that look like a
  * TARGET domain by (1) hashing each document's unigrams+bigrams into a
  * fixed bucket space, (2) estimating smoothed bucket distributions p̂
  * (target) and q̂ (raw), (3) scoring every raw document with the log
  * importance weight `Σ_features ln p̂(b) − ln q̂(b)`, and (4) resampling
  * without replacement via Gumbel-top-k over the weights.
  *
  * Hashing reuses the engine's proven FNV-1a word kernel (the minhash
  * tokenization: whitespace-run words, per-char lowercase): a unigram's
  * feature is its word hash, a bigram's is the FNV fold of the two word
  * hashes; buckets are the unsigned remainder mod `buckets`. The DuckDB
  * oracle replays the identical mod-2^64 arithmetic through the HashSql
  * machinery that already backs the minhash/simhash gates.
  *
  * Scale shape: feature extraction is one map-only kernel + explode over
  * the raw scan; both distribution estimates are bucket-keyed aggregations
  * bounded by `buckets` (map-side partials) that collapse to a broadcastable
  * ratio table; the per-document weight is one doc-keyed re-aggregation.
  * The Gumbel draw is a pure function of (id, seed) — [[Sampling.bucket]]'s
  * md5 machinery — so the resample is reproducible on any cluster, and the
  * top-k runs as TakeOrdered (no global sort materialization). */
object Dsir {

  /** Hashed n-gram feature buckets of one document: one Int in
    * [0, buckets) per unigram occurrence and per adjacent-pair bigram.
    * One char walk, zero allocation beyond the output — the
    * [[Dedup.minhashSignature]] kernel shape (a composed-builtin version
    * re-evaluates the tokenize pipeline per n-gram leg after
    * CollapseProject inlining; see that kernel's measurement note). */
  def featureBuckets(text: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val u = udf { (s: String) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      if (s != null) {
        var prev = 0L
        var havePrev = false
        var wh = 0xcbf29ce484222325L
        var inWord = false
        var idx = 0
        val n = s.length
        def closeWord(): Unit = if (inWord) {
          out += java.lang.Long.remainderUnsigned(wh, buckets).toInt
          if (havePrev) {
            // bigram = FNV-1a fold of the two word hashes (basis ^ h₁)·p ^ h₂)·p
            var bh = 0xcbf29ce484222325L
            bh = (bh ^ prev) * 0x100000001b3L
            bh = (bh ^ wh) * 0x100000001b3L
            out += java.lang.Long.remainderUnsigned(bh, buckets).toInt
          }
          prev = wh
          havePrev = true
          wh = 0xcbf29ce484222325L
          inWord = false
        }
        while (idx < n) {
          val c = s.charAt(idx)
          if (Character.isWhitespace(c)) closeWord()
          else { wh ^= Character.toLowerCase(c).toLong; wh *= 0x100000001b3L; inWord = true }
          idx += 1
        }
        closeWord()
      }
      out.toSeq
    }
    u(text)
  }

  /** Per-bucket log importance ratios `ln p̂(b) − ln q̂(b)` with add-one
    * smoothing over the full bucket space: a table bounded by `buckets`,
    * derived from one aggregation over each corpus. Every bucket present in
    * the RAW corpus appears (target-absent buckets smooth to count 0), so
    * the downstream weight join never drops a feature. */
  def bucketLogRatios(
      raw: DataFrame,
      target: DataFrame,
      buckets: Int,
      textCol: String = "text"): DataFrame = {
    // bucket-bounded (≤ `buckets` rows) and each read twice (totals + the
    // ratio join): materialize so each corpus's feature pass runs once
    // (plan peek before the cut: 5 parquet scans / 11 exchanges)
    val rawCounts = raw.select(explode(featureBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_raw"))
      .localCheckpoint()
    val tgtCounts = target.select(explode(featureBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_tgt"))
      .localCheckpoint()
    val totals = rawCounts.agg(sum(col("c_raw")).cast("double").as("n_raw"))
      .crossJoin(tgtCounts.agg(sum(col("c_tgt")).cast("double").as("n_tgt")))
    rawCounts.join(tgtCounts, Seq("bucket"), "left")
      .withColumn("c_tgt", coalesce(col("c_tgt"), lit(0L)))
      .crossJoin(broadcast(totals))
      .select(
        col("bucket"),
        (log((col("c_tgt") + 1.0) / (col("n_tgt") + buckets))
          - log((col("c_raw") + 1.0) / (col("n_raw") + buckets))).as("log_ratio"))
  }

  /** Per-document log importance weight: Σ over the document's feature
    * occurrences of the bucket's log ratio. Output: (idCol, n_features,
    * log_weight). */
  def logImportanceWeights(
      raw: DataFrame,
      target: DataFrame,
      buckets: Int = 1024,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ratios = bucketLogRatios(raw, target, buckets, textCol)
    raw.select(col(idCol), explode(featureBuckets(col(textCol), buckets)).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"), sum(col("log_ratio")).as("log_weight"))
  }

  /** Gumbel-top-k resample WITHOUT replacement over the weights (the DSIR
    * paper's draw, made reproducible): each document's key is
    * `log_weight + Gumbel(u)` with `u = (bucket(id, seed)+0.5)/10⁶` from
    * [[Sampling.bucket]]'s portable md5 hash, `Gumbel(u) = −ln(−ln u)`.
    * Keys are rounded to 6 dp BEFORE ranking (summation-order drift sits
    * far below the grain; ties break on id), so engine and oracle agree on
    * the selected set exactly. Top-n runs as TakeOrdered; the rank window
    * only ever sees the n survivors. */
  def resampleTopN(
      weights: DataFrame,
      n: Int,
      seed: String,
      idCol: String = "doc_id"): DataFrame = {
    val u = (Sampling.bucket(col(idCol), seed).cast("double") + 0.5) / Sampling.Buckets
    val keyed = weights.withColumn("sample_key",
      round(col("log_weight") + -log(-log(u)), 6))
    keyed.orderBy(col("sample_key").desc, col(idCol)).limit(n)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("sample_key").desc, col(idCol))))
  }
}
