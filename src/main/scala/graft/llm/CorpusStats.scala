package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Lowercased whitespace words of a document — the shared tokenization of
    * the corpus-statistics operators (identical to the oracle's
    * `string_split_regex(lower(trim(text)), '\s+')`). */
  private def words(textCol: Column): Column = split(lower(trim(textCol)), "\\s+")

  /** Top-k characteristic terms per document by tf·idf, the standard
    * keyword-extraction / topic-labelling pass over a corpus.
    *
    * idf = ln(N / df) with df = number of documents containing the word.
    * Scale shape: three shuffles, all keyed on high-cardinality hash-friendly
    * keys — (doc, word) for tf, word for df (both partial-aggregate
    * map-side), and the tf⋈df join on word (AQE may broadcast df when the
    * vocabulary is small). N arrives as a broadcast one-row aggregate, never
    * a driver-side collect. The per-document top-k ranks inside a window
    * partitioned by doc_id — millions of small partitions, no global sort.
    * Ties rank on (rounded score desc, word asc): total and
    * engine-independent, so the k-boundary is deterministic. */
  def tfIdfTopTerms(
      docs: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docWords = docs.select(col(idCol), explode(words(col(textCol))).as("word"))
    val tf = docWords.groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).cast("double").as("__n"))
    val scored = tf.join(df, "word")
      .crossJoin(broadcast(total))
      .withColumn("tf_idf", round(col("tf") * log(col("__n") / col("df")), 6))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tf_idf").desc, col("word"))
    scored
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("word"), col("tf"), col("tf_idf"), col("term_rank"))
  }

  /** Unigram language model over a reference corpus: (word, log_prob) with
    * add-one smoothing — log((c + 1) / (N + V + 1)), where the +1 in the
    * denominator reserves mass for the OOV pseudo-word, whose log-prob is
    * returned by [[lmOovLogProb]]. One shuffle (word counts, map-side
    * partials); N and V ride along as columns so scoring needs no driver
    * action. */
  def unigramLm(refDocs: DataFrame, textCol: String = "text"): DataFrame = {
    // vocab-bounded and read twice (totals + the model projection), and
    // the RETURNED model feeds several lazy consumers (OOV-constant agg,
    // broadcast probe, kernel collect): materialize both so the reference
    // corpus is tokenized exactly once (plan peek before the cut:
    // llm_lm_score at 5 parquet scans, llm_lm_buckets at 10)
    val counts = refDocs
      .select(explode(words(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val totals = counts.agg(
      sum(col("c")).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    counts.crossJoin(broadcast(totals))
      .select(col("word"),
        log((col("c") + 1.0) / (col("__n") + col("__v") + 1.0)).as("log_prob"),
        col("__n").as("n_tokens_lm"), col("__v").as("vocab_size"))
      .localCheckpoint()
  }

  /** Per-document cross-entropy (mean −log₂ p under the unigram LM) — the
    * CCNet-style fluency filter: low bits-per-token ≈ in-domain text, high ≈
    * noise. OOV words score the reserved smoothed mass.
    *
    * Scale shape: the LM is a vocabulary table — bounded by language, not
    * corpus size — so it broadcasts and the 100 TB side is probed map-side;
    * the only shuffle is the per-document re-aggregation (map-side
    * partials). Rounded to 6 dp: double summation order and libm ulp
    * differences sit far below the rounding grain. */
  def lmScore(
      docs: DataFrame,
      lm: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ln2 = math.log(2.0)
    val oov = broadcast(lm.agg(
      log(lit(1.0) / (first(col("n_tokens_lm")) + first(col("vocab_size")) + 1.0)).as("__oov")))
    docs
      .select(col(idCol), explode(words(col(textCol))).as("word"))
      .join(broadcast(lm.select(col("word"), col("log_prob"))), Seq("word"), "left")
      .crossJoin(oov)
      .withColumn("__lp", coalesce(col("log_prob"), col("__oov")))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-avg(col("__lp")) / ln2, 6).as("bits_per_token"))
  }

  /** Row-local form of [[lmScore]] for pipeline composition: the LM's
    * vocabulary table (bounded by language, not corpus size) is collected
    * once and rides the task closure as a broadcast hash map; each document
    * scores in ONE kernel pass — tokenize, look up, accumulate — with zero
    * shuffle, so a fluency filter slots into a map-only curation funnel
    * without breaking its single-scan shape. Same math as [[lmScore]]
    * (mean −log₂ p, add-one smoothing, OOV reserved mass, 6 dp), which the
    * spec pins by equality. */
  def lmScoreColumn(lm: DataFrame, text: Column): Column = {
    val rows = lm.select(col("word"), col("log_prob"), col("n_tokens_lm"), col("vocab_size")).collect()
    val probs = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val oov =
      if (rows.isEmpty) 0.0
      else math.log(1.0 / (rows.head.getDouble(2) + rows.head.getDouble(3) + 1.0))
    val ln2 = math.log(2.0)
    // one broadcast per executor, not one vocab copy per task closure — a
    // real multilingual vocabulary is millions of entries (ADVICE r4)
    val probsB = lm.sparkSession.sparkContext.broadcast(probs)
    val u = udf { (s: String) =>
      if (s == null) 0.0
      else {
        val words = splitLikeSql(s)
        val p = probsB.value
        var sum = 0.0
        var i = 0
        while (i < words.length) { sum += p.getOrElse(words(i), oov); i += 1 }
        val bits = if (words.length == 0) 0.0 else -(sum / words.length) / ln2
        BigDecimal(bits).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    u(text)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020 —
    * public method): split the corpus into `head`/`middle`/`tail` at the
    * TERCILES of its unigram-LM cross-entropy. CCNet keeps head+middle and
    * down-samples tail; the bucket column composes with
    * [[graft.llm.Sampling]] for exactly that.
    *
    * Scale shape: scoring is [[lmScore]] (broadcast vocab probe, one
    * per-document re-aggregation); the two cut points are ONE scalar
    * aggregate broadcast back over the scored frame — never a global sort.
    * Exact `percentile` here (the correctness baseline, `p·(n−1)`
    * interpolation — quantile_cont-equal, the [[lengthQuantiles]]
    * convention); a 100 TB run swaps in `approx_percentile`, same plan
    * shape. */
  def lmBuckets(
      docs: DataFrame,
      lm: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // scored feeds the cut-point aggregate AND the bucket assignment —
    // cut lineage so the scoring pass (corpus scan + broadcast probe +
    // doc re-agg) runs once, not once per consumer; rows are narrow
    // (id, count, double) so the checkpoint is spill-safe at scale
    val scored = lmScore(docs, lm, idCol, textCol).localCheckpoint()
    // percentage as a Scala-computed double: Spark SQL would parse a
    // "1.0/3" literal under DECIMAL semantics (≈0.333333333333000…), while
    // DuckDB's `/` divides as doubles — lit(1.0/3) pins BOTH engines to
    // the same IEEE 1/3 so the interpolated cuts match bit-wise
    val cuts = broadcast(scored.agg(
      percentile(col("bits_per_token"), lit(1.0 / 3)).as("__t1"),
      percentile(col("bits_per_token"), lit(2.0 / 3)).as("__t2")))
    scored.crossJoin(cuts)
      .withColumn("bucket",
        when(col("bits_per_token") <= col("__t1"), lit("head"))
          .when(col("bits_per_token") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__t1", "__t2")
  }

  /** Exactly `split(lower(trim(s)), '\s+')` — the [[words]] tokenization.
    * Java's `String.trim` strips every char ≤ U+0020 while SQL `trim`
    * strips spaces only, and Java's 1-arg `split` drops trailing empty
    * tokens while Spark's keeps them (limit −1) — so text with a leading or
    * trailing tab/newline gains empty OOV tokens under the SQL form that a
    * naive kernel would miss (ADVICE r4). */
  private[llm] def splitLikeSql(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e).toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
  }

  /** Sketch-based per-stratum profile — the 100 TB form of
    * [[strataProfile]]/[[lengthQuantiles]]: HyperLogLog++ vocabulary
    * cardinality and KLL-style token-count quantiles. Both sketches are
    * MERGEABLE, so they partial-aggregate map-side and the shuffle carries
    * fixed-size sketch states, never values — constant reducer memory at
    * any corpus size, where the exact percentile buffers each group's full
    * value list. Deterministic for a given input (no RNG), bounded error
    * (`rsd`, `accuracy`); the exact operators remain the correctness
    * oracles, and LlmSpec pins the error bounds against them. */
  def approxProfile(
      docs: DataFrame,
      strataCol: String,
      textCol: String = "text",
      rsd: Double = 0.05,
      accuracy: Int = 10000): DataFrame = {
    val toks = docs.select(col(strataCol),
      TextAnalysis.tokenCountWhitespace(col(textCol)).cast("double").as("__tok"))
    val perDoc = toks.groupBy(col(strataCol)).agg(
      count(lit(1)).as("n_docs"),
      percentile_approx(col("__tok"), lit(0.5), lit(accuracy)).as("p50_tokens"),
      percentile_approx(col("__tok"), lit(0.9), lit(accuracy)).as("p90_tokens"))
    val vocab = docs
      .select(col(strataCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(strataCol))
      .agg(approx_count_distinct(col("__w"), rsd).as("approx_vocab"))
    perDoc.join(vocab, Seq(strataCol))
  }

  /** Exact token-count quantiles per stratum (linear interpolation — the
    * same `p·(n−1)` rule DuckDB's quantile_cont applies, so the oracle is a
    * direct transliteration). Exact percentile buffers each group's values:
    * fine for per-stratum profiling (strata counts are bounded), and the
    * correctness baseline for `approx_percentile`, which is what a 100 TB
    * run would call — same plan shape, mergeable sketch instead of a
    * buffer. */
  def lengthQuantiles(
      docs: DataFrame,
      strataCol: String,
      textCol: String = "text",
      percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): DataFrame = {
    val toks = docs.select(col(strataCol),
      TextAnalysis.tokenCountWhitespace(col(textCol)).cast("double").as("__tok"))
    val aggs = percentiles.map { p =>
      round(expr(s"percentile(__tok, $p)"), 6).as(s"p${(p * 100).toInt}")
    }
    toks.groupBy(col(strataCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** A trained bigram LM (see [[bigramLm]]): three vocabulary-bounded
    * probability tables plus the smoothed-continuation floor for words
    * never seen as a bigram right-hand side. All tables broadcast at
    * scoring time (bounded by language, not corpus size — the [[lmScore]]
    * argument; a truly huge bigram table falls back to a plain equi-join,
    * same plan otherwise). */
  final case class BigramLm(
      bigrams: DataFrame, // (w1, w2, c12)
      histories: DataFrame, // (w1, h1, f1): history count, distinct followers
      continuations: DataFrame, // (w2, pc): smoothed KN continuation prob
      contFloor: Double,
      discount: Double)

  /** Bigram language model with interpolated Kneser–Ney / absolute
    * discounting (Kneser & Ney 1995, Chen & Goodman 1999; public method) —
    * the next fidelity step after [[unigramLm]] toward the CCNet
    * production filter (KenLM 5-gram; Wenzek et al. 2020):
    *
    *   p(w2|w1) = (max(c12 − D, 0) + D·f1·p_cont(w2)) / h1
    *   p_cont(w2) = (distinct predecessors of w2 + 1) / (B + V)
    *
    * with h1 = Σ_w2 c12 (occurrences of w1 as a history), f1 = distinct
    * followers of w1, B = distinct bigram types, V = vocab size; the +1/+V
    * smoothing keeps p_cont positive for words never seen as a right-hand
    * side, and unseen HISTORIES back off to p_cont alone. Every
    * probability is a fixed IEEE expression over integer counts, so the
    * oracle recomputes each one bit-for-bit; only per-document averaging
    * is order-sensitive (rounded 6 dp downstream).
    *
    * Shape: one pair aggregation over the reference corpus + three bounded
    * rollups of the bigram-type table; B and V collect as two scalars (the
    * PQ-codebook bounded-collect class). */
  def bigramLm(refDocs: DataFrame, discount: Double = 0.75, textCol: String = "text"): BigramLm = {
    val toks = refDocs.select(words(col(textCol)).as("ws"))
      .select(expr("filter(ws, w -> w <> '')").as("ws"))
    val pairs = toks.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> struct(a as w1, b as w2))")).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val bi = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint() // three rollups + B read it; cut the re-execution
    val hist = bi.groupBy(col("w1"))
      .agg(sum(col("c12")).as("h1"), count(lit(1)).as("f1"))
    val b = bi.count().toDouble
    val v = toks.select(explode(col("ws")).as("w")).agg(countDistinct(col("w")))
      .collect()(0).getLong(0).toDouble
    val cont = bi.groupBy(col("w2"))
      .agg(count(lit(1)).as("__npre"))
      .select(col("w2"), ((col("__npre") + lit(1.0)) / lit(b + v)).as("pc"))
    BigramLm(bi, hist, cont, contFloor = 1.0 / (b + v), discount = discount)
  }

  /** Per-document cross-entropy under a [[BigramLm]] (bits per bigram,
    * the [[lmScore]] convention at order 2): each adjacent pair scores
    * ln p(w2|w1); documents with fewer than two words have no bigrams and
    * drop out (both engines). Three broadcast probes + one per-document
    * re-aggregation. */
  def bigramScore(
      docs: DataFrame,
      lm: BigramLm,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastTables: Boolean = true): DataFrame = {
    // bigram-TYPE tables grow much faster than unigram vocab; at a truly
    // huge model pass broadcastTables = false and the three probes become
    // plain equi-joins (the Bpe.encodeCounts broadcastVocab convention)
    def side(df: DataFrame): DataFrame = if (broadcastTables) broadcast(df) else df
    val ln2 = math.log(2.0)
    val toks = docs.select(col(idCol), words(col(textCol)).as("ws"))
      .select(col(idCol), expr("filter(ws, w -> w <> '')").as("ws"))
    val pairs = toks.filter(size(col("ws")) >= 2)
      .select(col(idCol), explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> struct(a as w1, b as w2))")).as("pr"))
      .select(col(idCol), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    pairs
      .join(side(lm.bigrams), Seq("w1", "w2"), "left")
      .join(side(lm.histories), Seq("w1"), "left")
      .join(side(lm.continuations), Seq("w2"), "left")
      .withColumn("__pc", coalesce(col("pc"), lit(lm.contFloor)))
      .withColumn("__lp",
        when(col("h1").isNotNull,
          log((greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(lm.discount), lit(0.0))
            + lit(lm.discount) * col("f1") * col("__pc")) / col("h1")))
          .otherwise(log(col("__pc"))))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(-avg(col("__lp")) / ln2, 6).as("bits_per_bigram"))
  }

  /** Per-stratum token-distribution profile for diversity auditing:
    * token count, vocabulary size, type-token ratio, and unigram Shannon
    * entropy `H = ln N − (Σ c·ln c)/N` nats — the log-sum form avoids
    * materializing probabilities and keeps the whole computation two
    * hash aggregations ((stratum, word) counts → per-stratum rollup),
    * both map-side partial. A temperature-resample or dedup pass that
    * CHANGES these numbers materially changed corpus diversity — this is
    * the before/after table that review reads.
    *
    * Entropy is a float sum over the vocabulary, so engine and oracle can
    * differ in summation order; `round(·, 6)` sits ~5 orders of magnitude
    * above the accumulated ulp drift at any realistic vocab size. */
  def entropyProfile(
      docs: DataFrame,
      strataCol: String,
      textCol: String = "text"): DataFrame = {
    val wc = docs
      .select(col(strataCol), explode(words(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col(strataCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    wc.groupBy(col(strataCol))
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(col("__c").cast("double") * log(col("__c").cast("double"))).as("__clogc"))
      .select(
        col(strataCol),
        col("n_tokens"),
        col("vocab_size"),
        round(col("vocab_size").cast("double") / col("n_tokens"), 6).as("type_token_ratio"),
        round(log(col("n_tokens").cast("double"))
          - col("__clogc") / col("n_tokens"), 6).as("unigram_entropy"))
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990;
    * public method): the adjacent word pairs that co-occur far more than
    * chance — phrase mining / multi-word-expression extraction for
    * tokenizer and vocab design.
    *
    * `pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) )` with `p(a,b)` over the
    * adjacent-bigram distribution and `p(w)` over the unigram
    * distribution. `minCount` suppresses the unstable low-frequency tail
    * (a hapax pair has maximal PMI by construction).
    *
    * Shape: two corpus aggregations (unigrams, adjacent bigrams — both
    * explode → hash-agg with map-side partials), then two word-keyed joins
    * of the BIGRAM table (already collapsed to distinct pairs, orders of
    * magnitude smaller than the corpus) against the unigram counts, a
    * broadcast of the two scalar totals, and a TakeOrdered(k) on the
    * pinned order (rounded PMI desc, then pair asc). No corpus-sized
    * global sort, no driver-side loop.
    *
    * PMI is rounded to 6 dp BEFORE ranking so engine and oracle agree on
    * the boundary (the band-edge rule, ADVICE r8): both sides compute the
    * identical expression tree `ln((cab/Nb) / ((ca/Nu)·(cb/Nu)))`. */
  def pmiCollocations(
      docs: DataFrame,
      minCount: Long = 3,
      k: Int = 50,
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(words(col(textCol)).as("ws"))
      .select(expr("filter(ws, w -> w <> '')").as("ws"))
    // materialize both AGGREGATED tables (vocab-/pair-type-bounded): uni
    // feeds two joins + a total and biAll feeds the total + the report —
    // without the lineage cut each consumer re-runs its corpus-scale
    // explode+agg (plan peek: 11 exchanges, the unigram pass ×3)
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val biAll = toks
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> struct(a as w1, b as w2))")).as("pr"))
      .groupBy(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .agg(count(lit(1)).as("pair_count"))
      .localCheckpoint()
    // p(a,b) is over the FULL bigram distribution; minCount only prunes
    // which pairs are reported, not the probability space
    val totals = uni.agg(sum(col("c")).cast("double").as("n_uni"))
      .crossJoin(biAll.agg(sum(col("pair_count")).cast("double").as("n_bi")))
    biAll
      .filter(col("pair_count") >= minCount)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_count"),
        round(log((col("pair_count") / col("n_bi")) /
          ((col("c1") / col("n_uni")) * (col("c2") / col("n_uni")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
