package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, the SentencePiece algorithm) — the
  * third production tokenizer family next to [[Bpe]] (merge by raw pair
  * count) and [[Wordpiece]] (merge by likelihood gain). Where both of
  * those BUILD tokens bottom-up by merging, the unigram model starts from
  * an over-complete substring vocabulary and SELECTS: each word is
  * segmented by Viterbi under per-token unigram probabilities, token
  * usage is re-counted from the chosen segmentations (one hard-EM
  * round), and the surviving vocabulary is re-scored.
  *
  * Determinism contract (what makes the DuckDB oracle hash-exact): the
  * Viterbi objective is the PRODUCT of token probabilities, each prob a
  * ratio of two integers cast to double. IEEE multiply/divide are
  * bit-reproducible across engines for identical operands in identical
  * order — unlike `ln`, whose last-ulp behavior is libm-specific — so
  * both engines compare identical doubles and take identical argmax
  * paths (ties broken by longer last token, replicated as
  * `ORDER BY score DESC, l DESC` in the oracle). Words are restricted to
  * `^[a-z0-9]+$` and length ≤ [[MaxWordLen]] (bounds the oracle's DP
  * chain); every single character of a kept word is in the seed vocab,
  * so Viterbi always reaches position 0.
  *
  * Scale shape: the vocabulary is bounded (all single chars + top
  * [[SeedMulti]] multi-char substrings), so it broadcasts; segmentation
  * is a row-local UDF over the word-frequency table (map-only, the
  * shingle/MaxMatch precedent); seed counting is one explode + one agg
  * shuffle. Nothing is corpus-size-resident on the driver except the
  * bounded vocab.
  */
object Unigram {

  val MaxTokenLen = 4
  val MaxWordLen = 16
  val SeedMulti = 200

  /** Filtered word-frequency table (word, freq): lowercase whitespace
    * tokens, ASCII alphanumeric, length-bounded — the same filter the
    * oracle applies, and the bound that keeps the oracle's unrolled DP
    * chain at [[MaxWordLen]] stages. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$") && length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Seed vocabulary (tok, cnt): every substring of length 1..
    * [[MaxTokenLen]] counted at every occurrence position, weighted by
    * word frequency; ALL single chars plus the top [[SeedMulti]]
    * multi-char substrings by (count desc, token asc). Top-K via global
    * sort+limit (TakeOrdered), not a single-partition window. */
  def seedVocab(wordFreq: DataFrame): DataFrame = {
    val subs = wordFreq.select(col("freq"),
        explode(expr(
          s"flatten(transform(sequence(1, length(word)), s -> " +
            s"transform(sequence(1, least($MaxTokenLen, length(word) - s + 1)), " +
            s"l -> substring(word, s, l))))")).as("tok"))
      .groupBy("tok").agg(sum(col("freq")).as("cnt"))
    val single = subs.filter(length(col("tok")) === 1)
    val multi = subs.filter(length(col("tok")) > 1)
      .orderBy(col("cnt").desc, col("tok")).limit(SeedMulti)
    single.unionByName(multi)
  }

  /** Viterbi-best segmentation of `word` under `probs` (empty if any
    * character is outside the vocab — unreachable under the seed
    * contract). Pure function, shared by trainer and encoder. */
  def viterbiSegment(word: String, probs: collection.Map[String, Double]): Seq[String] = {
    val n = word.length
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    best(0) = 1.0
    var p = 1
    while (p <= n) {
      var bs = 0.0
      var bl = 0
      val lmax = math.min(MaxTokenLen, p)
      var l = 1
      while (l <= lmax) {
        if (best(p - l) > 0.0) {
          val pr = probs.getOrElse(word.substring(p - l, p), 0.0)
          if (pr > 0.0) {
            val s = best(p - l) * pr
            // argmax with (score desc, l desc): the oracle's row_number order
            if (s > bs || (s == bs && l > bl)) { bs = s; bl = l }
          }
        }
        l += 1
      }
      best(p) = bs
      back(p) = bl
      p += 1
    }
    if (best(n) <= 0.0) Seq.empty
    else {
      var acc: List[String] = Nil
      var q = n
      while (q > 0) { val l = back(q); acc = word.substring(q - l, q) :: acc; q -= l }
      acc
    }
  }

  /** One trained model: final vocab rows (token, seed_cnt, used_cnt,
    * token_id) plus the Laplace-smoothed encode probabilities. Vocab ids
    * are assigned driver-side over the BOUNDED vocab (used desc, token
    * asc) — no single-partition window in any query plan. */
  final case class Model(
      vocab: Seq[(String, Long, Long, Long)],
      encodeProbs: Map[String, Double],
      tokenIds: Map[String, Long])

  def train(spark: SparkSession, docs: DataFrame): Model = {
    val wf = wordFrequencies(docs).localCheckpoint()
    val seedRows = seedVocab(wf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = seedRows.map(_._2).sum
    val seedProbs: Map[String, Double] =
      seedRows.map { case (t, c) => t -> c.toDouble / total.toDouble }.toMap
    val bc = spark.sparkContext.broadcast(seedProbs)
    val segUdf = udf((w: String) => viterbiSegment(w, bc.value))
    val used: Map[String, Long] = wf
      .select(col("freq"), explode(segUdf(col("word"))).as("tok"))
      .groupBy("tok").agg(sum(col("freq")).as("used_cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // final vocab: every single char survives (SentencePiece's coverage
    // rule); multi-char tokens survive only if Viterbi actually used them
    val finalRows = seedRows
      .filter { case (t, _) => t.length == 1 || used.contains(t) }
      .map { case (t, c) => (t, c, used.getOrElse(t, 0L)) }
    val ids = finalRows.sortBy { case (t, _, u) => (-u, t) }
      .zipWithIndex.map { case ((t, c, u), i) => (t, c, u, i.toLong) }
    val totalUsed = finalRows.map(_._3).sum
    val nVocab = finalRows.size.toLong
    // Laplace (+1) smoothing so never-used single chars stay encodable
    val encodeProbs = finalRows.map { case (t, _, u) =>
      t -> (u + 1L).toDouble / (totalUsed + nVocab).toDouble
    }.toMap
    Model(ids.toSeq, encodeProbs, ids.map { case (t, _, _, id) => t -> id }.toMap)
  }

  /** The train-gate table: (token, seed_cnt, used_cnt, token_id). */
  def vocabTable(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.vocab.toDF("token", "seed_cnt", "used_cnt", "token_id")
  }

  /** Viterbi-encode `docs` (doc_id, text) under the trained model:
    * one row per (doc, word occurrence, token position). `word_idx` is
    * the position in the RAW whitespace split (pre-filter), matching the
    * Wordpiece gate convention so both oracles share the slicing rule. */
  def encode(spark: SparkSession, docs: DataFrame, m: Model): DataFrame = {
    val bcP = spark.sparkContext.broadcast(m.encodeProbs)
    val bcI = spark.sparkContext.broadcast(m.tokenIds)
    val segUdf = udf((w: String) => viterbiSegment(w, bcP.value))
    val idUdf = udf((t: String) => bcI.value.getOrElse(t, -1L))
    docs
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("word_idx", "word")))
      .filter(col("word").rlike("^[a-z0-9]+$") && length(col("word")) <= MaxWordLen)
      .select(col("doc_id"), col("word_idx").cast("long").as("word_idx"),
        posexplode(segUdf(col("word"))).as(Seq("tok_idx", "token")))
      .select(col("doc_id"), col("word_idx"), col("tok_idx").cast("long").as("tok_idx"),
        col("token"), idUdf(col("token")).as("token_id"))
  }
}
