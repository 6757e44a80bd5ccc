package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece-style tokenizer induction and encoding (Schuster & Nakajima,
  * ICASSP 2012; the likelihood-scored trainer described in Wu et al. 2016
  * §3.1 and implemented publicly in HuggingFace `tokenizers`) — the BPE
  * trainer's sibling, differing in exactly two public, well-defined ways:
  *
  *   1. TRAINING picks the merge maximizing the LIKELIHOOD GAIN
  *      `count(l,r) / (count(l) · count(r))` instead of the raw pair
  *      count — a frequent pair of two already-frequent symbols scores
  *      lower than a pair that almost always co-occurs;
  *   2. ENCODING is greedy LONGEST-MATCH-FIRST (MaxMatch) over the final
  *      token vocabulary, not a replay of the merge sequence.
  *
  * The Spark shape is [[Bpe]]'s: one corpus-scale word-frequency pass,
  * then bounded per-merge jobs over the distinct-word table (pair counts
  * PLUS a symbol-count aggregation — both explode the same segmentation,
  * map-side partial), a one-row argmax collect per merge, and
  * `localCheckpoint` per iteration (the Lloyd's-loop lineage cut). The
  * incremental delta-update path [[Bpe.trainMergesIncremental]] ships for
  * raw-count BPE applies here too (symbol counts delta the same way);
  * at the 8-merge gate depth the recompute loop is the measured floor,
  * so this trainer stays on the recompute path with the delta documented
  * as the >10k-merge scale hatch.
  *
  * Declared variant boundaries (spec-covered, consistent across engine
  * and oracle): no `##` continuation markers (they are a serialization
  * convention of the encode artifact, not of the algorithm — the merge
  * space here is the same wrapped-string segmentation [[Bpe]] uses), and
  * MaxMatch falls back to a single character when no vocab token matches
  * (the [[Bpe.encodeCounts]] OOV convention) instead of emitting a
  * whole-word `[UNK]`.
  *
  * Scores are compared as IEEE doubles: `cnt / (lcnt · rcnt)` on exact
  * long inputs below 2^53 is exactly rounded, so the Spark and DuckDB
  * argmax see bit-identical scores and the pinned tie-break
  * (score desc, then l, then r) is fully deterministic.
  */
object Wordpiece {

  /** One learned merge with its likelihood score components. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long, score: Double)

  import Bpe.{SymOpen, SymClose}

  /** Weighted symbol counts of the current segmentation — the denominator
    * of the likelihood score. Same bounded explode as the pair counts. */
  private[llm] def symbolCounts(vocab: DataFrame): DataFrame = {
    val syms = split(
      regexp_replace(col("s"), "^" + SymOpen + "|" + SymClose + "$", ""),
      SymClose + SymOpen)
    vocab
      .select(col("freq"), explode(syms).as("sym"))
      .groupBy("sym")
      .agg(sum(col("freq")).as("scnt"))
  }

  /** Train `numMerges` likelihood-scored merges over a word-frequency
    * table ([[Bpe.wordFrequencies]]). Returns the ordered merges and the
    * final segmentation state. Stops early when no pair remains. */
  def trainMerges(wordFreq: DataFrame, numMerges: Int): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    var vocab = wordFreq.localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val sc = symbolCounts(vocab)
      val top = Bpe.pairCounts(vocab)
        .join(sc.select(col("sym").as("l"), col("scnt").as("lcnt")), Seq("l"))
        .join(sc.select(col("sym").as("r"), col("scnt").as("rcnt")), Seq("r"))
        // both factors cast to double BEFORE multiplying: a long multiply
        // wraps silently in Spark (non-ANSI) but raises BIGINT overflow in
        // the DuckDB oracle, so at symbol counts > ~3e9 the two engines
        // would diverge rather than fail together (ADVICE r12)
        .withColumn("score",
          col("cnt").cast("double") / (col("lcnt").cast("double") * col("rcnt").cast("double")))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1)
        .select("l", "r", "cnt", "score")
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt, score) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2), top(0).getDouble(3))
        merges += Merge(rank, l, r, cnt, score)
        vocab = vocab
          .withColumn("s", expr(
            s"replace(s, ${Bpe.sqlLit(SymOpen + l + SymClose + SymOpen + r + SymClose)}," +
              s" ${Bpe.sqlLit(SymOpen + l + r + SymClose)})"))
          .localCheckpoint()
        rank += 1
      }
    }
    (merges.result(), vocab)
  }

  /** The trained merge table (rank, lhs, rhs, pair_count). The double
    * score drives the argmax but is not shipped: the merge SEQUENCE is
    * the artifact, and emitting the ratio would couple the gate hash to
    * float rendering. */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** The final token vocabulary with deterministic ids: base alphabet
    * (sorted) first, then merge products in rank order, keep-first on
    * duplicates — [[Bpe.vocabIds]]'s convention, shared so the two
    * tokenizers' artifacts are interchangeable downstream. */
  def vocabIds(spark: SparkSession, merges: Seq[Merge], finalVocab: DataFrame): DataFrame =
    Bpe.vocabIds(spark,
      merges.map(m => Bpe.Merge(m.rank, m.left, m.right, m.pairCount)), finalVocab)

  /** Greedy longest-match-first (MaxMatch) encoding against a trained
    * token set: one row per (doc, word occurrence, token position), with
    * the deterministic token id (−1 for a fallback character never seen
    * in training — the unk convention).
    *
    * Deliberately a compact UDF over the BROADCAST token set (the
    * [[Dedup.shingles]] precedent): MaxMatch is an imperative
    * longest-prefix loop, and a composed-builtin version would evaluate
    * `O(maxTokenLen)` substring probes per position as separate
    * expression trees. The token set is vocabulary-sized (alphabet +
    * merges — KBs to a few MB at production vocabs), exactly the
    * broadcast-lookup class; the pass itself is map-only after the
    * word explode, so it scales with the corpus. */
  def encodeIds(
      docs: DataFrame,
      vocabIdTable: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tokens = vocabIdTable.select("token").collect().map(_.getString(0)).toSet
    val maxLen = if (tokens.isEmpty) 1 else tokens.iterator.map(_.length).max
    val segment = udf { (word: String) =>
      if (word == null || word.isEmpty) Seq.empty[String]
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        while (pos < word.length) {
          var k = math.min(maxLen, word.length - pos)
          var found: String = null
          while (found == null && k > 1) {
            val cand = word.substring(pos, pos + k)
            if (tokens.contains(cand)) found = cand else k -= 1
          }
          // k == 1: single character, vocab member or not (char fallback)
          val tok = if (found != null) found else word.substring(pos, pos + 1)
          out += tok
          pos += tok.length
        }
        out.toSeq
      }
    }
    docs
      .select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+")).as(Seq("word_idx", "word")))
      .filter(col("word") =!= "" &&
        !col("word").contains(SymOpen) && !col("word").contains(SymClose))
      .select(col(idCol), col("word_idx"),
        posexplode(segment(col("word"))).as(Seq("tok_idx", "token")))
      .join(broadcast(vocabIdTable), Seq("token"), "left")
      .select(
        col(idCol),
        col("word_idx").cast("long").as("word_idx"),
        col("tok_idx").cast("long").as("tok_idx"),
        col("token"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))
  }
}
