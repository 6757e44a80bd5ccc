package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-Pair-Encoding tokenizer induction (Sennrich et al., ACL 2016;
  * public method) — the vocabulary-training step of every modern tokenizer
  * pipeline, expressed Spark-first.
  *
  * The classic algorithm is a driver-side loop over a word-frequency table,
  * and that is exactly the scale-correct Spark shape too:
  *
  *   1. ONE corpus-scale pass builds the word-frequency table (lowercased
  *      whitespace tokens → `groupBy(word).count`, map-side partials). At
  *      100 TB this is the only full-corpus job; everything after runs on
  *      the DISTINCT-WORD table, which is orders of magnitude smaller
  *      (vocab grows ~ Heaps' law, not linearly with corpus bytes).
  *   2. Each merge iteration is two bounded jobs on the vocab table: an
  *      adjacent-pair frequency aggregation (explode + groupBy with
  *      map-side partials, weighted by word frequency) and a map-only
  *      merge application. The per-iteration argmax collects exactly ONE
  *      row to the driver — the same bounded-collect class as the k-means
  *      centroid loop.
  *   3. Every iteration materializes its vocab state via `localCheckpoint`
  *      — the Lloyd's-loop lesson (NOTES r08): without the lineage cut,
  *      iteration k re-executes all k−1 prior merge plans on every action
  *      and the loop goes quadratic.
  *
  * Segmentation state is a STRING, not an array: a word's symbols are each
  * wrapped as `\u0001sym\u0002`, so one merge step is a plain (non-regex,
  * left-to-right, non-overlapping) `replace` of `\u0001a\u0002\u0001b\u0002`
  * with `\u0001ab\u0002` — byte-identical semantics in Spark and in the
  * DuckDB oracle, and the wrappers make cross-symbol false matches
  * impossible. Left-to-right non-overlap is the standard greedy BPE
  * application order (aaa + merge(a,a) → [aa, a]).
  *
  * Tie-breaks are pinned: the merge chosen each round is max by
  * (pair_count, then lexicographically smallest left, then right symbol) —
  * fully deterministic, so the trained merge table oracle-checks exactly.
  * Tokenization is the engine's standard text normal form (lower, trim,
  * whitespace-run split, empties dropped); words containing the wrapper
  * code points are dropped (declared, vanishingly rare in real text).
  */
object Bpe {

  /** One learned merge: `left + right` became a symbol with this weighted
    * adjacent-pair count at the time of merging. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  private[llm] val SymOpen = "\u0001"
  private[llm] val SymClose = "\u0002"

  /** Corpus → (word, freq, s) where `s` is the word's initial
    * character-level segmentation in wrapped form. The one corpus-scale
    * aggregation of the whole training run. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "" &&
        !col("word").contains(SymOpen) && !col("word").contains(SymClose))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .withColumn("s", regexp_replace(col("word"), "(.)", SymOpen + "$1" + SymClose))

  /** Adjacent symbol pairs of the current segmentation, weighted by word
    * frequency: (l, r, cnt). Bounded by the vocab table, map-side partial. */
  private[llm] def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = split(
      regexp_replace(col("s"), "^" + SymOpen + "|" + SymClose + "$", ""),
      SymClose + SymOpen)
    vocab
      .select(col("freq"), syms.as("sy"))
      .filter(size(col("sy")) >= 2)
      .select(col("freq"), explode(expr(
        "zip_with(slice(sy, 1, size(sy) - 1), slice(sy, 2, size(sy) - 1)," +
          " (a, b) -> struct(a as l, b as r))")).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Train `numMerges` BPE merges over a word-frequency table (from
    * [[wordFrequencies]]). Returns the ordered merge list and the final
    * vocab segmentation state (word, freq, s). Stops early when no
    * adjacent pair is left to merge. */
  def trainMerges(wordFreq: DataFrame, numMerges: Int): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    var vocab = wordFreq.localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        vocab = vocab
          .withColumn("s", expr(
            s"replace(s, ${sqlLit(SymOpen + l + SymClose + SymOpen + r + SymClose)}," +
              s" ${sqlLit(SymOpen + l + r + SymClose)})"))
          .localCheckpoint()
        rank += 1
      }
    }
    (merges.result(), vocab)
  }

  private[llm] def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** [[trainMerges]] with the standard incremental-trainer optimization
    * (the delta update every serious BPE implementation ships — Sennrich's
    * reference `learn_bpe` maintains the same running pair-stats): instead
    * of recomputing the full adjacent-pair aggregation from the whole
    * distinct-word table every iteration (numMerges full explode+shuffle
    * passes — the r10 VERDICT's scale ceiling at a 100k-merge production
    * vocab), maintain the pair-stats table across iterations and update it
    * with the DELTA of the words the merge actually changed:
    *
    *   - only words whose segmentation contains the merged pair change —
    *     a map-only `contains` filter finds them (no shuffle; the one
    *     remaining per-iteration vocab pass is embarrassingly parallel);
    *   - the delta is `pairCounts(changed after) − pairCounts(changed
    *     before)`, aggregated over the CHANGED subset only — for a single
    *     merge that subset is the pair's support, orders of magnitude
    *     smaller than the vocab (Zipf: most merges touch few words);
    *   - stats' = stats ⊎ delta, zero-count pairs dropped; both the vocab
    *     and the stats table `localCheckpoint` per iteration (the Lloyd's-
    *     loop lineage-cut lesson), so per-merge cost is bounded by the
    *     changed subset + the stats table, not the corpus-derived vocab.
    *
    * Exact-arithmetic deltas over BIGINT counts ⇒ the stats table equals
    * the full recomputation bit-for-bit at every iteration, so the merge
    * sequence (argmax + tie-breaks) and final vocab are IDENTICAL to
    * [[trainMerges]] — proven pairwise in TrainingDataOpsSpec and by the
    * llm_bpe_train gate hash staying green after the swap. */
  def trainMergesIncremental(wordFreq: DataFrame, numMerges: Int): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    var vocab = wordFreq.localCheckpoint()
    // the per-iteration filter⊎union vocab update concatenates partition
    // lists; without this guard the partition count grows by the changed
    // subset's every merge (32 → 64 → 96 …) and checkpoint latency with it
    // (the bpeCtes r9 lesson). Coalesce back to the starting width.
    val parts = math.max(1, vocab.rdd.getNumPartitions)
    var stats = pairCounts(vocab).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = stats
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        val pat = SymOpen + l + SymClose + SymOpen + r + SymClose
        val applyMerge = expr(
          s"replace(s, ${sqlLit(pat)}, ${sqlLit(SymOpen + l + r + SymClose)})")
        val changedBefore = vocab.filter(col("s").contains(pat)).localCheckpoint()
        val changedAfter = changedBefore.withColumn("s", applyMerge).localCheckpoint()
        stats = stats
          .unionByName(pairCounts(changedAfter))
          .unionByName(pairCounts(changedBefore).withColumn("cnt", -col("cnt")))
          .groupBy("l", "r")
          .agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0)
          .localCheckpoint()
        // unchanged words keep their segmentation; the merge applies only
        // to the changed subset (replace is identity elsewhere anyway)
        vocab = vocab.filter(!col("s").contains(pat))
          .unionByName(changedAfter)
          .coalesce(parts)
          .localCheckpoint()
        rank += 1
      }
    }
    (merges.result(), vocab)
  }

  /** The trained merge table as a DataFrame (rank, lhs, rhs, pair_count) —
    * the artifact a tokenizer ships. */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Tokenize a corpus with a trained vocab: per-document word count and
    * BPE token count. The join is word-keyed against the final vocab state
    * — broadcast when the vocab is small enough, a plain equi-join
    * otherwise (pass `broadcastVocab = false` at 100 TB-scale vocabs; for
    * a vocab reused across many encode runs, persist it with
    * `TableStore.writeBucketedIndex(vocab, table, joinKeys = Seq("word"))`
    * so the vocab side reads co-located and only the corpus words
    * shuffle — the incremental-dedup index convention, plan pinned in
    * SinksSpec). Words absent from the trained vocab (OOV on a corpus the
    * tokenizer was not trained on) fall back to character-wise
    * segmentation — `length(word)` tokens, real BPE's no-merges-apply
    * behavior — via a LEFT join + coalesce, so encoding a new corpus
    * counts every word instead of silently dropping OOV rows. */
  def encodeCounts(
      docs: DataFrame,
      finalVocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastVocab: Boolean = true): DataFrame = {
    val perWordTokens = finalVocab.select(
      col("word"),
      size(split(
        regexp_replace(col("s"), "^" + SymOpen + "|" + SymClose + "$", ""),
        SymClose + SymOpen)).cast("long").as("n_word_tokens"))
    val vocabSide = if (broadcastVocab) broadcast(perWordTokens) else perWordTokens
    docs
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "" &&
        !col("word").contains(SymOpen) && !col("word").contains(SymClose))
      .join(vocabSide, Seq("word"), "left")
      .withColumn("n_word_tokens",
        coalesce(col("n_word_tokens"), length(col("word")).cast("long")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_word_tokens")).as("n_bpe_tokens"))
  }

  /** Out-of-vocabulary audit: encode a HELD-OUT corpus with a vocab
    * trained elsewhere and report, per `groupCol`, how much of it the
    * tokenizer has never seen — the generalization check a tokenizer ships
    * before being frozen (an OOV-heavy language stratum means the training
    * mix under-sampled it). Word-level: a word absent from the trained
    * vocab counts as OOV and falls back to character-wise segmentation
    * (`length(word)` tokens), exactly [[encodeCounts]]'s LEFT-join
    * fallback — this gate is that fallback path exercised as a
    * first-class artifact. Same join shape and `broadcastVocab` escape
    * hatch as [[encodeCounts]]; one corpus explode, one group-keyed agg. */
  def oovAudit(
      docs: DataFrame,
      finalVocab: DataFrame,
      groupCol: String = "lang",
      textCol: String = "text",
      broadcastVocab: Boolean = true): DataFrame = {
    val perWordTokens = finalVocab.select(
      col("word"),
      size(split(
        regexp_replace(col("s"), "^" + SymOpen + "|" + SymClose + "$", ""),
        SymClose + SymOpen)).cast("long").as("n_word_tokens"))
    val vocabSide = if (broadcastVocab) broadcast(perWordTokens) else perWordTokens
    docs
      .select(col(groupCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "" &&
        !col("word").contains(SymOpen) && !col("word").contains(SymClose))
      .join(vocabSide, Seq("word"), "left")
      .withColumn("__oov", col("n_word_tokens").isNull)
      .withColumn("__toks",
        coalesce(col("n_word_tokens"), length(col("word")).cast("long")))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(when(col("__oov"), 1L).otherwise(0L)).as("n_oov_words"),
        sum(col("__toks")).as("n_tokens"),
        sum(when(col("__oov"), col("__toks")).otherwise(0L)).as("n_oov_tokens"))
      .withColumn("oov_word_rate",
        round(col("n_oov_words").cast("double") / col("n_words"), 6))
  }

  /** Deterministic token-id vocabulary — the id map a tokenizer ships
    * alongside its merge table: base alphabet characters first (sorted),
    * then each merge's produced symbol in rank order, keep-first when a
    * merge reproduces an existing string (the standard tokenizer-vocab
    * convention: a duplicate merge product maps to the already-assigned
    * id). The alphabet collect is alphabet-bounded (≤ a few thousand code
    * points for any real corpus), the same bounded-collect class as the
    * merge-loop argmax. */
  def vocabIds(spark: SparkSession, merges: Seq[Merge], finalVocab: DataFrame): DataFrame = {
    import spark.implicits._
    val alphabet = finalVocab
      .select(explode(split(col("word"), "")).as("c"))
      .filter(col("c") =!= "")
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val toks = (alphabet ++ merges.sortBy(_.rank).map(m => m.left + m.right)).distinct
    toks.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("token", "token_id")
  }

  /** Tokenize a corpus into ordered token-id sequences — the emission step
    * a pre-training pipeline actually ships (tokenize → pack): one row per
    * (document, word occurrence, token position) with the token string and
    * its [[vocabIds]] id. Same word-keyed vocab join as [[encodeCounts]]
    * (broadcast vs plain equi-join vs bucketed index per its scaladoc),
    * then a map-only posexplode of each word's final segmentation — no
    * shuffle beyond the joins, so the pass scales with the corpus. OOV
    * words segment character-wise; characters never seen in training get
    * id −1 (the unk convention). Sequence order is (word_idx, tok_idx),
    * both 0-based over the document's whitespace split. */
  def encodeIds(
      docs: DataFrame,
      finalVocab: DataFrame,
      vocabIdTable: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastVocab: Boolean = true): DataFrame = {
    val segs = finalVocab.select(
      col("word"),
      split(
        regexp_replace(col("s"), "^" + SymOpen + "|" + SymClose + "$", ""),
        SymClose + SymOpen).as("__toks"))
    val vocabSide = if (broadcastVocab) broadcast(segs) else segs
    val idSide = if (broadcastVocab) broadcast(vocabIdTable) else vocabIdTable
    docs
      .select(col(idCol),
        posexplode(split(lower(trim(col(textCol))), "\\s+")).as(Seq("word_idx", "word")))
      .filter(col("word") =!= "" &&
        !col("word").contains(SymOpen) && !col("word").contains(SymClose))
      .join(vocabSide, Seq("word"), "left")
      .withColumn("__toks",
        coalesce(col("__toks"), filter(split(col("word"), ""), t => t =!= "")))
      .select(col(idCol), col("word_idx"),
        posexplode(col("__toks")).as(Seq("tok_idx", "token")))
      .join(idSide, Seq("token"), "left")
      .select(
        col(idCol),
        col("word_idx").cast("long").as("word_idx"),
        col("tok_idx").cast("long").as("tok_idx"),
        col("token"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))
  }
}
