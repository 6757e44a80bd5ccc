package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Everything row-local — pure projections, no shuffle, fully codegen'd
  * builtins except the rolling-hash fingerprint (a UDF by necessity).
  * At 100 TB these run as map-only stages over the document scan.
  */
object TextAnalysis {

  /** Per-key ordered line re-assembly: one key-hash shuffle, a
    * partition-local (keys, pos) sort, and a linear scan that joins each
    * key's values with `sep` in position order — one output row per key,
    * plus an optional row count. Replaces the
    * `array_sort(collect_list(struct(pos, line)))` aggregation shape,
    * whose partial ObjectHashAggregate silently degrades to the
    * sort-based fallback past 128 keys/task and re-serializes every line
    * row through the external KV sorter (jstack-attributed on the
    * identically-shaped shard emit, NOTES r15). Group contiguity after
    * the repartition is a hash-partitioning invariant (AQE may coalesce
    * partitions, never split a bucket); null values are skipped without a
    * separator, matching `array_join`'s null handling, but still counted. */
  private[llm] def orderedReassemble(
      lines: DataFrame,
      keyCols: Seq[String],
      posCol: String,
      valCol: String,
      sep: String,
      outCol: String,
      countCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val sorted = lines
      .select((keyCols :+ posCol :+ valCol).map(col): _*)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ posCol).map(col): _*)
    val n = keyCols.size
    val outSchema = StructType(
      sorted.schema.fields.take(n) ++
        Seq(StructField(outCol, StringType, nullable = false)) ++
        countCol.map(c => StructField(c, LongType, nullable = false)))
    sorted.mapPartitions { it =>
      val in = it.buffered
      new Iterator[Row] {
        def hasNext: Boolean = in.hasNext
        def next(): Row = {
          val head = in.head
          val key = (0 until n).map(head.get)
          val sb = new java.lang.StringBuilder
          var cnt = 0L
          var appended = false
          while (in.hasNext && (0 until n).forall(i => in.head.get(i) == key(i))) {
            val r = in.next()
            cnt += 1
            val v = r.getString(n + 1)
            if (v != null) {
              if (appended) sb.append(sep)
              sb.append(v)
              appended = true
            }
          }
          Row.fromSeq(key ++ Seq(sb.toString) ++ countCol.map(_ => cnt))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Whitespace token count — `size(split(...))` builtins. */
  def tokenCountWhitespace(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token estimate: words + digits + punctuation as separate
    * tokens (a common pre-tokenizer regex shape). */
  def tokenCountBpeish(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Quality signals: length, word count, mean word length, punctuation
    * ratio, digit ratio, uppercase ratio — the standard cheap filters. */
  def qualitySignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val chars = length(t).cast("double")
    df
      .withColumn("n_chars_measured", length(t))
      .withColumn("n_words", tokenCountWhitespace(t))
      .withColumn("mean_word_len",
        when(col("n_words") > 0, (chars - (col("n_words") - 1)) / col("n_words")).otherwise(lit(0.0)))
      .withColumn("punct_ratio", regexp_count(t, lit("[^A-Za-z0-9\\s]")).cast("double") / greatest(chars, lit(1.0)))
      .withColumn("digit_ratio", regexp_count(t, lit("[0-9]")).cast("double") / greatest(chars, lit(1.0)))
      .withColumn("upper_ratio", regexp_count(t, lit("[A-Z]")).cast("double") / greatest(chars, lit(1.0)))
      .withColumn("stopword_ratio",
        regexp_count(lower(t), lit("\\b(the|and|of|to|in|is|that|for|with|a)\\b")).cast("double")
          / greatest(col("n_words").cast("double"), lit(1.0)))
  }

  /** Composite quality score in [0,1]: penalize extreme length, high
    * punctuation/digit density, and single-word documents. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame =
    qualitySignals(df, textCol)
      .withColumn("quality_score",
        round(
          when(col("n_words") < 2, lit(0.0)).otherwise(
            greatest(lit(0.0),
              lit(1.0)
                - least(col("punct_ratio") * 2, lit(0.5))
                - least(col("digit_ratio"), lit(0.3))
                - when(col("n_chars_measured") < 20, lit(0.2)).otherwise(lit(0.0)))),
          4))

  /** Repetition signals (Gopher-style quality rules): duplicate-word
    * fraction, most-frequent-word fraction, most-frequent-bigram fraction.
    * Row-local, zero shuffle.
    *
    * Deliberately ONE single-pass UDF kernel (the minhash/simhash
    * precedent, NOTES.md): every builtin formulation loses badly here —
    * `transform(array_distinct(A), w => size(filter(A, x => x === w)))`
    * re-evaluates A's construction per lambda element (75 ms/row at 50
    * words, an O(n²) array-rebuild bomb), and even the O(n log n)
    * sorted-run `aggregate` form runs interpreted (higher-order functions
    * have no codegen) at 2.6 ms/row. The hash-map kernel is ~10 µs/row and
    * computes all three fractions in one tokenization. */
  def repetitionSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val u = udf { (s: String) =>
      if (s == null) (0.0, 0.0, 0.0)
      else {
        // Locale.ROOT: match Spark's locale-independent lower()
        val words = s.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        val n = words.length
        if (n == 0) (0.0, 0.0, 0.0)
        else {
          val freq = new java.util.HashMap[String, Int](n * 2)
          var maxW = 0
          var i = 0
          while (i < n) {
            val c = freq.merge(words(i), 1, (a, b) => a + b)
            if (c > maxW) maxW = c
            i += 1
          }
          val dup = 1.0 - freq.size.toDouble / n
          val topW = maxW.toDouble / n
          val topB =
            if (n < 2) 0.0
            else {
              val bf = new java.util.HashMap[String, Int](n * 2)
              var maxB = 0
              var j = 0
              while (j < n - 1) {
                val c = bf.merge(words(j) + " " + words(j + 1), 1, (a, b) => a + b)
                if (c > maxB) maxB = c
                j += 1
              }
              maxB.toDouble / (n - 1)
            }
          (dup, topW, topB)
        }
      }
    }
    df.withColumn("__rep", u(col(textCol)))
      .withColumn("dup_word_frac", col("__rep._1"))
      .withColumn("top_word_frac", col("__rep._2"))
      .withColumn("top_bigram_frac", col("__rep._3"))
      .drop("__rep")
  }

  /** PII redaction: emails, IPv4 addresses, then phone-like digit runs —
    * chained codegen'd regexp_replace, map-only. Patterns are RE2-safe so
    * the DuckDB oracle applies the identical regexes. Order matters: emails
    * before phones (an email's digits must not be half-eaten), IPs before
    * phones (dotted quads are not phone numbers). */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>"))
    val ip = regexp_replace(email,
      lit("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"), lit("<IP>"))
    regexp_replace(ip, lit("\\+?\\d[\\d() -]{7,}\\d"), lit("<PHONE>"))
  }

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Tiny, broadcast as literals into the plan. */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "im", "ein"))

  /** Language-ID: score = stopword hits per language over lowercased word
    * boundaries; argmax with ties resolved like `greatest(struct(score,
    * lang))` (lexicographically greatest language wins); 'und'
    * (undetermined) when nothing hits.
    *
    * ONE kernel pass, not a regexp_count per language: the four
    * `\b(stop|words|…)\b` scans each re-walked the document (0.24 ms/doc —
    * the slowest map-only query in the suite). The kernel reproduces `\b`
    * exactly — tokens are maximal [A-Za-z0-9_] runs (Java regex word
    * chars), matched lowercased against each language's set — and scores
    * every language in one walk. */
  def languageId(text: Column): Column = {
    val langs = stopwords.toSeq.sortBy(_._1)
    val sets: Array[Set[String]] = langs.map(_._2.toSet).toArray
    val names: Array[String] = langs.map(_._1).toArray
    val u = udf { (s: String) =>
      if (s == null) "und"
      else {
        val scores = new Array[Int](sets.length)
        val sb = new java.lang.StringBuilder(16)
        var i = 0
        val n = s.length
        def closeToken(): Unit = if (sb.length > 0) {
          val tok = sb.toString
          var l = 0
          while (l < sets.length) { if (sets(l).contains(tok)) scores(l) += 1; l += 1 }
          sb.setLength(0)
        }
        while (i < n) {
          val c = s.charAt(i)
          // Java regex \w = [a-zA-Z0-9_]: the exact \b boundary rule
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
              (c >= '0' && c <= '9') || c == '_') sb.append(Character.toLowerCase(c))
          else closeToken()
          i += 1
        }
        closeToken()
        var best = 0
        var l = 1
        while (l < scores.length) {
          // >= keeps the later (lexicographically greater) language on ties
          if (scores(l) >= scores(best)) best = l
          l += 1
        }
        if (scores(best) > 0) names(best) else "und"
      }
    }
    u(text)
  }

  /** Polynomial rolling-hash document fingerprint (64-bit, base 31) over the
    * normalized text — stable content identity cheaper than md5 for
    * near-dup pre-bucketing; row-local UDF. */
  val fingerprintUdf = udf { (s: String) =>
    if (s == null) 0L
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
      h
    }
  }

  def fingerprint(text: Column): Column = fingerprintUdf(lower(trim(text)))

  /** The Gopher rule-set document filter (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021
    * §A1.1.2 — public method; also the RedPajama/Dolma "Gopher rules"):
    * per-document signals plus the canonical accept thresholds —
    *
    *  - 50 ≤ word count ≤ 100,000
    *  - 3 ≤ mean word length ≤ 10
    *  - symbol-to-word ratio (`#` or `...`/`…`) ≤ 0.1
    *  - < 90% of lines start with a bullet; < 30% end with an ellipsis
    *  - ≥ 80% of words contain an alphabetic character
    *  - ≥ 2 of the 8 English stop words {the, be, to, of, and, that,
    *    have, with} appear
    *  - duplicate-line fraction ≤ 0.3 (the doc-level repetition rule;
    *    the finer n-gram repetition rules are [[repetitionSignals]])
    *
    * Everything is builtin-function arithmetic over one row — map-only,
    * whole-stage codegen, no UDF — and transliterates 1:1 to the DuckDB
    * oracle. Ratios round to 6 dp; denominators clamp at 1 on both sides
    * so empty docs score 0 rather than null. */
  def gopherSignals(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val nWords = size(words)
    val nWordsD = greatest(nWords, lit(1)).cast("double")
    val lines = split(col(textCol), "\n")
    val nLines = size(lines)
    val nLinesD = greatest(nLines, lit(1)).cast("double")
    val nHash = length(col(textCol)) - length(regexp_replace(col(textCol), "#", ""))
    val nEllipsis =
      (length(col(textCol)) - length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3 +
        (length(col(textCol)) - length(regexp_replace(col(textCol), "…", "")))
    val bulletLines = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*") || ltrim(l).startsWith("•")))
    val ellipsisLines = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val stopHits = size(array_intersect(
      transform(words, w => lower(w)),
      typedLit(Seq("the", "be", "to", "of", "and", "that", "have", "with"))))
    val dupLines = (nLines - size(array_distinct(lines))).cast("double") / nLinesD
    df.select(
        col(idCol),
        nWords.as("n_words"),
        round(length(regexp_replace(trim(col(textCol)), "\\s+", "")) / nWordsD, 6).as("mean_word_len"),
        round((nHash + nEllipsis) / nWordsD, 6).as("symbol_word_ratio"),
        round(bulletLines / nLinesD, 6).as("bullet_line_frac"),
        round(ellipsisLines / nLinesD, 6).as("ellipsis_line_frac"),
        round(alphaWords / nWordsD, 6).as("alpha_word_frac"),
        stopHits.as("stopword_hits"),
        round(dupLines, 6).as("dup_line_frac"))
      .withColumn("gopher_pass",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_word_ratio") <= 0.1 &&
          col("bullet_line_frac") < 0.9 &&
          col("ellipsis_line_frac") < 0.3 &&
          col("alpha_word_frac") >= 0.8 &&
          col("stopword_hits") >= 2 &&
          col("dup_line_frac") <= 0.3)
  }
}
