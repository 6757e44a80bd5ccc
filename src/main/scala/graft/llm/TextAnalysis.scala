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
    * All row-local builtins (array_distinct / filter / transform) — the
    * per-row cost is O(distinct·n) on short token lists, zero shuffle. */
  def repetitionSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    val n = size(words)
    // 0-based get() (null OOB) — ANSI element_at throws; sequence() guarded
    // because sequence(1, 0) counts DOWN rather than returning empty
    val bigrams = transform(sequence(lit(0), n - 2),
      i => concat_ws(" ", get(words, i), get(words, i + 1)))
    def topFrac(arr: Column, denom: Column): Column =
      array_max(transform(array_distinct(arr), w => size(filter(arr, x => x === w))))
        .cast("double") / denom
    df
      .withColumn("dup_word_frac",
        when(n > 0, lit(1.0) - size(array_distinct(words)).cast("double") / n).otherwise(lit(0.0)))
      .withColumn("top_word_frac",
        when(n > 0, topFrac(words, n.cast("double"))).otherwise(lit(0.0)))
      .withColumn("top_bigram_frac",
        when(n >= 2, topFrac(bigrams, (n - 1).cast("double"))).otherwise(lit(0.0)))
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
    * boundaries; argmax, 'und' (undetermined) when nothing hits. */
  def languageId(text: Column): Column = {
    val scores: Seq[(String, Column)] = stopwords.toSeq.map { case (lang, words) =>
      val pattern = words.mkString("\\b(", "|", ")\\b")
      lang -> regexp_count(lower(text), lit(pattern))
    }
    val best = scores.map { case (lang, score) => struct(score.as("score"), lit(lang).as("lang")) }
    val top = greatest(best: _*)
    when(top.getField("score") > 0, top.getField("lang")).otherwise(lit("und"))
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
}
