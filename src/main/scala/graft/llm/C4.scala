package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning rule-set (Raffel et al., "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020,
  * §2.2 — public method; also the TFDS `c4` reference implementation):
  * line-level retention plus page-level drops, the other canonical
  * web-corpus filter next to the Gopher rules
  * ([[TextAnalysis.gopherSignals]]).
  *
  * Line rules (a line survives iff ALL hold):
  *  - ends in a terminal punctuation mark (`.` `!` `?` `"` — TFDS
  *    `_END_MARKS`) but NOT in an ellipsis `...` (TFDS `_ELLIPSIS`),
  *    after trimming
  *  - contains at least `minWordsPerLine` (default 5) whitespace words
  *  - does not mention "javascript" (case-insensitive)
  *
  * Page rules (the page is dropped iff ANY holds):
  *  - fewer than `minLines` (default 3) surviving lines — the paper's
  *    "fewer than 3 sentences" with surviving lines as the sentence proxy
  *  - any word of the RAW text (split on non-word characters, lowercased)
  *    is on the bad-word list — word-boundary matching, so punctuation-
  *    adjacent occurrences hit, as in TFDS. The real pipeline uses the
  *    public "List of Dirty, Naughty, Obscene..." list; it is not
  *    vendored here, so [[DefaultBadWords]] is a tiny placeholder — pass
  *    the full list in production
  *  - the phrase "lorem ipsum" appears in the SURVIVING lines
  *    (case-insensitive) — TFDS checks the rejoined filtered text
  *  - a curly bracket `{` appears in the SURVIVING lines (code, not prose)
  *
  * Everything is builtin array/string arithmetic over one row — map-only,
  * whole-stage codegen, no UDF, no shuffle — so at 100 TB this runs as a
  * pure projection over the document scan, transliterating 1:1 to the
  * DuckDB oracle.
  */
object C4 {

  /** Placeholder for the public bad-word list (not vendored). */
  val DefaultBadWords: Seq[String] = Seq("badword", "nsfwtoken")

  /** True iff the trimmed line passes all three C4 line rules. A line
    * ending in an ellipsis fails even though `...` ends with `.` — TFDS
    * rejects `_ELLIPSIS` endings explicitly (truncated teaser lines). */
  private def lineKeep(l: Column, minWordsPerLine: Int): Column = {
    val t = trim(l)
    (t.endsWith(".") || t.endsWith("!") || t.endsWith("?") || t.endsWith("\"")) &&
      !t.endsWith("...") &&
      size(split(t, "\\s+")) >= minWordsPerLine &&
      !lower(t).contains("javascript")
  }

  /** Per-document C4 result: surviving lines rejoined as `clean_text`,
    * line counts, the page-level flags, and the combined `c4_pass`.
    * Documents failing a page rule keep their diagnostic columns — the
    * caller filters on `c4_pass` (or reads the funnel off the flags). */
  def clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      badWords: Seq[String] = DefaultBadWords,
      minWordsPerLine: Int = 5,
      minLines: Int = 3): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val kept = filter(lines, l => lineKeep(l, minWordsPerLine))
    val cleanText = concat_ws("\n", kept)
    // Bad words tokenize on NON-WORD characters, not whitespace: TFDS
    // matches bad words with word-boundary regexes, so 'badword.' and
    // 'badword,' must hit (ADVICE r7). Checked over the RAW text — TFDS
    // screens every line for bad words before line filtering.
    val words = split(lower(t), "\\W+")
    docs.select(
        col(idCol),
        size(lines).as("n_lines"),
        size(kept).as("n_kept"),
        cleanText.as("clean_text"),
        // lorem/curly are page flags over the SURVIVING lines only — TFDS
        // applies them to the rejoined filtered text, so a page whose only
        // offending content sits in a dropped line is kept (ADVICE r7)
        lower(cleanText).contains("lorem ipsum").as("has_lorem"),
        cleanText.contains("{").as("has_curly"),
        (size(array_intersect(words, typedLit(badWords.map(_.toLowerCase)))) > 0)
          .as("has_badword"))
      .withColumn("c4_pass",
        col("n_kept") >= minLines &&
          !col("has_lorem") && !col("has_curly") && !col("has_badword"))
  }

  /** The filtered corpus: pages passing every rule, text replaced by the
    * surviving lines. */
  def filterCorpus(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      badWords: Seq[String] = DefaultBadWords,
      minWordsPerLine: Int = 5,
      minLines: Int = 3): DataFrame =
    clean(docs, idCol, textCol, badWords, minWordsPerLine, minLines)
      .filter(col("c4_pass"))
      .select(col(idCol), col("clean_text").as(textCol))
}
