package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Naive-Bayes quality classifier — the CCNet / LLaMA-1 quality-filter
  * shape (Wenzek et al. LREC 2020 §4.4; Touvron et al. 2023 train a linear
  * classifier over Wikipedia-vs-crawl; fastText's supervised mode is the
  * same bag-of-words linear score — public methods): train per-word
  * log-odds from a labeled corpus (quality vs not), score any document as
  * `prior + Σ_tokens logOdds(token)`, keep documents scoring above the
  * decision threshold.
  *
  * Same tokenization as [[CorpusStats]]' unigram LM (lowercased
  * whitespace split — `split(lower(trim(text)), "\\s+")`), same add-one
  * smoothing convention `(c+1)/(N+V+1)`, so the DuckDB oracle
  * transliterates both train and score exactly.
  *
  * Scale shape: train is one token-keyed aggregation over the LABELED set
  * (small by construction — quality labels are hand-curated or
  * proxy-sampled, not corpus-scale) collected into a model table bounded by
  * vocabulary; scoring broadcasts the model and re-aggregates per document
  * with map-side partials — exactly [[CorpusStats.lmScore]]'s shape, which
  * survives 100 TB because the corpus side stays one scan + one doc-keyed
  * shuffle. */
object Classifier {

  private def words(textCol: Column): Column = split(lower(trim(textCol)), "\\s+")

  /** Train the model: a (word, log_odds) table with the scalar constants
    * (OOV log-odds, prior log-odds) denormalized onto every row — the
    * [[CorpusStats.unigramLm]] layout, so a single broadcast carries the
    * whole model.
    *
    * `labelCol` must be boolean (true = quality). log_odds(w) =
    * ln((c⁺+1)/(N⁺+V+1)) − ln((c⁻+1)/(N⁻+V+1)) over the union vocabulary;
    * OOV words score ln(1/(N⁺+V+1)) − ln(1/(N⁻+V+1)); the prior is
    * ln(docs⁺/docs⁻). */
  def nbTrain(
      labeled: DataFrame,
      labelCol: String = "label",
      textCol: String = "text"): DataFrame = {
    val tokens = labeled.select(col(labelCol).as("__pos"), explode(words(col(textCol))).as("word"))
    // vocab-bounded and read twice (totals + the model projection):
    // materialize so the labeled-set token aggregation runs once
    val counts = tokens.groupBy(col("word")).agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).as("c_neg"))
      .localCheckpoint()
    val totals = counts.agg(
      sum(col("c_pos")).cast("double").as("n_pos"),
      sum(col("c_neg")).cast("double").as("n_neg"),
      count(lit(1)).cast("double").as("vocab_size"))
    val docTotals = labeled.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).cast("double").as("docs_pos"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).cast("double").as("docs_neg"))
    // the returned model feeds multiple consumers (score constants +
    // broadcast probe, or the kernel collect) — materialize it so the
    // train chain never re-executes per consumer (plan peek before the
    // cut: llm_nb_quality at 7 parquet scans / 17 exchanges)
    counts.crossJoin(broadcast(totals)).crossJoin(broadcast(docTotals))
      .select(
        col("word"),
        (log((col("c_pos") + 1.0) / (col("n_pos") + col("vocab_size") + 1.0))
          - log((col("c_neg") + 1.0) / (col("n_neg") + col("vocab_size") + 1.0))).as("log_odds"),
        (log(lit(1.0) / (col("n_pos") + col("vocab_size") + 1.0))
          - log(lit(1.0) / (col("n_neg") + col("vocab_size") + 1.0))).as("oov_log_odds"),
        log(col("docs_pos") / col("docs_neg")).as("prior_log_odds"))
      .localCheckpoint()
  }

  /** Score every document under a [[nbTrain]]ed model: (idCol, n_tokens,
    * nb_score, pred_quality). The score is rounded to 6 dp BEFORE the
    * decision compare, so a summation-order ulp can't flip the predicted
    * class between engines (the hard-negative band-edge rule, ADVICE r8). */
  def nbScore(
      docs: DataFrame,
      model: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val consts = broadcast(model.agg(
      first(col("oov_log_odds")).as("__oov"),
      first(col("prior_log_odds")).as("__prior")))
    docs
      .select(col(idCol), explode(words(col(textCol))).as("word"))
      .join(broadcast(model.select(col("word"), col("log_odds"))), Seq("word"), "left")
      .crossJoin(consts)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(first(col("__prior")) + sum(coalesce(col("log_odds"), col("__oov"))), 6)
          .as("nb_score"))
      .withColumn("pred_quality", col("nb_score") > 0.0)
  }

  /** Classifier calibration/reliability audit — the table an ML-ops pass
    * reviews before trusting a quality filter at corpus scale: scored
    * documents joined with evaluation labels, bucketed into fixed-width
    * score bins (floor(nb_score / binWidth), clamped to ±10 bins), each
    * bin reporting document count, true-label positives, predicted
    * positives, and the observed positive rate — a well-calibrated
    * classifier shows pos_rate rising monotonically with the bin. Fixed
    * double-width binning on the ALREADY-6dp-rounded score keeps the bin
    * assignment bit-identical across engines (no sigmoid/exp — libm-free).
    * One doc-keyed join + a ≤21-row aggregation on top of [[nbScore]]'s
    * existing shape. */
  def nbCalibration(
      scored: DataFrame,
      labels: DataFrame,
      binWidth: Double = 5.0,
      idCol: String = "doc_id"): DataFrame =
    scored.join(labels, Seq(idCol))
      .withColumn("bin",
        least(greatest(floor(col("nb_score") / binWidth).cast("long"), lit(-10L)), lit(10L)))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos_label"),
        sum(when(col("pred_quality"), 1L).otherwise(0L)).as("n_pred_pos"))
      .withColumn("pos_rate", round(col("n_pos_label").cast("double") / col("n_docs"), 6))

  /** Row-local form of [[nbScore]] for pipeline composition — the
    * [[CorpusStats.lmScoreColumn]] shape: the model table (bounded by
    * vocabulary) is collected once and rides the executors as ONE broadcast
    * hash map; each document scores in a single kernel pass with zero
    * shuffle, so the classifier slots into the map-only curation funnel.
    * Same math as [[nbScore]] (prior + Σ log-odds, OOV mass, 6 dp), which
    * the spec pins by equality. Tokenization is the SQL-split replica
    * ([[CorpusStats.splitLikeSql]]) so engine and oracle agree on empty
    * leading/trailing tokens. */
  def nbScoreColumn(model: DataFrame, text: Column): Column = {
    val rows = model
      .select(col("word"), col("log_odds"), col("oov_log_odds"), col("prior_log_odds"))
      .collect()
    val odds = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (oov, prior) =
      if (rows.isEmpty) (0.0, 0.0) else (rows.head.getDouble(2), rows.head.getDouble(3))
    val oddsB = model.sparkSession.sparkContext.broadcast(odds)
    val u = udf { (s: String) =>
      if (s == null) BigDecimal(prior).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else {
        val words = CorpusStats.splitLikeSql(s)
        val m = oddsB.value
        var sum = prior
        var i = 0
        while (i < words.length) { sum += m.getOrElse(words(i), oov); i += 1 }
        BigDecimal(sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    u(text)
  }
}
