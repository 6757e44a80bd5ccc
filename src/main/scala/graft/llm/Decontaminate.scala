package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents whose word n-grams
  * overlap an evaluation/benchmark set, report the overlap, and drop the
  * contaminated ones — the standard guard against test-set leakage into a
  * training corpus (n-gram overlap à la GPT-3/PaLM decontamination; real
  * pipelines use 8–13-gram windows, the fixtures' short docs use 3).
  *
  * Scale shape (the asymmetry is the whole design): the eval side is SMALL
  * by construction — benchmarks are thousands of documents against a
  * multi-billion-document corpus — so its distinct n-gram set is
  * `broadcast()` and the 100 TB training side is probed map-side, never
  * shuffled for the match. The only shuffle is the per-document
  * re-aggregation keyed on `doc_id`, which partial-aggregates map-side
  * (count/sum combine before the exchange).
  */
object Decontaminate {

  /** Per-document contamination stats against `evalDocs`:
    * `n_ngrams` (distinct n-grams in the doc), `n_contaminated` (of those,
    * how many appear anywhere in the eval set), `contamination_frac`.
    * Documents too short to form an n-gram get (0, 0, 0.0).
    */
  def contamination(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.shingles(col(textCol), n)).as("__gram"))
      .distinct()
      .withColumn("__hit", lit(1))
    val docGrams = docs
      .select(col(idCol),
        explode_outer(array_distinct(Dedup.shingles(col(textCol), n))).as("__gram"))
    docGrams
      .join(broadcast(evalGrams), Seq("__gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__gram")).as("n_ngrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_frac",
        round(col("n_contaminated").cast("double")
          / greatest(col("n_ngrams").cast("double"), lit(1.0)), 6))
  }

  /** Training corpus minus documents with ≥ `threshold` n-gram overlap
    * with the eval set. Anti-join on the flagged id set keeps the corpus
    * scan single-pass. */
  def decontaminate(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 3,
      threshold: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val flagged = contamination(docs, evalDocs, n, idCol, textCol)
      .filter(col("contamination_frac") >= threshold)
      .select(col(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** Row-local contamination fraction for pipeline composition — the
    * kernel form of [[contamination]]: the eval set's distinct n-gram
    * HASHES (64-bit, the [[Dedup.shingleHashes]] walk — benchmarks are
    * small by construction) ride the task closure as a hash set; each
    * document computes its overlap in one pass, zero shuffle, so a
    * decontamination filter slots into the map-only curation funnel.
    * Equal to the join-based stats up to negligible 64-bit collisions
    * (spec pins equality on the fixtures). */
  def contaminationColumn(
      evalDocs: DataFrame,
      text: Column,
      n: Int = 3,
      textCol: String = "text"): Column = {
    val evalGrams: Array[Long] = evalDocs
      .select(explode(Dedup.shingleHashes(col(textCol), n)).as("__g"))
      .distinct()
      .collect().map(_.getLong(0))
    val set = new java.util.HashSet[java.lang.Long](evalGrams.length * 2)
    evalGrams.foreach(g => set.add(g))
    // one broadcast per executor, not one set copy per task closure — the
    // same discipline as lmScoreColumn's vocabulary (ADVICE r4)
    val setB = evalDocs.sparkSession.sparkContext.broadcast(set)
    val u = udf { (grams: Seq[Long]) =>
      if (grams == null || grams.isEmpty) 0.0
      else {
        val s = setB.value
        var hits = 0
        grams.foreach(g => if (s.contains(g)) hits += 1)
        BigDecimal(hits.toDouble / grams.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    u(Dedup.shingleHashes(text, n))
  }

  /** Fuzzy decontamination: training documents NEAR-duplicating an eval
    * document (lightly paraphrased test-set leakage that exact n-gram
    * overlap misses). MinHash-LSH candidates across the two corpora,
    * verified by exact shingle Jaccard — returns (doc_id, eval_id, jaccard)
    * pairs at ≥ `threshold`.
    *
    * Scale shape: both sides compute signatures map-only (one pass, the
    * [[Dedup.minhashSignature]] kernel); the eval side's banded signatures
    * are TINY (benchmarks, not corpora) and broadcast, so candidate
    * generation is a map-side hash join against the 100 TB side — the
    * corpus never shuffles on bands. Only candidates (bounded by LSH
    * collisions) reach the Jaccard verify join. Approximate in recall like
    * every LSH pass (banding tuned below the verify threshold); precision
    * is exact. */
  def fuzzyContamination(
      docs: DataFrame,
      evalDocs: DataFrame,
      threshold: Double = 0.7,
      perms: Int = 32,
      bands: Int = 8,
      shingleK: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // internal aliases use a reserved __fz prefix so a caller's idCol can
    // never collide with them, and the output id column honors idCol
    // instead of a hardcoded "doc_id" (ADVICE r4)
    require(idCol != "eval_id" && !idCol.startsWith("__fz"),
      s"idCol collides with fuzzyContamination's output/internal names: $idCol")
    def banded(df: DataFrame, outId: String): DataFrame =
      Dedup.bandSignatures(df, idCol, textCol, perms, bands, shingleK, outId)
    val cands = banded(docs, "__fz_t")
      .join(broadcast(banded(evalDocs, "__fz_e")), Seq("band", "band_hash"))
      .select(col("__fz_t"), col("__fz_e"))
      .distinct()
    val docSh = docs.join(cands.select(col("__fz_t").as(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol).as("__fz_t"), Dedup.shingleHashes(col(textCol), shingleK).as("__fz_sh_t"))
    val evalSh = evalDocs.select(col(idCol).as("__fz_e"), Dedup.shingleHashes(col(textCol), shingleK).as("__fz_sh_e"))
    cands
      .join(docSh, Seq("__fz_t"))
      .join(broadcast(evalSh), Seq("__fz_e"))
      .withColumn("jaccard",
        when(size(array_union(col("__fz_sh_t"), col("__fz_sh_e"))) > 0,
          size(array_intersect(col("__fz_sh_t"), col("__fz_sh_e"))).cast("double") /
            size(array_union(col("__fz_sh_t"), col("__fz_sh_e"))))
          .otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select(col("__fz_t").as(idCol), col("__fz_e").as("eval_id"), col("jaccard"))
  }
}
