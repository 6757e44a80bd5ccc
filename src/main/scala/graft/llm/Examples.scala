package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-example construction — the last mile of a data pipeline, where
  * curated documents become model inputs. Everything here is a pure
  * function of (id, seed) through [[Sampling.bucket]]'s portable md5 hash:
  * the same document yields the same example on any cluster, any
  * partitioning, any engine — which is what makes example construction
  * auditable (the DuckDB oracle recomputes every cut bit-for-bit) and
  * stable across dataset versions. All kernels are map-only builtin
  * projections: no shuffle, no UDF, full codegen.
  */
object Examples {

  /** T5 span-corruption examples (Raffel et al., JMLR 2020 §3.1.4; public
    * method), deterministic variant: `nSpans` word spans are masked with
    * `<extra_id_i>` sentinels; the target lists each sentinel followed by
    * its masked words. Spans are non-overlapping BY CONSTRUCTION — span i
    * lives in the i-th of `nSpans` equal word segments, with its length
    * (1 .. 2·meanSpanLen−1, clamped to the segment) and start drawn from
    * the portable md5 hash under per-span seeds — so every cut is integer
    * arithmetic both engines replay exactly. Documents with fewer than
    * `nSpans` words pass through uncorrupted (`corrupted = false`,
    * target empty).
    *
    * Output text is the WHITESPACE-NORMALIZED join of the token list (the
    * declared normal form — both engines build from the same word list,
    * never from raw text). Map-only builtin projection. */
  def spanCorrupt(
      docs: DataFrame,
      nSpans: Int = 2,
      meanSpanLen: Int = 3,
      seed: String = "t5",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nSpans >= 1 && meanSpanLen >= 1, s"bad params: $nSpans, $meanSpanLen")
    val ws = expr(s"filter(split(lower(trim($textCol)), '\\\\s+'), w -> w <> '')")
    val base = docs.select(col(idCol), ws.as("__ws"))
      .withColumn("__n", size(col("__ws")))
    // per-span segment bounds + hash-derived (start, len), all integer
    val withSpans = (0 until nSpans).foldLeft(base) { (df, i) =>
      // integer `div` — a double `/` + int cast truncates in Spark but
      // ROUNDS in a DuckDB CAST, so segment bounds stay in integer math
      val segStart = expr(s"CAST((__n * $i) div $nSpans AS INT)") + 1
      val segEnd = expr(s"CAST((__n * ${i + 1}) div $nSpans AS INT)")
      val segLen = segEnd - segStart + 1
      val maxLen = lit(2 * meanSpanLen - 1)
      val len = least(lit(1) +
        (Sampling.bucket(col(idCol), s"$seed-l$i") % maxLen).cast("int"), segLen)
      val start = segStart +
        (Sampling.bucket(col(idCol), s"$seed-s$i") % (segLen - len + 1)).cast("int")
      df.withColumn(s"__s$i", start).withColumn(s"__l$i", len)
    }
    val corrupted = col("__n") >= nSpans
    // input = gaps between spans with sentinels; target = sentinels + spans
    val inputParts = (0 until nSpans).flatMap { i =>
      val prevEnd = if (i == 0) lit(0) else col(s"__s${i - 1}") + col(s"__l${i - 1}") - 1
      Seq(
        slice(col("__ws"), prevEnd + 1, col(s"__s$i") - prevEnd - 1),
        array(lit(s"<extra_id_$i>")))
    } :+ slice(col("__ws"),
      col(s"__s${nSpans - 1}") + col(s"__l${nSpans - 1}"),
      col("__n") - (col(s"__s${nSpans - 1}") + col(s"__l${nSpans - 1}")) + 1)
    val targetParts = (0 until nSpans).flatMap { i =>
      Seq(array(lit(s"<extra_id_$i>")), slice(col("__ws"), col(s"__s$i"), col(s"__l$i")))
    }
    withSpans.select(
      col(idCol),
      corrupted.as("corrupted"),
      when(corrupted, array_join(concat(inputParts: _*), " "))
        .otherwise(array_join(col("__ws"), " ")).as("input_text"),
      when(corrupted, array_join(concat(targetParts: _*), " "))
        .otherwise(lit("")).as("target_text"))
  }

  /** Fill-in-the-middle splits (Bavarian et al. 2022, "Efficient Training
    * of Language Models to Fill in the Middle"; public method): with
    * probability `fimRate` a document is split at two hash-derived
    * character cuts into (prefix, middle, suffix) for PSM/SPM reordering;
    * the rest pass through unsplit. The FIM decision reuses the
    * [[Sampling.deterministicSample]] bucket under `seed`; the two cuts
    * draw from independent seeds (`seed ++ "-a"`, `seed ++ "-b"`) and are
    * ordered, so `0 <= cut1 <= cut2 <= n_chars`.
    *
    * Character (not token) cuts are the paper's character-level variant —
    * deterministic without a tokenizer in the loop; cuts are in code
    * points over the fixture's BMP text (declared; both engines slice by
    * character). Output: doc_id, fim flag, cut1, cut2, and the three
    * parts (empty strings for non-FIM rows' prefix/suffix, middle = the
    * whole document — the degenerate split, so downstream packing treats
    * both shapes uniformly). */
  def fimSplit(
      docs: DataFrame,
      fimRate: Double,
      seed: String,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(fimRate >= 0.0 && fimRate <= 1.0, s"fimRate out of range: $fimRate")
    val n = length(col(textCol))
    val isFim = Sampling.bucket(col(idCol), seed) < math.round(fimRate * Sampling.Buckets)
    // hash-derived cuts in [0, n]: mod (n+1) so the empty prefix/suffix
    // splits are reachable (a cut AT the boundary is a valid FIM example)
    val cutA = (Sampling.bucket(col(idCol), seed + "-a") % (n + 1)).cast("int")
    val cutB = (Sampling.bucket(col(idCol), seed + "-b") % (n + 1)).cast("int")
    val c1 = when(isFim, least(cutA, cutB)).otherwise(lit(0))
    val c2 = when(isFim, greatest(cutA, cutB)).otherwise(n.cast("int"))
    docs.select(
      col(idCol),
      isFim.as("fim"),
      c1.as("cut1"),
      c2.as("cut2"),
      col(textCol).substr(lit(1), c1).as("prefix"),
      // substr(pos = cut+1, len): 1-based in both engines
      col(textCol).substr(c1 + 1, c2 - c1).as("middle"),
      col(textCol).substr(c2 + 1, n - c2).as("suffix"))
  }
}
