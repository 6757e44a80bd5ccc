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
