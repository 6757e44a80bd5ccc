package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding vectors — the SQ8 compression of
  * FAISS/ScaNN (Jégou et al. "Product quantization" §2 discusses the scalar
  * baseline; public method): each dimension gets an affine code
  * `round((v − vmin_d) · 255 / (vmax_d − vmin_d))` in [0, 255] from
  * per-dimension corpus min/max, cutting a float32 corpus 4× while keeping
  * cosine rankings nearly intact (parity measured in the spec / the
  * llm_int8_parity gate; pairs with the llm_pq_* family — PQ compresses
  * harder, SQ8 reconstructs closer).
  *
  * Scale shape: train is ONE aggregation keyed on dimension index (≤ dim
  * groups, map-side partials) collected to a (2 × dim) table — bounded by
  * dimensionality, not corpus size, like the IVF centroid collect. Encode
  * and dequantize are map-only builtin `transform` projections over the
  * corpus scan: zero shuffles, whole-stage codegen.
  *
  * Determinism: min/max are comparison-exact; the code arithmetic is a
  * fixed IEEE double expression tree `(v − vmin) · 255.0 / (vmax − vmin)`
  * evaluated identically by any engine, and `round` half-up equals DuckDB's
  * half-away-from-zero on the non-negative domain — codes are
  * bit-reproducible, which is what makes them oracle-checkable. */
object Quantize {

  /** Trained per-dimension ranges. Plain data (no session reference) so it
    * memoizes safely in a [[graft.util.SessionCache]]. */
  final case class Ranges(vmin: IndexedSeq[Double], vmax: IndexedSeq[Double]) {
    def dim: Int = vmin.length
  }

  /** One pass over the corpus: per-dimension min/max. */
  def trainRanges(
      corpus: DataFrame,
      vecCol: String = "embedding"): Ranges = {
    val rows = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .orderBy("pos")
      .collect()
    Ranges(
      rows.map(_.getDouble(1)).toIndexedSeq,
      rows.map(_.getDouble(2)).toIndexedSeq)
  }

  private def litArray(xs: Seq[Double]): Column = array(xs.map(lit): _*)

  /** Map-only encode: `codes` = int array in [0, 255] (one per dimension).
    * A degenerate dimension (vmax == vmin) codes to 0. Values outside the
    * trained range (new data) clamp to the range edges. */
  def encode(
      corpus: DataFrame,
      ranges: Ranges,
      vecCol: String = "embedding",
      codesCol: String = "codes"): DataFrame = {
    val mins = litArray(ranges.vmin)
    val spans = litArray(ranges.vmax.lazyZip(ranges.vmin).map(_ - _))
    corpus.withColumn(codesCol,
      transform(
        col(vecCol).cast("array<double>"),
        (v, i) => {
          val span = element_at(spans, i + 1)
          val code = round((v - element_at(mins, i + 1)) * lit(255.0) / span)
          when(span === 0.0, lit(0))
            .otherwise(greatest(lit(0), least(lit(255), code.cast("int"))))
        }))
  }

  /** Map-only dequantize of an [[encode]]d codes column:
    * `v̂_d = vmin_d + code_d · (vmax_d − vmin_d) / 255`. */
  def dequantize(
      codes: DataFrame,
      ranges: Ranges,
      codesCol: String = "codes",
      outCol: String = "dequant"): DataFrame = {
    val mins = litArray(ranges.vmin)
    val spans = litArray(ranges.vmax.lazyZip(ranges.vmin).map(_ - _))
    codes.withColumn(outCol,
      transform(
        col(codesCol),
        (c, i) =>
          element_at(mins, i + 1) +
            c.cast("double") * element_at(spans, i + 1) / lit(255.0)))
  }

  /** Reconstruction-quality audit per vector — the parity table that decides
    * whether SQ8 is safe for a corpus: cosine(original, dequantized) and the
    * max per-dimension absolute error. One map-only pass (encode + decode +
    * compare fused in a single projection). */
  def parity(
      corpus: DataFrame,
      ranges: Ranges,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val deq = dequantize(encode(corpus, ranges, vecCol), ranges)
      .withColumn("__orig", col(vecCol).cast("array<double>"))
    deq.select(
      col(idCol),
      round(Similarity.dot(col("__orig"), col("dequant"))
        / (Similarity.norm(col("__orig")) * Similarity.norm(col("dequant"))), 6)
        .as("cosine_parity"),
      round(array_max(zip_with(col("__orig"), col("dequant"),
        (a, b) => abs(a - b))), 6).as("max_abs_err"))
  }

  /** Brute-force cosine top-k over the DEQUANTIZED corpus — the compressed
    * search path whose recall vs the float corpus the spec measures (same
    * bounded-oracle shape as [[Similarity.bruteForceTopK]]). */
  def int8TopK(
      queries: DataFrame,
      corpus: DataFrame,
      ranges: Ranges,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val deq = dequantize(encode(corpus, ranges, vecCol), ranges)
      .select(col(idCol).as("neighbor_id"), col("dequant").as("__cv"),
        Similarity.norm(col("dequant")).as("__cn"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", Similarity.norm(col("__qv")))
    Similarity.topKPerQuery(
      q.crossJoin(deq)
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine",
          Similarity.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))),
      "cosine", k)
  }
}
