package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

/** Product quantization (PQ) over an embedding column — the vector
  * COMPRESSION scale path (Jégou, Douze & Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public method; the faiss
  * `IndexPQ` construction).
  *
  * The space is split into `m` subspaces of `dim/m` components; each
  * subspace gets its own `ks`-centroid k-means codebook; a vector is stored
  * as `m` small codes. At `ks ≤ 256` a 768-dim float vector (3 KB) becomes
  * `m` bytes (16-48×-384× compression) — the difference between "the scan
  * side is 100 TB of floats" and "the scan side is a few hundred GB of
  * codes that fit the page cache". Search is ADC (asymmetric distance
  * computation): the QUERY stays exact, corpus vectors are approximated by
  * their reconstruction from the codebook — a row-local lookup, never a
  * join back to the original vectors.
  *
  * Determinism contract (what makes the DuckDB oracle possible):
  *  - seeds are the [[Similarity.seedCentroids]] pick — the `ks` corpus
  *    rows with the smallest `xxhash64(id)`, sliced into every subspace;
  *  - Lloyd assignment is squared-Euclidean argmin (ties → lower code),
  *    via the [[graft.plans.NearestCells]] kernel's `l2` mode — PQ
  *    codewords minimize RECONSTRUCTION error, so magnitude matters and
  *    cosine would be the wrong metric;
  *  - Lloyd means round through float per iteration (the
  *    [[Similarity.refineCentroids]] `::REAL[]` convention) so engine
  *    summation-order noise cannot leak into the codebook.
  *
  * Scale shape: `train` is `iterations` passes over the corpus — each ONE
  * map-only code assignment (plan-constant codebook, no Exchange) plus ONE
  * shuffle keyed on (subspace, code, position) — `m·ks·subLen` groups,
  * uniform by construction — and a bounded `m·ks·subLen`-double collect
  * (the broadcast the next pass needs anyway). `encode` is a single
  * map-only projection. `adcTopK` deliberately scans Q×N — that is the PQ
  * trade: the scan side carries `m`-code rows and the per-pair work is one
  * fused dot over the reconstruction; restrict candidates first (IVF cells,
  * LSH buckets) when Q×N itself is the bottleneck.
  */
object Pq {

  /** A trained codebook: `cents(s)(j)` = centroid `j` of subspace `s`
    * (float-valued doubles after training — see the rounding contract). */
  final case class Codebook(
      dim: Int,
      m: Int,
      ks: Int,
      cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m equal subspaces")
    require(cents.length == m && cents.forall(_.length == ks),
      s"codebook shape must be $m x $ks")
    val subLen: Int = dim / m
    require(cents.forall(_.forall(_.length == subLen)),
      s"every centroid must have $subLen components")
  }

  /** Train a PQ codebook: deterministic seeds + `iterations` Lloyd steps,
    * all `m` subspaces per pass (see the class doc for the plan shape). */
  def train(
      corpus: DataFrame,
      dim: Int,
      m: Int,
      ks: Int,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Codebook = {
    // shape invariants live in the Codebook constructor
    val subLen = dim / m
    // the seedCentroids pick: smallest xxhash64(id), sliced per subspace.
    // TakeOrderedAndProject — a per-partition top-ks merge, never a global
    // sort; the collect is the bounded codebook itself.
    val picked = corpus
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(ks)
      .collect()
      .map(_.getSeq[Double](1).toIndexedSeq)
    require(picked.length == ks, s"corpus has fewer than ks=$ks rows")
    require(picked.forall(_.length == dim), s"every $vecCol must have dim=$dim components")
    val seeds = (0 until m).map(s => picked.toIndexedSeq.map(_.slice(s * subLen, (s + 1) * subLen)))
    (1 to iterations).foldLeft(Codebook(dim, m, ks, seeds))((cur, _) => lloydStep(corpus, cur, vecCol))
  }

  /** One Lloyd step over every subspace at once: map-only assign, one
    * (subspace, code, position)-keyed shuffle for the means, bounded
    * collect. Empty cells keep their previous centroid (the standard
    * degenerate-cell rule); means round through float. */
  private def lloydStep(corpus: DataFrame, cb: Codebook, vecCol: String): Codebook = {
    val subLen = cb.subLen
    val sub = (col("__pos") / subLen).cast("int")
    val meanRows = corpus
      .select(encodeCol(cb, col(vecCol)).as("__codes"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__pos", "__x")))
      .select(sub.as("__s"),
        element_at(col("__codes"), sub + 1).as("__c"),
        (col("__pos") % subLen).as("__p"),
        col("__x"))
      .groupBy("__s", "__c", "__p")
      .agg(avg(col("__x")).as("__m"))
      .collect()
    val next = Array.tabulate(cb.m, cb.ks)((s, j) => cb.cents(s)(j).toArray)
    meanRows.foreach { r =>
      // float-round each mean — absorbs engine summation-order noise, and
      // is exactly the oracle's (::REAL[])::DOUBLE[] per-iteration cast
      next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat.toDouble
    }
    Codebook(cb.dim, cb.m, cb.ks, next.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)
  }

  /** The `m` codes of a vector — one [[graft.plans.NearestCells]] L2 kernel
    * call per subspace over the plan-constant codebook: map-only, no
    * Exchange, whole-stage-codegen friendly. */
  def encodeCol(cb: Codebook, vec: Column): Column = {
    val ids: IndexedSeq[Int] = 0 until cb.ks
    array((0 until cb.m).map { s =>
      graft.plans.GraftExtensions
        .nearestCellsL2(slice(vec, s * cb.subLen + 1, cb.subLen), ids, cb.cents(s), 1)
        .getItem(0)
    }: _*)
  }

  /** (idCol, codes array<int>) — the compressed corpus representation. */
  def encode(
      vectors: DataFrame,
      cb: Codebook,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), encodeCol(cb, col(vecCol)).as("codes"))

  /** Row-local reconstruction x̂ from codes: the per-subspace codeword
    * lookup (plan-constant codebook), concatenated in subspace order. */
  def reconstructCol(cb: Codebook, codes: Column): Column =
    concat((0 until cb.m).map { s =>
      element_at(typedLit(cb.cents(s).map(_.toSeq).toSeq), codes.getItem(s) + 1)
    }: _*)

  /** ADC top-k: rank corpus CODES against exact queries by
    * cosine(query, reconstruction). Approximate — recall vs
    * [[Similarity.bruteForceTopK]] measured in LlmSpec; deterministic, so
    * oracle-checkable. */
  def adcTopK(
      queries: DataFrame,
      codes: DataFrame,
      cb: Codebook,
      k: Int,
      idCol: String = "vec_id",
      codesIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", Similarity.norm(col("__qv")))
    val c = codes.select(col(codesIdCol).as("neighbor_id"), reconstructCol(cb, col("codes")).as("__xh"))
      .withColumn("__xn", Similarity.norm(col("__xh")))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_cosine", Similarity.dot(col("__qv"), col("__xh")) / (col("__qn") * col("__xn")))
    Similarity.topKPerQuery(scored, "adc_cosine", k)
  }

  /** Two-stage PQ search: ADC shortlist of `rerank` candidates from the
    * compressed scan, then EXACT cosine over only those (the standard
    * refinement step — recall approaches brute force as `rerank` grows,
    * while the exact-vector read stays Q·rerank, not Q·N). */
  def adcRerankTopK(
      queries: DataFrame,
      codes: DataFrame,
      corpus: DataFrame,
      cb: Codebook,
      k: Int,
      rerank: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val cand = adcTopK(queries, codes, cb, rerank, idCol, idCol, vecCol)
      .select("query_id", "neighbor_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      Similarity.norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      Similarity.norm(col(vecCol)).as("__cn"))
    val scored = cand.join(q, Seq("query_id")).join(c, Seq("neighbor_id"))
      .withColumn("cosine", Similarity.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    Similarity.topKPerQuery(scored, "cosine", k)
  }

  /** IVF-PQ: coarse cells restrict the ADC scan — the billion-scale layout
    * (faiss `IndexIVFPQ`). The corpus is indexed ONCE with a single
    * map-only projection computing BOTH its coarse cell (cosine
    * [[Similarity]] convention, deterministic seeds) and its PQ codes;
    * each query probes its `nprobe` nearest cells and ADC-ranks only the
    * codes in them. The candidate join is keyed on cell_id — the shuffle
    * carries `m`-code rows, 1/numCells of the corpus per probe — so the
    * Q×N scan of [[adcTopK]] becomes Q×(nprobe·N/numCells) over compressed
    * rows. Recall compounds the two approximations (probe misses + ADC
    * distortion); both are measured against brute force in LlmSpec. */
  def ivfAdcTopK(
      queries: DataFrame,
      corpus: DataFrame,
      cb: Codebook,
      k: Int,
      numCells: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = Similarity.seedCentroids(corpus, numCells, idCol, vecCol)
    // collect the coarse centroids ONCE: the index build and the probe side
    // embed the same matrix as a plan constant — the per-call-site collect
    // was one extra driver job each per execution (r16 PhaseProbe)
    val cents = Similarity.collectedCentroids(centroids)
    val index = corpus.select(
      col(idCol).as("id"),
      Similarity.nearestCellsOf(cents, col(vecCol), 1).getItem(0).as("cell_id"),
      encodeCol(cb, col(vecCol)).as("codes"))
    searchIndexWith(queries, index, cents, cb, k, nprobe, idCol, vecCol)
  }

  /** The persistable IVF-PQ corpus index — (id, cell_id, codes), ONE
    * map-only projection per corpus row. Write it with
    * `TableStore.writeBucketedIndex(_, table, joinKeys = Seq("cell_id"))`
    * and every later [[searchIndex]] probe join co-locates on the bucket
    * (SinksSpec pins the exchange-count differential). The codebook and
    * coarse centroids persist alongside via [[codebookTable]] /
    * `Similarity` centroid frames — together they are the whole index
    * artifact. */
  def ivfPqIndex(
      corpus: DataFrame,
      centroids: DataFrame,
      cb: Codebook,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.select(
      col(idCol).as("id"),
      Similarity.nearestCells(centroids, col(vecCol), 1).getItem(0).as("cell_id"),
      encodeCol(cb, col(vecCol)).as("codes"))

  /** ADC top-k of a query batch against an [[ivfPqIndex]] (in-memory or
    * loaded from its bucketed table): batch-sized probe work against a
    * corpus-sized compressed index — the rolling-ingest ANN search. */
  def searchIndex(
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      cb: Codebook,
      k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    searchIndexWith(queries, index, Similarity.collectedCentroids(centroids),
      cb, k, nprobe, idCol, vecCol)

  /** [[searchIndex]] over already-collected coarse centroids (see
    * [[ivfAdcTopK]] — one collect shared across the projections). */
  private def searchIndexWith(
      queries: DataFrame,
      index: DataFrame,
      cents: (IndexedSeq[Int], IndexedSeq[IndexedSeq[Double]]),
      cb: Codebook,
      k: Int,
      nprobe: Int,
      idCol: String,
      vecCol: String): DataFrame = {
    val indexed = index.select(col("id").as("neighbor_id"), col("cell_id"),
      reconstructCol(cb, col("codes")).as("__xh"))
      .withColumn("__xn", Similarity.norm(col("__xh")))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("__qv"),
      explode(Similarity.nearestCellsOf(cents, col(vecCol), nprobe)).as("cell_id"))
      .withColumn("__qn", Similarity.norm(col("__qv")))
    val scored = probes.join(indexed, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_cosine", Similarity.dot(col("__qv"), col("__xh")) / (col("__qn") * col("__xn")))
    Similarity.topKPerQuery(scored, "adc_cosine", k)
  }

  /** Codebook ⇄ DataFrame (subspace, cell_id, centroid) — the persistable
    * form ([[graft.sinks.TableStore]] convention, like every other index
    * artifact). */
  def codebookTable(spark: SparkSession, cb: Codebook): DataFrame = {
    val schema = StructType(Seq(
      StructField("subspace", IntegerType, nullable = false),
      StructField("cell_id", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = for (s <- 0 until cb.m; j <- 0 until cb.ks)
      yield Row(s, j, cb.cents(s)(j))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  def codebookFromTable(table: DataFrame, dim: Int): Codebook = {
    val rows = table
      .select(col("subspace").cast("int"), col("cell_id").cast("int"),
        col("centroid").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq))
    val bySub = rows.groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toIndexedSeq)
    Codebook(dim, bySub.length, bySub.head.length, bySub)
  }
}
