package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (exact — the correctness oracle).
  * Scale path: IVF-style coarse quantization — assign every vector to its
  * nearest of C centroids, search only matching cells. The centroid
  * assignment is a broadcast join + row-local argmax; the candidate join is
  * keyed on cell id, so the shuffle is 1/C of brute force.
  *
  * Dot products run the native [[graft.plans.VectorDot]] Catalyst
  * expression — one fused codegen'd loop per pair. The builtin
  * `aggregate(zip_with(...))` composition it replaced materializes an
  * intermediate products array per PAIR, which dominates at |Q|·|C| scale;
  * the fold order is identical, so results are bit-equal (oracle hashes
  * unchanged).
  */
object Similarity {

  /** Σ aᵢ·bᵢ — native fused loop, no intermediate array. */
  def dot(a: Column, b: Column): Column = graft.plans.GraftExtensions.vectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** The shared tail of every top-k search: rank `scored` per query_id by
    * (`scoreCol` desc, neighbor_id asc), keep rank ≤ k. ONE definition of
    * the tie-break contract every search oracle pins — a drifted copy in
    * one variant would silently diverge the others. */
  private[llm] def topKPerQuery(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col(scoreCol).desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", scoreCol, "rank")
  }

  /** Brute-force cosine top-k: every query row against the full corpus,
    * ranked per query. Exact; O(|Q|·|C|) — the oracle for ANN variants.
    * Norms are precomputed per row, not per pair — the per-pair work is one
    * dot product and a division (cuts the candidate scoring by ~2/3). */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      queryIdCol: String = "vec_id",
      corpusIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    topKPerQuery(scored, "cosine", k)
  }

  /** Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein,
    * SIGIR 1998): greedily select `selectK` of the `candidateK` most
    * relevant candidates, each step maximizing
    * λ·rel − (1−λ)·max-sim-to-already-selected. The retrieval-side
    * complement of SemDeDup: a near-dup-aware result list.
    *
    * Scale shape: the candidate pool is bounded (|Q|·candidateK rows,
    * materialized once); the selection loop is DRIVER-UNROLLED over
    * selectK — a small constant, the candle-ladder convention — and each
    * step is a bounded join of the pool against the ≤|Q| selected rows
    * plus one per-query rank window. No UDF, no iterative shuffle growth.
    * Ties break on neighbor id at every argmax. The first pick's score is
    * its raw relevance; later scores are the MMR objective.
    *
    * Each step's PICK (one row per query) is collected and re-broadcast as
    * a local relation — the [[materializeCentroids]] convention (bounded
    * |Q|·selectK rows, exact row round-trip, so downstream arithmetic and
    * oracle hashes are unchanged). The previous shape localCheckpoint'ed
    * the growing result per step instead, which re-materialized the whole
    * selected set (cache build + its own job) every round and fed the next
    * round's anti-join through cluster-side reads: 23 jobs / 1.1 s of
    * plan-BUILD time for selectK = 3 (r16 PhaseProbe). Selected rows are
    * per-round driver state of the greedy loop, exactly like Lloyd's
    * centroids — the corpus-sized work (pool scoring, sim joins) stays in
    * cluster-side joins against the checkpointed pool. */
  def mmrDiversify(
      queries: DataFrame,
      corpus: DataFrame,
      candidateK: Int,
      selectK: Int,
      lambda: Double,
      queryIdCol: String = "vec_id",
      corpusIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(selectK >= 1 && candidateK >= selectK,
      s"need candidateK >= selectK >= 1: $candidateK, $selectK")
    val spark = queries.sparkSession
    val emb = corpus.select(col(corpusIdCol).as("neighbor_id"), col(vecCol).as("__v"))
    val pool = bruteForceTopK(queries, corpus, candidateK, queryIdCol, corpusIdCol, vecCol)
      .withColumnRenamed("cosine", "rel")
      .join(emb, Seq("neighbor_id"))
      .localCheckpoint() // feeds every step's anti-join AND sim join
    val step1 = pool.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"), col("__v"),
        lit(1).as("mmr_rank"), col("rel").as("mmr_score"))
    val outSchema = step1.schema
    // selected-so-far: bounded driver state (≤ |Q|·selectK rows)
    val selected = scala.collection.mutable.ArrayBuffer(step1.collect().toSeq: _*)
    def selectedDf(): DataFrame = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(selected.asJava, outSchema)
    }
    var step = 2
    while (step <= selectK) {
      val sel = selectedDf()
      val selV = sel.select(col("query_id"),
        col("neighbor_id").as("__sid"), col("__v").as("__sv"))
      val rem = pool.join(
        broadcast(sel.select(col("query_id"), col("neighbor_id"))),
        Seq("query_id", "neighbor_id"), "left_anti")
      val scored = rem.join(broadcast(selV), Seq("query_id"))
        .withColumn("__sim", cosine(col("__v"), col("__sv")))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(max(col("rel")).as("rel"), max(col("__v")).as("__v"),
          max(col("__sim")).as("__maxsim"))
        .withColumn("__score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("__maxsim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("__score").desc, col("neighbor_id"))
      val pick = scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("query_id"), col("neighbor_id"), col("__v"),
          lit(step).as("mmr_rank"), col("__score").as("mmr_score"))
      selected ++= pick.collect()
      step += 1
    }
    selectedDf().drop("__v")
  }

  /** Deterministic pseudo-centroids: the `numCells` corpus vectors with the
    * smallest 64-bit hash of their id — a deterministic pseudo-random sample.
    * (k-means would iterate; for the engine the *plumbing* — assign, bucket,
    * probe — is the contract, and deterministic seeds keep tests stable.)
    *
    * Scale shape: `orderBy(hash).limit(C)` executes as a per-partition top-C
    * merge (TakeOrderedAndProject) — never a global sort or single-partition
    * window. The C winners are collected to the driver for cell-id
    * assignment; that is the same bounded collection the downstream
    * `broadcast(centroids)` performs anyway. */
  def seedCentroids(corpus: DataFrame, numCells: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val spark = corpus.sparkSession
    val picked = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(numCells)
      .collect()
    val vecType = corpus.schema(vecCol).dataType
    val schema = StructType(Seq(
      StructField("cell_id", IntegerType, nullable = false),
      StructField("centroid", vecType, nullable = false)))
    val rows = picked.zipWithIndex.map { case (r, i) => Row(i, r.get(1)) }.toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The centroid table collected to (sorted cell ids, matrix) — the
    * bounded driver-side collection every assignment/broadcast needed
    * anyway (numCells × dim doubles). Ascending cell id is the kernel's
    * tie-break order. */
  private[llm] def collectedCentroids(centroids: DataFrame): (IndexedSeq[Int], IndexedSeq[IndexedSeq[Double]]) = {
    val rows = centroids.select(col("cell_id").cast("int"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toIndexedSeq)
      .sortBy(_._1)
    (rows.map(_._1).toIndexedSeq, rows.map(_._2).toIndexedSeq)
  }

  /** `n` nearest cells of a vector, row-locally ([[graft.plans.NearestCells]]). */
  private[llm] def nearestCells(centroids: DataFrame, vec: Column, n: Int): Column = {
    val (ids, mats) = collectedCentroids(centroids)
    graft.plans.GraftExtensions.nearestCells(vec, ids, mats, n)
  }

  /** [[nearestCells]] over an ALREADY-collected centroid table — for call
    * paths that embed the same centroids in several projections (IVF index
    * build + probe side): collect once, reuse the matrix, instead of one
    * collect job per call site. Same kernel, same matrix — bit-identical. */
  private[llm] def nearestCellsOf(
      cents: (IndexedSeq[Int], IndexedSeq[IndexedSeq[Double]]),
      vec: Column, n: Int): Column =
    graft.plans.GraftExtensions.nearestCells(vec, cents._1, cents._2, n)

  /** Assign each vector to its nearest centroid — a MAP-ONLY row-local
    * argmax: the bounded centroid matrix rides the
    * [[graft.plans.NearestCells]] kernel as a plan constant, so the plan is
    * one projection over the corpus scan with NO Exchange at all
    * (PlanShapeSpec pins this). The previous shape expanded the corpus ×k
    * via `crossJoin(broadcast)` and shuffled the expansion through a
    * `Window.partitionBy(id)` row_number — an avoidable corpus-size shuffle
    * paid once per IVF build and once per Lloyd iteration (VERDICT r4 #1).
    * Ordering (cosine desc, cell_id asc, NaN-greatest) is replicated
    * exactly, so outputs are unchanged. */
  def assignCells(vectors: DataFrame, centroids: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), col(vecCol),
      nearestCells(centroids, col(vecCol), 1).getItem(0).as("cell_id"))

  /** Lloyd (k-means) centroid refinement over the seeded cells: each
    * iteration assigns every vector to its nearest centroid, then replaces
    * each centroid with the element-wise MEAN of its cell.
    *
    * Scale shape: the mean is computed by posexploding vectors to
    * (cell_id, pos, value) and averaging per (cell_id, pos) — one shuffle
    * keyed on (cell, position), uniform by construction (dim × numCells
    * groups), then the per-cell arrays are rebuilt with
    * sort_array(collect_list) over at most `dim` elements per group. No
    * driver-side math beyond the (numCells × dim) collect that the
    * downstream broadcast performs anyway. Empty cells keep their previous
    * centroid (the standard Lloyd degenerate-cell rule).
    *
    * Each iteration's output is MATERIALIZED to a local (numCells × dim)
    * table before the next: iteration i's `assignCells` collects the
    * current centroids eagerly anyway (the kernel embeds them as a plan
    * constant), but the returned lazy join-plan would re-execute every
    * prior iteration's corpus aggregation each time IT is collected —
    * quadratic corpus passes in `iterations` (VERDICT r7 task 5's
    * redundancy class). Materializing pins the cost at exactly one corpus
    * aggregation per Lloyd step; values are the same collected doubles, so
    * results are bit-identical. */
  def refineCentroids(
      corpus: DataFrame,
      centroids: DataFrame,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    (1 to iterations).foldLeft(centroids) { (cur, _) =>
      val assigned = assignCells(corpus, cur, idCol, vecCol)
      val means = assigned
        .select(col("cell_id"), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
        .groupBy("cell_id", "pos")
        .agg(avg(col("v")).as("m"))
        .groupBy("cell_id")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
      // degenerate (empty) cells fall back to their previous centroid so the
      // cell count never shrinks
      val vecType = centroids.schema("centroid").dataType
      materializeCentroids(
        cur.select(col("cell_id"), col("centroid").as("__prev"))
          .join(means, Seq("cell_id"), "left")
          .select(col("cell_id"),
            coalesce(col("centroid").cast(vecType), col("__prev")).as("centroid")))
    }

  /** Collect a centroid table (bounded: numCells × dim) into a 1-partition
    * local DataFrame — the same shape [[seedCentroids]] emits. Exact row
    * round-trip, so downstream arithmetic is unchanged. */
  private[llm] def materializeCentroids(centroids: DataFrame): DataFrame = {
    val spark = centroids.sparkSession
    val schema = centroids.schema
    val rows = centroids.collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Seed + optional Lloyd refinement, materialized — the one-stop centroid
    * build gate code memoizes per (session, corpus) so the IVF/k-means
    * family trains once instead of once per query (VERDICT r7 task 5,
    * same class as the PQ codebook memo). */
  def trainCentroids(
      corpus: DataFrame,
      numCells: Int,
      iterations: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val seeded = seedCentroids(corpus, numCells, idCol, vecCol)
    if (iterations > 0) refineCentroids(corpus, seeded, iterations, idCol, vecCol) else seeded
  }

  /** IVF-bucketed ANN top-k with `nprobe` cells per query: join query cells
    * to corpus cells (shuffle keyed on cell_id), rank within candidates.
    * Approximate — recall measured against [[bruteForceTopK]] in tests.
    * `kmeansIterations` > 0 runs Lloyd refinement over the deterministic
    * seeds before bucketing (tighter cells → higher recall at the same
    * nprobe, at the cost of `iterations` extra passes at index-build time —
    * the classic IVF build/probe trade). */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      numCells: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      kmeansIterations: Int = 0,
      precomputedCentroids: Option[DataFrame] = None): DataFrame =
    topKPerQuery(
      ivfScored(queries, corpus, numCells, nprobe, idCol, vecCol, kmeansIterations,
        precomputedCentroids),
      "cosine", k)

  /** The IVF probe-and-score subtree shared by [[ivfTopK]] and
    * [[hardNegativesIvf]]: (query_id, neighbor_id, cosine) for every
    * candidate in the probed cells. `precomputedCentroids` (when supplied,
    * e.g. a memoized [[trainCentroids]]) skips the per-call train. */
  private def ivfScored(
      queries: DataFrame,
      corpus: DataFrame,
      numCells: Int,
      nprobe: Int,
      idCol: String,
      vecCol: String,
      kmeansIterations: Int,
      precomputedCentroids: Option[DataFrame] = None): DataFrame = {
    val centroids = precomputedCentroids.getOrElse(
      trainCentroids(corpus, numCells, kmeansIterations, idCol, vecCol))
    val corpusCells = assignCells(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"), col("cell_id"))

    // nprobe nearest cells per query vector — the same row-local kernel
    // (top-nprobe array + explode), so the query side is map-only too
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"),
        explode(nearestCells(centroids, col(vecCol), nprobe)).as("cell_id"))

    probes.join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
  }

  /** Hard-negative mining for contrastive/retrieval training (DPR,
    * Karpukhin et al. EMNLP 2020; ANCE, Xiong et al. ICLR 2021 — public
    * methods): for each query, the top `k` corpus items whose cosine lies
    * in [simLo, simHi) — similar enough to be informative negatives, below
    * the near-duplicate band that would make them false negatives. Exact
    * (brute-force) variant — the oracle; ranked by cosine DESC within the
    * band so the hardest negatives come first. */
  /** The band-membership comparison, optionally quantized: with
    * `bandScale >= 0` the cosine is rounded to that many decimals BEFORE
    * comparing against [simLo, simHi), so an oracle computing the same
    * cosine with a different summation order can't disagree about a pair
    * sitting within one ulp of a band edge (ADVICE r8). Ranking still uses
    * the raw cosine. */
  private def bandFilter(c: Column, simLo: Double, simHi: Double, bandScale: Int): Column = {
    val cq = if (bandScale >= 0) round(c, bandScale) else c
    cq >= simLo && cq < simHi
  }

  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      simLo: Double = 0.5,
      simHi: Double = 0.9,
      queryIdCol: String = "vec_id",
      corpusIdCol: String = "vec_id",
      vecCol: String = "embedding",
      bandScale: Int = -1): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
      .filter(bandFilter(col("cosine"), simLo, simHi, bandScale))
    topKPerQuery(scored, "cosine", k)
  }

  /** [[hardNegatives]] at corpus scale: the ANCE shape — candidates come
    * from the IVF index (probed cells only, shuffle keyed on cell_id),
    * then the similarity band filters them. Widen `nprobe` to reach
    * deeper into the mid-similarity band (the negatives live further from
    * the query's own cell than its nearest neighbors do). */
  def hardNegativesIvf(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      simLo: Double = 0.5,
      simHi: Double = 0.9,
      numCells: Int = 16,
      nprobe: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      kmeansIterations: Int = 0,
      precomputedCentroids: Option[DataFrame] = None,
      bandScale: Int = -1): DataFrame =
    topKPerQuery(
      ivfScored(queries, corpus, numCells, nprobe, idCol, vecCol, kmeansIterations,
        precomputedCentroids)
        .filter(bandFilter(col("cosine"), simLo, simHi, bandScale)),
      "cosine", k)

  /** K-means topic clustering over the embedding column: deterministic
    * seeds → `iterations` Lloyd steps ([[refineCentroids]]) → final
    * assignment. Returns (idCol, cluster_id) — the corpus-partitioning pass
    * a curation pipeline uses for topic balancing and per-cluster sampling.
    *
    * Scale shape is the IVF build path's: every step is one broadcast
    * assign (map-only argmax over k centroids) plus one shuffle keyed on
    * (cell, position) for the means — no driver-side math beyond the
    * (k × dim) centroid collect the broadcast needs anyway. */
  def kmeansCluster(
      corpus: DataFrame,
      k: Int,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      precomputedCentroids: Option[DataFrame] = None): DataFrame = {
    val centroids = precomputedCentroids.getOrElse(
      trainCentroids(corpus, k, iterations, idCol, vecCol))
    assignCells(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col("cell_id").as("cluster_id"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540 —
    * public method): k-means-cluster the embedding space, form candidate
    * pairs only WITHIN clusters, verify by exact cosine, drop
    * near-duplicates at ≥ `threshold` keeping the lowest id. Catches
    * SEMANTIC duplicates (rephrasings, template variants) that text-level
    * MinHash misses; the cluster partition is what makes it tractable —
    * pair expansion is bounded by cluster size, never corpus², and `k`
    * grows with the corpus so clusters stay bounded (the paper's scale
    * story). Oversized clusters are capped + skipped exactly like every
    * dedup bucket (audit via [[clusterProfile]] `n_vectors > maxCluster`
    * — capped coverage is surfaced, never silent; mass-identical vectors
    * are exact-dedup's job).
    *
    * Shape: the clustering is the [[kmeansCluster]] build (map-only
    * assigns + one (cell, pos) shuffle per Lloyd step), candidates are one
    * shuffle keyed on cell_id, and the verify subtree joins vectors back
    * by id — no cross join anywhere (PlanShapeSpec). */
  def semanticDedup(
      corpus: DataFrame,
      k: Int,
      threshold: Double = 0.95,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxCluster: Int = Dedup.DefaultMaxBucket,
      precomputedCentroids: Option[DataFrame] = None): DataFrame = {
    val centroids = precomputedCentroids.getOrElse(
      trainCentroids(corpus, k, iterations, idCol, vecCol))
    val assigned = assignCells(corpus, centroids, idCol, vecCol)
    val cands = Dedup.expandBuckets(
      assigned.groupBy(col("cell_id")).agg(sort_array(collect_set(col(idCol))).as("ids")),
      maxCluster)
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
    val side = corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__n"))
    val dups = cands
      .join(side.select(col(idCol).as("id_a"), col(vecCol).as("__va"), col("__n").as("__na")), Seq("id_a"))
      .join(side.select(col(idCol).as("id_b"), col(vecCol).as("__vb"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("cosine", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(dups, Seq(idCol), "left_anti")
  }

  /** Cluster sizes + mean cosine-to-assigned-centroid — the audit view of
    * [[kmeansCluster]] (spot collapsed or incoherent clusters). */
  def clusterProfile(
      corpus: DataFrame,
      k: Int,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = trainCentroids(corpus, k, iterations, idCol, vecCol)
    assignCells(corpus, centroids, idCol, vecCol)
      .join(broadcast(centroids), Seq("cell_id"))
      .withColumn("__sim", cosine(col(vecCol), col("centroid")))
      .groupBy(col("cell_id").as("cluster_id"))
      .agg(count(lit(1)).as("n_vectors"), round(avg(col("__sim")), 6).as("mean_cosine"))
  }

  /** Random-hyperplane LSH bucketing for cosine (the alternative scale
    * path): `bits` signs of dot(v, rᵢ) with deterministic pseudo-random
    * hyperplanes form the bucket key. `seed` selects an independent
    * hyperplane family (for multi-table LSH). */
  def lshBuckets(vectors: DataFrame, dim: Int, bits: Int = 12, vecCol: String = "embedding", seed: Long = 0L): DataFrame = {
    val key = lshBucketKey(dim, bits, vecCol, seed)
    vectors.withColumn("bucket", key)
  }

  /** The raw xorshift states behind the hyperplane family — exposed so the
    * DuckDB oracle can inline the exact same constants (a plane value is
    * `state.toDouble / Long.MaxValue`; inlining the LONG keeps the oracle's
    * doubles bit-identical without decimal round-trips). */
  private[graft] def hyperplaneSeeds(dim: Int, bits: Int, seed: Long): IndexedSeq[Array[Long]] =
    (0 until bits).map { b =>
      // xorshift-seeded deterministic pseudo-random hyperplane
      var s = 0x9e3779b97f4a7c15L + (seed * bits + b) * 0xbf58476d1ce4e5b9L
      Array.fill(dim) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        s
      }
    }

  private def lshBucketKey(dim: Int, bits: Int, vecCol: String, seed: Long): Column = {
    val planes = hyperplaneSeeds(dim, bits, seed).map(_.map(_.toDouble / Long.MaxValue))
    (0 until bits).map { b =>
      val d = dot(col(vecCol), typedLit(planes(b).toSeq))
      when(d >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Persistable multi-table LSH bucket index of a vector corpus:
    * (id, table, bucket) — the embedding analog of
    * [[graft.llm.Dedup.bandSignatures]]. Computed map-only; write it
    * bucketed by (table, bucket) and every increment's candidate join
    * co-locates. */
  def lshBucketIndex(
      vectors: DataFrame,
      dim: Int,
      bits: Int = 8,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      outId: String = "id"): DataFrame = {
    // all table keys in ONE projection + posexplode — the union-of-tables
    // form re-scanned the vector source once PER table (plan peek:
    // llm_incremental_ann at 32 parquet scans), which on the live
    // ingest path means bucketing every increment `tables` times
    val keys = array((0 until tables).map(t => lshBucketKey(dim, bits, vecCol, t.toLong)): _*)
    vectors.select(col(idCol).as(outId), posexplode(keys).as(Seq("table", "bucket")))
  }

  /** Near-dup candidates of a NEW vector batch against an indexed corpus —
    * batch-sized work against a corpus-sized index (the rolling-ingest ANN
    * dedup): the increment buckets only ITS vectors (map-only), joins the
    * index on (table, bucket), and candidates go to exact-cosine verify. */
  def incrementalVectorCandidates(
      newVectors: DataFrame,
      index: DataFrame,
      dim: Int,
      bits: Int = 8,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    lshBucketIndex(newVectors, dim, bits, tables, idCol, vecCol, outId = "new_id")
      .join(index.select(col("id").as("corpus_id"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()

  /** Incremental embedding near-dedup: the new batch minus vectors whose
    * exact cosine against an indexed-corpus candidate reaches `threshold`.
    * Recall follows the (bits, tables) collision probability like
    * [[lshNearDup]]; precision is exact. */
  def incrementalNearDupVectors(
      newVectors: DataFrame,
      index: DataFrame,
      corpusVectors: DataFrame,
      dim: Int,
      threshold: Double = 0.9,
      bits: Int = 8,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cands = incrementalVectorCandidates(newVectors, index, dim, bits, tables, idCol, vecCol)
    val newSide = newVectors.select(col(idCol).as("new_id"), col(vecCol).as("__vn"),
      norm(col(vecCol)).as("__nn"))
    val corpusSide = corpusVectors.select(col(idCol).as("corpus_id"), col(vecCol).as("__vc"),
      norm(col(vecCol)).as("__nc"))
    val dups = cands
      .join(newSide, Seq("new_id"))
      .join(corpusSide, Seq("corpus_id"))
      .withColumn("cosine", dot(col("__vn"), col("__vc")) / (col("__nn") * col("__nc")))
      .filter(col("cosine") >= threshold)
      .select(col("new_id").as(idCol)).distinct()
    newVectors.join(dups, Seq(idCol), "left_anti")
  }

  /** Audit view of (table, bucket) groups the `maxBucket` cap skips in
    * [[lshNearDup]] — mass-duplicated vectors are exact-dedup's job, and
    * capped coverage must be surfaced, never silent (the
    * [[graft.llm.Dedup.oversizedBuckets]] convention). */
  def oversizedVectorBuckets(
      vectors: DataFrame,
      dim: Int,
      bits: Int = 8,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    lshBucketIndex(vectors, dim, bits, tables, idCol, vecCol)
      .groupBy("table", "bucket")
      .agg(count_distinct(col("id")).as("members"))
      .filter(col("members") > maxBucket)

  /** Embedding near-dup over an UNBOUNDED corpus — the scale path past
    * [[bruteForceTopK]]'s O(Q·C) (which stays the exactness oracle):
    * `tables` independent hyperplane families bucket every vector map-only;
    * candidate pairs form only inside (table, bucket) groups (one shuffle
    * keyed on bucket hashes, never an all-pairs join); pairs are then
    * verified by exact cosine. A pair at cosine θ collides in one table
    * with probability (1 - acos(θ)/π)^bits, in ≥1 of the tables with
    * 1-(1-p)^tables — recall is tuned by (bits, tables) and measured
    * against brute force in LlmSpec. Oversized buckets are capped exactly
    * as [[Dedup]] does (mass-duplicated vectors are exact-dedup's job). */
  def lshNearDup(
      vectors: DataFrame,
      dim: Int,
      threshold: Double = 0.9,
      bits: Int = 8,
      tables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val banded = lshBucketIndex(vectors, dim, bits, tables, idCol, vecCol)
    val cands = banded
      .groupBy("table", "bucket")
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(
        flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))),
            y => struct(x.as("id_a"), y.as("id_b"))))))
        .as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
    // exact-cosine verification of the candidate set only
    val side = vectors.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__n"))
    cands
      .join(side.select(col(idCol).as("id_a"), col(vecCol).as("__va"), col("__n").as("__na")), Seq("id_a"))
      .join(side.select(col(idCol).as("id_b"), col(vecCol).as("__vb"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("cosine", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
