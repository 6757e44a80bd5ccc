package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The Spark-side contract — schema, partitioning, batch shape — is real and
  * tested; the actual codec step is a clearly-marked deterministic stand-in
  * (media libraries are not available in this environment, and on a real
  * cluster it would be swapped for a vectorized decode over the same
  * row-batch shape, e.g. Pandas-UDF-style `mapInPandas`/`mapInArrow`).
  */
object Multimodal {

  /** Typed media-asset schema: payload + metadata travel together. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Wrap an id + binary frame into the typed media schema, deriving fake
    * metadata deterministically from the payload. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      when(lit(mediaType) === "image", pmod(crc32(col(payloadCol)), lit(1920)).cast("int")).as("width"),
      when(lit(mediaType) === "image", pmod(crc32(col(payloadCol)), lit(1080)).cast("int")).as("height"),
      when(lit(mediaType) === "audio", lit(16000)).cast("int").as("sample_rate"),
      when(lit(mediaType) =!= "image", (length(col(payloadCol)) * 10).cast("long")).as("duration_ms"))

  /** STUB decode: a real deployment decodes the codec here (libjpeg/ffmpeg
    * via mapInArrow batches). The stand-in emits a deterministic 8-dim
    * feature derived from payload bytes so the distributed plumbing —
    * per-partition batching, schema, ordering — is fully exercised. */
  def decodeToFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    val out: Dataset[Row] = media.select("asset_id", "media_type", "payload").mapPartitions { it =>
      // Batch the iterator exactly as an Arrow-batch decode would.
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val feature = fakeDecode(payload)
          Row(id, mt, payload.length.toLong, feature)
        }
      }
    }(enc)
    out.toDF()
  }

  /** Deterministic stand-in for the codec: 8 byte-histogram buckets,
    * L1-normalized. Replace with the real decoder on a real cluster. */
  private[llm] def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    if (payload != null && payload.nonEmpty) {
      payload.foreach(b => hist((b & 0xff) >> 5) += 1f)
      val total = payload.length.toFloat
      var i = 0
      while (i < 8) { hist(i) /= total; i += 1 }
    }
    hist
  }

  /** STUB resize (image): target metadata is exact; the payload is
    * decimated to `len · (tw·th) / (w·h)` bytes (integer math, clamped to
    * [1, len]) by nearest-index sampling — a deterministic byte-level
    * stand-in for the codec's nearest-neighbor resize, batched per
    * partition exactly like [[decodeToFeatures]]. Non-image rows pass
    * through untouched. */
  def resize(spark: SparkSession, media: DataFrame, targetWidth: Int, targetHeight: Int,
      batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val out: Dataset[Row] = media.select(mediaSchema.fieldNames.map(col).toIndexedSeq: _*)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val mt = r.getString(1)
            if (mt != "image" || r.isNullAt(3) || r.isNullAt(4)) r
            else {
              val payload = r.getAs[Array[Byte]](2)
              val (w, h) = (r.getInt(3), r.getInt(4))
              val resized = fakeResize(payload, w, h, targetWidth, targetHeight)
              Row(r.getLong(0), mt, resized, targetWidth, targetHeight,
                if (r.isNullAt(5)) null else r.getInt(5),
                if (r.isNullAt(6)) null else r.getLong(6))
            }
          }
        }
      }(enc)
    out.toDF()
  }

  /** Deterministic stand-in for codec resize: nearest-index byte sampling
    * to the area-scaled length (integer math — reproducible anywhere). */
  private[llm] def fakeResize(payload: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty || w <= 0 || h <= 0) return payload
    val len = payload.length.toLong
    val newLen = math.max(1L, math.min(len, len * tw * th / (w.toLong * h))).toInt
    Array.tabulate(newLen)(i => payload(((i.toLong * payload.length) / newLen).toInt))
  }

  /** Image–text alignment scoring — the CLIP-score curation filter a
    * multimodal training pipeline runs over (image, caption) pairs (Radford
    * et al. 2021; LAION's CLIP-filtering — public methods): embed both
    * modalities, keep pairs whose cosine clears a threshold. Both encoder
    * kernels are deterministic STAND-INS like [[fakeDecode]] (the image
    * side IS [[fakeDecode]]'s byte histogram; the text side is the same
    * 8-bucket histogram over the caption's UTF-8 bytes) — a real
    * deployment swaps in CLIP image/text towers over the SAME per-partition
    * batch shape. The machinery around them is real: batched mapPartitions
    * exactly like a vectorized encoder would run, integer histogram counts
    * so the cosine is fixed-order IEEE double math (replayable bit-for-bit
    * in the oracle; normalization cancels in cosine so raw counts suffice),
    * and a map-only threshold verdict — no shuffle anywhere, the pass
    * scales linearly with the corpus.
    *
    * Expects (asset_id, payload, caption); emits (asset_id, align_score
    * [unrounded], aligned). A zero vector on either side scores 0.0. */
  def alignmentScores(
      media: DataFrame,
      threshold: Double,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("align_score", DoubleType, nullable = false),
      StructField("aligned", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val out: Dataset[Row] = media.select("asset_id", "payload", "caption")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val img = byteHistogram(r.getAs[Array[Byte]](1))
            val txt = byteHistogram(
              if (r.isNullAt(2)) null
              else r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val score = cosineOfCounts(img, txt)
            Row(id, score, score >= threshold)
          }
        }
      }(enc)
    out.toDF()
  }

  /** 8-bucket byte histogram as INTEGER counts (bucket = byte >> 5) — the
    * shared stand-in feature for both alignment towers. Counts, not
    * normalized floats: cosine is normalization-invariant and integer
    * inputs keep the double math exactly replayable. */
  private[llm] def byteHistogram(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](8)
    if (payload != null) payload.foreach(b => hist((b & 0xff) >> 5) += 1L)
    hist
  }

  private[llm] def cosineOfCounts(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < 8) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Perceptual-hash bands of a media payload — the image-dedup primitive
    * (pHash family: downscale → DCT → sign bits; Zauner 2010, public
    * method). The DCT-over-decoded-pixels step is a deterministic STAND-IN
    * like [[fakeDecode]]: parity bits of byte-range sums over the payload,
    * which is locality-sensitive for same-length payloads (a small edit
    * flips at most a few range parities) — the banding/verify machinery on
    * top is the real deployment shape and swaps kernels cleanly.
    *
    * `ranges` parity bits pack into `ranges / bandBits` band values; two
    * payloads within Hamming distance `nBands − 1` are GUARANTEED to share
    * at least one identical band (pigeonhole), which is what makes the
    * band-bucket candidate join recall-complete at the dedup threshold. */
  def perceptualHashBands(payload: Column, ranges: Int = 64, bandBits: Int = 8): Column = {
    require(ranges % bandBits == 0, s"ranges $ranges must divide into $bandBits-bit bands")
    // sums RAW bytes, not UTF-8-decoded chars: for non-text payloads an
    // invalid sequence would collapse to U+FFFD (distinct payloads hashing
    // identically) and a 1-byte edit would shift every later char index,
    // breaking the few-ranges-flip locality property. Byte sums preserve it
    // for arbitrary binary; on the ASCII fixtures byte == char code, so the
    // DuckDB oracle's unicode() replay is unchanged.
    val u = udf { (bytes: Array[Byte]) =>
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val n = b.length
      val bits = Array.tabulate(ranges) { r =>
        val lo = r * n / ranges
        val hi = (r + 1) * n / ranges
        var sum = 0L
        var i = lo
        while (i < hi) { sum += (b(i) & 0xff).toLong; i += 1 }
        (sum % 2).toInt
      }
      (0 until ranges / bandBits).map { b =>
        var v = 0L
        var j = 0
        while (j < bandBits) { v |= bits(b * bandBits + j).toLong << j; j += 1 }
        v
      }
    }
    u(payload)
  }

  /** Near-duplicate media dedup: band-bucket candidates over
    * [[perceptualHashBands]], verify by exact Hamming distance, keep the
    * lowest asset_id of each duplicate pair. The [[Dedup.expandBuckets]]
    * machinery bounds pair expansion (oversized buckets skipped + audited,
    * never corpus²); with 8 bands the candidate join is recall-complete
    * for maxHamming ≤ 7. One bucket-keyed shuffle + a bounded verify join
    * — the [[graft.llm.Similarity.lshNearDup]] scale shape on the media
    * column. */
  def mediaNearDedup(
      media: DataFrame,
      maxHamming: Int = 2,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val hashed = media
      .select(col("asset_id"), perceptualHashBands(col("payload")).as("ph"))
      .localCheckpoint() // feeds the bucket agg + both verify sides
    val banded = hashed.select(col("asset_id"), posexplode(col("ph")).as(Seq("band", "value")))
    val cands = Dedup.expandBuckets(
        banded.groupBy(col("band"), col("value"))
          .agg(sort_array(collect_set(col("asset_id"))).as("ids")), maxBucket)
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b")).distinct()
    val dups = cands
      .join(hashed.select(col("asset_id").as("id_a"), col("ph").as("__pa")), Seq("id_a"))
      .join(hashed.select(col("asset_id").as("id_b"), col("ph").as("__pb")), Seq("id_b"))
      .withColumn("__hd",
        expr("aggregate(zip_with(__pa, __pb, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"))
      .filter(col("__hd") <= maxHamming)
      .select(col("id_b").as("asset_id")).distinct()
    media.join(dups, Seq("asset_id"), "left_anti")
  }

  /** Per-frame energies of an audio payload: the payload is sliced into
    * `frameBytes`-byte frames (ceil coverage — the tail partial frame
    * counts) and each frame's "energy" is its raw byte sum — a
    * deterministic STAND-IN for RMS over decoded PCM samples, the
    * [[fakeDecode]] convention (a real deployment decodes the codec and
    * computes RMS over the SAME per-row frame slicing). ONE kernel call
    * per row emits every frame energy, then a row-local posexplode — no
    * shuffle, the pass scales linearly with the corpus. On the ASCII text
    * fixtures byte == char code, so a DuckDB unicode() replay matches
    * exactly. */
  def frameEnergies(media: DataFrame, frameBytes: Int = 64): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive: $frameBytes")
    val u = udf { (bytes: Array[Byte]) =>
      val b = if (bytes == null) Array.emptyByteArray else bytes
      val n = (b.length + frameBytes - 1) / frameBytes
      (0 until n).map { f =>
        var sum = 0L
        var i = f * frameBytes
        val hi = math.min(b.length, i + frameBytes)
        while (i < hi) { sum += (b(i) & 0xff).toLong; i += 1 }
        sum
      }
    }
    media
      .select(col("asset_id"), posexplode(u(col("payload"))).as(Seq("frame_idx", "energy")))
      .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"), col("energy"))
  }

  /** Voice-activity segmentation over [[frameEnergies]] — the VAD →
    * utterance-split pass an audio pipeline runs before transcription:
    * a frame is ACTIVE when its energy is at or above the asset's mean
    * frame energy (compared exactly as `energy * n_frames >= total_energy`
    * — pure BIGINT math, no float threshold to diverge across engines),
    * and consecutive active frames merge into one segment while the gap
    * between them stays ≤ `maxSilenceFrames` (the hangover that bridges
    * brief dips). Per-asset windows only — narrow, bounded by one asset's
    * frame count, the [[graft.operators.Sessionize]] gaps-and-islands
    * shape applied to frame indices; one asset-keyed shuffle end-to-end. */
  def vadSegments(
      media: DataFrame,
      frameBytes: Int = 64,
      maxSilenceFrames: Int = 1): DataFrame = {
    require(maxSilenceFrames >= 0, s"maxSilenceFrames must be >= 0: $maxSilenceFrames")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("asset_id"))
    val wo = w.orderBy(col("frame_idx"))
    val run = wo.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    frameEnergies(media, frameBytes)
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__total", sum(col("energy")).over(w))
      .filter(col("energy") * col("__n") >= col("__total"))
      .withColumn("__new",
        when(lag(col("frame_idx"), 1).over(wo).isNull
          || col("frame_idx") - lag(col("frame_idx"), 1).over(wo) > maxSilenceFrames + 1, 1L)
          .otherwise(0L))
      .withColumn("seg_idx", sum(col("__new")).over(run) - lit(1L))
      .groupBy(col("asset_id"), col("seg_idx"))
      .agg(
        min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_active_frames"))
  }

  /** Frame sampling: pick every `stride`-th chunk of a video payload —
    * row-local explode, no shuffle. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame =
    media
      .withColumn("n_frames", greatest(floor(length(col("payload")) / frameBytes), lit(1)).cast("int"))
      .select(
        col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("payload"))
      .filter(col("frame_idx") % stride === 0)
      .select(
        col("asset_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
}
