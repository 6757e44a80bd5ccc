package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.convert._
import graft.operators.{ChainSync, Scd2}
import graft.operators.ChainSync.ChainState

/** End-to-end replay through the PRODUCTION orchestrator
  * ([[ChainSync.handleUpdates]] ≙ `mod.rs:190-251`): typed updates →
  * squash/append/SCD-2/candles/rollback; the corrected state must equal a
  * clean replay of only the surviving blocks — the reference's whole
  * correctness story in one fold. */
class ReplaySpec extends SparkSpec {

  import spark.implicits._

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")
  private val pk = Array.tabulate[Byte](32)(_.toByte)

  private def exchange(id: String, tsMs: Long, amount: Long, price: Long, pair: (String, String)): RawTx =
    RawTx(id = bytes(id), txType = 7, senderPublicKey = pk, timeStampMs = tsMs,
      fee = 1L, txVersion = Some(2),
      order1 = Some(RawOrder(id = bytes(s"o-$id"), version = 1)),
      order2 = Some(RawOrder(id = bytes(s"p-$id"), version = 1, orderSide = 1)),
      amount = Some(amount), price = Some(price),
      amountAssetId = Some(bytes(pair._1)), priceAssetId = Some(bytes(pair._2)),
      buyMatcherFee = Some(0L), sellMatcherFee = Some(0L),
      feeAssetId = Some(Array.emptyByteArray),
      assetStateUpdates = Seq(RawAssetStateUpdate(
        assetId = bytes(pair._1), issuer = pk, name = s"asset-${pair._1}",
        description = "", decimals = 2, reissuable = true, nft = false,
        volume = amount * 10)))

  private val t0 = 1704100000000L // 2024-01-01T08:26:40Z
  private val block1 = RawBlock("b1", 100, Some(t0), Some(100000000L), Seq(
    exchange("e1", t0, 100, 500, ("AA", "PP")),
    exchange("e2", t0 + 30000, 50, 700, ("AA", "PP"))))
  private val block2 = RawBlock("b2", 101, Some(t0 + 60000), Some(100000500L), Seq(
    exchange("e3", t0 + 60000, 10, 900, ("AA", "PP")),
    exchange("e4", t0 + 61000, 5, 200, ("BB", "PP"))))

  private def fold(state: ChainState, updates: RawUpdate*): ChainState =
    ChainSync.handleUpdates(spark, state, updates.toSeq)

  private def same(a: DataFrame, b: DataFrame, label: String): Unit =
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"$label diverged:\nleft-only:\n${a.exceptAll(b).collect().mkString("\n")}\n" +
        s"right-only:\n${b.exceptAll(a).collect().mkString("\n")}")

  test("handleUpdates: append + rollback replays to the clean single-block state") {
    val full = fold(fold(ChainSync.emptyState(spark), block1, block2), RawRollback("b1"))
    val clean = fold(ChainSync.emptyState(spark), block1)
    same(full.candles, clean.candles, "candles")
    same(full.facts("txs_7"), clean.facts("txs_7"), "txs_7")
    same(full.blocks, clean.blocks, "blocks")
    same(full.assetUpdates, clean.assetUpdates, "asset_updates")
    // origins cascade with their asset_update rows → identity too
    same(full.assetOrigins, clean.assetOrigins, "asset_origins")
    // waves_data has no block reference: rollback keeps b2's quantity row
    // (faithful to the reference, which never deletes waves_data)
    assert(full.wavesData.count() == 2 && clean.wavesData.count() == 1)
    assert(full.maxBlockUid == 1L)
  }

  test("handleUpdates: insert-ignore tables keep first-writer rows") {
    val state = fold(ChainSync.emptyState(spark), block1, block2)
    // AA issued by e1 (first update wins), BB by e4
    val origins = state.assetOrigins.orderBy("first_asset_update_uid").collect()
    assert(origins.length == 2)
    assert(origins.head.getAs[String]("origin_transaction_id") ==
      graft.functions.Base58.encode(bytes("e1")))
    assert(origins.head.getAs[Int]("issue_height") == 100)
    assert(state.wavesData.select("quantity").as[BigDecimal].collect().map(_.toLong).sorted.toSeq ==
      Seq(100000000L, 100000500L))
  }

  test("handleUpdates: SCD-2 chain re-opens on rollback") {
    val appended = fold(ChainSync.emptyState(spark), block1, block2)
    // AA is versioned by e1,e2 (block1) then e3 (block2): after the append
    // e3's version (volume 10*10) is current, e2's (50*10) is closed
    val before = Scd2.current(appended.assetUpdates)
    assert(before.filter(col("volume") === 100L).count() == 1)
    assert(before.filter(col("volume") === 500L).count() == 0)
    val rolled = fold(appended, RawRollback("b1"))
    val current = Scd2.current(rolled.assetUpdates)
    // after rollback only block1's last update per asset is current again
    assert(current.filter(col("volume") === 500L).count() == 1) // e2: 50*10
    assert(rolled.assetUpdates.count() == 2) // e1 + e2 versions survive
  }

  test("handleUpdates: microblock squash re-points facts to the extended key block") {
    val micro = RawBlock("m1", 100, None, None, Seq(
      exchange("e5", t0 + 40000, 7, 300, ("AA", "PP"))))
    // key b1 (uid 1) → micro m1 (uid 2) → key b2 (uid 3, squashes first)
    val state = fold(ChainSync.emptyState(spark), block1, micro, block2)
    // m1's facts were re-pointed at b1's uid before b2 appended
    val e5 = state.facts("txs_7").filter(col("id") === graft.functions.Base58.encode(bytes("e5")))
    assert(e5.select("block_uid").as[Long].collect().toSeq == Seq(1L))
    // the uid generator is global (mod.rs:41): the microblock tx CONTINUES
    // height 100's index after b1's two txs instead of colliding at idx 0
    assert(e5.select("uid").as[Long].collect().toSeq == Seq(100L * 100000 + 2))
    // the key block took over the microblock's id (total-block rename)
    assert(state.blocks.orderBy("uid").select("id").as[String].collect().toSeq == Seq("m1", "b2"))
    assert(state.blocks.filter(col("time_stamp").isNull).count() == 0)
  }

  test("persist/load round-trips the fold state and resumes the uid high-water mark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state-").toString
    val state = fold(ChainSync.emptyState(spark), block1)
    ChainSync.persist(state, dir)
    val loaded = ChainSync.load(spark, dir)
    assert(loaded.maxBlockUid == 1L)
    same(loaded.candles, state.candles, "persisted candles")
    same(loaded.facts("txs_7"), state.facts("txs_7"), "persisted txs_7")
    same(loaded.assetUpdates, state.assetUpdates, "persisted asset_updates")
    // resuming the fold from the durable state equals the in-memory fold
    val resumed = fold(loaded, block2)
    val direct = fold(state, block2)
    same(resumed.candles, direct.candles, "resumed candles")
    same(resumed.blocks, direct.blocks, "resumed blocks")
  }

  test("persist is atomic: a crash between table writes leaves the previous state loadable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state-").toString
    val state1 = fold(ChainSync.emptyState(spark), block1)
    ChainSync.persist(state1, dir, lastBatchId = 1L)
    val state2 = fold(state1, block2)
    // kill persist #2 between two table writes — after candles landed but
    // before the dims; without the version-pointer swap this interleaving
    // used to leave candles from fold 2 next to dims from fold 1
    final class SimulatedCrash extends RuntimeException("crash mid-persist")
    intercept[SimulatedCrash] {
      ChainSync.persist(state2, dir, lastBatchId = 2L,
        onTableWritten = name => if (name == "candles") throw new SimulatedCrash)
    }
    // the pointer still names version 1: EVERY table (and sync_meta) reads
    // back as the previous consistent fold
    val loaded = ChainSync.load(spark, dir)
    same(loaded.candles, state1.candles, "candles after crashed persist")
    same(loaded.blocks, state1.blocks, "blocks after crashed persist")
    same(loaded.facts("txs_7"), state1.facts("txs_7"), "facts after crashed persist")
    assert(ChainSync.lastAppliedBatch(spark, dir) == 1L)
    // a clean re-persist publishes fold 2 and sweeps the orphaned attempt;
    // the PREVIOUS version survives one more persist so readers holding the
    // old pointer can finish (ADVICE r5) — v1 and v2, nothing else
    ChainSync.persist(state2, dir, lastBatchId = 2L)
    val reloaded = ChainSync.load(spark, dir)
    same(reloaded.candles, state2.candles, "candles after re-persist")
    assert(ChainSync.lastAppliedBatch(spark, dir) == 2L)
    val versions = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.matches("v\\d+")).toSeq.sorted
    assert(versions == Seq("v1", "v2"), s"kept-version policy violated: $versions")
    // and a THIRD persist retires v1
    ChainSync.persist(fold(state2, RawRollback("b1")), dir, lastBatchId = 3L)
    val afterThird = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.matches("v\\d+")).toSeq.sorted
    assert(afterThird == Seq("v2", "v3"), s"kept-version policy violated: $afterThird")
  }

  // ---- incremental durable persist (VERDICT r5 #1) -----------------------

  private def segFiles(dir: String): Set[String] = {
    val base = java.nio.file.Paths.get(dir, "segments")
    if (!java.nio.file.Files.exists(base)) Set.empty
    else {
      val s = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => java.nio.file.Paths.get(dir).relativize(p).toString)
          .filterNot(_.endsWith("_SUCCESS")).filterNot(_.contains(".crc"))
          .toSet
      } finally s.close()
    }
  }

  // blocks spanning three height buckets (HeightBucketSize = 1000)
  private def bucketBlock(id: String, height: Int, tsOffsetMin: Int, tx: String): RawBlock =
    RawBlock(id, height, Some(t0 + tsOffsetMin * 60000L), None, Seq(
      exchange(tx, t0 + tsOffsetMin * 60000L, 10 + height % 7, 100 + height % 13, ("AA", "PP"))))

  test("incremental persist: frozen segments are reused; a new batch writes O(batch) files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-").toString
    val s1 = fold(ChainSync.emptyState(spark),
      bucketBlock("h1", 100, 0, "x1"), bucketBlock("h2", 1100, 1, "x2"),
      bucketBlock("h3", 2100, 2, "x3"))
    ChainSync.persist(s1, dir)
    val after1 = segFiles(dir)
    val m1 = ChainSync.readManifest(spark, s"$dir/v1").get
    // height-keyed tables freeze buckets 0..1 (tip = bucket 2); candle
    // segments are keyed by time_start week and asserted separately
    val heightSegs1 = m1.segments.filterNot(_.table == "candles")
    val frozen1 = heightSegs1.filter(_.frozen)
    assert(frozen1.nonEmpty && frozen1.forall(s => s.lo == 0 && s.hi == 1), s"$frozen1")
    assert(heightSegs1.filterNot(_.frozen).forall(s => s.lo == 2 && s.hi == 2))
    // the minute-spaced trades land in ONE candle week: a single tip segment
    val cSegs1 = m1.segments.filter(_.table == "candles")
    assert(cSegs1.size == 1 && !cSegs1.head.frozen, s"$cSegs1")

    // append at the SAME tip bucket: every frozen segment is reused by
    // reference, and the only files written belong to the new tip segments
    val s2 = fold(s1, bucketBlock("h4", 2150, 3, "x4"))
    ChainSync.persist(s2, dir)
    val after2 = segFiles(dir)
    val m2 = ChainSync.readManifest(spark, s"$dir/v2").get
    assert(m2.segments.filter(_.frozen) == frozen1,
      s"frozen segments not reused:\n${m2.segments.filter(_.frozen)}\nvs\n$frozen1")
    val new2 = after2 -- after1
    assert(new2.nonEmpty && new2.forall(_.contains("/s2-t/")),
      s"persist of one batch wrote non-tip files: ${new2.filterNot(_.contains("/s2-t/"))}")
    val loaded2 = ChainSync.load(spark, dir)
    same(loaded2.facts("txs_7"), s2.facts("txs_7"), "incremental txs_7")
    same(loaded2.blocks, s2.blocks, "incremental blocks")
    same(loaded2.candles, s2.candles, "incremental candles")

    // tip advance: bucket 2 freezes EXACTLY once (one new frozen segment
    // per table, covering [2,2]); buckets 0..1 are never rewritten
    val s3 = fold(s2, bucketBlock("h5", 3100, 4, "x5"))
    ChainSync.persist(s3, dir)
    val m3 = ChainSync.readManifest(spark, s"$dir/v3").get
    val blocksSegs3 = m3.segments.filter(s => s.table == "blocks_microblocks" && s.frozen)
    assert(blocksSegs3.map(_.relPath).toSet ==
      Set("segments/blocks_microblocks/s1-f0", "segments/blocks_microblocks/s3-f0"), s"$blocksSegs3")
    assert(m3.segments.filter(_.relPath.contains("s3-f")).forall(s => s.lo == 2 && s.hi == 2))
    val new3 = segFiles(dir) -- after2
    assert(new3.forall(f => f.contains("/s3-f") || f.contains("/s3-t/")),
      s"history rewritten on tip advance: ${new3.filterNot(f => f.contains("/s3-f") || f.contains("/s3-t/"))}")
    val loaded3 = ChainSync.load(spark, dir)
    same(loaded3.facts("txs_7"), s3.facts("txs_7"), "tip-advance txs_7")
    same(loaded3.blocks, s3.blocks, "tip-advance blocks")
    assert(loaded3.maxBlockUid == s3.maxBlockUid)
  }

  test("incremental persist: rollback invalidates frozen buckets from the cut") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-rb-").toString
    val s1 = fold(ChainSync.emptyState(spark),
      bucketBlock("h1", 100, 0, "x1"), bucketBlock("h2", 1100, 1, "x2"),
      bucketBlock("h3", 2100, 2, "x3"))
    ChainSync.persist(s1, dir)
    // roll back to h2: bucket 2 disappears, bucket 1 becomes the tip — the
    // v1 frozen segment spans [0,1] so it cannot be reused (its hi reaches
    // into the now-mutable tip); persist must rewrite from bucket 0
    val rolled = fold(s1, RawRollback("h2"))
    ChainSync.persist(rolled, dir)
    val m2 = ChainSync.readManifest(spark, s"$dir/v2").get
    assert(m2.segments.filterNot(_.table == "candles").forall(_.hi <= 1),
      s"rolled-back bucket still referenced: ${m2.segments}")
    val loaded = ChainSync.load(spark, dir)
    same(loaded.blocks, rolled.blocks, "post-rollback blocks")
    same(loaded.facts("txs_7"), rolled.facts("txs_7"), "post-rollback txs_7")
    // and the rolled-back state equals a clean fold of the surviving blocks
    val clean = fold(ChainSync.emptyState(spark),
      bucketBlock("h1", 100, 0, "x1"), bucketBlock("h2", 1100, 1, "x2"))
    same(loaded.blocks, clean.blocks, "post-rollback blocks vs clean")
    same(loaded.candles, clean.candles, "post-rollback candles vs clean")
  }

  test("fingerprint diff is distributed: dirtyBoundary collects one row and finds the first changed bucket") {
    // the VERDICT r13 #3 contract: the persist path never collects the
    // fingerprint history into the driver — the current-vs-previous compare
    // is a full-outer join whose only collect is the min differing bucket
    def fp(rows: (Int, Long, String)*): DataFrame =
      rows.toSeq.toDF("b", "n", "hs")
        .select(col("b"), col("n"), col("hs").cast("decimal(38,0)").as("h"))
    val prev = fp((0, 10L, "111"), (1, 20L, "222"), (2, 5L, "333"))
    // identical → MaxValue (nothing dirty)
    assert(ChainSync.dirtyBoundary(fp((0, 10L, "111"), (1, 20L, "222"), (2, 5L, "333")), prev) == Long.MaxValue)
    // hash change in bucket 1 → 1
    assert(ChainSync.dirtyBoundary(fp((0, 10L, "111"), (1, 20L, "-9"), (2, 5L, "333")), prev) == 1L)
    // count change only → caught too
    assert(ChainSync.dirtyBoundary(fp((0, 10L, "111"), (1, 21L, "222"), (2, 5L, "333")), prev) == 1L)
    // bucket present only on one side (rollback removed it / append added
    // one) → that bucket is the boundary
    assert(ChainSync.dirtyBoundary(fp((0, 10L, "111"), (1, 20L, "222")), prev) == 2L)
    assert(ChainSync.dirtyBoundary(fp((0, 10L, "111"), (1, 20L, "222"), (2, 5L, "333"), (3, 1L, "4")), prev) == 3L)
  }

  test("persist writes per-version fingerprints parquet; a legacy fp-line manifest still migrates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fpq-").toString
    val s1 = fold(ChainSync.emptyState(spark),
      bucketBlock("h1", 100, 0, "x1"), bucketBlock("h2", 1100, 1, "x2"),
      bucketBlock("h3", 2100, 2, "x3"))
    ChainSync.persist(s1, dir)
    val m1 = ChainSync.readManifest(spark, s"$dir/v1").get
    assert(m1.fpParquet, "r14 manifest must flag parquet fingerprints")
    assert(m1.fingerprints.isEmpty && m1.candleFingerprints.isEmpty,
      "no fp/cfp text lines expected in an r14 manifest")
    val fps1 = spark.read.parquet(s"$dir/v1/fingerprints")
    assert(fps1.select("kind").distinct().collect().map(_.getString(0)).toSet ==
      Set("blocks", "candles"))
    val frozen1 = m1.segments.filter(_.frozen)

    // LEGACY MIGRATION: rewrite v1 into the pre-r14 manifest format (fp/cfp
    // text lines, no fpq flag, no parquet) and persist again — the diff
    // must lift the legacy lines into a frame and still reuse every frozen
    // segment
    val lines = new StringBuilder
    lines.append("cseg 1\nwseg 1\n")
    fps1.orderBy("kind", "b").collect().foreach { r =>
      val tag = if (r.getAs[String]("kind") == "blocks") "fp" else "cfp"
      lines.append(s"$tag ${r.getAs[Int]("b")} ${r.getAs[Long]("n")} ${r.getAs[java.math.BigDecimal]("h").toBigInteger}\n")
    }
    m1.segments.foreach { s =>
      lines.append(s"seg ${s.table} ${s.relPath} ${s.lo} ${s.hi} ${if (s.frozen) 1 else 0}\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/v1/_MANIFEST"),
      lines.toString.getBytes("UTF-8"))
    def rmdir(p: java.nio.file.Path): Unit = {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally s.close()
    }
    rmdir(java.nio.file.Paths.get(s"$dir/v1/fingerprints"))
    assert(!ChainSync.readManifest(spark, s"$dir/v1").get.fpParquet)

    val s2 = fold(s1, bucketBlock("h4", 2150, 3, "x4"))
    ChainSync.persist(s2, dir)
    val m2 = ChainSync.readManifest(spark, s"$dir/v2").get
    assert(m2.fpParquet, "migration persist writes the parquet layout")
    assert(m2.segments.filter(_.frozen) == frozen1,
      s"legacy-manifest diff failed to reuse frozen segments:\n${m2.segments.filter(_.frozen)}\nvs\n$frozen1")
    same(ChainSync.load(spark, dir).blocks, s2.blocks, "post-migration blocks")
  }

  test("incremental persist: frozen spans are capped — a shallow rollback rewrites O(span), not O(history)") {
    // Bootstrap a chain spanning 10 height buckets (two span-8 windows),
    // then roll back INTO bucket 8. Without the span cap the bootstrap
    // would have frozen [0,8] as one segment and the rollback would force
    // a full-history rewrite; with it, window 0's segment [0,7] must be
    // reused untouched and only the tip bucket is rewritten.
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-span-").toString
    val blocks = (0 to 9).map(b => bucketBlock(s"w$b", 100 + b * 1000, b, s"wx$b"))
    val s1 = fold(ChainSync.emptyState(spark), blocks: _*)
    ChainSync.persist(s1, dir)
    val m1 = ChainSync.readManifest(spark, s"$dir/v1").get
    val frozen1 = m1.segments.filter(s => s.table == "blocks_microblocks" && s.frozen)
    assert(frozen1.map(s => (s.lo, s.hi)).toSet == Set((0, 7), (8, 8)),
      s"bootstrap freeze not span-capped: $frozen1")
    val after1 = segFiles(dir)

    val rolled = fold(s1, RawRollback("w8")) // bucket 9 gone; bucket 8 is the tip
    ChainSync.persist(rolled, dir)
    val m2 = ChainSync.readManifest(spark, s"$dir/v2").get
    // window 0 reused by reference for EVERY table; no frozen rewrite at all
    assert(m2.segments.filter(_.frozen) == m1.segments.filter(s => s.frozen && s.hi <= 7),
      s"window-0 segments not reused: ${m2.segments.filter(_.frozen)}")
    val new2 = segFiles(dir) -- after1
    assert(new2.nonEmpty && new2.forall(_.contains("/s2-t/")),
      s"shallow rollback rewrote history: ${new2.filterNot(_.contains("/s2-t/"))}")
    val loaded = ChainSync.load(spark, dir)
    same(loaded.blocks, rolled.blocks, "span-cap blocks")
    same(loaded.facts("txs_7"), rolled.facts("txs_7"), "span-cap txs_7")
    val clean = fold(ChainSync.emptyState(spark), blocks.take(9): _*)
    same(loaded.blocks, clean.blocks, "span-cap blocks vs clean replay")
  }

  test("incremental persist: waves_data segments are append-only frozen; rollback never rewrites them") {
    // waves_data is insert-ignore keyed by height and SURVIVES rollback
    // (first-writer wins on re-append), so its frozen segments are
    // reusable unconditionally — persist must never rewrite one, even
    // across a rollback that rewrites the block/fact history.
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-wd-").toString
    def wb(id: String, h: Int, off: Int, q: Long): RawBlock =
      RawBlock(id, h, Some(t0 + off * 60000L), Some(q), Nil)
    val s1 = fold(ChainSync.emptyState(spark),
      wb("wd1", 100, 0, 1L), wb("wd2", 1100, 1, 2L), wb("wd3", 2100, 2, 3L))
    ChainSync.persist(s1, dir)
    val m1 = ChainSync.readManifest(spark, s"$dir/v1").get
    val w1 = m1.segments.filter(_.table == "waves_data")
    assert(w1.count(_.frozen) == 1 && w1.count(!_.frozen) == 1, s"$w1")
    val after1 = segFiles(dir)

    // tip advance: previous frozen waves segments reused, bucket 2 freezes
    val s2 = fold(s1, wb("wd4", 3100, 3, 4L))
    ChainSync.persist(s2, dir)
    val m2 = ChainSync.readManifest(spark, s"$dir/v2").get
    assert(w1.filter(_.frozen).forall(m2.segments.contains), s"${m2.segments.filter(_.table == "waves_data")}")
    val newW2 = (segFiles(dir) -- after1).filter(_.startsWith("segments/waves_data/"))
    assert(newW2.forall(f => f.contains("/s2-f") || f.contains("/s2-t/")), s"$newW2")
    val after2 = segFiles(dir)

    // rollback rewrites blocks/facts but waves_data survives WHOLE: every
    // frozen waves segment stays referenced, only the tip is rewritten
    val rolled = fold(s2, RawRollback("wd2"))
    ChainSync.persist(rolled, dir)
    val m3 = ChainSync.readManifest(spark, s"$dir/v3").get
    assert(m3.segments.filter(s => s.table == "waves_data" && s.frozen) ==
      m2.segments.filter(s => s.table == "waves_data" && s.frozen),
      s"rollback rewrote append-only waves segments: ${m3.segments.filter(_.table == "waves_data")}")
    val newW3 = (segFiles(dir) -- after2).filter(_.startsWith("segments/waves_data/"))
    assert(newW3.forall(_.contains("/s3-t/")), s"$newW3")
    val loaded = ChainSync.load(spark, dir)
    same(loaded.wavesData, rolled.wavesData, "post-rollback waves_data")
    same(loaded.wavesData, s2.wavesData, "waves_data survives rollback")
  }

  test("incremental persist: candle history freezes by week; tip-week appends reuse frozen weeks") {
    // Candles segment by time_start week the way facts segment by height
    // bucket — but the fold's recompute cut snaps to the CURRENT MONTH
    // start (the 1M ladder edge), so every append legitimately dirties the
    // week holding the month's first day: frozen reuse stabilizes for
    // weeks OLDER than the current month (O(month) rewrite per persist,
    // never O(history)). Three blocks ~5 weeks apart (Jan / Feb / Mar
    // 2024); an append in March must reuse the frozen segment that holds
    // the January+February weeks untouched.
    val week = 7 * 24 * 60 // bucketBlock's tsOffset unit is minutes
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-cw-").toString
    val s1 = fold(ChainSync.emptyState(spark),
      bucketBlock("cw1", 100, 0, "cx1"), bucketBlock("cw2", 200, 5 * week, "cx2"),
      bucketBlock("cw3", 300, 10 * week, "cx3"))
    ChainSync.persist(s1, dir)
    val m1 = ChainSync.readManifest(spark, s"$dir/v1").get
    val c1 = m1.segments.filter(_.table == "candles")
    assert(c1.count(_.frozen) >= 2 && c1.count(!_.frozen) == 1,
      s"candle weeks did not freeze: $c1")
    val marchStartWeek = (1709251200000L / ChainSync.CandleBucketMs).toInt // 2024-03-01
    val janFebSegs = c1.filter(s => s.frozen && s.hi < marchStartWeek)
    assert(janFebSegs.nonEmpty, s"$c1")
    val after1 = segFiles(dir)

    // append another block in mid-March: the recompute cut snaps to Mar 1,
    // so the Jan+Feb frozen weeks are reused by reference and no candle
    // file below the March window is rewritten
    val s2 = fold(s1, bucketBlock("cw4", 400, 10 * week + 30, "cx4"))
    ChainSync.persist(s2, dir)
    val m2 = ChainSync.readManifest(spark, s"$dir/v2").get
    assert(janFebSegs.forall(m2.segments.contains),
      s"pre-March frozen candle weeks not reused:\n${m2.segments.filter(_.table == "candles")}\nvs kept\n$janFebSegs")
    val newCandleFiles = (segFiles(dir) -- after1).filter(_.startsWith("segments/candles/"))
    assert(newCandleFiles.nonEmpty && newCandleFiles.forall(f =>
      f.contains("/s2-t/") || f.contains(s"/s2-f${marchStartWeek / ChainSync.FrozenSegmentSpan}/")),
      s"candle history below March rewritten on tip append: $newCandleFiles")
    same(ChainSync.load(spark, dir).candles, s2.candles, "tip-append candles")

    // rollback to the February block: March candles disappear, the
    // fingerprint diff invalidates from the cut, and load matches the fold
    val rolled = fold(s2, RawRollback("cw2"))
    ChainSync.persist(rolled, dir)
    val loaded = ChainSync.load(spark, dir)
    same(loaded.candles, rolled.candles, "post-rollback candles")
    val clean = fold(ChainSync.emptyState(spark),
      bucketBlock("cw1", 100, 0, "cx1"), bucketBlock("cw2", 200, 5 * week, "cx2"))
    same(loaded.candles, clean.candles, "post-rollback candles vs clean replay")
  }

  test("incremental persist: crash between segment write and publish keeps the previous state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-crash-").toString
    val s1 = fold(ChainSync.emptyState(spark),
      bucketBlock("h1", 100, 0, "x1"), bucketBlock("h2", 1100, 1, "x2"))
    ChainSync.persist(s1, dir, lastBatchId = 1L)
    val s2 = fold(s1, bucketBlock("h3", 2100, 2, "x3"))
    final class SimulatedCrash extends RuntimeException("crash mid-segments")
    intercept[SimulatedCrash] {
      ChainSync.persist(s2, dir, lastBatchId = 2L,
        onTableWritten = name => if (name == "txs_7") throw new SimulatedCrash)
    }
    // pointer still on v1: the orphaned v2 segments are invisible
    val loaded = ChainSync.load(spark, dir)
    same(loaded.blocks, s1.blocks, "blocks after crashed segment persist")
    same(loaded.facts("txs_7"), s1.facts("txs_7"), "txs_7 after crashed segment persist")
    assert(ChainSync.lastAppliedBatch(spark, dir) == 1L)
    // clean re-persist publishes fold 2 (overwriting the orphaned attempt)
    ChainSync.persist(s2, dir, lastBatchId = 2L)
    val reloaded = ChainSync.load(spark, dir)
    same(reloaded.facts("txs_7"), s2.facts("txs_7"), "txs_7 after re-persist")
    assert(ChainSync.lastAppliedBatch(spark, dir) == 2L)
  }

  test("incremental persist: randomized append/rollback/crash interleavings always load the fold") {
    // Property-style chaos drive over the NEWEST path (segment reuse +
    // rollback invalidation + two-phase publish): a fixed-seed random walk
    // of appends (some jumping height buckets), rollbacks, clean persists
    // and crash-injected persists. Invariant after every clean persist:
    // load(dir) == the in-memory fold; after every crashed persist:
    // load(dir) == the last successfully PUBLISHED fold.
    val rnd = new scala.util.Random(20260813L)
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-chaos-").toString
    final class SimulatedCrash extends RuntimeException("chaos crash")
    val crashTables = Vector("blocks_microblocks", "txs_7", "candles", "sync_meta")

    var state = ChainSync.emptyState(spark)
    var applied = Vector.empty[RawBlock] // surviving chain in order
    var height = 100
    var n = 0
    var batchId = 0L
    var published: Option[(ChainState, Long)] = None

    def verifyLoaded(expect: ChainState, expectBatch: Long, label: String): Unit = {
      val loaded = ChainSync.load(spark, dir)
      same(loaded.blocks, expect.blocks, s"$label blocks")
      same(loaded.facts("txs_7"), expect.facts("txs_7"), s"$label txs_7")
      same(loaded.candles, expect.candles, s"$label candles")
      same(loaded.assetUpdates, expect.assetUpdates, s"$label asset_updates")
      same(loaded.wavesData, expect.wavesData, s"$label waves_data")
      assert(ChainSync.lastAppliedBatch(spark, dir) == expectBatch, label)
    }

    for (step <- 1 to 16) {
      rnd.nextInt(10) match {
        case r if r <= 4 || applied.size < 2 => // append (bucket jump 1 in 4)
          n += 1
          height += (if (rnd.nextInt(4) == 0) 400 + rnd.nextInt(1200) else 1 + rnd.nextInt(3))
          val b = bucketBlock(s"c$n", height, n, s"t$n")
          state = fold(state, b)
          applied :+= b
        case r if r <= 6 => // rollback to a random surviving block
          val keep = 1 + rnd.nextInt(applied.size - 1)
          state = fold(state, RawRollback(applied(keep - 1).id))
          applied = applied.take(keep)
          height = applied.last.height
        case r if r <= 8 => // clean persist + full invariant check
          batchId += 1
          ChainSync.persist(state, dir, lastBatchId = batchId)
          published = Some((state, batchId))
          verifyLoaded(state, batchId, s"step $step clean persist")
        case _ => // crash-injected persist: the publish must not happen
          val crashOn = crashTables(rnd.nextInt(crashTables.length))
          intercept[SimulatedCrash] {
            ChainSync.persist(state, dir, lastBatchId = batchId + 1,
              onTableWritten = t => if (t == crashOn) throw new SimulatedCrash)
          }
          published match {
            case Some((p, b)) => verifyLoaded(p, b, s"step $step crash on $crashOn")
            case None => assert(!new java.io.File(s"$dir/_CURRENT").exists(),
              s"step $step: crashed first persist must not publish")
          }
      }
    }
    // terminal invariant: a final clean persist round-trips, and the fold
    // equals a clean replay of only the surviving blocks
    batchId += 1
    ChainSync.persist(state, dir, lastBatchId = batchId)
    verifyLoaded(state, batchId, "terminal persist")
    val clean = fold(ChainSync.emptyState(spark), applied: _*)
    same(state.blocks, clean.blocks, "terminal blocks vs clean replay")
    same(state.candles, clean.candles, "terminal candles vs clean replay")
    same(state.facts("txs_7"), clean.facts("txs_7"), "terminal txs_7 vs clean replay")
  }

  test("persist/load resumes the uid generator — no tx-uid collisions at the tip height") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state-").toString
    val state = fold(ChainSync.emptyState(spark), block1)
    ChainSync.persist(state, dir, lastBatchId = 7L)
    assert(ChainSync.lastAppliedBatch(spark, dir) == 7L)
    val loaded = ChainSync.load(spark, dir)
    assert(loaded.uidLastHeight == 100 && loaded.uidNextIdx == 2L)
    // a microblock extending the persisted tip must CONTINUE height 100's
    // index (e1=idx0, e2=idx1 persisted → e5 gets idx2), not restart at 0
    val micro = RawBlock("m1", 100, None, None, Seq(
      exchange("e5", t0 + 40000, 7, 300, ("AA", "PP"))))
    val resumed = fold(loaded, micro)
    val uids = resumed.facts("txs_7").select("uid").as[Long].collect().toSet
    assert(uids.size == 3, s"uid collision after resume: $uids")
    assert(uids.contains(100L * 100000 + 2))
  }

  test("dropAppliedBlocks skips re-served blocks; overlap replay folds to the clean state") {
    val state = fold(ChainSync.emptyState(spark), block1, block2)
    val block3 = RawBlock("b3", 102, Some(t0 + 120000), None, Seq(
      exchange("e6", t0 + 120000, 20, 400, ("AA", "PP"))))
    // a source resuming from below the tip re-serves block2
    val replayed = ChainSync.dropAppliedBlocks(state, Seq(block2, block3))
    assert(replayed.map { case b: RawBlock => b.id; case _ => "" } == Seq("b3"))
    // rollbacks pass through untouched
    assert(ChainSync.dropAppliedBlocks(state, Seq(RawRollback("b1"))).length == 1)
    val resumed = fold(state, replayed: _*)
    val direct = fold(ChainSync.emptyState(spark), block1, block2, block3)
    same(resumed.candles, direct.candles, "overlap-replay candles")
    same(resumed.facts("txs_7"), direct.facts("txs_7"), "overlap-replay txs_7")
    same(resumed.blocks, direct.blocks, "overlap-replay blocks")
  }

  test("startupRollback rewinds the safety margin to the clean prefix") {
    val state = fold(ChainSync.emptyState(spark), block1, block2)
    val rolled = ChainSync.startupRollback(state, depth = 1)
    val clean = fold(ChainSync.emptyState(spark), block1)
    same(rolled.candles, clean.candles, "startup-rollback candles")
    same(rolled.blocks, clean.blocks, "startup-rollback blocks")
    same(rolled.assetUpdates, clean.assetUpdates, "startup-rollback asset_updates")
    // depth past the chain start is a no-op at the first block
    assert(ChainSync.startupRollback(rolled, depth = 5).maxBlockUid == rolled.maxBlockUid)
  }

  test("restart replay: seeded batch high-water mark + resume dedup produce no duplicates") {
    import graft.streaming.MicroBatchPipeline
    import graft.streaming.MicroBatchPipeline.UpdateEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-restart-").toString
    val block3 = RawBlock("b3", 102, Some(t0 + 120000), None, Seq(
      exchange("e6", t0 + 120000, 20, 400, ("AA", "PP"))))

    // first run: fold batch 0, persist state + batch id, then "crash"
    val s1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UpdateEvent]
    val q1 = MicroBatchPipeline.startChainSync(
      spark, s1.toDS(), ChainSync.emptyState(spark),
      onBatch = (st, id) => ChainSync.persist(st, dir, id), maxWaitMs = 10L)
    try {
      s1.addData(UpdateEvent(block1), UpdateEvent(block2))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart: the streaming engine re-serves the in-flight batch with the
    // SAME id (simulated by a fresh MemoryStream whose ids restart at 0);
    // the seeded high-water mark must skip it, then batch 1 applies
    val loaded = ChainSync.load(spark, dir)
    val lastBatch = ChainSync.lastAppliedBatch(spark, dir)
    assert(lastBatch == 0L)
    @volatile var last: Option[ChainState] = None
    val s2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UpdateEvent]
    val q2 = MicroBatchPipeline.startChainSync(
      spark, s2.toDS(), loaded,
      onBatch = (st, _) => last = Some(st), maxWaitMs = 10L,
      lastAppliedBatch = lastBatch)
    try {
      s2.addData(UpdateEvent(block1), UpdateEvent(block2)) // checkpoint replay
      q2.processAllAvailable()
      s2.addData(UpdateEvent(block3))
      q2.processAllAvailable()
    } finally q2.stop()
    val direct = fold(ChainSync.emptyState(spark), block1, block2, block3)
    same(last.get.facts("txs_7"), direct.facts("txs_7"), "restarted txs_7")
    same(last.get.blocks, direct.blocks, "restarted blocks")
    same(last.get.candles, direct.candles, "restarted candles")
  }

  test("restart chaos: repeated crash/replay cycles over startChainSync converge to the clean fold") {
    // The production restart story end-to-end, randomized: a global batch
    // schedule grows across 5 simulated process lifetimes. Each lifetime
    // resumes from the durable store (load + lastAppliedBatch seed),
    // re-serves the ENTIRE schedule from batch 0 — replayed ids must be
    // skipped, never double-applied — and then "crashes": one batch's
    // persist dies mid-write (two-phase: the previous version must keep
    // loading) and later batches are folded in memory but never persisted
    // (durable state lags the dead process, exactly a crash). The final
    // lifetime persists everything; the durable state must equal a clean
    // batch-structured fold of the surviving blocks.
    import graft.streaming.MicroBatchPipeline
    import graft.streaming.MicroBatchPipeline.UpdateEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(0xC6A05L)
    val dir = java.nio.file.Files.createTempDirectory("graft-restart-chaos-").toString
    final class SimulatedCrash extends RuntimeException("restart chaos crash")
    val crashTables = Vector("blocks_microblocks", "txs_7", "candles", "sync_meta")
    def publishedYet: Boolean = new java.io.File(s"$dir/_CURRENT").exists()

    var schedule = Vector.empty[Seq[RawUpdate]]
    var survivors = Vector.empty[RawBlock] // expected chain after the full schedule
    var height = 100
    var n = 0

    for (run <- 1 to 5) {
      // extend the schedule: 1-3 new batches of appends (bucket jumps) and
      // occasional rollbacks, tracking the expected surviving chain
      (1 to 1 + rnd.nextInt(3)).foreach { _ =>
        val batch = (1 to 1 + rnd.nextInt(2)).map { _ =>
          if (survivors.size >= 2 && rnd.nextInt(5) == 0) {
            val keep = 1 + rnd.nextInt(survivors.size - 1)
            val rb = RawRollback(survivors(keep - 1).id)
            survivors = survivors.take(keep)
            height = survivors.last.height
            rb
          } else {
            n += 1
            height += (if (rnd.nextInt(4) == 0) 700 + rnd.nextInt(900) else 1 + rnd.nextInt(3))
            val b = bucketBlock(s"r$n", height, n, s"rt$n")
            survivors :+= b
            b
          }
        }
        schedule :+= batch
      }

      // a lifetime that crashed before its first publish leaves no durable
      // state at all — the restart then cold-starts from the empty fold
      val resuming = run > 1 && publishedYet
      val loaded = if (resuming) ChainSync.load(spark, dir) else ChainSync.emptyState(spark)
      val lastBatch = if (resuming) ChainSync.lastAppliedBatch(spark, dir) else -1L
      // last lifetime survives; earlier ones die at a random NEW batch id
      val crashAt: Long =
        if (run == 5) Long.MaxValue
        else schedule.length - 1L - rnd.nextInt(math.min(2, schedule.length))
      val crashTable = crashTables(rnd.nextInt(crashTables.length))
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UpdateEvent]
      val q = MicroBatchPipeline.startChainSync(
        spark, stream.toDS(), loaded,
        onBatch = (st, id) =>
          if (id < crashAt) ChainSync.persist(st, dir, id)
          else if (id == crashAt)
            try ChainSync.persist(st, dir, id,
              onTableWritten = t => if (t == crashTable) throw new SimulatedCrash)
            catch { case _: SimulatedCrash => () } // the process is "dead": no persist after this
          , maxWaitMs = 10L, lastAppliedBatch = lastBatch)
      try {
        schedule.foreach { batch =>
          stream.addData(batch.map(UpdateEvent(_)))
          q.processAllAvailable()
        }
      } finally q.stop()
      // after every lifetime the durable store must load SOMETHING
      // consistent (the last published version) — never throw, never mix
      if (publishedYet) ChainSync.load(spark, dir).blocks.count()
    }

    val loaded = ChainSync.load(spark, dir)
    val clean = schedule.foldLeft(ChainSync.emptyState(spark))((st, b) => fold(st, b: _*))
    same(loaded.blocks, clean.blocks, "restart-chaos blocks")
    same(loaded.facts("txs_7"), clean.facts("txs_7"), "restart-chaos txs_7")
    same(loaded.candles, clean.candles, "restart-chaos candles")
    same(loaded.assetUpdates, clean.assetUpdates, "restart-chaos asset_updates")
    // and the batch-structured fold equals the flat replay of the survivors
    val flat = fold(ChainSync.emptyState(spark), survivors: _*)
    same(loaded.blocks, flat.blocks, "restart-chaos blocks vs survivor replay")
  }

  test("views compose over the fold state (decimals/tickers/assets)") {
    val state = fold(ChainSync.emptyState(spark), block1, block2)
    val (decimals, tickers, assets) = ChainSync.views(spark, state)
    // decimals: current AA + BB versions plus the static WAVES row
    val decs = decimals.collect().map(r => r.getString(0) -> r.getShort(1)).toMap
    assert(decs("WAVES") == 8.toShort)
    assert(decs.size == 3) // AA, BB, WAVES
    assert(tickers.count() == 0) // no ticker extraction configured
    // assets: one row per current asset + synthetic WAVES with latest quantity
    val a = assets.collect().map(r => r.getString(0) -> r).toMap
    assert(a.contains("WAVES") && a.size == 3)
    assert(a("WAVES").getDecimal(a("WAVES").fieldIndex("total_quantity")).longValue == 100000500L)
  }

  test("startChainSync: the streaming wrapper folds batches to the same state") {
    import graft.streaming.MicroBatchPipeline
    import graft.streaming.MicroBatchPipeline.UpdateEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UpdateEvent]
    @volatile var last: Option[ChainState] = None
    val liveness = new graft.streaming.LivenessListener(maxAgeMs = 300000)
    val query = MicroBatchPipeline.startChainSync(
      spark, stream.toDS(), ChainSync.emptyState(spark),
      onBatch = (s, _) => last = Some(s), maxWaitMs = 10L, liveness = Some(liveness))
    try {
      stream.addData(UpdateEvent(block1), UpdateEvent(block2))
      query.processAllAvailable()
      stream.addData(UpdateEvent(RawRollback("b1")))
      query.processAllAvailable()
    } finally query.stop()
    val direct = fold(fold(ChainSync.emptyState(spark), block1, block2), RawRollback("b1"))
    same(last.get.candles, direct.candles, "streamed candles")
    same(last.get.facts("txs_7"), direct.facts("txs_7"), "streamed txs_7")
    // ST6: liveness observed the newest key-block time from the stream
    assert(liveness.lastEventTime == t0 + 60000)
    assert(liveness.isHealthy(t0 + 60000 + 100000))
    assert(!liveness.isHealthy(t0 + 60000 + 400000))
  }
}
