package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Candles
import graft.streaming.{LivenessListener, MicroBatchPipeline}

/** Structured-Streaming wrapper semantics: micro-batch application is
  * exactly-once, streamed candle maintenance converges to the batch answer,
  * liveness tracks event-time freshness. */
case class Trade(uid: Long, ts: String, amount_asset_id: String,
    price_asset_id: String, sender: String, height: Int, amount: Long, price: Double)

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private val tradeRows = Seq(
    Trade(1, "2024-01-01 10:00:05", "A", "P", "m1", 10, 100, 5.0),
    Trade(2, "2024-01-01 10:00:30", "A", "P", "m1", 10, 50, 7.0),
    Trade(3, "2024-01-01 10:59:10", "A", "P", "m1", 11, 10, 9.0),
    Trade(4, "2024-01-01 11:30:00", "A", "P", "m1", 11, 20, 4.0))

  private def asTrades(df: DataFrame): DataFrame =
    df.select(col("uid"), to_timestamp(col("ts")).as("time_stamp"),
      col("amount_asset_id"), col("price_asset_id"), col("sender"), col("height"),
      col("amount"), col("price").cast("decimal(18,2)").as("price"))

  test("foreachBatch candle maintenance converges to the batch answer (ST1/ST2)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Trade]
    // per-batch arrivals, applied exactly once (the incremental-merge math
    // itself is proven in CandlesSpec; here we prove the streaming contract:
    // batches arrive once, in order, and the union is complete)
    val arrived = scala.collection.mutable.ArrayBuffer.empty[Trade]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]

    val query = MicroBatchPipeline.start[Trade](
      stream.toDS(),
      (df, id) => {
        batches += id
        arrived ++= df.as[Trade].collect()
      },
      maxWaitMs = 50L)

    stream.addData(tradeRows.take(2))
    query.processAllAvailable()
    stream.addData(tradeRows.drop(2))
    query.processAllAvailable()
    query.stop()

    assert(batches.toSeq == batches.toSeq.distinct, "a batch was applied twice")
    assert(arrived.map(_.uid).sorted == tradeRows.map(_.uid))

    val streamed = Candles.allIntervals(asTrades(arrived.toSeq.toDF()))
    val expected = Candles.allIntervals(asTrades(tradeRows.toDF()))
    assert(streamed.exceptAll(expected).count() == 0 && expected.exceptAll(streamed).count() == 0)
  }

  test("DSv2 source: batch boundaries equal the reference's size-close rule (updates.rs:89-152)") {
    // 600 available rows, 256-row cap → batches of 256 / 256 / 88, each
    // covering a contiguous offset range — the UPDATES_PER_REQUEST close
    val stream = spark.readStream
      .format(classOf[graft.sources.BlockStreamProvider].getName)
      .option("total_rows", 600L)
      .option("max_rows_per_batch", 256L)
      .load()
    val perBatch = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val query = MicroBatchPipeline.withBatchClose(
      stream.writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, id: Long) =>
          perBatch.synchronized {
            val r = df.agg(count(lit(1)), min("uid"), max("uid")).collect().head
            perBatch(id) = (r.getLong(0), r.getLong(1), r.getLong(2))
          }
          ()
        },
      maxWaitMs = 10L).start()
    try query.processAllAvailable() finally query.stop()
    assert(perBatch.toMap == Map(
      0L -> ((256L, 0L, 255L)),
      1L -> ((256L, 256L, 511L)),
      2L -> ((88L, 512L, 599L))))
  }

  test("streaming windowed candles equal the batch aggregation (ST7)") {
    import graft.streaming.StreamingCandles
    // 200 trades over ~13 minutes, 2 pairs × 2 matchers, out-of-minute
    // arrival inside chunks (chunk=64 straddles minute boundaries)
    val events = (0 until 200).map { i =>
      StreamingCandles.TradeEvent(
        uid = i.toLong, timeStampMs = 1704103200000L + (i % 40) * 20000L + (i / 40) * 240000L,
        amountAssetId = s"A${i % 2}", priceAssetId = "P", sender = s"m${(i / 3) % 2}",
        height = 10 + i / 50, amount = i % 30 + 1, price = BigDecimal((i % 17 + 1) * 25, 2))
    }
    val batchInput = asTrades(events.map(e =>
      Trade(e.uid, new Timestamp(e.timeStampMs).toString, e.amountAssetId,
        e.priceAssetId, e.sender, e.height, e.amount, e.price.toDouble)).toDF())
    val expected = Candles.minuteCandles(batchInput)
    val streamed = StreamingCandles.replayMinute(spark, events, chunk = 64)
    assert(streamed.exceptAll(expected).count() == 0 &&
      expected.exceptAll(streamed).count() == 0,
      s"windowed-stream candles diverged from batch:\n" +
        s"stream-only: ${streamed.exceptAll(expected).collect().mkString("\n")}\n" +
        s"batch-only: ${expected.exceptAll(streamed).collect().mkString("\n")}")
  }

  test("stateful replay is partitioning-independent: 1 vs 4 shuffle partitions hash-equal, state rows identical") {
    import graft.streaming.StreamingCandles
    // the VERDICT r13 #2 pin: ReplayEnv runs bounded replays at 1 shuffle
    // partition for speed, and the claim that keyed-state results do not
    // depend on the partition count was asserted, not tested. Same trades,
    // two partitionings — identical result set AND identical total state
    // rows (state is keyed; partitioning only shards it).
    val events = (0 until 300).map { i =>
      StreamingCandles.TradeEvent(
        uid = i.toLong, timeStampMs = 1704103200000L + (i % 30) * 12000L + (i / 30) * 120000L,
        amountAssetId = s"A${i % 3}", priceAssetId = "P", sender = s"m${i % 2}",
        height = 5 + i / 60, amount = i % 25 + 1, price = BigDecimal((i % 13 + 1) * 40, 2))
    }
    val (r1, s1) = StreamingCandles.replayStatefulMeasured(spark, events, chunk = 80, partitions = 1)
    val (r4, s4) = StreamingCandles.replayStatefulMeasured(spark, events, chunk = 80, partitions = 4)
    assert(r1.exceptAll(r4).count() == 0 && r4.exceptAll(r1).count() == 0,
      s"partitioning changed the replay result:\n1-only: ${r1.exceptAll(r4).collect().mkString("\n")}\n" +
        s"4-only: ${r4.exceptAll(r1).collect().mkString("\n")}")
    assert(s1.stateRows > 0 && s1.stateRows == s4.stateRows,
      s"state-row totals diverged across partitionings: p1=${s1.stateRows} p4=${s4.stateRows}")
  }

  test("stateful mapGroupsWithState candles equal the batch aggregation (ST8)") {
    import graft.streaming.StreamingCandles
    val events = (0 until 150).map { i =>
      StreamingCandles.TradeEvent(
        uid = i.toLong, timeStampMs = 1704103200000L + (i % 25) * 15000L + (i / 25) * 180000L,
        amountAssetId = "A", priceAssetId = s"P${i % 3}", sender = "m",
        height = 7 + i / 40, amount = i % 20 + 1, price = BigDecimal((i % 11 + 2) * 50, 2))
    }
    val batchInput = asTrades(events.map(e =>
      Trade(e.uid, new Timestamp(e.timeStampMs).toString, e.amountAssetId,
        e.priceAssetId, e.sender, e.height, e.amount, e.price.toDouble)).toDF())
    val expected = Candles.minuteCandles(batchInput).select(
      graft.sources.Tables.epochSecs(col("time_start")).as("t"),
      col("amount_asset_id"), col("price_asset_id"), col("matcher_address"),
      col("low").cast("double"), col("high").cast("double"),
      col("volume").cast("double"), col("quote_volume").cast("double"),
      col("max_height"), col("txs_count").cast("long"),
      col("weighted_average_price").cast("double"),
      col("open").cast("double"), col("close").cast("double"))
    val streamed = StreamingCandles.replayStateful(spark, events, chunk = 50).select(
      (col("time_start_ms") / 1000).cast("long").as("t"),
      col("amount_asset_id"), col("price_asset_id"), col("matcher_address"),
      col("low").cast("double"), col("high").cast("double"),
      col("volume").cast("double"), col("quote_volume").cast("double"),
      col("max_height"), col("txs_count").cast("long"),
      col("weighted_average_price").cast("double"),
      col("open").cast("double"), col("close").cast("double"))
    assert(streamed.exceptAll(expected).count() == 0 &&
      expected.exceptAll(streamed).count() == 0,
      s"stateful candles diverged from batch:\n" +
        s"stream-only: ${streamed.exceptAll(expected).collect().mkString("\n")}\n" +
        s"batch-only: ${expected.exceptAll(streamed).collect().mkString("\n")}")
  }

  test("chained stateful ladder: streamed 1m→5m candles equal the batch ladder (append mode)") {
    import graft.streaming.StreamingCandles
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704103200000L
    val events = (0 until 120).map { i =>
      StreamingCandles.TradeEvent(
        uid = i.toLong, timeStampMs = t0 + i * 5000L, // 10 minutes of trades
        amountAssetId = s"A${i % 2}", priceAssetId = "P", sender = "m",
        height = 5 + i / 60, amount = i % 15 + 1, price = BigDecimal((i % 9 + 1) * 75, 2))
    }
    // sentinel far in the future advances the watermark so every real
    // window finalizes; its own never does (append emits only closed ones)
    val sentinel = StreamingCandles.TradeEvent(9999L, t0 + 7200000L, "A0", "P", "m", 9, 1, BigDecimal(100, 2))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingCandles.TradeEvent]
    val ladder = StreamingCandles.ladderStream(
      StreamingCandles.minuteCandlesWindowed(
        StreamingCandles.tradeFrame(stream), watermarkDelay = "0 seconds"), "5m")
    val query = ladder.writeStream.outputMode("append")
      .format("memory").queryName("graft_ladder_append").start()
    try {
      stream.addData(events.take(60))
      query.processAllAvailable()
      stream.addData(events.drop(60) :+ sentinel)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("graft_ladder_append")
    val batchInput = asTrades(events.map(e =>
      Trade(e.uid, new Timestamp(e.timeStampMs).toString, e.amountAssetId,
        e.priceAssetId, e.sender, e.height, e.amount, e.price.toDouble)).toDF())
    val expected = Candles.ladderStep(Candles.minuteCandles(batchInput), "1m", "5m")
    assert(streamed.exceptAll(expected).count() == 0 &&
      expected.exceptAll(streamed).count() == 0,
      s"streamed ladder diverged:\nstream-only: ${streamed.exceptAll(expected).collect().mkString("\n")}\n" +
        s"batch-only: ${expected.exceptAll(streamed).collect().mkString("\n")}")
  }

  test("calendar streaming ladder: 1w/1M candles equal the batch calendar edges (ST12)") {
    import graft.streaming.StreamingCandles
    // trades every 8 hours from 2024-01-25: spans two ISO weeks AND the
    // Jan→Feb month boundary, so both calendar intervals aggregate >1 group
    val t0 = 1706140800000L // 2024-01-25T00:00:00Z (a Thursday)
    val events = (0 until 40).map { i =>
      StreamingCandles.TradeEvent(
        uid = i.toLong, timeStampMs = t0 + i * 28800000L,
        amountAssetId = s"A${i % 2}", priceAssetId = "P", sender = "m",
        height = 3 + i / 10, amount = i % 12 + 1, price = BigDecimal((i % 7 + 1) * 40, 2))
    }
    val streamed = StreamingCandles.replayCalendar(spark, events, chunk = 15)
    val batchInput = asTrades(events.map(e =>
      Trade(e.uid, new Timestamp(e.timeStampMs).toString, e.amountAssetId,
        e.priceAssetId, e.sender, e.height, e.amount, e.price.toDouble)).toDF())
    val expected = Candles.allIntervals(batchInput).filter(col("interval").isin("1w", "1M"))
    assert(streamed.filter(col("interval") === "1w").count() >= 2)
    assert(streamed.filter(col("interval") === "1M").count() >= 2)
    assert(streamed.exceptAll(expected).count() == 0 &&
      expected.exceptAll(streamed).count() == 0,
      s"calendar stream diverged:\nstream-only: ${streamed.exceptAll(expected).collect().mkString("\n")}\n" +
        s"batch-only: ${expected.exceptAll(streamed).collect().mkString("\n")}")
  }

  test("streaming dedup: in-horizon duplicates dropped, state evicted past the watermark (ST9)") {
    import graft.streaming.StreamingDedup
    val t0 = 1704103200000L
    // A twice within the horizon (second dropped), B once; after the
    // watermark passes A's state, a third A is admitted again
    // batch 1: A twice (second dropped) + B; batch 2: sentinels advancing
    // the watermark past A's expiry (t0+1h); batch 3: the re-arrived A is
    // admitted because its state was evicted between batches
    val events = Seq(
      StreamingDedup.DocEvent(t0, "doc-A"),
      StreamingDedup.DocEvent(t0 + 60000, "doc-A"),
      StreamingDedup.DocEvent(t0 + 120000, "doc-B"),
      StreamingDedup.DocEvent(t0 + 9000000L, "doc-C1"), // t0+2h30m
      StreamingDedup.DocEvent(t0 + 9000000L, "doc-C2"),
      StreamingDedup.DocEvent(t0 + 9000000L, "doc-C3"),
      StreamingDedup.DocEvent(t0 + 3 * 3600000L, "doc-A"))
    val out = StreamingDedup.replayExact(spark, events, chunk = 3, delay = "1 hour")
      .as[String].collect().toSeq
    assert(out.count(_ == "doc-A") == 2, s"expected re-admission after eviction: $out")
    assert(out.count(_ == "doc-B") == 1)
    // within one horizon the survivors are exactly the distinct contents
    val bounded = StreamingDedup.replayExact(spark,
      (0 until 100).map(i => StreamingDedup.DocEvent(t0 + i * 1000L, s"d${i % 7}")), chunk = 40)
      .as[String].collect().toSeq
    assert(bounded.sorted == (0 until 7).map(i => s"d$i"))
  }

  test("streaming novelty: seen corpus dropped exactly, in-stream dups dropped, novel passes") {
    import graft.streaming.StreamingDedup
    val t0 = 1704103200000L
    val seen = Seq((1L, "seen-A"), (2L, "seen-B")).toDF("doc_id", "text")
    val events = Seq(
      StreamingDedup.IdDocEvent(10L, t0, "seen-A"),          // in seen → dropped
      StreamingDedup.IdDocEvent(11L, t0 + 1000, "novel-X"),  // survives
      StreamingDedup.IdDocEvent(12L, t0 + 2000, "novel-X"),  // in-stream dup → dropped
      StreamingDedup.IdDocEvent(13L, t0 + 3000, "seen-B"),   // in seen → dropped
      StreamingDedup.IdDocEvent(14L, t0 + 4000, "novel-Y"))  // survives
    // a lousy bloom (fpp 0.5) may send novel docs to the verify join but
    // must never change the result — exactness is the contract
    for (fpp <- Seq(0.5, 0.01)) {
      val out = StreamingDedup.replayNovel(spark, events, seen, chunk = 2, delay = "1 hour", fpp = fpp)
      assert(out.as[Long].collect().toSet == Set(11L, 14L), s"fpp=$fpp")
    }
  }

  test("novelty stream build: with expectedItems supplied, only the bloom build touches seen") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    // the old auto-sizing fallback ran seen.count() — a second full corpus
    // pass before the bloom build (VERDICT r4 #6); with expectedItems
    // supplied, constructing the stream must launch at most the single
    // bloom-build job
    val seen = Seq((1L, "seen-A"), (2L, "seen-B")).toDF("doc_id", "text")
    val stream = MemoryStream[StreamingDedup.IdDocEvent]
    val src = stream.toDS()
      .select(col("docId").as("doc_id"),
        timestamp_millis(col("timeStampMs")).as("event_time"), col("text"))
    def countJobs(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // give the listener bus time to drain before counting
        var waited = 0
        while (jobs.get() < 1 && waited < 20) { Thread.sleep(50); waited += 1 }
        Thread.sleep(250)
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // control: jobs a bare bloom build launches (2 on Spark 4)
    val bloomOnly = countJobs {
      seen.select(md5(col("text")).as("__h")).stat.bloomFilter("__h", 2L, 0.01); ()
    }
    val construction = countJobs {
      StreamingDedup.novelWithinWatermark(src, seen, "event_time", expectedItems = 2L); ()
    }
    // + the hash-distinct materialization (distinct + checkpoint jobs) that
    // both the bloom and the verify join's static side read — the CONSTANT
    // build cost that replaces a per-micro-batch corpus re-scan (and the
    // former auto-size count())
    assert(construction <= bloomOnly + 2,
      s"constructing the stream must launch only the materialize + bloom jobs (<= ${bloomOnly + 2}), saw $construction")
    // and the auto-size fallback is gone: expectedItems is required
    intercept[IllegalArgumentException] {
      StreamingDedup.novelWithinWatermark(src, seen, "event_time", expectedItems = 0L)
    }
  }

  test("streaming curation: annotate+filter+dedup run as one streaming pipeline") {
    import graft.llm.Curation
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704103200000L
    val good = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val events = Seq(
      StreamingDedup.DocEvent(t0, good),                    // survives
      StreamingDedup.DocEvent(t0 + 1000, good),             // dup → dropped
      StreamingDedup.DocEvent(t0 + 2000, "too short"),      // length drop
      StreamingDedup.DocEvent(t0 + 3000, ("spam " * 40).trim), // repetition drop
      StreamingDedup.DocEvent(t0 + 4000, "el la de que y en los del las por dias")) // survives
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDedup.DocEvent]
    val src = stream.toDS()
      .select(timestamp_millis(col("timeStampMs")).as("event_time"), col("text"))
    val query = Curation.curateStream(src, "event_time")
      .select("text")
      .writeStream.outputMode("append").format("memory").queryName("graft_curate_stream")
      .start()
    try {
      stream.addData(events.take(2))
      query.processAllAvailable()
      stream.addData(events.drop(2))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("graft_curate_stream").as[String].collect().toSet
    assert(out == Set(good, "el la de que y en los del las por dias"), s"got $out")
  }

  test("streaming curation with LM-fluency and decontamination stages (broadcast kernels)") {
    import graft.llm.{CorpusStats, Curation}
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704103200000L
    val inDomain = "the cat sat on the mat and the dog lay by the door all day long"
    // fluent under the LM (same vocabulary) but with NO 3-gram shared with
    // inDomain (scrambled order): the streamed copy must fall to
    // decontamination, not fluency, and inDomain must stay clean
    val evalText = "mat the cat the dog the door sat on lay by day all"
    val oov = "zx qy wv ut sr qp on ml kj ih gf ed cb az yx wv ut sr"
    val lm = CorpusStats.unigramLm(Seq((1L, inDomain)).toDF("doc_id", "text"))
    val evalDocs = Seq((9L, evalText)).toDF("doc_id", "text")
    val events = Seq(
      StreamingDedup.DocEvent(t0, inDomain),          // fluent, clean → survives
      StreamingDedup.DocEvent(t0 + 1000, oov),        // all-OOV → fluency drop
      StreamingDedup.DocEvent(t0 + 2000, evalText))   // eval overlap → decon drop
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDedup.DocEvent]
    val src = stream.toDS()
      .select(timestamp_millis(col("timeStampMs")).as("event_time"), col("text"))
    val cfg = Curation.Config(minQuality = 0.0,
      maxBitsPerToken = Some(4.5), maxContamination = Some(0.5))
    val query = Curation.curateStream(src, "event_time", cfg,
        lm = Some(lm), evalDocs = Some(evalDocs))
      .select("text")
      .writeStream.outputMode("append").format("memory").queryName("graft_curate_stream_lm")
      .start()
    try {
      stream.addData(events)
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("graft_curate_stream_lm").as[String].collect().toSet
    assert(out == Set(inDomain), s"got $out")
  }

  test("idempotent handler skips re-delivered batches (ST2)") {
    var applied = 0
    val h = new MicroBatchPipeline.IdempotentBatchHandler((_, _) => applied += 1)
    val df = Seq(1).toDF("x")
    h(df, 0L); h(df, 1L); h(df, 1L); h(df, 0L)
    assert(applied == 2)
    assert(h.lastBatch == 1L)
  }

  test("liveness listener: healthy within bound, unhealthy beyond (ST6)") {
    val l = new LivenessListener(maxAgeMs = 300000)
    assert(!l.isHealthy()) // nothing observed yet
    val now = System.currentTimeMillis()
    l.observe(now - 100000)
    assert(l.isHealthy(now))
    assert(!l.isHealthy(now + 400000))
  }

  test("liveness HTTP endpoint serves the block-age verdict (ST6, consumer.rs:33-46)") {
    import graft.streaming.LivenessServer
    def get(port: Int): (Int, String) = {
      val conn = java.net.URI.create(s"http://127.0.0.1:$port/health").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(5000); conn.setReadTimeout(5000)
      val code = conn.getResponseCode
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      in.close(); conn.disconnect()
      (code, body)
    }
    val l = new LivenessListener(maxAgeMs = 300000)
    val srv = new LivenessServer(l, port = 0, host = "127.0.0.1")
    try {
      // nothing observed yet → unhealthy, 503, age unknown
      val (c0, b0) = get(srv.boundPort)
      assert(c0 == 503 && b0.contains("\"healthy\":false") && b0.contains("\"age_ms\":-1"), s"$c0 $b0")
      // fresh block → healthy, 200, age reported
      val t = System.currentTimeMillis() - 100000
      l.observe(t)
      val (c1, b1) = get(srv.boundPort)
      assert(c1 == 200 && b1.contains("\"healthy\":true")
        && b1.contains(s""""last_block_ms":$t"""), s"$c1 $b1")
      // stale block → unhealthy again
      val stale = new LivenessListener(maxAgeMs = 1L)
      stale.observe(System.currentTimeMillis() - 10000)
      val srv2 = new LivenessServer(stale, port = 0, host = "127.0.0.1")
      try {
        val (c2, b2) = get(srv2.boundPort)
        assert(c2 == 503 && b2.contains("\"healthy\":false"), s"$c2 $b2")
      } finally srv2.close()
    } finally srv.close()
  }

  test("streaming sessionization equals the batch operator (ST13)") {
    import graft.streaming.StreamingSessionize
    import graft.streaming.StreamingSessionize.SessEvent
    val base = 1704067200000000L
    // three users, gaps straddling the threshold, ties, cross-chunk
    // session continuation (chunk = 3 splits user 1's first session)
    val events = Seq(
      SessEvent(1, 1, base),
      SessEvent(2, 1, base + 60L * 1000000),
      SessEvent(3, 2, base),
      SessEvent(4, 1, base + 120L * 1000000), // same session, next chunk
      SessEvent(5, 1, base + 120L * 1000000 + 1801L * 1000000), // new session
      SessEvent(6, 2, base + 1800L * 1000000), // exactly the gap: SAME session
      SessEvent(7, 3, base))
    val got = StreamingSessionize.replay(spark, events, chunk = 3, gapSeconds = 1800L)
      .select("user_id", "session_idx", "session_start_us", "session_end_us",
        "n_events", "min_event_id", "max_event_id", "duration_us")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // the batch operator over the same events is the reference
    val batchIn = events.map(e =>
      (e.eventId, e.userId, new java.sql.Timestamp(e.tsUs / 1000))).toDF("event_id", "user_id", "ts")
    val want = graft.operators.Sessionize.summarize(batchIn, gapSeconds = 1800L)
      .select("user_id", "session_idx", "session_start_us", "session_end_us",
        "n_events", "min_event_id", "max_event_id", "duration_us")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want, s"stream=$got batch=$want")
    assert(got.size == 4) // u1: 2 sessions, u2: 1 (gap == threshold kept), u3: 1
    // out-of-order arrival INSIDE a micro-batch is re-sorted per key
    val scrambled = Seq(events(1), events(0), events(4), events(3), events(2), events(5), events(6))
    val got2 = StreamingSessionize.replay(spark, scrambled, chunk = 100, gapSeconds = 1800L)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == want.map(t => (t._1, t._2, t._5)))
  }

  test("streaming as-of enrichment equals the batch operator (ST14)") {
    import graft.streaming.StreamingAsof
    import graft.streaming.StreamingAsof.AsofEvent
    def ref(uid: Long, ts: Long, refId: Long) = AsofEvent(0L, uid, ts, 0, refId)
    def probe(id: Long, uid: Long, ts: Long) = AsofEvent(id, uid, ts, 1, 0L)
    // the batch semantics table, replayed with chunk = 2 so every
    // interesting transition crosses a micro-batch boundary: cross-batch
    // state carry, inclusive equal-ts, dup-ts MAX payload, no-ref key
    val events = Seq(
      probe(1, 1, 100),             // before any ref -> null
      ref(1, 200, 20),
      probe(2, 1, 200),             // equal ts: ref visible (inclusive)
      ref(1, 300, 31), ref(1, 300, 30), // dup ts -> MAX payload (31)
      probe(3, 1, 250),             // between refs -> 20 (carry from batch 1)
      probe(4, 1, 300),             // at the dup ts -> 31
      ref(2, 400, 40),
      probe(5, 2, 500),             // second key: independent state -> 40
      probe(6, 2, 600),             // -> 40, state carried across batches
      probe(7, 1, 9999)             // far future -> still 31
    ).sortBy(e => (e.tsUs, e.side, e.refId))
    val got = StreamingAsof.replay(spark, events, chunk = 2)
      .select("event_id", "ref_id")
      .as[(Long, Option[Long])].collect().toMap
    val batchProbe = events.filter(_.side == 1)
      .map(e => (e.eventId, e.userId, e.tsUs)).toDF("event_id", "user_id", "us")
    val batchRef = events.filter(_.side == 0)
      .map(e => (e.userId, e.tsUs, e.refId)).toDF("user_id", "us", "ref_id")
    val want = graft.operators.AsofJoin.backward(batchProbe, batchRef, Seq("user_id"), "us", Seq("ref_id"))
      .select("event_id", "ref_id").as[(Long, Option[Long])].collect().toMap
    assert(got == want, s"stream=$got batch=$want")
    assert(got == Map(1L -> None, 2L -> Some(20L), 3L -> Some(20L),
      4L -> Some(31L), 5L -> Some(40L), 6L -> Some(40L), 7L -> Some(31L)))
  }

  test("stream-stream join drops late rows AND counts them (dropped_late observability)") {
    import graft.streaming.StreamStreamJoin
    import graft.streaming.StreamStreamJoin.{ClickEvent, ViewEvent}
    val t0 = 1704100000L * 1000000L
    val h2 = 2L * 3600L * 1000000L
    // chunk=1 → one event per micro-batch. Batch 0 carries the view and a
    // click at t0+2h, advancing BOTH watermarks (global = min = t0+2h);
    // batch 1 delivers a click back at t0 — 2h behind the watermark — which
    // the join must DROP and the replay must COUNT (VERDICT r12 #8: the
    // drop was previously silent).
    val views = Seq(ViewEvent(1L, 10L, t0 + h2))
    val clicks = Seq(ClickEvent(100L, 10L, t0 + h2), ClickEvent(101L, 10L, t0))
    val (joined, dropped) = StreamStreamJoin.replayCounted(
      spark, views, clicks, windowUs = 1800L * 1000000L, chunk = 1)
    val rows = joined.select("event_id", "ref_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 100L)), s"got $rows")
    assert(dropped == 1L, s"late click must be counted as dropped, got $dropped")
    // control: the same events replayed in EVENT-TIME order drop nothing
    // and the late click joins normally
    val (j2, d2) = StreamStreamJoin.replayCounted(
      spark, views, clicks.sortBy(_.refTsUs), windowUs = 1800L * 1000000L, chunk = 1)
    assert(d2 == 0L)
    assert(j2.select("event_id", "ref_id").as[(Long, Long)].collect().toSet == Set((1L, 100L)))
  }

  test("stream-stream FULL outer emits unmatched rows from both sides exactly once") {
    import graft.streaming.StreamStreamJoin
    import graft.streaming.StreamStreamJoin.{ClickEvent, ViewEvent}
    val t0 = 1704100000L * 1000000L
    val m10 = 10L * 60L * 1000000L
    // view 1 matches click 100; view 2 has no click in window; click 101
    // (3 days later, different user) matches nothing
    val views = Seq(ViewEvent(1L, 10L, t0 + m10), ViewEvent(2L, 11L, t0 + m10))
    val clicks = Seq(ClickEvent(100L, 10L, t0), ClickEvent(101L, 12L, t0 + 3L * 86400L * 1000000L))
    val (joined, dropped) = StreamStreamJoin.replayCounted(
      spark, views, clicks, windowUs = 1800L * 1000000L, chunk = 10, joinType = "fullOuter")
    assert(dropped == 0L)
    val rows = joined
      .select(col("event_id"), col("ref_id"))
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), Option(r.get(1)).map(_.asInstanceOf[Long])))
      .toSet
    assert(rows == Set(
      (Some(1L), Some(100L)),  // matched
      (Some(2L), None),        // unmatched view
      (None, Some(101L))),     // unmatched click
      s"got $rows")
  }

  test("stream-stream join state is window-bounded: old rows evict, peak > final") {
    import graft.streaming.StreamStreamJoin
    import graft.streaming.StreamStreamJoin.{ClickEvent, ViewEvent}
    val t0 = 1704100000L * 1000000L
    val h1 = 3600L * 1000000L
    // 40 view/click pairs, one per hour — far wider apart than the 30 min
    // join window, so state committed at hour N must have evicted rows
    // from hours < N-1; a state store that retained history would report
    // final ≈ total rows fed. chunk=2 feeds one (view, click) pair per
    // trigger: the watermark advances every batch and evictions happen
    // continuously, the fixed-rate shape the ScaleBench row measures.
    val views = (0 until 40).map(i => ViewEvent(i.toLong, 10L, t0 + i * h1))
    val clicks = (0 until 40).map(i => ClickEvent(100L + i, 10L, t0 + i * h1))
    val (joined, stats) = StreamStreamJoin.replayMeasured(
      spark,
      views, clicks, windowUs = 1800L * 1000000L, chunk = 1)
    // each click lands exactly at its view's timestamp → 40 matches
    assert(joined.count() == 40L)
    assert(stats.droppedLate == 0L)
    assert(stats.batches >= 40L, s"chunk=1 over 40 pairs must take >=40 batches, got ${stats.batches}")
    // the state claim: resident rows never approached the 80 fed rows,
    // and the final commit holds only the last window's worth
    assert(stats.stateRowsPeak < 20L,
      s"peak state ${stats.stateRowsPeak} should be a few in-window rows, not history")
    assert(stats.stateRowsFinal <= stats.stateRowsPeak)
    // replayCounted delegates to the same implementation
    val (j2, d2) = StreamStreamJoin.replayCounted(
      spark, views, clicks, windowUs = 1800L * 1000000L, chunk = 1)
    assert(d2 == 0L && j2.count() == 40L)
  }
}
