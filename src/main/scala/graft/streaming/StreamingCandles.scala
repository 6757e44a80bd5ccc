package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}

import graft.operators.Candles
import graft.schema.ReferenceSchemas

/** Streaming-NATIVE minute-candle maintenance — the reference recomputes
  * candles per ingest batch from the first affected minute (`pg.rs:660-678`);
  * these are the two idiomatic Structured-Streaming expressions of the same
  * aggregation, for deployments where candles should be maintained by the
  * streaming engine's state store instead of the fold's MERGE
  * ([[graft.operators.Candles.recomputeSince]]):
  *
  *  1. [[minuteCandles]] — declarative: event-time watermark + 1-minute
  *     windowed aggregation over exactly [[Candles.minuteAggs]]. Late trades
  *     within the watermark update their candle; state for closed minutes is
  *     evicted by the watermark, so executor state is bounded by
  *     (watermark horizon × live pairs) regardless of stream length — the
  *     100 TB-safe shape. Run in `update` mode (emit refreshed candles per
  *     trigger) or `append` (emit each candle once, finalized).
  *  2. [[statefulMinuteCandles]] — imperative custom state via
  *     `KeyValueGroupedDataset.mapGroupsWithState`, for semantics a windowed
  *     agg cannot express (e.g. conditional resets). Carries (value, uid)
  *     argmin/argmax state for open/close exactly like the salted batch path.
  *
  * Both produce rows definitionally identical to the batch
  * [[Candles.minuteCandles]] — pinned by StreamingSpec parity tests and the
  * st7/st8 oracle queries.
  */
object StreamingCandles {

  private val money = ReferenceSchemas.money

  /** Watermark + windowed aggregation (shape 1). `trades` must carry the
    * candle input contract columns (time_stamp, uid, height, sender,
    * amount_asset_id, price_asset_id, amount, price[, tx_version]). */
  def minuteCandles(
      trades: DataFrame,
      decimals: Option[DataFrame] = None,
      watermarkDelay: String = "10 minutes"): DataFrame =
    Candles.pricedTrades(trades.withWatermark("time_stamp", watermarkDelay), decimals)
      .select(col("time_stamp"),
        col("amount_asset_id"), col("price_asset_id"),
        col("sender").as("matcher_address"),
        col("uid"), col("height"),
        col("amount").cast(money).as("__amount"),
        col("__price"))
      .groupBy(window(col("time_stamp"), "1 minute"),
        col("amount_asset_id"), col("price_asset_id"), col("matcher_address"))
      .agg(Candles.minuteAggs.head, Candles.minuteAggs.tail: _*)
      .withColumn("time_start", col("window.start"))
      .withColumn("interval", lit("1m"))
      .select(ReferenceSchemas.candles.fieldNames.map(col).toIndexedSeq: _*)

  /** [[minuteCandles]] with the time-window struct kept (column `window`) —
    * the chainable form that [[ladderStream]] re-aggregates. */
  def minuteCandlesWindowed(
      trades: DataFrame,
      decimals: Option[DataFrame] = None,
      watermarkDelay: String = "10 minutes"): DataFrame =
    Candles.pricedTrades(trades.withWatermark("time_stamp", watermarkDelay), decimals)
      .select(col("time_stamp"),
        col("amount_asset_id"), col("price_asset_id"),
        col("sender").as("matcher_address"),
        col("uid"), col("height"),
        col("amount").cast(money).as("__amount"),
        col("__price"))
      .groupBy(window(col("time_stamp"), "1 minute"),
        col("amount_asset_id"), col("price_asset_id"), col("matcher_address"))
      .agg(Candles.minuteAggs.head, Candles.minuteAggs.tail: _*)

  /** Chained stateful ladder edge — the streaming analog of
    * [[graft.operators.Candles.ladderStep]]: re-aggregate the (append-mode)
    * windowed candles into a coarser fixed-width interval, grouping on
    * `window(window_time(window), dst)`. Spark ≥3.4 runs multiple stateful
    * aggregations in one append-mode query exactly for this shape; each
    * level's state evicts by the same watermark. Calendar intervals (1w/1M)
    * stay batch-side — `window()` cannot express them; the fold's
    * incremental MERGE remains their path. */
  def ladderStream(windowedCandles: DataFrame, dst: String): DataFrame = {
    val secs = graft.functions.CandleIntervals.seconds.getOrElse(dst,
      throw new IllegalArgumentException(s"ladderStream supports fixed-width intervals only, got $dst"))
    windowedCandles
      .groupBy(window(window_time(col("window")), s"$secs seconds"),
        col("amount_asset_id"), col("price_asset_id"), col("matcher_address"))
      .agg(
        min(col("low")).as("low"),
        max(col("high")).as("high"),
        sum(col("volume")).cast(money).as("volume"),
        sum(col("quote_volume")).cast(money).as("quote_volume"),
        max(col("max_height")).as("max_height"),
        sum(col("txs_count")).cast("int").as("txs_count"),
        floor(sum(col("weighted_average_price") * col("volume")) / sum(col("volume")))
          .cast(money).as("weighted_average_price"),
        min_by(col("open"), col("window.start")).as("open"),
        max_by(col("close"), col("window.start")).as("close"))
      .withColumn("time_start", col("window.start"))
      .withColumn("interval", lit(dst))
      .select(ReferenceSchemas.candles.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Typed trade event for the stateful path and the replay harness. */
  final case class TradeEvent(
      uid: Long, timeStampMs: Long,
      amountAssetId: String, priceAssetId: String, sender: String,
      height: Int, amount: Long, price: BigDecimal)

  /** Running per-candle state: argmin/argmax carry their uid so open/close
    * stay deterministic across arrival order, as in the batch/salted paths. */
  final case class CandleAgg(
      openUid: Long, open: BigDecimal, closeUid: Long, close: BigDecimal,
      low: BigDecimal, high: BigDecimal,
      volume: BigDecimal, quoteVolume: BigDecimal,
      maxHeight: Int, txsCount: Int)

  final case class CandleRow(
      time_start_ms: Long, amount_asset_id: String, price_asset_id: String,
      matcher_address: String,
      low: BigDecimal, high: BigDecimal, volume: BigDecimal,
      quote_volume: BigDecimal, max_height: Int, txs_count: Int,
      weighted_average_price: BigDecimal,
      open: BigDecimal, close: BigDecimal)

  private def step(a: CandleAgg, t: TradeEvent): CandleAgg = {
    val amt = BigDecimal(t.amount)
    val qv = amt * t.price
    if (a == null)
      CandleAgg(t.uid, t.price, t.uid, t.price, t.price, t.price, amt, qv, t.height, 1)
    else {
      val (ou, o) = if (t.uid < a.openUid) (t.uid, t.price) else (a.openUid, a.open)
      val (cu, c) = if (t.uid > a.closeUid) (t.uid, t.price) else (a.closeUid, a.close)
      CandleAgg(ou, o, cu, c,
        a.low.min(t.price), a.high.max(t.price),
        a.volume + amt, a.quoteVolume + qv,
        math.max(a.maxHeight, t.height), a.txsCount + 1)
    }
  }

  /** mapGroupsWithState candle maintenance (shape 2): one state entry per
    * (minute, pair, matcher), updated incrementally, re-emitted on every
    * trigger that touches the group (run the query in `update` mode).
    * weighted_average_price = floor(Σ amount·price / Σ amount), re-derived
    * from the combined sums exactly as the salted batch phase 2 does. */
  def statefulMinuteCandles(trades: Dataset[TradeEvent]): Dataset[CandleRow] = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .groupByKey(t => (t.timeStampMs / 60000 * 60000, t.amountAssetId, t.priceAssetId, t.sender))
      .mapGroupsWithState[CandleAgg, CandleRow](GroupStateTimeout.NoTimeout) {
        case ((minuteMs, a, p, m), rows, state) =>
          val agg = rows.foldLeft(state.getOption.orNull)(step)
          state.update(agg)
          CandleRow(minuteMs, a, p, m,
            agg.low, agg.high, agg.volume, agg.quoteVolume,
            agg.maxHeight, agg.txsCount,
            (agg.quoteVolume / agg.volume).setScale(0, BigDecimal.RoundingMode.FLOOR),
            agg.open, agg.close)
      }
  }

  // ---------------------------------------------------------------- replay
  // Bounded deterministic harnesses (≙ StreamReplay): drive the streaming
  // aggregations with a real MemoryStream query and return the final candle
  // set as a batch frame — how the st7/st8 gate queries run them.

  private val seq = new AtomicInteger()

  /** Run `body` with a reduced shuffle-partition count: a streaming query
    * snapshots the conf at start, and each micro-batch writes one state
    * file per state partition — 32 partitions for a bounded replay is pure
    * fixed cost (the production query keeps the session default). */
  private def withReplayPartitions[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "4")
    try body finally spark.conf.set(key, prev)
  }

  private[graft] def tradeFrame(stream: MemoryStream[TradeEvent]): DataFrame =
    stream.toDS().select(
      col("uid"),
      timestamp_millis(col("timeStampMs")).as("time_stamp"),
      col("amountAssetId").as("amount_asset_id"),
      col("priceAssetId").as("price_asset_id"),
      col("sender"), col("height"), col("amount"), col("price"))

  /** Replay `trades` through the windowed aggregation in `chunk`-sized
    * micro-batches; complete-mode memory sink so the final table IS the
    * final candle set (the bounded-replay analog of update mode — a
    * watermark cannot finalize the tail of a finite stream). */
  def replayMinute(spark: SparkSession, trades: Seq[TradeEvent], chunk: Int): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[TradeEvent]
    val name = s"graft_stream_candles_${seq.incrementAndGet()}"
    withReplayPartitions(spark) {
      val query = minuteCandles(tradeFrame(stream)).writeStream
        .outputMode("complete").format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(10L))
        .start()
      try {
        trades.grouped(chunk).foreach { g => stream.addData(g); query.processAllAvailable() }
      } finally query.stop()
    }
    spark.table(name)
  }

  /** Replay `trades` through the CHAINED stateful ladder (1-minute windowed
    * candles re-aggregated to `dst`) in APPEND mode — the ST10 gate form of
    * the multiple-stateful-aggregation pipeline. Events are replayed in
    * event-time order (so a 0-second watermark never drops a late chunk)
    * and a far-future sentinel trade advances the watermark past every real
    * window at the end: append mode emits each `dst` candle exactly once,
    * finalized; the sentinel's own window never closes, so it is absent
    * from the output. */
  def replayLadder(
      spark: SparkSession,
      trades: Seq[TradeEvent],
      chunk: Int,
      dst: String): DataFrame = {
    require(trades.nonEmpty, "replayLadder needs at least one trade")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[TradeEvent]
    val name = s"graft_stream_ladder_${seq.incrementAndGet()}"
    val sorted = trades.sortBy(t => (t.timeStampMs, t.uid))
    val sentinel = TradeEvent(Long.MaxValue, sorted.last.timeStampMs + 30L * 86400000L,
      sorted.head.amountAssetId, sorted.head.priceAssetId, sorted.head.sender,
      sorted.head.height, 1L, sorted.head.price)
    withReplayPartitions(spark) {
      val ladder = ladderStream(
        minuteCandlesWindowed(tradeFrame(stream), watermarkDelay = "0 seconds"), dst)
      val query = ladder.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(10L))
        .start()
      try {
        sorted.grouped(chunk).foreach { g => stream.addData(g); query.processAllAvailable() }
        stream.addData(Seq(sentinel))
        query.processAllAvailable()
      } finally query.stop()
    }
    spark.table(name)
  }

  /** Replay through [[statefulMinuteCandles]] (update mode): per-key
    * last-write-wins over the emitted updates is the final candle set. */
  def replayStateful(spark: SparkSession, trades: Seq[TradeEvent], chunk: Int): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[TradeEvent]
    val latest = new java.util.concurrent.ConcurrentHashMap[(Long, String, String, String), CandleRow]()
    withReplayPartitions(spark) {
      val query = statefulMinuteCandles(stream.toDS()).writeStream
        .outputMode("update")
        .foreachBatch { (df: Dataset[CandleRow], _: Long) =>
          df.collect().foreach { r =>
            latest.put((r.time_start_ms, r.amount_asset_id, r.price_asset_id, r.matcher_address), r)
          }; ()
        }
        .trigger(Trigger.ProcessingTime(10L))
        .start()
      try {
        trades.grouped(chunk).foreach { g => stream.addData(g); query.processAllAvailable() }
      } finally query.stop()
    }
    import scala.jdk.CollectionConverters._
    latest.values.asScala.toSeq.toDS().toDF()
  }
}
