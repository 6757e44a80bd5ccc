package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Candles, Pipeline, Scd2, Views}
import graft.schema.ReferenceSchemas.MaxUid
import graft.sources.Tables
import graft.sources.Tables.epochSecs

/** Aggregation / window / sort / scalar-function / streaming-semantics
  * queries (SURVEY.md §2.4-§2.8). The candle queries run the real
  * [[graft.operators.Candles]] engine over the exchange-trades mapping of
  * `events`; their oracles transliterate `pg.rs:680-815` as DuckDB CTEs. */
object AggQueries {

  /** [[Tables.trades]] round-robined across the session's shuffle-partition
    * knob right after the read: the fixture parquet is one row group = ONE
    * scan task (guide §2.5, unsplittable input), so the trades projection
    * and the partial minute aggregation above it ran single-core. Used by
    * the kernel-heavy candle gates; results are partitioning-invariant
    * (decimal/long aggregates, total-order output sorts). */
  private def tradesPar(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.parallelizeKernelInput(Tables.trades(s, dir))

  /** Synthetic `assets`-view inputs derived from events — (asset_updates,
    * asset_tickers, asset_origins, waves_data), shared by the view_assets
    * DataFrame gate and its spark.sql catalog twin (sql_view_assets) so the
    * two gates can only differ in the FRONT DOOR, never the data. */
  private def assetViewInputs(s: org.apache.spark.sql.SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir)
    val au = Scd2.linkBatch(ev.select(
      concat(lit("U"), col("user_id").cast("string")).as("asset_id"),
      col("event_id").as("uid"),
      col("event_id").as("block_uid"),
      (col("user_id") % 9).cast("short").as("decimals"),
      concat(lit("N"), col("user_id").cast("string")).as("name"),
      lit("").as("description"),
      (col("user_id") % 2 === 0).as("reissuable"),
      (col("user_id") * 1000).as("volume"),
      when(col("user_id") % 3 === 0, lit("base64:AA==")).otherwise(lit(null).cast("string")).as("script"),
      lit(null).cast("long").as("sponsorship"),
      lit(false).as("nft")),
      key = "asset_id", uidCol = "uid")
    val tickers = ev.filter(col("event_type") === "click").select(
      col("event_id").as("uid"),
      concat(lit("U"), col("user_id").cast("string")).as("asset_id"),
      concat(lit("T"), col("user_id").cast("string")).as("ticker"))
    val origins = ev.groupBy(concat(lit("U"), col("user_id").cast("string")).as("asset_id"))
      .agg(min("event_id").as("first_asset_update_uid"),
        min("event_id").cast("string").as("origin_transaction_id"),
        first(concat(lit("I"), col("user_id").cast("string"))).as("issuer"),
        min(col("user_id")).cast("int").as("issue_height"),
        min(col("ts").cast("timestamp")).as("issue_time_stamp"))
    val wavesData = ev.select(
      col("user_id").cast("int").as("height"),
      (lit(100000000L) + col("user_id")).cast("decimal(38,0)").as("quantity"))
    (au, tickers, origins, wavesData)
  }

  // ---------- candle oracle SQL (CTE-chain transliteration) ----------

  /** Minute-candle CTE ≙ `calculate_minute_candles` (`pg.rs:680-738`),
    * bucketed on epoch seconds. */
  private def c1mCte(where: String = ""): String =
    s"""c1m AS (
       |  SELECT CAST(epoch(date_trunc('minute', time_stamp)) AS BIGINT) AS ts_1m,
       |    amount_asset_id, price_asset_id, sender AS matcher_address,
       |    min(price) AS low, max(price) AS high,
       |    sum(amount) AS volume, sum(amount * price) AS quote_volume,
       |    max(height) AS max_height, count(price) AS txs_count,
       |    floor(sum(amount * price) / sum(amount)) AS wap,
       |    min_by(price, uid) AS open, max_by(close_src, uid) AS close
       |  FROM (SELECT t.*, price AS close_src FROM trades t $where)
       |  GROUP BY 1, 2, 3, 4)""".stripMargin

  /** Calendar-bucket ladder edge (1d→1w / 1d→1M): DuckDB `date_trunc` over a
    * naive timestamp rebuilt from the epoch key (TZ-independent). */
  private def ladderCteCalendar(src: String, dst: String, trunc: String): String =
    s"""c$dst AS (
       |  SELECT CAST(epoch(date_trunc('$trunc', make_timestamp(ts_$src * 1000000))) AS BIGINT) AS ts_$dst,
       |    amount_asset_id, price_asset_id, matcher_address,
       |    min(low) AS low, max(high) AS high,
       |    sum(volume) AS volume, sum(quote_volume) AS quote_volume,
       |    max(max_height) AS max_height, sum(txs_count) AS txs_count,
       |    floor(sum(wap * volume) / sum(volume)) AS wap,
       |    min_by(open, ts_$src) AS open, max_by(close, ts_$src) AS close
       |  FROM c$src GROUP BY 1, 2, 3, 4)""".stripMargin

  /** Ladder-edge CTE ≙ `calculate_non_minute_candles` (`pg.rs:740-815`). */
  private def ladderCte(src: String, dst: String, secs: Long): String =
    s"""c$dst AS (
       |  SELECT CAST(floor(ts_$src / $secs) * $secs AS BIGINT) AS ts_$dst,
       |    amount_asset_id, price_asset_id, matcher_address,
       |    min(low) AS low, max(high) AS high,
       |    sum(volume) AS volume, sum(quote_volume) AS quote_volume,
       |    max(max_height) AS max_height, sum(txs_count) AS txs_count,
       |    floor(sum(wap * volume) / sum(volume)) AS wap,
       |    min_by(open, ts_$src) AS open, max_by(close, ts_$src) AS close
       |  FROM c$src GROUP BY 1, 2, 3, 4)""".stripMargin

  private def candleSelect(ts: String): String =
    s"""SELECT $ts AS time_start_epoch, amount_asset_id, price_asset_id, matcher_address,
       |  CAST(low AS DOUBLE) AS low, CAST(high AS DOUBLE) AS high,
       |  CAST(volume AS DOUBLE) AS volume, CAST(quote_volume AS DOUBLE) AS quote_volume,
       |  max_height, CAST(txs_count AS BIGINT) AS txs_count,
       |  CAST(wap AS DOUBLE) AS weighted_average_price,
       |  CAST(open AS DOUBLE) AS open, CAST(close AS DOUBLE) AS close""".stripMargin

  private val orderTail =
    "ORDER BY time_start_epoch, amount_asset_id, price_asset_id, matcher_address"

  /** Oracle-shape projection columns of the library's candle frame. */
  private def candleOutCols: Seq[org.apache.spark.sql.Column] = Seq(
    epochSecs(col("time_start")).as("time_start_epoch"),
    col("amount_asset_id"), col("price_asset_id"), col("matcher_address"),
    col("low").cast("double").as("low"),
    col("high").cast("double").as("high"),
    col("volume").cast("double").as("volume"),
    col("quote_volume").cast("double").as("quote_volume"),
    col("max_height"),
    col("txs_count").cast("long").as("txs_count"),
    col("weighted_average_price").cast("double").as("weighted_average_price"),
    col("open").cast("double").as("open"),
    col("close").cast("double").as("close"))

  /** Spark-side projection of the library's candle frame to the oracle shape. */
  private def candleOut(c: DataFrame): DataFrame =
    c.select(candleOutCols: _*)
      .orderBy("time_start_epoch", "amount_asset_id", "price_asset_id", "matcher_address")

  private def withTrades(body: String): String =
    s"WITH trades AS (${Tables.tradesOracleSql}),\n$body"

  /** o56's written candle-layout path, one write per (session, sf). */
  private val candleLayoutCache = new graft.util.SessionCache[String]

  /** Shared fixture for the chain_fold_* queries: 240 events → three key
    * blocks of exchange txs (every 10th carries an asset state update),
    * folded by the production orchestrator in one batch, then a rollback
    * batch to the second block. All asset/matcher identities are collapsed
    * (empty pair bytes → WAVES, one pk) so the oracle never needs base58.
    * Memoized per (session, dir): the fold is the shared FIXTURE both
    * queries read — its ~40 per-batch materialization jobs (the per-batch
    * COMMIT analog) would otherwise be re-paid by every consumer. */
  private val foldCache = new graft.util.SessionCache[graft.operators.ChainSync.ChainState]()

  private def foldedState(s: org.apache.spark.sql.SparkSession, dir: String): graft.operators.ChainSync.ChainState =
    foldCache.getOrCompute(s, dir)(computeFoldedState(s, dir))

  private def computeFoldedState(s: org.apache.spark.sql.SparkSession, dir: String): graft.operators.ChainSync.ChainState = {
    import graft.convert._
    import graft.operators.ChainSync
    val pk = Array.tabulate[Byte](32)(_.toByte)
    val ids = Tables.events(s, dir).filter(col("event_id") < 240)
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0))
    val txs = ids.map { id =>
      val au =
        if (id % 10 == 0) Seq(RawAssetStateUpdate(
          assetId = s"AS${(id / 10) % 5}".getBytes("UTF-8"), issuer = pk,
          name = s"n$id", description = "", decimals = (id % 9).toShort,
          reissuable = true, nft = false, volume = id * 100))
        else Nil
      (id / 80).toInt -> RawTx(
        id = s"tx$id".getBytes("UTF-8"), txType = 7, senderPublicKey = pk,
        timeStampMs = 1704067200000L + id * 30000, txVersion = Some(2),
        order1 = Some(RawOrder(id = s"o$id".getBytes("UTF-8"), version = 1)),
        order2 = Some(RawOrder(id = s"p$id".getBytes("UTF-8"), version = 1, orderSide = 1)),
        amount = Some(id % 50 + 1), price = Some(id % 90 + 10),
        amountAssetId = Some(Array.emptyByteArray), priceAssetId = Some(Array.emptyByteArray),
        buyMatcherFee = Some(0L), sellMatcherFee = Some(0L),
        feeAssetId = Some(Array.emptyByteArray),
        assetStateUpdates = au)
    }
    val blocks = txs.groupBy(_._1).toSeq.sortBy(_._1).map { case (h, m) =>
      RawBlock(s"b$h", 100 + h, Some(1704067200000L + h * 1000L), None, m.map(_._2).toSeq)
    }
    val appended = ChainSync.handleUpdates(s, ChainSync.emptyState(s), blocks)
    // round-trip through the durable table-store form between the two
    // batches: the gate then also proves persist/load resume correctness
    val stateDir = java.nio.file.Files.createTempDirectory("graft-fold-state-").toString
    ChainSync.persist(appended, stateDir)
    ChainSync.handleUpdates(s, ChainSync.load(s, stateDir), Seq(RawRollback("b1")))
  }

  /** Second fold fixture for the END-USER slice gate (sql_pair_ohlcv,
    * SURVEY §7.2): 720 events → nine key blocks of exchange txs over TWO
    * pairs — even event_id trades the queried pair (asset AS0 amount /
    * WAVES price), odd trades WAVES/WAVES — with tx_version=3 on every
    * third tx so the v3 decimal price rescale (pg.rs:708-713) is LIVE
    * through the fold: AS0 is issued with decimals=2 by the first tx's
    * asset state update, WAVES is 8, so v3 prices on the queried pair
    * scale by 10^(8-2)=10^6 via the decimals view the fold now feeds to
    * the candle recompute. A rollback to b6 then drops the last two
    * blocks, so the served candles are post-correction state. */
  private val pairFoldCache = new graft.util.SessionCache[graft.operators.ChainSync.ChainState]()

  private def pairFoldedState(s: org.apache.spark.sql.SparkSession, dir: String): graft.operators.ChainSync.ChainState =
    pairFoldCache.getOrCompute(s, dir)(computePairFoldedState(s, dir))

  private def computePairFoldedState(s: org.apache.spark.sql.SparkSession, dir: String): graft.operators.ChainSync.ChainState = {
    import graft.convert._
    import graft.operators.ChainSync
    val pk = Array.tabulate[Byte](32)(_.toByte)
    val as0 = "AS0".getBytes("UTF-8")
    val ids = Tables.events(s, dir).filter(col("event_id") < 720)
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0))
    val txs = ids.map { id =>
      val au =
        if (id == 0) Seq(RawAssetStateUpdate(
          assetId = as0, issuer = pk, name = "a0", description = "",
          decimals = 2.toShort, reissuable = true, nft = false, volume = 1000L))
        else Nil
      (id / 80).toInt -> RawTx(
        id = s"tx$id".getBytes("UTF-8"), txType = 7, senderPublicKey = pk,
        timeStampMs = 1704067200000L + id * 30000,
        txVersion = Some(if (id % 3 == 0) 3.toShort else 2.toShort),
        order1 = Some(RawOrder(id = s"o$id".getBytes("UTF-8"), version = 1)),
        order2 = Some(RawOrder(id = s"p$id".getBytes("UTF-8"), version = 1, orderSide = 1)),
        amount = Some(id % 50 + 1), price = Some(id % 90 + 10),
        amountAssetId = Some(if (id % 2 == 0) as0 else Array.emptyByteArray),
        priceAssetId = Some(Array.emptyByteArray),
        buyMatcherFee = Some(0L), sellMatcherFee = Some(0L),
        feeAssetId = Some(Array.emptyByteArray),
        assetStateUpdates = au)
    }
    val blocks = txs.groupBy(_._1).toSeq.sortBy(_._1).map { case (h, m) =>
      RawBlock(s"b$h", 100 + h, Some(1704067200000L + h * 1000L), None, m.map(_._2).toSeq)
    }
    val appended = ChainSync.handleUpdates(s, ChainSync.emptyState(s), blocks)
    ChainSync.handleUpdates(s, appended, Seq(RawRollback("b6")))
  }

  val all: Vector[QueryDef] = Vector(

    // A1 — minute-candle OHLCV aggregation (pg.rs:680-738)
    // tradesPar: the fixture reads as ONE scan task (single parquet row
    // group), so the trades projection + the partial minute agg ran
    // single-core — round-robin the rows across the session's shuffle
    // knob first (guide §2.5: unsplittable input). Candle aggregates are
    // decimal/long (order-exact), so partitioning cannot move the hash.
    QueryDef("a1_candles_minute",
      (s, dir) => candleOut(Candles.minuteCandles(tradesPar(s, dir))),
      Some(withTrades(c1mCte()) + "\n" + candleSelect("ts_1m") + "\nFROM c1m " + orderTail)),

    // A2 — 12-edge ladder re-aggregation to 1h (pg.rs:740-815, candles.rs:39-52)
    QueryDef("a2_candles_1h_ladder",
      (s, dir) => {
        val c1m = Candles.partitionForLadder(Candles.minuteCandles(tradesPar(s, dir)))
        val c5 = Candles.ladderStep(c1m, "1m", "5m")
        val c15 = Candles.ladderStep(c5, "5m", "15m")
        val c30 = Candles.ladderStep(c15, "15m", "30m")
        candleOut(Candles.ladderStep(c30, "30m", "1h"))
      },
      Some(withTrades(Seq(
        c1mCte(),
        ladderCte("1m", "5m", 300),
        ladderCte("5m", "15m", 900),
        ladderCte("15m", "30m", 1800),
        ladderCte("30m", "1h", 3600)).mkString(",\n")) +
        "\n" + candleSelect("ts_1h") + "\nFROM c1h " + orderTail)),

    // O56 — the CANDLE declared-layout read path end-to-end (r11, pairs
    // with o55's fact layout): write 1m + 1h candles interval-partitioned
    // (TableStore.writeCandles, one write per session via SessionCache),
    // then serve the reference's hottest read — one interval, one pair, a
    // time range (pg.rs:760) — through readCandleRange, whose interval
    // equality prunes the partition directory and whose pair/time bounds
    // push to the scan. The oracle recomputes the 1h ladder from raw
    // trades and applies the same filters: the layout round-trip must be
    // invisible to results
    QueryDef("o56_candle_layout_read",
      (s, dir) => {
        import graft.sinks.TableStore
        val path = candleLayoutCache.getOrCompute(s, dir) {
          val tmp = java.nio.file.Files.createTempDirectory("graft-o56").toString
          val c1m = Candles.partitionForLadder(Candles.minuteCandles(Tables.trades(s, dir)))
          val c5 = Candles.ladderStep(c1m, "1m", "5m")
          val c15 = Candles.ladderStep(c5, "5m", "15m")
          val c30 = Candles.ladderStep(c15, "15m", "30m")
          val c1h = Candles.ladderStep(c30, "30m", "1h")
          TableStore.writeCandles(c1m.unionByName(c1h), s"$tmp/candles")
          s"$tmp/candles"
        }
        // Instant-based bounds: Timestamp.valueOf parses in the JVM
        // default timezone, which would shift the read window (and break
        // the UTC-epoch oracle literals 1704672000/1705881600) on a
        // non-UTC host; Timestamp.from(Instant) is TZ-independent
        candleOut(TableStore.readCandleRange(s, path, "1h", "A1", "P2",
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704672000L)),
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1705881600L))))
      },
      Some(withTrades(Seq(
        c1mCte(),
        ladderCte("1m", "5m", 300),
        ladderCte("5m", "15m", 900),
        ladderCte("15m", "30m", 1800),
        ladderCte("30m", "1h", 3600)).mkString(",\n")) +
        "\n" + candleSelect("ts_1h") + "\nFROM c1h " +
        """WHERE amount_asset_id = 'A1' AND price_asset_id = 'P2'
          |  AND ts_1h BETWEEN 1704672000 AND 1705881600
          |""".stripMargin + orderTail)),

    // A2b — full ladder through the calendar buckets (1d→1w, 1d→1M): the
    // non-fixed-width path the reference takes via date_trunc week/month
    // (pg.rs:788-800); runs the engine's complete 13-interval set
    QueryDef("a2b_candles_calendar",
      (s, dir) => {
        // calendarIntervals shares ONE materialized 1m→1d sub-ladder across
        // the 1w and 1M branches (the allIntervals+filter form re-executed
        // the 8-agg chain per branch — a2b's old floor)
        // bare trades here: the repartition variant was measured +0.6 s on
        // this gate (the 9-agg calendar build re-executes per rep and the
        // extra stage outweighs the parallel partial agg — unlike a1/a2)
        val cal = Candles.calendarIntervals(Tables.trades(s, dir))
        cal.select(col("interval") +: candleOutCols: _*)
          .orderBy("interval", "time_start_epoch", "amount_asset_id", "price_asset_id", "matcher_address")
      },
      Some(withTrades((Seq(
        c1mCte(),
        ladderCte("1m", "5m", 300),
        ladderCte("5m", "15m", 900),
        ladderCte("15m", "30m", 1800),
        ladderCte("30m", "1h", 3600),
        ladderCte("1h", "3h", 10800),
        ladderCte("3h", "6h", 21600),
        ladderCte("6h", "12h", 43200),
        ladderCte("12h", "1d", 86400),
        ladderCteCalendar("1d", "1w", "week"),
        // "1mo" not "1M": DuckDB identifiers are case-insensitive, so c1M
        // would collide with the c1m minute CTE
        ladderCteCalendar("1d", "1mo", "month"))).mkString(",\n")) +
        s"""
           |SELECT * FROM (
           |  ${candleSelect("ts_1w").replace("SELECT ", "SELECT '1w' AS interval, ")}
           |  FROM c1w
           |  UNION ALL
           |  ${candleSelect("ts_1mo").replace("SELECT ", "SELECT '1M' AS interval, ")}
           |  FROM c1mo)
           |ORDER BY interval, time_start_epoch, amount_asset_id, price_asset_id, matcher_address""".stripMargin)),

    // A3 — incremental cut-off: recompute only from the first affected
    // minute (pg.rs:660-678)
    QueryDef("a3_candles_incremental",
      (s, dir) => candleOut(Candles.minuteCandles(
        Tables.trades(s, dir),
        since = Some(Timestamp.valueOf("2024-01-10 00:00:00")))),
      Some(withTrades(c1mCte("WHERE time_stamp >= TIMESTAMP '2024-01-10 00:00:00'")) +
        "\n" + candleSelect("ts_1m") + "\nFROM c1m " + orderTail)),

    // A4 — max/min scalar aggregates (pg.rs:70-78, 125-131)
    QueryDef("a4_scalar_minmax",
      (s, dir) => Tables.events(s, dir)
        .agg(max("event_id").as("max_uid"), min("event_id").as("min_uid"),
          max("user_id").as("max_height"), count(lit(1)).as("n")),
      Some("SELECT max(event_id) AS max_uid, min(event_id) AS min_uid, max(user_id) AS max_height, count(*) AS n FROM events")),

    // A5 — dedup-group by key: latest row per entity (mod.rs:614-621)
    QueryDef("a5_latest_per_key",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"), col("value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id AS last_event_id, value FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
             |ORDER BY user_id""".stripMargin)),

    // A6 — count per batch (mod.rs:383-385)
    QueryDef("a6_count_per_group",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("n")).orderBy("event_type"),
      Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type")),

    // O20 — DISTINCT ON via row_number (tickers view, up.sql:432-435)
    QueryDef("o20_distinct_on",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").desc)
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "value")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, value FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) = 1
             |ORDER BY user_id""".stripMargin)),

    // O21 — SCD-2 successor linking via lead() (mod.rs:583-677)
    QueryDef("o21_scd2_lead",
      (s, dir) => Scd2.linkBatch(
        Tables.events(s, dir).select(col("user_id"), col("event_id")),
        key = "user_id", uidCol = "event_id")
        .select("user_id", "event_id", "superseded_by")
        .orderBy("user_id", "event_id"),
      Some(s"""SELECT user_id, event_id,
              |  lead(event_id, 1, ${MaxUid}) OVER (PARTITION BY user_id ORDER BY event_id) AS superseded_by
              |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // O22 — deterministic uid window: height*100000 + idx (convert.rs:45-72)
    QueryDef("o22_uid_window",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("height", floor(epochSecs(col("ts")) / 86400).cast("int"))
        Pipeline.assignTxUids(ev, Seq(col("event_id")))
          .select("event_id", "height", "uid")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, height,
             |  CAST(height AS BIGINT) * 100000 + (row_number() OVER (PARTITION BY height ORDER BY event_id) - 1) AS uid
             |FROM (SELECT event_id, CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS INT) AS height FROM events)
             |ORDER BY event_id""".stripMargin)),

    // O23 — ordered first/last in group via min_by/max_by (pg.rs:695-696)
    QueryDef("o23_first_last",
      (s, dir) => Tables.events(s, dir)
        .groupBy("user_id")
        .agg(min_by(col("value"), col("event_id")).as("first_value"),
          max_by(col("value"), col("event_id")).as("last_value"))
        .orderBy("user_id"),
      Some("""SELECT user_id, min_by(value, event_id) AS first_value, max_by(value, event_id) AS last_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // O24 — top-1 by order (pg.rs:71-77, up.sql:478-481)
    QueryDef("o24_top1",
      (s, dir) => Tables.events(s, dir)
        .orderBy(col("ts").desc)
        .limit(1)
        .select(col("event_id"), epochSecs(col("ts")).as("ts_epoch")),
      Some("SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch FROM events ORDER BY ts DESC LIMIT 1")),

    // O30 — ORDER BY DESC NULLS LAST (up.sql:480)
    QueryDef("o30_sort_nulls_last",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy(col("total").desc_nulls_last, col("c_custkey"))
      },
      Some("""SELECT c_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             |GROUP BY c_custkey ORDER BY total DESC NULLS LAST, c_custkey""".stripMargin)),

    // O31 — distance-ordered sort; after uid the distance is the reference's
    // no-op tiebreaker (pg.rs:715, SURVEY O31)
    QueryDef("o31_distance_sort",
      (s, dir) => {
        val t0 = lit(1704240000L) // 2024-01-03 00:00:00 UTC
        Tables.events(s, dir)
          .filter(epochSecs(col("ts")) >= t0)
          .orderBy(col("event_id"), abs(epochSecs(col("ts")) - t0))
          .limit(100)
          .select("event_id", "user_id")
      },
      Some("""SELECT event_id, user_id FROM events
             |WHERE CAST(floor(epoch(ts)) AS BIGINT) >= 1704240000
             |ORDER BY event_id, abs(CAST(floor(epoch(ts)) AS BIGINT) - 1704240000)
             |LIMIT 100""".stripMargin)),

    // O32 — LIMIT 1
    QueryDef("o32_limit1",
      (s, dir) => Tables.events(s, dir).orderBy("event_id").limit(1).select("event_id", "user_id"),
      Some("SELECT event_id, user_id FROM events ORDER BY event_id LIMIT 1")),

    // O33 — decimals view: UNION ALL with static WAVES row (up.sql:420-430)
    QueryDef("o33_decimals_view",
      (s, dir) => {
        val au = Scd2.linkBatch(
          Tables.events(s, dir).select(
            concat(lit("U"), col("user_id").cast("string")).as("asset_id"),
            col("event_id").as("uid"),
            (col("user_id") % 9).cast("short").as("decimals")),
          key = "asset_id", uidCol = "uid")
        Views.decimals(s, au)
          .select(col("asset_id"), col("decimals").cast("int").as("decimals"))
          .orderBy("asset_id")
      },
      Some("""SELECT 'U' || CAST(user_id AS VARCHAR) AS asset_id, CAST(user_id % 9 AS INT) AS decimals
             |FROM (SELECT DISTINCT user_id FROM events)
             |UNION ALL SELECT 'WAVES', 8
             |ORDER BY asset_id""".stripMargin)),

    // O34 — range generation with sentinel (pg.rs:93-99)
    QueryDef("o34_range_generation",
      (s, dir) => {
        import s.implicits._
        s.range(100, 0, -10).toDF("height")
          .unionByName(Seq(0L).toDF("height"))
          .orderBy(col("height").desc)
      },
      Some("""SELECT CAST(h AS BIGINT) AS height FROM range(100, 0, -10) t(h)
             |UNION ALL SELECT 0
             |ORDER BY height DESC""".stripMargin)),

    // O40 — gaps-and-islands sessionization (30-minute inactivity gap):
    // one user-hash shuffle, per-user windows, rollup reuses the exchange
    // (pinned in PlanShapeSpec); all gap math on unix_micros BIGINTs
    QueryDef("o40_sessionize",
      (s, dir) => graft.operators.Sessionize
        .summarize(Tables.events(s, dir), gapSeconds = 1800L)
        .orderBy("user_id", "session_idx"),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
             |f AS (
             |  SELECT user_id, event_id, us,
             |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS nw
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (
             |  SELECT user_id, event_id, us,
             |    CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
             |  FROM f)
             |SELECT user_id, session_idx,
             |  min(us) AS session_start_us, max(us) AS session_end_us,
             |  count(*) AS n_events,
             |  min(event_id) AS min_event_id, max(event_id) AS max_event_id,
             |  max(us) - min(us) AS duration_us
             |FROM g GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin)),

    // O41 — point-in-time (as-of) join: every view event picks up the
    // LATEST click by the same user at or before it. Union-merge
    // algorithm (one user-hash shuffle + per-key carry-forward window) —
    // no range probe, no nested loop; the oracle replays the identical
    // merge in SQL
    QueryDef("o41_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("us"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("ref_id"))
        graft.operators.AsofJoin.backward(probe, ref, Seq("user_id"), "us", Seq("ref_id"))
          .orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id FROM c
             |  UNION ALL
             |  SELECT user_id, us, 1, event_id, CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    last_value(ref_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ref_id
             |  FROM u)
             |SELECT event_id, user_id, us, ref_id FROM w WHERE side = 1
             |ORDER BY event_id""".stripMargin)),

    // O41b — FORWARD as-of join (pandas merge_asof direction='forward'):
    // first reference at-or-after each probe; probe sorts BEFORE the
    // reference at equal ts (inclusive), first_value over the following
    // frame carries the payload backward. Same single key-hash shuffle
    QueryDef("o41b_asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("us"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("ref_id"))
        graft.operators.AsofJoin.forward(probe, ref, Seq("user_id"), "us", Seq("ref_id"))
          .orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 1 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id FROM c
             |  UNION ALL
             |  SELECT user_id, us, 0, event_id, CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    first_value(ref_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ref_id
             |  FROM u)
             |SELECT event_id, user_id, us, ref_id FROM w WHERE side = 0
             |ORDER BY event_id""".stripMargin)),

    // O41d — backward as-of with a TOLERANCE bound (pandas merge_asof
    // tolerance): matches staler than 1h are nulled — the staleness guard
    // on slowly-updating reference feeds. Same single-shuffle union-merge;
    // the bound is one row-local predicate on the carried match
    QueryDef("o41d_asof_tolerance",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("us"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("ref_id"))
        graft.operators.AsofJoin.backwardWithin(probe, ref, Seq("user_id"), "us",
            Seq("ref_id"), tolerance = 3600L * 1000000L)
          .orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id,
             |    us AS ref_us FROM c
             |  UNION ALL
             |  SELECT user_id, us, 1, event_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    last_value(ref_id IGNORE NULLS) OVER wp AS b_id,
             |    last_value(ref_us IGNORE NULLS) OVER wp AS b_us
             |  FROM u
             |  WINDOW wp AS (PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, us,
             |  CASE WHEN b_id IS NOT NULL AND us - b_us <= 3600000000 THEN b_id END AS ref_id,
             |  CASE WHEN b_id IS NOT NULL AND us - b_us <= 3600000000 THEN b_us END AS asof_ts
             |FROM w WHERE side = 1
             |ORDER BY event_id""".stripMargin)),

    // O41c — NEAREST as-of join (pandas direction='nearest', ties →
    // backward): ONE union, TWO frame windows over the same key-hash sort;
    // the forward window is exclusive at equal ts, exact because distance-0
    // matches already belong to the inclusive backward window. Emits the
    // matched reference timestamp so the distance choice is auditable
    QueryDef("o41c_asof_nearest",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("us"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("ref_id"))
        graft.operators.AsofJoin.nearest(probe, ref, Seq("user_id"), "us", Seq("ref_id"))
          .orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id,
             |    us AS ref_us FROM c
             |  UNION ALL
             |  SELECT user_id, us, 1, event_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    last_value(ref_id IGNORE NULLS) OVER wp AS b_id,
             |    last_value(ref_us IGNORE NULLS) OVER wp AS b_us,
             |    first_value(ref_id IGNORE NULLS) OVER wf AS f_id,
             |    first_value(ref_us IGNORE NULLS) OVER wf AS f_us
             |  FROM u
             |  WINDOW wp AS (PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wf AS (PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT event_id, user_id, us,
             |  CASE WHEN f_id IS NULL THEN b_id WHEN b_id IS NULL THEN f_id
             |       WHEN us - b_us <= f_us - us THEN b_id ELSE f_id END AS ref_id,
             |  CASE WHEN f_id IS NULL THEN b_us WHEN b_id IS NULL THEN f_us
             |       WHEN us - b_us <= f_us - us THEN b_us ELSE f_us END AS asof_ts
             |FROM w WHERE side = 1
             |ORDER BY event_id""".stripMargin)),

    // O41e — time-SLICED backward as-of join: semantics identical to o41
    // (the oracle SQL is o41's verbatim — the gate hash-matches the
    // unsliced operator), but the carry-forward window partitions by
    // (user, 6h-cell) so one hot user's history spreads across cells
    // instead of serializing through a single window task; the cross-cell
    // carry runs over the tiny (user, cell)-level table. The 100 TB skew
    // hatch, proven equivalent on the real fixture here and on a planted
    // 100:1 hot key in SkewSpec
    QueryDef("o41e_asof_sliced",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("us"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("ref_id"))
        graft.operators.AsofJoin.backwardSliced(probe, ref, Seq("user_id"), "us",
            Seq("ref_id"), cellWidth = 6L * 3600L * 1000000L)
          .orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id FROM c
             |  UNION ALL
             |  SELECT user_id, us, 1, event_id, CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    last_value(ref_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ref_id
             |  FROM u)
             |SELECT event_id, user_id, us, ref_id FROM w WHERE side = 1
             |ORDER BY event_id""".stripMargin)),

    // O41f — time-SLICED forward as-of join: semantics identical to o41b
    // (the oracle SQL is o41b's verbatim — the gate hash-matches the
    // unsliced operator), with the (user, 6h-cell) in-cell merge and the
    // BACKWARD-running cell carry (a probe cell takes the earliest ref of
    // the nearest later cell). Completes the skew-hatch family: both
    // as-of directions now have a hot-key path, proven equivalent here
    // and on a planted 100:1 hot key in SkewSpec
    QueryDef("o41f_asof_forward_sliced",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("us"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("ref_id"))
        graft.operators.AsofJoin.forwardSliced(probe, ref, Seq("user_id"), "us",
            Seq("ref_id"), cellWidth = 6L * 3600L * 1000000L)
          .orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 1 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id FROM c
             |  UNION ALL
             |  SELECT user_id, us, 0, event_id, CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    first_value(ref_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ref_id
             |  FROM u)
             |SELECT event_id, user_id, us, ref_id FROM w WHERE side = 0
             |ORDER BY event_id""".stripMargin)),

    // O41g — time-SLICED nearest as-of join (r12, completing the skew-
    // hatch family): semantics identical to o41c (oracle verbatim — the
    // hash IS the equivalence proof). ONE (user, 6h-cell) sort serves
    // both frames, and TWO cross-cell carries (last-earlier / first-later
    // reference) run over the tiny cell table
    QueryDef("o41g_asof_nearest_sliced",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("us"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("ref_id"))
        graft.operators.AsofJoin.nearestSliced(probe, ref, Seq("user_id"), "us",
            Seq("ref_id"), cellWidth = 6L * 3600L * 1000000L)
          .orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id,
             |    us AS ref_us FROM c
             |  UNION ALL
             |  SELECT user_id, us, 1, event_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    last_value(ref_id IGNORE NULLS) OVER wp AS b_id,
             |    last_value(ref_us IGNORE NULLS) OVER wp AS b_us,
             |    first_value(ref_id IGNORE NULLS) OVER wf AS f_id,
             |    first_value(ref_us IGNORE NULLS) OVER wf AS f_us
             |  FROM u
             |  WINDOW wp AS (PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wf AS (PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT event_id, user_id, us,
             |  CASE WHEN f_id IS NULL THEN b_id WHEN b_id IS NULL THEN f_id
             |       WHEN us - b_us <= f_us - us THEN b_id ELSE f_id END AS ref_id,
             |  CASE WHEN f_id IS NULL THEN b_us WHEN b_id IS NULL THEN f_us
             |       WHEN us - b_us <= f_us - us THEN b_us ELSE f_us END AS asof_ts
             |FROM w WHERE side = 1
             |ORDER BY event_id""".stripMargin)),

    // O41h — time-SLICED tolerance-bounded backward as-of (r12): o41d's
    // semantics through the skew hatch, oracle verbatim; the staleness
    // bound stays a row-local predicate on the reattached match
    QueryDef("o41h_asof_tolerance_sliced",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("us"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id").as("ref_id"))
        graft.operators.AsofJoin.backwardWithinSliced(probe, ref, Seq("user_id"), "us",
            Seq("ref_id"), tolerance = 3600L * 1000000L,
            cellWidth = 6L * 3600L * 1000000L)
          .orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click'),
             |u AS (
             |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id,
             |    us AS ref_us FROM c
             |  UNION ALL
             |  SELECT user_id, us, 1, event_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    last_value(ref_id IGNORE NULLS) OVER wp AS b_id,
             |    last_value(ref_us IGNORE NULLS) OVER wp AS b_us
             |  FROM u
             |  WINDOW wp AS (PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, us,
             |  CASE WHEN b_id IS NOT NULL AND us - b_us <= 3600000000 THEN b_id END AS ref_id,
             |  CASE WHEN b_id IS NOT NULL AND us - b_us <= 3600000000 THEN b_us END AS asof_ts
             |FROM w WHERE side = 1
             |ORDER BY event_id""".stripMargin)),

    // O42 — range (interval-containment) join: events matched into their
    // containing session windows via the grid-bucket equi-join (cells
    // exploded per interval, points keyed to one cell, exact BETWEEN
    // verify) — never a nested loop. Sessions are disjoint per user, so
    // the match is exactly the session assignment, which is what the
    // oracle emits directly
    QueryDef("o42_interval_join",
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("event_id") < 5000)
        val pts = ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
        val sessions = graft.operators.Sessionize.summarize(ev, gapSeconds = 1800L)
          .select(col("user_id"), col("session_idx"),
            col("session_start_us"), col("session_end_us"))
        graft.operators.IntervalJoin.containmentJoin(
            pts, sessions, Seq("user_id"), "us",
            "session_start_us", "session_end_us", cellWidth = 3600L * 1000000)
          .select(col("event_id"), col("user_id"), col("session_idx"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE event_id < 5000),
             |f AS (
             |  SELECT user_id, event_id, us,
             |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS nw
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (
             |  SELECT user_id, event_id,
             |    CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
             |  FROM f)
             |SELECT event_id, user_id, session_idx FROM g ORDER BY event_id""".stripMargin)),

    // O42b — SPAN-SPLIT interval join: semantics identical to o42 (the
    // oracle SQL is o42's verbatim — the gate hash-matches the unsliced
    // operator), but the interval table splits by span: sessions covering
    // at most 2 fifteen-minute grid cells take the grid-bucket equi-join,
    // the long tail broadcasts and hash-joins on user + exact BETWEEN —
    // no explode blow-up from degenerate long intervals. The 100 TB
    // long-interval hatch, proven on a planted week-long interval in
    // SkewSpec
    QueryDef("o42b_interval_split",
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("event_id") < 5000)
        val pts = ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
        val sessions = graft.operators.Sessionize.summarize(ev, gapSeconds = 1800L)
          .select(col("user_id"), col("session_idx"),
            col("session_start_us"), col("session_end_us"))
        graft.operators.IntervalJoin.containmentJoinSplit(
            pts, sessions, Seq("user_id"), "us",
            "session_start_us", "session_end_us",
            cellWidth = 900L * 1000000, maxCells = 2)
          .select(col("event_id"), col("user_id"), col("session_idx"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE event_id < 5000),
             |f AS (
             |  SELECT user_id, event_id, us,
             |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS nw
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (
             |  SELECT user_id, event_id,
             |    CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
             |  FROM f)
             |SELECT event_id, user_id, session_idx FROM g ORDER BY event_id""".stripMargin)),

    // O43 — trailing event-time window (RANGE frame): per event, the
    // count and max id of the same user's events in the trailing hour —
    // the sliding-window feature shape (fixed-width event-time frame, peer
    // rows included), integer outputs only
    QueryDef("o43_trailing_window",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600L * 1000000, 0)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .withColumn("trailing_n", count(lit(1)).over(w))
          .withColumn("trailing_max_id", max(col("event_id")).over(w))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS us,
             |  CAST(count(*) OVER tw AS BIGINT) AS trailing_n,
             |  max(event_id) OVER tw AS trailing_max_id
             |FROM events
             |WINDOW tw AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // O44 — ordered funnel (view → click → purchase, 1-day conversion
    // window): greedy-earliest chain via one keyed agg per step, all
    // hashing the same user key; integer-µs outputs
    QueryDef("o44_funnel",
      (s, dir) => graft.operators.Funnel
        .funnel(Tables.events(s, dir), Seq("view", "click", "purchase"),
          windowSeconds = 86400L)
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |t1 AS (SELECT user_id, min(us) AS t1_us FROM e
             |       WHERE event_type = 'view' GROUP BY user_id),
             |t2 AS (SELECT e.user_id, min(us) AS t2_us FROM e JOIN t1 USING (user_id)
             |       WHERE event_type = 'click' AND us > t1_us GROUP BY e.user_id),
             |t3 AS (SELECT e.user_id, min(us) AS t3_us FROM e JOIN t2 USING (user_id)
             |       WHERE event_type = 'purchase' AND us > t2_us GROUP BY e.user_id)
             |SELECT t1.user_id, t1_us, t2_us, t3_us,
             |  CAST(1 + CASE WHEN t2_us IS NOT NULL THEN 1 ELSE 0 END
             |         + CASE WHEN t3_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_completed,
             |  (t3_us IS NOT NULL AND t3_us - t1_us <= 86400000000) AS converted
             |FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // O45 — cohort retention triangle: first-seen epoch-day cohorts ×
    // day offsets, distinct-user counts; pure BIGINT day arithmetic
    QueryDef("o45_retention",
      (s, dir) => graft.operators.Funnel.retention(Tables.events(s, dir))
        .orderBy("cohort_day", "day_offset"),
      Some("""WITH a AS (
             |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
             |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
             |SELECT cohort_day, a.day - cohort_day AS day_offset, count(*) AS n_users
             |FROM a JOIN c USING (user_id)
             |GROUP BY cohort_day, day_offset
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // O46 — two-phase salted aggregation (operators/Skew.scala): the skew
    // hatch for hot grouping keys as a first-class gate. lineitem's 6
    // (flag, status) groups each carry ~1/6 of the corpus — exactly the
    // hot-key shape where a plain groupBy leaves 6 reducers doing all the
    // work; the salt spreads each group over 16 partials first. Results
    // are salt-invariant (the oracle is a plain GROUP BY): algebraic
    // measures recombine exactly, ordered open/close picks carry their
    // (uid, value) ordering key through both phases — (uid, value) and
    // not bare uid because the synthetic lineitem duplicates
    // (orderkey, linenumber), so bare-uid argmin would be nondeterministic
    QueryDef("o46_salted_agg",
      (s, dir) => {
        import graft.operators.Skew
        val li = Tables.lineitem(s, dir)
          .withColumn("__uid", col("l_orderkey") * 100 + col("l_linenumber"))
        val ordKey = struct(col("__uid"), col("l_extendedprice"))
        Skew.saltedAggregate(
          li,
          keys = Seq(col("l_returnflag"), col("l_linestatus")),
          measures = Seq(
            Skew.sumOf(col("l_quantity").cast("decimal(18,2)"), "total_qty"),
            Skew.countRows("n"),
            Skew.minOf(col("l_extendedprice"), "lo"),
            Skew.maxOf(col("l_extendedprice"), "hi"),
            Skew.minByOf(col("l_extendedprice"), ordKey, "open"),
            Skew.maxByOf(col("l_extendedprice"), ordKey, "close")),
          saltBuckets = 16,
          saltSource = col("__uid"))
          .withColumn("total_qty", col("total_qty").cast("double"))
          .withColumnRenamed("l_returnflag", "flag")
          .withColumnRenamed("l_linestatus", "status")
          .orderBy("flag", "status")
      },
      Some("""WITH u AS (
             |  SELECT l_returnflag AS f, l_linestatus AS s, l_quantity AS q,
             |    l_extendedprice AS p, l_orderkey * 100 + l_linenumber AS uid
             |  FROM lineitem),
             |w AS (
             |  SELECT f, s, q, p,
             |    row_number() OVER (PARTITION BY f, s ORDER BY uid, p) AS rn_a,
             |    row_number() OVER (PARTITION BY f, s ORDER BY uid DESC, p DESC) AS rn_d
             |  FROM u)
             |SELECT f AS flag, s AS status,
             |  CAST(sum(CAST(q AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
             |  count(*) AS n,
             |  min(p) AS lo, max(p) AS hi,
             |  max(CASE WHEN rn_a = 1 THEN p END) AS "open",
             |  max(CASE WHEN rn_d = 1 THEN p END) AS "close"
             |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // O47 — multi-dimensional subtotals (ROLLUP): the per-(lang, source)
    // token-count report with per-lang subtotals and a grand total — the
    // standard corpus-composition report a curation pipeline publishes.
    // grouping_id() disambiguates subtotal NULLs from data NULLs and keys
    // the deterministic output order; Spark's bitmask convention (first
    // rollup column = MSB) matches DuckDB's GROUPING(lang, source)
    QueryDef("o47_rollup",
      (s, dir) => Tables.documents(s, dir)
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), asc_nulls_first("lang"), asc_nulls_first("source")),
      Some("""SELECT lang, source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(GROUPING(lang, source) AS BIGINT) AS gid
             |FROM documents GROUP BY ROLLUP (lang, source)
             |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin)),

    // O48 — pivot (crosstab): per-source doc counts fanned across the five
    // fixture languages as columns. Spark's pivot with an EXPLICIT value
    // list (never the two-pass value-discovery scan — a full extra corpus
    // read at 100 TB); absent combos coalesce to 0 to match the
    // conditional-sum oracle
    QueryDef("o48_pivot",
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val p = Tables.documents(s, dir)
          .groupBy(col("source")).pivot("lang", langs).agg(count(lit(1)))
        langs.foldLeft(p)((acc, l) => acc.withColumn(l, coalesce(col(l), lit(0L))))
          .orderBy("source")
      },
      Some("""SELECT source,
             |  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
             |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
             |  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
             |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
             |  CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // O49 — multi-distinct aggregation: daily active users / event-type
    // diversity — count(DISTINCT x) twice in one grouped agg (Catalyst
    // plans the expand + two-phase distinct; absent from the reference,
    // SURVEY §2.4, but table stakes for pipeline reporting)
    QueryDef("o49_distinct_agg",
      (s, dir) => Tables.events(s, dir)
        .groupBy(expr("unix_micros(ts) div 86400000000L").as("day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy("day"),
      Some("""SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_events,
             |  count(DISTINCT user_id) AS n_users,
             |  count(DISTINCT event_type) AS n_types
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // F1 — date_trunc bucketing
    QueryDef("f1_date_trunc",
      (s, dir) => Tables.events(s, dir)
        .groupBy(epochSecs(date_trunc("day", col("ts"))).as("day_epoch"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("day_epoch"),
      Some("""SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events GROUP BY 1 ORDER BY day_epoch""".stripMargin)),

    // F2 — arbitrary-width bucket (_trunc_ts_by_secs, up.sql:521-528)
    QueryDef("f2_trunc_by_secs",
      (s, dir) => Tables.events(s, dir)
        .groupBy(epochSecs(GraftFunctions.truncTsBySecs(col("ts"), 300)).as("bucket_epoch"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket_epoch"),
      Some("""SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 300) * 300 AS BIGINT) AS bucket_epoch, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY bucket_epoch""".stripMargin)),

    // F3 — interval dispatch incl. calendar buckets (_to_raw_timestamp)
    QueryDef("f3_interval_dispatch",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_id") < 50)
        .select(col("event_id"),
          epochSecs(GraftFunctions.toRawTimestamp(col("ts"), "5m")).as("e5m"),
          epochSecs(GraftFunctions.toRawTimestamp(col("ts"), "1h")).as("e1h"),
          epochSecs(GraftFunctions.toRawTimestamp(col("ts"), "1d")).as("e1d"),
          epochSecs(GraftFunctions.toRawTimestamp(col("ts"), "1w")).as("e1w"),
          epochSecs(GraftFunctions.toRawTimestamp(col("ts"), "1M")).as("e1M"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 300) * 300 AS BIGINT) AS e5m,
             |  CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) * 3600 AS BIGINT) AS e1h,
             |  CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS e1d,
             |  CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS e1w,
             |  CAST(epoch(date_trunc('month', ts)) AS BIGINT) AS "e1M"
             |FROM events WHERE event_id < 50 ORDER BY event_id""".stripMargin)),

    // F4 — text_timestamp_cast (up.sql:487-494)
    QueryDef("f4_text_timestamp_cast",
      (s, dir) => Tables.events(s, dir)
        .withColumn("ms_text", unix_millis(col("ts").cast("timestamp")).cast("string"))
        .select(col("event_id"),
          epochSecs(GraftFunctions.textTimestampCast(col("ms_text"))).as("parsed_epoch"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(floor(CAST(CAST(epoch_ms(ts) AS VARCHAR) AS DOUBLE) / 1000) AS BIGINT) AS parsed_epoch
             |FROM events ORDER BY event_id""".stripMargin)),

    // F5 — epoch-ms conversion (utils.rs:17-20)
    QueryDef("f5_epoch_ms",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), unix_millis(col("ts").cast("timestamp")).as("epoch_ms"))
        .orderBy("event_id"),
      Some("SELECT event_id, epoch_ms(ts) AS epoch_ms FROM events ORDER BY event_id")),

    // F6 — floor / power / unary minus (pg.rs:693, 708-712)
    QueryDef("f6_floor_pow_neg",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          floor(col("value")).as("fv"),
          (col("value") * pow(lit(10), lit(2))).cast("double").as("scaled"),
          negate(col("value")).as("neg"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(floor(value) AS BIGINT) AS fv,
             |  CAST(value * power(10, 2) AS DOUBLE) AS scaled, -value AS neg
             |FROM events ORDER BY event_id""".stripMargin)),

    // F7 — decimal multiply-sum (quote volume shape, pg.rs:690)
    QueryDef("f7_decimal_mulsum",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // F22 — sequence high-water mark as running max (pg.rs:190-194 analog)
    QueryDef("f22_high_water",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), max(col("value")).over(w).as("high_water"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  max(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_water
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // ST1 — time-window micro-batch close (updates.rs:117-129)
    QueryDef("st1_time_batches",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("es", epochSecs(col("ts")))
        val m0 = ev.agg(min("es").as("m0"))
        ev.crossJoin(m0)
          .groupBy(floor((col("es") - col("m0")) / 300).as("batch_id"))
          .agg(count(lit(1)).as("n"))
          .orderBy("batch_id")
      },
      Some("""WITH m AS (SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS m0 FROM events)
             |SELECT CAST(floor((CAST(floor(epoch(ts)) AS BIGINT) - m.m0) / 300) AS BIGINT) AS batch_id, count(*) AS n
             |FROM events, m GROUP BY 1 ORDER BY batch_id""".stripMargin)),

    // ST2 — exactly-once: reprocessing is idempotent (mod.rs:168-186)
    QueryDef("st2_idempotent_replay",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_id", "event_type")
        ev.unionByName(ev)
          .dropDuplicates("event_id")
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n FROM (
             |  SELECT DISTINCT event_id, event_type FROM (
             |    SELECT event_id, event_type FROM events
             |    UNION ALL SELECT event_id, event_type FROM events))
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ST3 — microblock squash (mod.rs:769-792): clicks are microblocks
    QueryDef("st3_microblock_squash",
      (s, dir) => {
        val blocks = Tables.events(s, dir).select(
          col("event_id").as("uid"),
          col("event_id").cast("string").as("id"),
          col("user_id").cast("int").as("height"),
          when(col("event_type") === "click", lit(null).cast("timestamp"))
            .otherwise(col("ts").cast("timestamp")).as("time_stamp"))
        val keyBlockId = blocks.filter(col("time_stamp").isNotNull)
          .orderBy(col("uid").desc).limit(1).select("id").collect().head.getString(0)
        val (squashed, _) = Pipeline.squashMicroblocks(blocks, keyBlockId)
        squashed
          .select(col("uid"), col("id"), col("height"), epochSecs(col("time_stamp")).as("ts_epoch"))
          .orderBy("uid")
      },
      Some("""WITH blocks AS (
             |  SELECT event_id AS uid, CAST(event_id AS VARCHAR) AS id, CAST(user_id AS INT) AS height,
             |    CASE WHEN event_type = 'click' THEN NULL ELSE ts END AS time_stamp
             |  FROM events),
             |k AS (SELECT max(uid) AS key_uid FROM blocks WHERE time_stamp IS NOT NULL),
             |lm AS (SELECT max(uid) AS mu FROM blocks, k WHERE time_stamp IS NULL AND uid < key_uid)
             |SELECT b.uid,
             |  CASE WHEN b.uid = k.key_uid AND lm.mu IS NOT NULL THEN CAST(lm.mu AS VARCHAR) ELSE b.id END AS id,
             |  b.height, CAST(floor(epoch(b.time_stamp)) AS BIGINT) AS ts_epoch
             |FROM blocks b, k, lm
             |WHERE NOT (b.time_stamp IS NULL AND b.uid < k.key_uid)
             |ORDER BY b.uid""".stripMargin)),

    // ST4 — rollback: drop facts past the cut, recompute aggregates
    // (mod.rs:794-863)
    QueryDef("st4_rollback",
      (s, dir) => {
        val facts = Map("events" -> Tables.events(s, dir).withColumn("block_uid", col("event_id")))
        val rolled = Pipeline.rollbackFacts(facts, 700L)("events")
        rolled.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events WHERE event_id <= 700
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ST5 — startup safety rollback cut (mod.rs:103-137)
    QueryDef("st5_startup_rollback",
      (s, dir) => {
        val blocks = Tables.events(s, dir).select(
          col("event_id").as("uid"),
          when(col("event_type") === "click", lit(null).cast("timestamp"))
            .otherwise(col("ts").cast("timestamp")).as("time_stamp"))
        val cut = Pipeline.startupRollbackCut(blocks, depth = 3).get
        Tables.events(s, dir)
          .filter(col("event_id") <= cut)
          .agg(count(lit(1)).as("n"))
          .withColumn("cut_uid", lit(cut))
      },
      Some("""WITH kb AS (SELECT event_id FROM events WHERE event_type <> 'click' ORDER BY event_id DESC LIMIT 4),
             |cut AS (SELECT min(event_id) AS c FROM kb)
             |SELECT (SELECT count(*) FROM events, cut WHERE event_id <= c) AS n, c AS cut_uid FROM cut""".stripMargin)),

    // ST6 — liveness probe (src/bin/consumer.rs:9)
    QueryDef("st6_liveness",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_type") =!= "click")
        .orderBy(col("event_id").desc)
        .limit(1)
        .select(unix_millis(col("ts").cast("timestamp")).as("latest_ms")),
      Some("""SELECT epoch_ms(ts) AS latest_ms FROM events
             |WHERE event_type <> 'click' ORDER BY event_id DESC LIMIT 1""".stripMargin)),

    // ST7 — streaming-NATIVE minute candles: watermark + 1-minute windowed
    // aggregation driven by a real MemoryStream query in micro-batches; the
    // oracle is the SAME c1m transliteration the batch a1 uses — streaming
    // and batch are definitionally identical (Candles.minuteAggs is shared)
    QueryDef("st7_stream_candles",
      (s, dir) => {
        import graft.streaming.StreamingCandles
        val rows = Tables.trades(s, dir).filter(col("uid") < 4000)
          .collect().map(r => StreamingCandles.TradeEvent(
            r.getAs[Long]("uid"),
            r.getAs[java.sql.Timestamp]("time_stamp").getTime,
            r.getAs[String]("amount_asset_id"), r.getAs[String]("price_asset_id"),
            r.getAs[String]("sender"), r.getAs[Int]("height"),
            r.getAs[Long]("amount"), BigDecimal(r.getAs[java.math.BigDecimal]("price"))))
        candleOut(StreamingCandles.replayMinute(s, rows.toSeq, chunk = 2000))
      },
      Some(withTrades(c1mCte("WHERE uid < 4000")) +
        "\n" + candleSelect("ts_1m") + "\nFROM c1m " + orderTail)),

    // ST8 — stateful candles via mapGroupsWithState (custom streaming state,
    // update mode): per-key last-write-wins over emitted updates must equal
    // the same batch oracle
    QueryDef("st8_stateful_candles",
      (s, dir) => {
        import graft.streaming.StreamingCandles
        val rows = Tables.trades(s, dir).filter(col("uid") < 4000)
          .collect().map(r => StreamingCandles.TradeEvent(
            r.getAs[Long]("uid"),
            r.getAs[java.sql.Timestamp]("time_stamp").getTime,
            r.getAs[String]("amount_asset_id"), r.getAs[String]("price_asset_id"),
            r.getAs[String]("sender"), r.getAs[Int]("height"),
            r.getAs[Long]("amount"), BigDecimal(r.getAs[java.math.BigDecimal]("price"))))
        StreamingCandles.replayStateful(s, rows.toSeq, chunk = 2000)
          .select(
            (col("time_start_ms") / 1000).cast("long").as("time_start_epoch"),
            col("amount_asset_id"), col("price_asset_id"), col("matcher_address"),
            col("low").cast("double").as("low"),
            col("high").cast("double").as("high"),
            col("volume").cast("double").as("volume"),
            col("quote_volume").cast("double").as("quote_volume"),
            col("max_height"),
            col("txs_count").cast("long").as("txs_count"),
            col("weighted_average_price").cast("double").as("weighted_average_price"),
            col("open").cast("double").as("open"),
            col("close").cast("double").as("close"))
          .orderBy("time_start_epoch", "amount_asset_id", "price_asset_id", "matcher_address")
      },
      Some(withTrades(c1mCte("WHERE uid < 4000")) +
        "\n" + candleSelect("ts_1m") + "\nFROM c1m " + orderTail)),

    // ST9 — streaming ingest dedup: dropDuplicatesWithinWatermark keyed on
    // content hash, state bounded by the watermark horizon; with no
    // eviction inside the bounded replay the survivors are exactly the
    // distinct contents (arrival-independent projection)
    QueryDef("st9_stream_dedup",
      (s, dir) => {
        import graft.streaming.StreamingDedup
        val rows = Tables.events(s, dir).filter(col("event_id") < 2000)
          .orderBy("event_id")
          .select(unix_millis(col("ts").cast("timestamp")).as("ms"),
            concat(col("event_type"), lit("#"), (col("user_id") % 50).cast("string")).as("text"))
          .collect()
          .map(r => StreamingDedup.DocEvent(r.getLong(0), r.getString(1)))
        // horizon far beyond the fixture's time span: no eviction, so the
        // survivors are exactly the global distinct set
        StreamingDedup.replayExact(s, rows.toSeq, chunk = 700, delay = "3650 days")
          .orderBy("text")
      },
      Some("""SELECT DISTINCT event_type || '#' || CAST(user_id % 50 AS VARCHAR) AS text
             |FROM events WHERE event_id < 2000 ORDER BY text""".stripMargin)),

    // ST10 — chained stateful ladder in append mode (multiple stateful
    // aggregations in one streaming query): streamed 1m→5m candles, each
    // emitted exactly once when the watermark closes its window, must equal
    // the batch ladder edge over the same trades
    QueryDef("st10_ladder_stream",
      (s, dir) => {
        import graft.streaming.StreamingCandles
        val rows = Tables.trades(s, dir).filter(col("uid") < 4000)
          .collect().map(r => StreamingCandles.TradeEvent(
            r.getAs[Long]("uid"),
            r.getAs[java.sql.Timestamp]("time_stamp").getTime,
            r.getAs[String]("amount_asset_id"), r.getAs[String]("price_asset_id"),
            r.getAs[String]("sender"), r.getAs[Int]("height"),
            r.getAs[Long]("amount"), BigDecimal(r.getAs[java.math.BigDecimal]("price"))))
        candleOut(StreamingCandles.replayLadder(s, rows.toSeq, chunk = 2000, dst = "5m"))
      },
      Some(withTrades(c1mCte("WHERE uid < 4000") + ",\n" + ladderCte("1m", "5m", 300)) +
        "\n" + candleSelect("ts_5m") + "\nFROM c5m " + orderTail)),

    // ST12 — streaming CALENDAR ladder (VERDICT r5 #4), STAGED: trades→1h
    // (5 chained stateful aggs), 1h→1d (4 more in a second query — past ~7
    // chained stateful operators Spark 4.1 blows the driver heap, measured
    // NOTES.md r06), then 1d→1w (Monday-origin 7-day windows — fixed-width
    // after an origin shift) and 1d→1M (flatMapGroupsWithState, event-time
    // timeout at the month boundary). Edge sequence identical to the batch
    // ladder, so it must hash-match the batch calendar CTE chain.
    QueryDef("st12_calendar_stream",
      (s, dir) => {
        import graft.streaming.StreamingCandles
        val rows = Tables.trades(s, dir).filter(col("uid") < 4000)
          .collect().map(r => StreamingCandles.TradeEvent(
            r.getAs[Long]("uid"),
            r.getAs[java.sql.Timestamp]("time_stamp").getTime,
            r.getAs[String]("amount_asset_id"), r.getAs[String]("price_asset_id"),
            r.getAs[String]("sender"), r.getAs[Int]("height"),
            r.getAs[Long]("amount"), BigDecimal(r.getAs[java.math.BigDecimal]("price"))))
        // chunk > slice size: one data micro-batch + the sentinel batch per
        // staged query — the gate pays query fixed cost, not batch rounds
        val cal = StreamingCandles.replayCalendar(s, rows.toSeq, chunk = 4096)
        cal.select(col("interval") +: candleOutCols: _*)
          .orderBy("interval", "time_start_epoch", "amount_asset_id", "price_asset_id", "matcher_address")
      },
      Some(withTrades((Seq(
        c1mCte("WHERE uid < 4000"),
        ladderCte("1m", "5m", 300),
        ladderCte("5m", "15m", 900),
        ladderCte("15m", "30m", 1800),
        ladderCte("30m", "1h", 3600),
        ladderCte("1h", "3h", 10800),
        ladderCte("3h", "6h", 21600),
        ladderCte("6h", "12h", 43200),
        ladderCte("12h", "1d", 86400),
        ladderCteCalendar("1d", "1w", "week"),
        ladderCteCalendar("1d", "1mo", "month"))).mkString(",\n")) +
        s"""
           |SELECT * FROM (
           |  ${candleSelect("ts_1w").replace("SELECT ", "SELECT '1w' AS interval, ")}
           |  FROM c1w
           |  UNION ALL
           |  ${candleSelect("ts_1mo").replace("SELECT ", "SELECT '1M' AS interval, ")}
           |  FROM c1mo)
           |ORDER BY interval, time_start_epoch, amount_asset_id, price_asset_id, matcher_address""".stripMargin)),

    // ST13 — streaming sessionization: flatMapGroupsWithState holding one
    // open session per user (append-mode emission at each gap close,
    // sentinel-flushed at replay end) must reproduce the batch
    // gaps-and-islands operator bit-for-bit — o40's oracle over the same
    // event slice
    QueryDef("st13_session_stream",
      (s, dir) => {
        import graft.streaming.StreamingSessionize
        val rows = Tables.events(s, dir).filter(col("event_id") < 2000)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .orderBy("us", "event_id")
          .collect()
          .map(r => StreamingSessionize.SessEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
        StreamingSessionize.replay(s, rows.toSeq, chunk = 700, gapSeconds = 1800L)
          .orderBy("user_id", "session_idx")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE event_id < 2000),
             |f AS (
             |  SELECT user_id, event_id, us,
             |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS nw
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (
             |  SELECT user_id, event_id, us,
             |    CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
             |  FROM f)
             |SELECT user_id, session_idx,
             |  min(us) AS session_start_us, max(us) AS session_end_us,
             |  count(*) AS n_events,
             |  min(event_id) AS min_event_id, max(event_id) AS max_event_id,
             |  max(us) - min(us) AS duration_us
             |FROM g GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin)),

    // ST14 — streaming as-of enrichment: probes and reference updates
    // replayed through the flatMapGroupsWithState cursor (one (ts,
    // payload) pair of state per key) must hash-match the BATCH o41
    // union-merge oracle over the same slice — the st13 pattern applied
    // to as-of enrichment (r10 VERDICT task 4)
    QueryDef("st14_asof_stream",
      (s, dir) => {
        import graft.streaming.StreamingAsof
        val rows = Tables.events(s, dir).filter(col("event_id") < 2000)
          .filter(col("event_type").isin("view", "click"))
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
            when(col("event_type") === "click", 0).otherwise(1).as("side"))
          .collect()
          .map { r =>
            val probe = r.getInt(3) == 1
            StreamingAsof.AsofEvent(
              eventId = if (probe) r.getLong(0) else 0L,
              userId = r.getLong(1), tsUs = r.getLong(2),
              side = r.getInt(3),
              refId = if (probe) 0L else r.getLong(0))
          }
          .sortBy(e => (e.tsUs, e.side, e.refId))
        StreamingAsof.replay(s, rows.toSeq, chunk = 700).orderBy("event_id")
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
             |  WHERE event_type = 'view' AND event_id < 2000),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_id AS ref_id FROM events
             |  WHERE event_type = 'click' AND event_id < 2000),
             |u AS (
             |  SELECT user_id, us, 0 AS side, CAST(NULL AS BIGINT) AS event_id, ref_id FROM c
             |  UNION ALL
             |  SELECT user_id, us, 1, event_id, CAST(NULL AS BIGINT) FROM v),
             |w AS (
             |  SELECT user_id, us, side, event_id,
             |    last_value(ref_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY us, side, ref_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ref_id
             |  FROM u)
             |SELECT event_id, user_id, us, ref_id FROM w WHERE side = 1
             |ORDER BY event_id""".stripMargin)),

    // ST15 — stream-STREAM watermarked join (r12): two live streams
    // (views, clicks) joined on user + an event-time range condition
    // ("click within the 30 min before the view") with Spark's built-in
    // watermarked inner join — state bounded by the window, never by
    // history. The replay's final table must equal the plain batch
    // range-join over the same slice
    QueryDef("st15_stream_stream_join",
      (s, dir) => {
        import graft.streaming.StreamStreamJoin
        val ev = Tables.events(s, dir).filter(col("event_id") < 2000)
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .orderBy("us", "event_id").collect()
          .map(r => StreamStreamJoin.ViewEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .orderBy("us", "event_id").collect()
          .map(r => StreamStreamJoin.ClickEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
        StreamStreamJoin.replay(s, views.toSeq, clicks.toSeq,
            windowUs = 1800L * 1000000L, chunk = 400)
          .orderBy("event_id", "ref_id")
      },
      Some("""SELECT v.event_id, v.user_id, epoch_us(v.ts) AS view_us,
             |  c.event_id AS ref_id, epoch_us(c.ts) AS click_us
             |FROM events v JOIN events c
             |  ON v.user_id = c.user_id
             |  AND epoch_us(c.ts) BETWEEN epoch_us(v.ts) - 1800000000 AND epoch_us(v.ts)
             |WHERE v.event_type = 'view' AND c.event_type = 'click'
             |  AND v.event_id < 2000 AND c.event_id < 2000
             |ORDER BY v.event_id, c.event_id""".stripMargin)),

    // ST16 — stream-stream LEFT OUTER join (r12): st15's join in outer
    // mode, pinning the subtler semantics — an unmatched view may only
    // emit (with NULL click columns) once the watermark proves no future
    // click can match, so the replay pushes a far-future sentinel through
    // BOTH streams to finalize the tail. Must equal the batch LEFT JOIN
    QueryDef("st16_stream_stream_outer",
      (s, dir) => {
        import graft.streaming.StreamStreamJoin
        val ev = Tables.events(s, dir).filter(col("event_id") < 2000)
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .orderBy("us", "event_id").collect()
          .map(r => StreamStreamJoin.ViewEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .orderBy("us", "event_id").collect()
          .map(r => StreamStreamJoin.ClickEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
        StreamStreamJoin.replay(s, views.toSeq, clicks.toSeq,
            windowUs = 1800L * 1000000L, chunk = 400, joinType = "leftOuter")
          .orderBy("event_id", "ref_id")
      },
      Some("""SELECT v.event_id, v.user_id, epoch_us(v.ts) AS view_us,
             |  c.event_id AS ref_id, epoch_us(c.ts) AS click_us
             |FROM events v LEFT JOIN events c
             |  ON v.user_id = c.user_id AND c.event_type = 'click' AND c.event_id < 2000
             |  AND epoch_us(c.ts) BETWEEN epoch_us(v.ts) - 1800000000 AND epoch_us(v.ts)
             |WHERE v.event_type = 'view' AND v.event_id < 2000
             |ORDER BY v.event_id, c.event_id""".stripMargin)),

    // ST17 — stream-stream FULL OUTER join + late-drop accounting
    // (VERDICT r12 #8): completes the join family — unmatched rows from
    // EITHER side emit with NULLs once the watermark finalizes them. The
    // hashed output also carries the replay's total
    // numRowsDroppedByWatermark as a constant column pinned to 0: an
    // event-time-ordered replay must drop nothing, and any future change
    // that makes the watermark silently discard rows breaks the hash
    // instead of passing quietly (StreamingSpec feeds a deliberately late
    // row to prove the counter fires). NULLS FIRST ordering matches
    // Spark's asc default on both engines.
    QueryDef("st17_stream_stream_full",
      (s, dir) => {
        import graft.streaming.StreamStreamJoin
        val ev = Tables.events(s, dir).filter(col("event_id") < 2000)
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .orderBy("us", "event_id").collect()
          .map(r => StreamStreamJoin.ViewEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .orderBy("us", "event_id").collect()
          .map(r => StreamStreamJoin.ClickEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
        val (joined, dropped) = StreamStreamJoin.replayCounted(s, views.toSeq, clicks.toSeq,
          windowUs = 1800L * 1000000L, chunk = 400, joinType = "fullOuter")
        joined.withColumn("dropped_late", lit(dropped))
          .orderBy(col("event_id").asc_nulls_first, col("ref_id").asc_nulls_first)
      },
      Some("""WITH v AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
             |  WHERE event_type = 'view' AND event_id < 2000),
             |c AS (
             |  SELECT event_id AS ref_id, user_id AS cuser, epoch_us(ts) AS cus FROM events
             |  WHERE event_type = 'click' AND event_id < 2000)
             |SELECT v.event_id, v.user_id, v.us AS view_us,
             |  c.ref_id, c.cus AS click_us, CAST(0 AS BIGINT) AS dropped_late
             |FROM v FULL JOIN c
             |  ON v.user_id = c.cuser AND c.cus BETWEEN v.us - 1800000000 AND v.us
             |ORDER BY event_id NULLS FIRST, ref_id NULLS FIRST""".stripMargin)),

    // Views — tickers (O20 over asset_tickers, up.sql:432-435)
    QueryDef("view_tickers",
      (s, dir) => {
        val at = Tables.events(s, dir)
          .filter(col("event_type") === "click")
          .select(
            col("event_id").as("uid"),
            concat(lit("U"), col("user_id").cast("string")).as("asset_id"),
            col("event_id").cast("string").as("ticker"))
        Views.tickers(at).orderBy("asset_id")
      },
      Some("""SELECT 'U' || CAST(user_id AS VARCHAR) AS asset_id, CAST(max(event_id) AS VARCHAR) AS ticker
             |FROM events WHERE event_type = 'click' GROUP BY user_id ORDER BY asset_id""".stripMargin)),

    // Views — assets: current dim LEFT JOIN tickers LEFT JOIN origins +
    // synthetic WAVES row (up.sql:437-485)
    QueryDef("view_assets",
      (s, dir) => {
        val (au, tickers, origins, wavesData) = assetViewInputs(s, dir)
        Views.assets(s, au, tickers, origins, wavesData)
          .select(col("asset_id"), col("ticker"), col("asset_name"), col("sender"),
            col("issue_height"), epochSecs(col("issue_timestamp")).as("issue_epoch"),
            col("total_quantity").cast("double").as("total_quantity"),
            col("decimals"), col("reissuable"), col("has_script"))
          .orderBy("asset_id")
      },
      Some("""WITH u AS (SELECT user_id, min(epoch(ts)) AS first_es, max(user_id) OVER () AS mu FROM events GROUP BY user_id),
             |t AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
             |SELECT 'U' || CAST(u.user_id AS VARCHAR) AS asset_id,
             |  CASE WHEN t.user_id IS NOT NULL THEN 'T' || CAST(u.user_id AS VARCHAR) ELSE NULL END AS ticker,
             |  'N' || CAST(u.user_id AS VARCHAR) AS asset_name,
             |  'I' || CAST(u.user_id AS VARCHAR) AS sender,
             |  CAST(u.user_id AS INT) AS issue_height,
             |  CAST(floor(u.first_es) AS BIGINT) AS issue_epoch,
             |  CAST(u.user_id * 1000 AS DOUBLE) AS total_quantity,
             |  CAST(u.user_id % 9 AS INT) AS decimals,
             |  u.user_id % 2 = 0 AS reissuable,
             |  u.user_id % 3 = 0 AS has_script
             |FROM u LEFT JOIN t ON u.user_id = t.user_id
             |UNION ALL
             |SELECT 'WAVES', 'WAVES', 'Waves', '', 0,
             |  CAST(epoch(TIMESTAMP '2016-04-11 21:00:00') AS BIGINT),
             |  CAST(100000000 + (SELECT max(user_id) FROM events) AS DOUBLE),
             |  8, false, false
             |ORDER BY asset_id""".stripMargin)),

    // The SQL FRONT DOOR twin of view_assets (VERDICT r13 #5): the same
    // synthetic inputs registered into the session catalog through
    // graft.SqlCatalog (all 30 reference tables + the 3 views as temp
    // views), then the query issued as spark.sql TEXT against the `assets`
    // view — the exact SQL a reference user runs against Postgres
    // (up.sql:437-485). Same oracle as view_assets, so the harness proves
    // text-SQL output hash-equal to the DataFrame twin.
    QueryDef("sql_view_assets",
      (s, dir) => {
        val (au, tickers, origins, wavesData) = assetViewInputs(s, dir)
        SqlCatalog.register(s, Map(
          "asset_updates" -> au, "asset_tickers" -> tickers,
          "asset_origins" -> origins, "waves_data" -> wavesData))
        s.sql("""SELECT asset_id, ticker, asset_name, sender, issue_height,
                |  unix_timestamp(issue_timestamp) AS issue_epoch,
                |  CAST(total_quantity AS DOUBLE) AS total_quantity,
                |  decimals, reissuable, has_script
                |FROM assets ORDER BY asset_id""".stripMargin)
      },
      Some("""WITH u AS (SELECT user_id, min(epoch(ts)) AS first_es, max(user_id) OVER () AS mu FROM events GROUP BY user_id),
             |t AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
             |SELECT 'U' || CAST(u.user_id AS VARCHAR) AS asset_id,
             |  CASE WHEN t.user_id IS NOT NULL THEN 'T' || CAST(u.user_id AS VARCHAR) ELSE NULL END AS ticker,
             |  'N' || CAST(u.user_id AS VARCHAR) AS asset_name,
             |  'I' || CAST(u.user_id AS VARCHAR) AS sender,
             |  CAST(u.user_id AS INT) AS issue_height,
             |  CAST(floor(u.first_es) AS BIGINT) AS issue_epoch,
             |  CAST(u.user_id * 1000 AS DOUBLE) AS total_quantity,
             |  CAST(u.user_id % 9 AS INT) AS decimals,
             |  u.user_id % 2 = 0 AS reissuable,
             |  u.user_id % 3 = 0 AS has_script
             |FROM u LEFT JOIN t ON u.user_id = t.user_id
             |UNION ALL
             |SELECT 'WAVES', 'WAVES', 'Waves', '', 0,
             |  CAST(epoch(TIMESTAMP '2016-04-11 21:00:00') AS BIGINT),
             |  CAST(100000000 + (SELECT max(user_id) FROM events) AS DOUBLE),
             |  8, false, false
             |ORDER BY asset_id""".stripMargin)),

    // Conversion engine through the gate: synthesize typed blocks from
    // events, run the real 18-way TxConvert, scan the txs union-all parent
    // view, count per type with deterministic uid bounds (convert.rs:74-729)
    QueryDef("convert_txs_union",
      (s, dir) => {
        import graft.convert._
        val rows = Tables.events(s, dir)
          .filter(col("event_id") < 500)
          .select("event_id", "user_id")
          .orderBy("event_id")
          .collect()
        val txs = rows.map { r =>
          val (id, user) = (r.getLong(0), r.getLong(1))
          (user.toInt, RawTx(
            id = s"tx$id".getBytes("UTF-8"),
            txType = (id % 18 + 1).toShort,
            senderPublicKey = s"pk$user".getBytes("UTF-8"),
            timeStampMs = 1704067200000L + id * 1000,
            fee = id,
            order1 = Some(RawOrder(id = s"o$id".getBytes("UTF-8"), version = 1)),
            order2 = Some(RawOrder(id = s"p$id".getBytes("UTF-8"), version = 1, orderSide = 1)),
            amount = Some(id), price = Some(id), quantity = Some(id),
            decimals = Some(2), reissuable = Some(true),
            amountAssetId = Some(Array.emptyByteArray),
            priceAssetId = Some(Array.emptyByteArray),
            feeAssetId = Some(Array.emptyByteArray),
            buyMatcherFee = Some(0L), sellMatcherFee = Some(0L),
            recipient = Some("r".getBytes("UTF-8")),
            assetId = Some(Array.emptyByteArray),
            assetName = Some("n"), description = Some(""), alias = Some("a"),
            dappAddress = Some("d".getBytes("UTF-8")),
            ethereumBytes = Some(Array[Byte](1))))
        }
        val blocks = txs.groupBy(_._1).toSeq.sortBy(_._1).map { case (height, members) =>
          RawBlock(s"b$height", height, Some(1704067200000L), None, members.map(_._2).toSeq)
        }
        val blockUids = blocks.zipWithIndex.map { case (b, i) => (i.toLong + 1, b.id) }
        import s.implicits._
        // repartition blocks ConvertToLocalRelation from constant-folding the
        // whole 18-branch conversion on the driver at optimize time; the 18
        // branches then read ONE reused exchange instead of re-evaluating the
        // local relation each (driver-side 2.4-9.9 s → distributed, NOTES.md)
        val flat = TxConvert.withBlockUids(TxConvert.flatten(s, blocks), blockUids.toDF("uid", "id"))
          .repartition(col("height"))
        TxConvert.txsUnionView(TxConvert.convert(flat))
          .groupBy(col("tx_type").cast("int").as("tx_type"))
          .agg(count(lit(1)).as("n"), min("uid").as("min_uid"), max("uid").as("max_uid"))
          .orderBy("tx_type")
      },
      Some("""WITH t AS (
             |  SELECT event_id % 18 + 1 AS tx_type,
             |    CAST(user_id AS INT) AS height,
             |    CAST(user_id AS BIGINT) * 100000
             |      + (row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1) AS uid
             |  FROM events WHERE event_id < 500)
             |SELECT CAST(tx_type AS INT) AS tx_type, count(*) AS n,
             |  min(uid) AS min_uid, max(uid) AS max_uid
             |FROM t GROUP BY 1 ORDER BY tx_type""".stripMargin)),

    // The production orchestrator through the gate (mod.rs:190-251): one
    // batch of three key blocks (exchange txs + asset state updates) folded
    // by ChainSync.handleUpdates, then a rollback batch to the second block.
    // Surviving 1m candle state must equal a clean DuckDB minute-candle
    // aggregation over only the surviving trades — i.e. squash/append/
    // candles/rollback compose to the reference's correction semantics.
    // (matcher_address/asset ids are base58-opaque to DuckDB: single pair +
    // single matcher by construction, projected out.)
    QueryDef("chain_fold_candles",
      (s, dir) => foldedState(s, dir).candles
        .filter(col("interval") === "1m")
        .select(
          epochSecs(col("time_start")).as("time_start_epoch"),
          col("low").cast("double").as("low"),
          col("high").cast("double").as("high"),
          col("volume").cast("double").as("volume"),
          col("quote_volume").cast("double").as("quote_volume"),
          col("max_height"),
          col("txs_count").cast("long").as("txs_count"),
          col("weighted_average_price").cast("double").as("weighted_average_price"),
          col("open").cast("double").as("open"),
          col("close").cast("double").as("close"))
        .orderBy("time_start_epoch"),
      Some(s"""WITH trades AS (
              |  SELECT (100 + event_id // 80) * 100000 + event_id % 80 AS uid,
              |    make_timestamp((1704067200000 + event_id * 30000) * 1000) AS time_stamp,
              |    CAST(100 + event_id // 80 AS INT) AS height,
              |    CAST(event_id % 50 + 1 AS BIGINT) AS amount,
              |    CAST(event_id % 90 + 10 AS DECIMAL(18,2)) AS price
              |  FROM events WHERE event_id < 160)
              |SELECT CAST(epoch(date_trunc('minute', time_stamp)) AS BIGINT) AS time_start_epoch,
              |  CAST(min(price) AS DOUBLE) AS low, CAST(max(price) AS DOUBLE) AS high,
              |  CAST(sum(amount) AS DOUBLE) AS volume,
              |  CAST(sum(amount * price) AS DOUBLE) AS quote_volume,
              |  max(height) AS max_height, count(price) AS txs_count,
              |  CAST(floor(sum(amount * price) / sum(amount)) AS DOUBLE) AS weighted_average_price,
              |  CAST(min_by(price, uid) AS DOUBLE) AS open,
              |  CAST(max_by(price, uid) AS DOUBLE) AS close
              |FROM trades GROUP BY 1 ORDER BY time_start_epoch""".stripMargin)),

    // The SQL front door over the REAL sync state (companion to
    // sql_view_assets, which covers the views over synthetic inputs): the
    // fold's output tables registered into the session catalog through
    // graft.SqlCatalog and the surviving candles queried as spark.sql
    // TEXT — the exact `SELECT … FROM candles WHERE interval = '1m'`
    // shape the reference's API issues to Postgres. Same oracle as
    // chain_fold_candles, so text-SQL over chain tables is hash-equal to
    // the DataFrame path.
    QueryDef("sql_chain_candles",
      (s, dir) => {
        val st = foldedState(s, dir)
        SqlCatalog.register(s, Map(
          "blocks_microblocks" -> st.blocks,
          "asset_updates" -> st.assetUpdates,
          "asset_origins" -> st.assetOrigins,
          "waves_data" -> st.wavesData,
          "candles" -> st.candles))
        s.sql("""SELECT unix_timestamp(time_start) AS time_start_epoch,
                |  CAST(low AS DOUBLE) AS low, CAST(high AS DOUBLE) AS high,
                |  CAST(volume AS DOUBLE) AS volume,
                |  CAST(quote_volume AS DOUBLE) AS quote_volume,
                |  max_height, CAST(txs_count AS BIGINT) AS txs_count,
                |  CAST(weighted_average_price AS DOUBLE) AS weighted_average_price,
                |  CAST(`open` AS DOUBLE) AS `open`, CAST(`close` AS DOUBLE) AS `close`
                |FROM candles WHERE `interval` = '1m'
                |ORDER BY time_start_epoch""".stripMargin)
      },
      Some(s"""WITH trades AS (
              |  SELECT (100 + event_id // 80) * 100000 + event_id % 80 AS uid,
              |    make_timestamp((1704067200000 + event_id * 30000) * 1000) AS time_stamp,
              |    CAST(100 + event_id // 80 AS INT) AS height,
              |    CAST(event_id % 50 + 1 AS BIGINT) AS amount,
              |    CAST(event_id % 90 + 10 AS DECIMAL(18,2)) AS price
              |  FROM events WHERE event_id < 160)
              |SELECT CAST(epoch(date_trunc('minute', time_stamp)) AS BIGINT) AS time_start_epoch,
              |  CAST(min(price) AS DOUBLE) AS low, CAST(max(price) AS DOUBLE) AS high,
              |  CAST(sum(amount) AS DOUBLE) AS volume,
              |  CAST(sum(amount * price) AS DOUBLE) AS quote_volume,
              |  max(height) AS max_height, count(price) AS txs_count,
              |  CAST(floor(sum(amount * price) / sum(amount)) AS DOUBLE) AS weighted_average_price,
              |  CAST(min_by(price, uid) AS DOUBLE) AS open,
              |  CAST(max_by(price, uid) AS DOUBLE) AS close
              |FROM trades GROUP BY 1 ORDER BY time_start_epoch""".stripMargin)),

    // The reference's END-USER query through the SQL front door (VERDICT
    // r14 #6, SURVEY §7.2 minimum slice): "OHLCV for pair (A, P) at 1h
    // over [t1, t2]" — interval + pair-equality + time-range predicates
    // as text SQL against the LADDER output of the real folded sync state,
    // with the tx_version>2 price rescale live (pg.rs:708-713: the fold
    // feeds the current decimals view into the candle recompute; the
    // queried pair rescales v3 prices by 10^(8-2)). The oracle rebuilds
    // the surviving pair trades (post-rollback: event_id < 560, even ids),
    // applies the same rescale row-locally, and runs the full 1m→1h
    // ladder CTE chain with the engine's laddered-wap semantics.
    QueryDef("sql_pair_ohlcv",
      (s, dir) => {
        val st = pairFoldedState(s, dir)
        SqlCatalog.register(s, Map(
          "blocks_microblocks" -> st.blocks,
          "asset_updates" -> st.assetUpdates,
          "asset_origins" -> st.assetOrigins,
          "waves_data" -> st.wavesData,
          "candles" -> st.candles))
        val a = graft.functions.Base58.encode("AS0".getBytes("UTF-8"))
        s.sql(s"""SELECT unix_timestamp(time_start) AS time_start_epoch,
                 |  CAST(low AS DOUBLE) AS low, CAST(high AS DOUBLE) AS high,
                 |  CAST(volume AS DOUBLE) AS volume,
                 |  CAST(quote_volume AS DOUBLE) AS quote_volume,
                 |  max_height, CAST(txs_count AS BIGINT) AS txs_count,
                 |  CAST(weighted_average_price AS DOUBLE) AS weighted_average_price,
                 |  CAST(`open` AS DOUBLE) AS `open`, CAST(`close` AS DOUBLE) AS `close`
                 |FROM candles
                 |WHERE `interval` = '1h'
                 |  AND amount_asset_id = '$a' AND price_asset_id = 'WAVES'
                 |  AND time_start >= timestamp_seconds(1704070800)
                 |  AND time_start <  timestamp_seconds(1704078000)
                 |ORDER BY time_start_epoch""".stripMargin)
      },
      Some(s"""WITH trades AS (
              |  SELECT (100 + event_id // 80) * 100000 + event_id % 80 AS uid,
              |    make_timestamp((1704067200000 + event_id * 30000) * 1000) AS time_stamp,
              |    CAST(100 + event_id // 80 AS INT) AS height,
              |    'A' AS amount_asset_id, 'WAVES' AS price_asset_id, 'm' AS sender,
              |    CAST(event_id % 50 + 1 AS BIGINT) AS amount,
              |    CASE WHEN event_id % 3 = 0
              |      THEN CAST(event_id % 90 + 10 AS DECIMAL(18,2)) * 1000000
              |      ELSE CAST(event_id % 90 + 10 AS DECIMAL(18,2)) END AS price
              |  FROM events WHERE event_id < 560 AND event_id % 2 = 0),
              |${c1mCte()},
              |${ladderCte("1m", "5m", 300)},
              |${ladderCte("5m", "15m", 900)},
              |${ladderCte("15m", "30m", 1800)},
              |${ladderCte("30m", "1h", 3600)}
              |SELECT CAST(ts_1h AS BIGINT) AS time_start_epoch,
              |  CAST(low AS DOUBLE) AS low, CAST(high AS DOUBLE) AS high,
              |  CAST(volume AS DOUBLE) AS volume,
              |  CAST(quote_volume AS DOUBLE) AS quote_volume,
              |  max_height, CAST(txs_count AS BIGINT) AS txs_count,
              |  CAST(wap AS DOUBLE) AS weighted_average_price,
              |  CAST(open AS DOUBLE) AS open, CAST(close AS DOUBLE) AS close
              |FROM c1h
              |WHERE ts_1h >= 1704070800 AND ts_1h < 1704078000
              |ORDER BY time_start_epoch""".stripMargin)),

    // SCD-2 through the same fold: the asset dimension after append+rollback
    // must equal linking only the surviving updates (rollback∘append
    // identity, pg.rs:244-256); uids follow the declared tx_uid*1000+pos
    // numbering so DuckDB reproduces the chain without base58
    QueryDef("chain_fold_scd2",
      (s, dir) => foldedState(s, dir).assetUpdates
        .select(col("uid"), col("superseded_by"), col("decimals"), col("volume"))
        .orderBy("uid"),
      Some(s"""WITH au AS (
              |  SELECT ((100 + event_id // 80) * 100000 + event_id % 80) * 1000 AS uid,
              |    (event_id // 10) % 5 AS asset_key,
              |    CAST(event_id % 9 AS SMALLINT) AS decimals,
              |    event_id * 100 AS volume
              |  FROM events WHERE event_id < 160 AND event_id % 10 = 0)
              |SELECT uid,
              |  coalesce(lead(uid) OVER (PARTITION BY asset_key ORDER BY uid), ${MaxUid}) AS superseded_by,
              |  decimals, volume
              |FROM au ORDER BY uid""".stripMargin)),

    // Insert-ignore origins through the same fold (pg.rs:205-214): the
    // first update per asset wins deterministically (min_by on update uid);
    // rollback cascades origins with their asset_update row
    QueryDef("chain_fold_origins",
      (s, dir) => foldedState(s, dir).assetOrigins
        .select(col("first_asset_update_uid"), col("issue_height"),
          unix_millis(col("issue_time_stamp")).as("issue_ts_ms"))
        .orderBy("first_asset_update_uid"),
      Some("""WITH au AS (
             |  SELECT event_id, (event_id // 10) % 5 AS asset_key
             |  FROM events WHERE event_id < 160 AND event_id % 10 = 0),
             |firsts AS (SELECT asset_key, min(event_id) AS event_id FROM au GROUP BY asset_key)
             |SELECT ((100 + event_id // 80) * 100000 + event_id % 80) * 1000 AS first_asset_update_uid,
             |  CAST(100 + event_id // 80 AS INT) AS issue_height,
             |  1704067200000 + event_id * 30000 AS issue_ts_ms
             |FROM firsts ORDER BY first_asset_update_uid""".stripMargin)),

    // Ingest-side ticker extraction (mod.rs:548-581): fragstring key parse,
    // storage-address filter, string-value vs deleted-key (→ "") semantics
    QueryDef("extract_tickers",
      (s, dir) => {
        import graft.convert._
        val pk = Array.tabulate[Byte](32)(_.toByte)
        val storage = "STORE".getBytes("UTF-8")
        val other = "OTHER".getBytes("UTF-8")
        val rows = Tables.events(s, dir).filter(col("event_id") < 500)
          .select("event_id").orderBy("event_id").collect().map(_.getLong(0))
        val txs = rows.filter(_ % 7 == 0).map { id =>
          val entry =
            if (id % 2 == 0) RawDataEntry(s"%s%s__assetId2ticker__AS${id % 5}", stringValue = Some(s"TK${id % 4}"))
            else RawDataEntry(s"%s%s__assetId2ticker__AS${id % 5}") // deleted key → ""
          RawTx(id = s"tx$id".getBytes("UTF-8"), txType = 12, senderPublicKey = pk,
            timeStampMs = 1704067200000L + id,
            dataEntryUpdates = Seq(
              RawDataEntryUpdate(if (id % 5 == 0) other else storage, Some(entry))))
        }
        val blocks = Seq(RawBlock("tb1", 300, Some(1704067200000L), None, txs.toSeq))
        import s.implicits._
        val flat = TxConvert.withBlockUids(
          TxConvert.flatten(s, blocks), Seq((7L, "tb1")).toDF("uid", "id"))
        graft.convert.Extract
          .assetTickers(flat, graft.functions.Base58.encode(storage))
          .select("uid", "asset_id", "ticker")
          .orderBy("uid")
      },
      Some(s"""WITH t AS (
              |  SELECT event_id,
              |    row_number() OVER (ORDER BY event_id) - 1 AS idx
              |  FROM events WHERE event_id < 500 AND event_id % 7 = 0)
              |SELECT (300 * 100000 + idx) * 1000 AS uid,
              |  'AS' || (event_id % 5) AS asset_id,
              |  CASE WHEN event_id % 2 = 0 THEN 'TK' || (event_id % 4) ELSE '' END AS ticker
              |FROM t WHERE event_id % 5 <> 0 ORDER BY uid""".stripMargin)),

    // SCD-2 close/insert batch application (pg.rs:229-242, mod.rs:660-668):
    // applying the tail batch to the head dimension must equal linking the
    // whole history at once
    QueryDef("scd2_apply_batch",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"))
        val dim = Scd2.linkBatch(ev.filter(col("event_id") < 500), key = "user_id", uidCol = "event_id")
        val batch = ev.filter(col("event_id") >= 500)
        Scd2.applyBatch(dim, batch, key = "user_id", uidCol = "event_id")
          .select("user_id", "event_id", "superseded_by")
          .orderBy("user_id", "event_id")
      },
      Some(s"""SELECT user_id, event_id,
              |  lead(event_id, 1, ${MaxUid}) OVER (PARTITION BY user_id ORDER BY event_id) AS superseded_by
              |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // SCD-2 rollback re-open (pg.rs:244-256, mod.rs:823-859)
    QueryDef("scd2_rollback_reopen",
      (s, dir) => {
        val dim = Scd2.linkBatch(
          Tables.events(s, dir).select(col("user_id"), col("event_id")),
          key = "user_id", uidCol = "event_id")
          .withColumn("block_uid", col("event_id"))
        Scd2.rollback(dim, 700L, uidCol = "event_id")
          .select("user_id", "event_id", "superseded_by")
          .orderBy("user_id", "event_id")
      },
      Some(s"""WITH au AS (
              |  SELECT user_id, event_id,
              |    lead(event_id, 1, ${MaxUid}) OVER (PARTITION BY user_id ORDER BY event_id) AS sb
              |  FROM events)
              |SELECT user_id, event_id,
              |  CASE WHEN sb <> ${MaxUid} AND sb > 700 THEN ${MaxUid} ELSE sb END AS superseded_by
              |FROM au WHERE event_id <= 700
              |ORDER BY user_id, event_id""".stripMargin)))
}
