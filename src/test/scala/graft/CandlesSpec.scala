package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Candles, Merge}

/** Candle-engine invariants (SURVEY.md §5): OHLC ordering, ladder volume
  * conservation, incremental == full recompute, rollback∘append = identity. */
class CandlesSpec extends SparkSpec {

  private def trades(rows: Seq[(Long, String, String, String, String, Int, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("uid", "ts", "amount_asset_id", "price_asset_id", "sender", "height", "amount", "price")
      .select(
        col("uid"),
        to_timestamp(col("ts")).as("time_stamp"),
        col("amount_asset_id"), col("price_asset_id"), col("sender"), col("height"),
        col("amount"),
        col("price").cast("decimal(18,2)").as("price"))
  }

  private val fixture = trades(Seq(
    // same minute, uid order defines open/close (pg.rs:695-696)
    (1L, "2024-01-01 10:00:05", "A", "P", "m1", 10, 100L, "5.00"),
    (2L, "2024-01-01 10:00:30", "A", "P", "m1", 10, 50L, "7.00"),
    (3L, "2024-01-01 10:00:55", "A", "P", "m1", 10, 25L, "3.00"),
    // next minute, same hour
    (4L, "2024-01-01 10:59:10", "A", "P", "m1", 11, 10L, "9.00"),
    // next hour
    (5L, "2024-01-01 11:30:00", "A", "P", "m1", 11, 20L, "4.00"),
    // different pair + matcher
    (6L, "2024-01-01 10:00:10", "B", "P", "m2", 10, 5L, "2.00")))

  test("minute candles: open/close by uid order, OHLC bounds, volumes") {
    val c = Candles.minuteCandles(fixture).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString) -> r).toMap
    val first = c(("A", "2024-01-01 10:00:00.0"))
    assert(first.getAs[java.math.BigDecimal]("open").doubleValue() == 5.0)
    assert(first.getAs[java.math.BigDecimal]("close").doubleValue() == 3.0)
    assert(first.getAs[java.math.BigDecimal]("low").doubleValue() == 3.0)
    assert(first.getAs[java.math.BigDecimal]("high").doubleValue() == 7.0)
    assert(first.getAs[java.math.BigDecimal]("volume").doubleValue() == 175.0)
    // quote_volume = 100*5 + 50*7 + 25*3 = 925
    assert(first.getAs[java.math.BigDecimal]("quote_volume").doubleValue() == 925.0)
    // wap = floor(925/175) = 5
    assert(first.getAs[java.math.BigDecimal]("weighted_average_price").doubleValue() == 5.0)
    assert(first.getAs[Int]("txs_count") == 3)
  }

  test("OHLC invariant low <= open, close <= high on every interval") {
    val all = Candles.allIntervals(fixture)
    val bad = all.filter(
      col("low") > col("open") || col("low") > col("close") ||
        col("high") < col("open") || col("high") < col("close") ||
        col("low") > col("high")).count()
    assert(bad == 0)
  }

  test("ladder conserves volume, quote_volume and txs_count per pair") {
    val all = Candles.allIntervals(fixture).cache()
    val perInterval = all.groupBy("interval")
      .agg(sum("volume").as("v"), sum("quote_volume").as("qv"), sum("txs_count").as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDecimal(1).doubleValue(), r.getDecimal(2).doubleValue(), r.getLong(3))))
      .toMap
    val (v0, qv0, _) = perInterval("1m")
    graft.functions.CandleIntervals.all.foreach { ivl =>
      val (v, qv, _) = perInterval(ivl)
      assert(v == v0, s"volume drift at $ivl")
      assert(qv == qv0, s"quote volume drift at $ivl")
    }
  }

  test("ladder open/close come from earliest/latest source bucket") {
    val c1h = {
      val c1m = Candles.minuteCandles(fixture)
      val c5 = Candles.ladderStep(c1m, "1m", "5m")
      val c15 = Candles.ladderStep(c5, "5m", "15m")
      val c30 = Candles.ladderStep(c15, "15m", "30m")
      Candles.ladderStep(c30, "30m", "1h")
    }
    val hour10 = c1h.filter(col("amount_asset_id") === "A" &&
      col("time_start") === lit(Timestamp.valueOf("2024-01-01 10:00:00"))).collect().head
    assert(hour10.getAs[java.math.BigDecimal]("open").doubleValue() == 5.0) // first minute's open
    assert(hour10.getAs[java.math.BigDecimal]("close").doubleValue() == 9.0) // last minute's close
  }

  test("tx_version > 2 price rescale uses the decimals dimension; missing asset fails (J3)") {
    import spark.implicits._
    val t = fixture.withColumn("tx_version", when(col("uid").isin(2, 6), 3).otherwise(1).cast("short"))
    val dim = Seq(("A", 2.toShort), ("B", 0.toShort), ("P", 4.toShort)).toDF("asset_id", "decimals")
    val c = Candles.minuteCandles(t, Some(dim))
    val first = c.filter(col("amount_asset_id") === "A" &&
      col("time_start") === lit(Timestamp.valueOf("2024-01-01 10:00:00"))).collect().head
    // uid 2 price 7.00 rescaled by 10^4 * 10^-2 = 100 => high = 700
    assert(first.getAs[java.math.BigDecimal]("high").doubleValue() == 700.0)

    val badDim = Seq(("A", 2.toShort), ("P", 4.toShort)).toDF("asset_id", "decimals") // B missing
    val ex = intercept[Exception](Candles.minuteCandles(t, Some(badDim)).collect())
    assert(ex.getMessage.contains("decimals not found") ||
      Option(ex.getCause).exists(_.getMessage.contains("decimals not found")))

    // decimal-exact powers: 10^17 is not representable in DOUBLE-pow land
    // without error at the last digits (Postgres computes in numeric)
    val bigDim = Seq(("A", 0.toShort), ("B", 0.toShort), ("P", 17.toShort)).toDF("asset_id", "decimals")
    val scaled = Candles.minuteCandles(t, Some(bigDim))
      .filter(col("amount_asset_id") === "A" &&
        col("time_start") === lit(Timestamp.valueOf("2024-01-01 10:00:00")))
      .collect().head
    // uid 2 price 7.00 × 10^17 exactly
    assert(scaled.getAs[java.math.BigDecimal]("high").toBigInteger
      .equals(new java.math.BigInteger("700000000000000000")))
  }

  test("incremental recompute from cutoff equals full recompute (A3)") {
    val keys = Seq("interval", "time_start", "amount_asset_id", "price_asset_id", "matcher_address")
    val full = Candles.allIntervals(fixture)
    // prior state: candles computed from only the first 4 trades
    val prior = Candles.allIntervals(fixture.filter(col("uid") <= 4))
    // appended trades are uids 5 (11:30) and 6 (10:00:10); the reference
    // cutoff is the FIRST appended tx timestamp (pg.rs:660-678)
    val incremental = Candles.recomputeSince(
      prior, fixture, Timestamp.valueOf("2024-01-01 10:00:10"))
    // compare as sets of rows
    assert(incremental.exceptAll(full).count() == 0 && full.exceptAll(incremental).count() == 0)
  }

  test("rollback∘append = identity (SURVEY §5)") {
    val before = Candles.allIntervals(fixture.filter(col("uid") <= 4))
    val appended = Candles.recomputeSince(before, fixture, Timestamp.valueOf("2024-01-01 10:00:10"))
    val rolledBack = Candles.rollback(appended, fixture.filter(col("uid") <= 4),
      Timestamp.valueOf("2024-01-01 10:00:10"))
    assert(rolledBack.exceptAll(before).count() == 0 && before.exceptAll(rolledBack).count() == 0)
  }

  test("interval start snapping (pg.rs:776-803): fixed, week, month") {
    val ts = Timestamp.valueOf("2024-01-10 13:47:31") // Wednesday
    assert(Candles.intervalStart(ts, "1h") == Timestamp.valueOf("2024-01-10 13:00:00"))
    assert(Candles.intervalStart(ts, "12h") == Timestamp.valueOf("2024-01-10 12:00:00"))
    assert(Candles.intervalStart(ts, "1w") == Timestamp.valueOf("2024-01-08 00:00:00")) // Monday
    assert(Candles.intervalStart(ts, "1M") == Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  test("upsert keeps primary-key uniqueness (S5)") {
    val keys = Seq("interval", "time_start", "amount_asset_id", "price_asset_id", "matcher_address")
    val a = Candles.allIntervals(fixture.filter(col("uid") <= 4))
    val b = Candles.allIntervals(fixture)
    val merged = Merge.upsert(a, b, keys)
    assert(merged.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count() == 0)
  }
}
