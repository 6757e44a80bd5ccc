package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Candles

/** Randomized candle invariants (SURVEY §5) over generated trade sets:
  * OHLC ordering, measure conservation across the ladder, incremental ==
  * full at arbitrary cutoffs, rollback∘append identity. Seeded generators —
  * failures reproduce. */
class CandlePropertySpec extends SparkSpec {

  import spark.implicits._

  private def randomTrades(seed: Long, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val base = 1704067200L // 2024-01-01
    val rows = (1 to n).map { i =>
      val ts = base + rnd.nextInt(40 * 86400).toLong // across ~6 weeks
      (i.toLong, new Timestamp(ts * 1000L),
        s"A${rnd.nextInt(3)}", s"P${rnd.nextInt(2)}", s"m${rnd.nextInt(2)}",
        ts.toInt / 86400, rnd.nextInt(1000).toLong + 1,
        BigDecimal(rnd.nextInt(100000)) / 100)
    }
    rows.toDF("uid", "time_stamp", "amount_asset_id", "price_asset_id", "sender", "height", "amount", "price")
      .withColumn("price", col("price").cast("decimal(18,2)"))
  }

  test("OHLC bounds hold on random trade sets at every interval") {
    for (seed <- Seq(1L, 42L, 99L)) {
      val all = Candles.allIntervals(randomTrades(seed, 300))
      val bad = all.filter(
        col("low") > col("open") || col("low") > col("close") ||
          col("high") < col("open") || col("high") < col("close")).count()
      assert(bad == 0, s"seed $seed violated OHLC bounds")
    }
  }

  test("volume/quote_volume/txs_count are conserved across all 13 intervals") {
    for (seed <- Seq(7L, 1234L)) {
      val all = Candles.allIntervals(randomTrades(seed, 400)).cache()
      val sums = all.groupBy("interval")
        .agg(sum("volume").cast("decimal(38,6)").as("v"),
          sum("quote_volume").cast("decimal(38,6)").as("qv"),
          sum("txs_count").as("n"))
        .collect()
        .map(r => r.getString(0) -> ((r.getDecimal(1), r.getDecimal(2), r.getLong(3))))
        .toMap
      val (v0, qv0, n0) = sums("1m")
      graft.functions.CandleIntervals.all.foreach { ivl =>
        val (v, qv, n) = sums(ivl)
        assert(v == v0 && qv == qv0 && n == n0, s"seed $seed drift at $ivl")
      }
      all.unpersist()
    }
  }

  test("incremental recompute equals full recompute at random cutoffs") {
    val trades = randomTrades(77L, 250)
    val cutUid = 200L
    val prior = Candles.allIntervals(trades.filter(col("uid") <= cutUid))
    val appended = trades.filter(col("uid") > cutUid)
    val firstTs = appended.agg(min("time_stamp")).collect().head.getTimestamp(0)
    val incremental = Candles.recomputeSince(prior, trades, firstTs)
    val full = Candles.allIntervals(trades)
    assert(incremental.exceptAll(full).count() == 0 && full.exceptAll(incremental).count() == 0)
  }

  test("rollback-append is an identity on random histories") {
    val trades = randomTrades(31L, 250)
    val cutUid = 180L
    val before = Candles.allIntervals(trades.filter(col("uid") <= cutUid))
    val appended = trades.filter(col("uid") > cutUid)
    val firstTs = appended.agg(min("time_stamp")).collect().head.getTimestamp(0)
    val state = Candles.recomputeSince(before, trades, firstTs)
    val rolled = Candles.rollback(state, trades.filter(col("uid") <= cutUid), firstTs)
    assert(rolled.exceptAll(before).count() == 0 && before.exceptAll(rolled).count() == 0)
  }
}
