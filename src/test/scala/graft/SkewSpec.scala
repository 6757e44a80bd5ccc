package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted two-phase aggregation equals the direct aggregation — including
  * the ordered argmin/argmax used for candle open/close. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("salted aggregate equals direct groupBy on a skewed key distribution") {
    // one hot key (90% of rows) + a tail
    val rows = (1 to 900).map(i => ("HOT", i.toLong, (i % 97).toDouble)) ++
      (1 to 100).map(i => (s"k${i % 7}", 1000L + i, i.toDouble))
    val df = rows.toDF("key", "uid", "value")

    val direct = df.groupBy("key")
      .agg(
        sum(col("value").cast("decimal(18,2)")).as("total"),
        count(lit(1)).as("n"),
        min("value").as("lo"),
        max("value").as("hi"),
        min_by(col("value"), col("uid")).as("open"),
        max_by(col("value"), col("uid")).as("close"))

    val salted = Skew.saltedAggregate(
      df,
      keys = Seq(col("key")),
      measures = Seq(
        Skew.sumOf(col("value").cast("decimal(18,2)"), "total"),
        Skew.countRows("n"),
        Skew.minOf(col("value"), "lo"),
        Skew.maxOf(col("value"), "hi"),
        Skew.minByOf(col("value"), col("uid"), "open"),
        Skew.maxByOf(col("value"), col("uid"), "close")),
      saltBuckets = 16,
      saltSource = col("uid"))

    val d = direct.orderBy("key").collect().map(_.toSeq).toSeq
    val s2 = salted.select(direct.columns.map(col).toIndexedSeq: _*).orderBy("key").collect().map(_.toSeq).toSeq
    assert(d == s2)
  }

  test("struct ordering key: argmin/argmax stay deterministic under duplicate uids") {
    // two rows share uid=1 with different values: a bare-uid argmin is
    // nondeterministic; the (uid, value) struct key pins the pick
    val df = Seq(("K", 1L, 9.0), ("K", 1L, 3.0), ("K", 2L, 5.0)).toDF("key", "uid", "value")
    val ord = struct(col("uid"), col("value"))
    val got = Skew.saltedAggregate(
      df,
      keys = Seq(col("key")),
      measures = Seq(
        Skew.minByOf(col("value"), ord, "open"),
        Skew.maxByOf(col("value"), ord, "close")),
      saltBuckets = 4,
      saltSource = col("value"))
      .select("open", "close").as[(Double, Double)].collect().head
    // open: min (uid, value) = (1, 3.0); close: max = (2, 5.0)
    assert(got == ((3.0, 5.0)))
  }

  test("salt actually spreads the hot key across partial groups") {
    val rows = (1 to 1000).map(i => ("HOT", i.toLong, 1.0))
    val df = rows.toDF("key", "uid", "value")
    val partials = df.withColumn("__salt", pmod(hash(col("uid")), lit(16)))
      .groupBy("key", "__salt").count()
    assert(partials.count() > 8) // hot key split over many buckets
  }

  test("salted minute candles equal the unsalted plan on the trades fixture") {
    val trades = graft.sources.Tables.trades(spark, "/root/testdata/sf0.001")
    val plain = graft.operators.Candles.minuteCandles(trades)
    val salted = graft.operators.Candles.minuteCandlesSalted(trades, saltBuckets = 8)
    assert(plain.exceptAll(salted).count() == 0 && salted.exceptAll(plain).count() == 0,
      s"salted candle divergence:\n${plain.exceptAll(salted).collect().take(3).mkString("\n")}")
  }

  test("minuteCandlesAuto salts only past the hot-pair threshold") {
    val trades = graft.sources.Tables.trades(spark, "/root/testdata/sf0.001")
    // low threshold → salted path; result must still match the plain plan
    val auto = graft.operators.Candles.minuteCandlesAuto(trades, hotPairRowThreshold = 1L)
    val plain = graft.operators.Candles.minuteCandles(trades)
    assert(auto.exceptAll(plain).count() == 0 && plain.exceptAll(auto).count() == 0)
    // high threshold → the single-shuffle plan (one Exchange for the agg)
    val unsalted = graft.operators.Candles.minuteCandlesAuto(trades, hotPairRowThreshold = Long.MaxValue)
    val exchanges = unsalted.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, "plain path should not pay the two-phase shuffle")
  }
}
