package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{JdbcUpsertSink, TableStore}

/** Sink-side contracts: ON CONFLICT statement generation with the
  * reference's chunk ceiling, and the parquet layout conventions. */
class SinksSpec extends SparkSpec {

  import spark.implicits._

  test("chunk sizing matches the reference formula (pg.rs:31-32)") {
    assert(JdbcUpsertSink.chunkRows(14) == (65535 / 14) / 10 * 10)
    assert(JdbcUpsertSink.chunkRows(4) == 16380)
  }

  test("upsert SQL carries every non-key column in DO UPDATE (pg.rs:721-730)") {
    val sql = JdbcUpsertSink.upsertSql("candles",
      Seq("interval", "time_start", "low", "high"), Seq("interval", "time_start"), rows = 2)
    assert(sql.startsWith("INSERT INTO candles (interval, time_start, low, high) VALUES (?, ?, ?, ?), (?, ?, ?, ?)"))
    assert(sql.contains("ON CONFLICT (interval, time_start) DO UPDATE SET low = excluded.low, high = excluded.high"))
    assert(!sql.contains("excluded.interval"))
  }

  test("insert-ignore SQL (pg.rs:176-184)") {
    val sql = JdbcUpsertSink.insertIgnoreSql("waves_data", Seq("height", "quantity"), Seq("quantity"), rows = 1)
    assert(sql == "INSERT INTO waves_data (height, quantity) VALUES (?, ?) ON CONFLICT (quantity) DO NOTHING")
  }

  test("statement respects the bind-param ceiling") {
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.upsertSql("t", Seq("a", "b"), Seq("a"), rows = JdbcUpsertSink.chunkRows(2) + 1)
    }
  }

  test("fact layout: height buckets partition, uid sorted, round-trips") {
    val dir = Files.createTempDirectory("graft-store").toString
    val df = Seq((1L, 1500, "x"), (2L, 2500, "y"), (3L, 1500, "z"))
      .toDF("uid", "height", "payload")
    TableStore.writeFact(df, s"$dir/facts")
    val back = TableStore.readAny(spark, s"$dir/facts")
    assert(back.count() == 3)
    assert(back.select("height_bucket").distinct().as[Int].collect().toSet == Set(1, 2))
    // partition pruning: a height-bucket filter reads one directory
    val pruned = back.filter(col("height_bucket") === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 2)
  }

  test("candle layout: interval partitions round-trip") {
    val dir = Files.createTempDirectory("graft-store").toString
    val candles = Seq(
      ("1m", "A", "P", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "m"),
      ("1h", "A", "P", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "m"))
      .toDF("interval", "amount_asset_id", "price_asset_id", "time_start", "matcher_address")
    TableStore.writeCandles(candles, s"$dir/candles")
    val back = TableStore.readAny(spark, s"$dir/candles")
    assert(back.filter(col("interval") === "1h").count() == 1)
  }
}
