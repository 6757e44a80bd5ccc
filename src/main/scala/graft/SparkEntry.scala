package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Candles
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (IDs match the VERDICT.md coverage table) plus the LLM-pipeline operator
  * families; `oracleSql` holds the DuckDB transliteration for every
  * SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship: OHLCV 1h candle ladder over the exchange-trades mapping —
    * the §7.2 end-to-end slice (ingest → convert → minute agg → ladder). */
  def entry(spark: SparkSession): DataFrame = {
    val trades = Tables.trades(spark, "/root/testdata/sf0.001")
    val c1m = Candles.partitionForLadder(Candles.minuteCandles(trades))
    val c5 = Candles.ladderStep(c1m, "1m", "5m")
    val c15 = Candles.ladderStep(c5, "5m", "15m")
    val c30 = Candles.ladderStep(c15, "15m", "30m")
    Candles.ladderStep(c30, "30m", "1h")
      .orderBy("time_start", "amount_asset_id", "price_asset_id", "matcher_address")
  }

  val allQueries: Vector[QueryDef] =
    CoreQueries.all ++ AggQueries.all ++ FuncQueries.all ++ LlmQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case QueryDef(name, _, Some(sql)) => name -> sql }.toMap
}
