package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.ReferenceSchemas.MaxUid

/** The reference's SQL views as composable DataFrames
  * (`up.sql:420-485`; SURVEY.md O20/O33/J2).
  */
object Views {

  /** `decimals` view (`up.sql:420-430`): current asset rows + static WAVES. */
  def decimals(spark: SparkSession, assetUpdates: DataFrame): DataFrame = {
    import spark.implicits._
    val current = assetUpdates
      .filter(col("superseded_by") === MaxUid)
      .select(col("asset_id"), col("decimals"))
    val waves = Seq(("WAVES", 8.toShort)).toDF("asset_id", "decimals")
    current.unionByName(waves)
  }

  /** `tickers` view (`up.sql:432-435`): DISTINCT ON (asset_id) ORDER BY
    * asset_id, uid DESC → row_number window (O20). */
  def tickers(assetTickers: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("uid").desc)
    assetTickers
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("asset_id"), col("ticker"))
  }

  /** `assets` view (`up.sql:437-485`): current asset_updates LEFT JOIN
    * tickers LEFT JOIN asset_origins, plus the synthetic WAVES row whose
    * total_quantity is the latest waves_data quantity (O24 scalar subquery).
    *
    * Both join dims are broadcast — tickers and origins are small relative
    * to the versioned fact at any scale that matters. */
  def assets(
      spark: SparkSession,
      assetUpdates: DataFrame,
      assetTickers: DataFrame,
      assetOrigins: DataFrame,
      wavesData: DataFrame): DataFrame = {
    import spark.implicits._

    val au = assetUpdates.filter(col("superseded_by") === MaxUid)
    val t = broadcast(tickers(assetTickers))
    val ao = broadcast(assetOrigins)

    val main = au
      .join(t, Seq("asset_id"), "left")
      .join(ao, Seq("asset_id"), "left")
      .select(
        col("asset_id"),
        col("ticker"),
        col("name").as("asset_name"),
        col("description"),
        col("issuer").as("sender"),
        col("issue_height"),
        col("issue_time_stamp").as("issue_timestamp"),
        col("volume").cast("decimal(38,0)").as("total_quantity"),
        col("decimals").cast("int").as("decimals"),
        col("reissuable"),
        col("script").isNotNull.as("has_script"),
        col("sponsorship").as("min_sponsored_asset_fee"))

    // ORDER BY height DESC NULLS LAST LIMIT 1 (`up.sql:478-481`) — stays
    // in-plan as a one-row aggregate cross-joined onto the static WAVES row
    // (no blocking driver action per view evaluation; VERDICT r2 #5)
    val latestQuantity = wavesData
      .agg(max_by(col("quantity"), col("height")).cast("decimal(38,0)").as("total_quantity"))

    val waves = Seq((
      "WAVES", "WAVES", "Waves", "", "", 0,
      java.sql.Timestamp.from(java.time.Instant.parse("2016-04-11T21:00:00Z")),
      8, false, false,
      None: Option[Long]))
      .toDF("asset_id", "ticker", "asset_name", "description", "sender", "issue_height",
        "issue_timestamp", "decimals", "reissuable", "has_script",
        "min_sponsored_asset_fee")
      .crossJoin(broadcast(latestQuantity))
      .select(main.columns.map(col).toIndexedSeq: _*)

    main.unionByName(waves)
  }
}
