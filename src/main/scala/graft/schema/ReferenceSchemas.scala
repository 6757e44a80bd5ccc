package graft.schema

import org.apache.spark.sql.types._

/** Explicit `StructType` registry for every table/view of the reference's
  * analytical schema — nothing is ever `inferSchema`'d.
  *
  * Source of truth: `migrations/2022-04-27-111623_initial/up.sql:12-418` and
  * the Diesel mirror `src/lib/schema.rs:3-683` in `/root/reference/`.
  * Type mapping per SURVEY.md §1.2: BIGINT→Long, INTEGER→Int, SMALLINT→Short,
  * VARCHAR/TEXT/jsonb→String, TEXT[]→Array[String], TIMESTAMPTZ→Timestamp
  * (session TZ pinned UTC), unbounded NUMERIC→Decimal(38,18) for
  * prices/volumes and Decimal(38,0) for quantities (declared deviation:
  * Postgres numeric is unbounded, 38 is Spark's max), BYTEA→Binary.
  */
object ReferenceSchemas {

  private def f(name: String, dt: DataType, nullable: Boolean = false) =
    StructField(name, dt, nullable)

  /** `up.sql:45-62` — common prefix shared by txs and all txs_N children. */
  val txsCommon: Seq[StructField] = Seq(
    f("uid", LongType),
    f("tx_type", ShortType),
    f("sender", StringType, nullable = true),
    f("sender_public_key", StringType, nullable = true),
    f("time_stamp", TimestampType),
    f("height", IntegerType),
    f("id", StringType),
    f("signature", StringType, nullable = true),
    f("proofs", ArrayType(StringType, containsNull = true), nullable = true),
    f("tx_version", ShortType, nullable = true),
    f("fee", LongType),
    f("status", StringType),
    f("block_uid", LongType))

  private def txsChild(extra: StructField*): StructType = StructType(txsCommon ++ extra)
  /** Children where DDL re-declares sender/sender_public_key NOT NULL. */
  private def txsChildStrictSender(extra: StructField*): StructType =
    StructType(txsCommon.map {
      case sf if sf.name == "sender" || sf.name == "sender_public_key" => sf.copy(nullable = false)
      case sf => sf
    } ++ extra)

  // `up.sql:12-17`
  val blocksMicroblocks: StructType = StructType(Seq(
    f("uid", LongType),
    f("id", StringType),
    f("height", IntegerType),
    f("time_stamp", TimestampType, nullable = true))) // NULL ⇒ microblock (pg.rs:160-166)

  // `up.sql:19-34`
  val assetUpdates: StructType = StructType(Seq(
    f("block_uid", LongType),
    f("uid", LongType),
    f("superseded_by", LongType),
    f("asset_id", StringType),
    f("decimals", ShortType),
    f("name", StringType),
    f("description", StringType),
    f("reissuable", BooleanType),
    f("volume", LongType),
    f("script", StringType, nullable = true),
    f("sponsorship", LongType, nullable = true),
    f("nft", BooleanType)))

  // `up.sql:36-43`
  val assetOrigins: StructType = StructType(Seq(
    f("asset_id", StringType),
    f("first_asset_update_uid", LongType),
    f("origin_transaction_id", StringType),
    f("issuer", StringType),
    f("issue_height", IntegerType),
    f("issue_time_stamp", TimestampType)))

  // `up.sql:45-62`
  val txs: StructType = StructType(txsCommon)

  // `up.sql:64-72` Genesis
  val txs1: StructType = txsChild(
    f("recipient_address", StringType),
    f("recipient_alias", StringType, nullable = true),
    f("amount", LongType))

  // `up.sql:76-86` Payment
  val txs2: StructType = txsChildStrictSender(
    f("recipient_address", StringType),
    f("recipient_alias", StringType, nullable = true),
    f("amount", LongType))

  // `up.sql:88-103` Issue
  val txs3: StructType = txsChildStrictSender(
    f("asset_id", StringType),
    f("asset_name", StringType),
    f("description", StringType),
    f("quantity", LongType),
    f("decimals", ShortType),
    f("reissuable", BooleanType),
    f("script", StringType, nullable = true))

  // `up.sql:105-119` Transfer
  val txs4: StructType = txsChildStrictSender(
    f("asset_id", StringType),
    f("amount", LongType),
    f("recipient_address", StringType),
    f("recipient_alias", StringType, nullable = true),
    f("fee_asset_id", StringType),
    f("attachment", StringType))

  // `up.sql:121-131` Reissue
  val txs5: StructType = txsChildStrictSender(
    f("asset_id", StringType),
    f("quantity", LongType),
    f("reissuable", BooleanType))

  // `up.sql:133-141` Burn
  val txs6: StructType = txsChildStrictSender(
    f("asset_id", StringType),
    f("amount", LongType))

  // `up.sql:143-159` Exchange — the candle input
  val txs7: StructType = txsChildStrictSender(
    f("order1", StringType), // jsonb carried as canonical JSON string
    f("order2", StringType),
    f("amount", LongType),
    f("price", LongType),
    f("amount_asset_id", StringType),
    f("price_asset_id", StringType),
    f("buy_matcher_fee", LongType),
    f("sell_matcher_fee", LongType),
    f("fee_asset_id", StringType))

  // `up.sql:161-170` Lease
  val txs8: StructType = txsChildStrictSender(
    f("recipient_address", StringType),
    f("recipient_alias", StringType, nullable = true),
    f("amount", LongType))

  // `up.sql:172-181` LeaseCancel
  val txs9: StructType = txsChildStrictSender(
    f("lease_tx_uid", LongType, nullable = true))

  // `up.sql:183-190` CreateAlias
  val txs10: StructType = txsChildStrictSender(
    f("alias", StringType))

  // `up.sql:192-201` MassTransfer
  val txs11: StructType = txsChildStrictSender(
    f("asset_id", StringType),
    f("attachment", StringType))

  // `up.sql:203-213`
  val txs11Transfers: StructType = StructType(Seq(
    f("tx_uid", LongType),
    f("recipient_address", StringType),
    f("recipient_alias", StringType, nullable = true),
    f("amount", LongType),
    f("position_in_tx", ShortType),
    f("height", IntegerType)))

  // `up.sql:215-222` DataTransaction
  val txs12: StructType = txsChildStrictSender()

  // `up.sql:224-237`
  val txs12Data: StructType = StructType(Seq(
    f("tx_uid", LongType),
    f("data_key", StringType),
    f("data_type", StringType, nullable = true),
    f("data_value_integer", LongType, nullable = true),
    f("data_value_boolean", BooleanType, nullable = true),
    f("data_value_binary", StringType, nullable = true),
    f("data_value_string", StringType, nullable = true),
    f("position_in_tx", ShortType),
    f("height", IntegerType)))

  // `up.sql:239-247` SetScript
  val txs13: StructType = txsChildStrictSender(
    f("script", StringType, nullable = true))

  // `up.sql:249-258` SponsorFee
  val txs14: StructType = txsChildStrictSender(
    f("asset_id", StringType),
    f("min_sponsored_asset_fee", LongType, nullable = true))

  // `up.sql:260-269` SetAssetScript
  val txs15: StructType = txsChildStrictSender(
    f("asset_id", StringType),
    f("script", StringType, nullable = true))

  // `up.sql:271-282` InvokeScript
  val txs16: StructType = txsChildStrictSender(
    f("dapp_address", StringType),
    f("dapp_alias", StringType, nullable = true),
    f("function_name", StringType, nullable = true),
    f("fee_asset_id", StringType))

  // `up.sql:284-297` (same shape for txs_18_args, `up.sql:333-346`)
  val invokeArgs: StructType = StructType(Seq(
    f("arg_type", StringType),
    f("arg_value_integer", LongType, nullable = true),
    f("arg_value_boolean", BooleanType, nullable = true),
    f("arg_value_binary", StringType, nullable = true),
    f("arg_value_string", StringType, nullable = true),
    f("arg_value_list", StringType, nullable = true), // jsonb as JSON string
    f("position_in_args", ShortType),
    f("tx_uid", LongType),
    f("height", IntegerType, nullable = true)))

  // `up.sql:299-308` (same shape for txs_18_payment, `up.sql:348-357`)
  val invokePayment: StructType = StructType(Seq(
    f("tx_uid", LongType),
    f("amount", LongType),
    f("position_in_payment", ShortType),
    f("height", IntegerType, nullable = true),
    f("asset_id", StringType)))

  val txs16Args: StructType = invokeArgs
  val txs16Payment: StructType = invokePayment

  // `up.sql:310-321` UpdateAssetInfo
  val txs17: StructType = txsChildStrictSender(
    f("asset_id", StringType),
    f("asset_name", StringType),
    f("description", StringType))

  // `up.sql:323-331` Ethereum-like
  val txs18: StructType = txsChild(
    f("bytes", BinaryType),
    f("function_name", StringType, nullable = true))

  val txs18Args: StructType = invokeArgs
  val txs18Payment: StructType = invokePayment

  // `up.sql:359-366`
  val assetsMetadata: StructType = StructType(Seq(
    f("asset_id", StringType, nullable = true),
    f("asset_name", StringType, nullable = true),
    f("ticker", StringType, nullable = true),
    f("height", IntegerType, nullable = true)))

  /** Decimal layout for candle/pair money columns (declared deviation from
    * unbounded Postgres numeric — SURVEY.md §1.2). */
  val money: DecimalType = DecimalType(38, 18)

  // `up.sql:368-385`
  val candles: StructType = StructType(Seq(
    f("time_start", TimestampType),
    f("amount_asset_id", StringType),
    f("price_asset_id", StringType),
    f("low", money),
    f("high", money),
    f("volume", money),
    f("quote_volume", money),
    f("max_height", IntegerType),
    f("txs_count", IntegerType),
    f("weighted_average_price", money),
    f("open", money),
    f("close", money),
    f("interval", StringType),
    f("matcher_address", StringType)))

  // `up.sql:387-402`
  val pairs: StructType = StructType(Seq(
    f("amount_asset_id", StringType),
    f("price_asset_id", StringType),
    f("first_price", money),
    f("last_price", money),
    f("volume", money),
    f("volume_waves", money, nullable = true),
    f("quote_volume", money),
    f("high", money),
    f("low", money),
    f("weighted_average_price", money),
    f("txs_count", IntegerType),
    f("matcher_address", StringType)))

  // `up.sql:404-408`
  val wavesData: StructType = StructType(Seq(
    f("height", IntegerType, nullable = true),
    f("quantity", DecimalType(38, 0))))

  // `up.sql:410-418`
  val assetTickers: StructType = StructType(Seq(
    f("uid", LongType),
    f("superseded_by", LongType),
    f("block_uid", LongType),
    f("asset_id", StringType),
    f("ticker", StringType)))

  /** Every physical table, by reference name. */
  val tables: Map[String, StructType] = Map(
    "blocks_microblocks" -> blocksMicroblocks,
    "asset_updates" -> assetUpdates,
    "asset_origins" -> assetOrigins,
    "txs" -> txs,
    "txs_1" -> txs1, "txs_2" -> txs2, "txs_3" -> txs3, "txs_4" -> txs4,
    "txs_5" -> txs5, "txs_6" -> txs6, "txs_7" -> txs7, "txs_8" -> txs8,
    "txs_9" -> txs9, "txs_10" -> txs10, "txs_11" -> txs11,
    "txs_11_transfers" -> txs11Transfers,
    "txs_12" -> txs12, "txs_12_data" -> txs12Data,
    "txs_13" -> txs13, "txs_14" -> txs14, "txs_15" -> txs15,
    "txs_16" -> txs16, "txs_16_args" -> txs16Args, "txs_16_payment" -> txs16Payment,
    "txs_17" -> txs17,
    "txs_18" -> txs18, "txs_18_args" -> txs18Args, "txs_18_payment" -> txs18Payment,
    "assets_metadata" -> assetsMetadata,
    "candles" -> candles,
    "pairs" -> pairs,
    "waves_data" -> wavesData,
    "asset_tickers" -> assetTickers)

  /** Current-version sentinel: `i64::MAX - 1` (`pg.rs:31`). */
  val MaxUid: Long = 9223372036854775806L

  /** Deterministic tx-uid multiplier (`mod.rs:41`). */
  val UidsPerHeight: Long = 100000L
}
