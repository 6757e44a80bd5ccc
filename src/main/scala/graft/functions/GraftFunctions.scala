package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level function surface of the engine.
  *
  * Everything that has a Spark builtin stays a builtin (codegen'd); only the
  * genuinely missing primitives (base58, blake2b/keccak address) are UDFs —
  * per SURVEY.md §2.9. Interval/bucketing helpers mirror the reference's
  * plpgsql functions `_trunc_ts_by_secs` / `_to_raw_timestamp` /
  * `text_timestamp_cast` (`migrations/...initial/up.sql:487-528`).
  */
object GraftFunctions {

  // ---- custom scalar UDFs (no Spark builtin exists) ----

  val base58Encode = udf((b: Array[Byte]) => if (b == null) null else Base58.encode(b))
  /** Whole-array variant — UDFs cannot consume higher-order-function lambda
    * variables, so proofs-style columns encode in one call. */
  val base58EncodeArray = udf((arr: Seq[Array[Byte]]) =>
    if (arr == null) null else arr.map(b => if (b == null) null else Base58.encode(b)))
  val base58Decode = udf((s: String) => if (s == null) null else Base58.decode(s).orNull)
  val base58IsValid = udf((s: String) => s != null && Base58.isValid(s))
  val blake2b256Udf = udf((b: Array[Byte]) => if (b == null) null else Blake2b256.hash(b))
  val keccak256Udf = udf((b: Array[Byte]) => if (b == null) null else Keccak256.hash(b))
  val wavesAddress = udf((pk: Array[Byte], chainId: Int) =>
    if (pk == null) null else Waves.addressFromPublicKey(pk, chainId.toByte))
  /** Address from a precomputed 20-byte public-key hash (`waves.rs:52-66`) —
    * the genesis/payment recipient payload (`convert.rs:258-285`). */
  val wavesAddressFromPkh = udf((pkh: Array[Byte], chainId: Int) =>
    if (pkh == null) null else Waves.addressFromPublicKeyHash(pkh, chainId.toByte))

  /** `extract_asset_id` (`waves.rs:79-85`) as a column expression: the
    * empty-check is a codegen'd builtin; only the base58 leg hits the UDF. */
  def extractAssetId(c: Column): Column =
    when(c.isNull.or(length(c) === 0), lit(Waves.WavesId)).otherwise(base58Encode(c))

  /** `into_prefixed_base64` (`utils.rs:7-15`) — builtins only. */
  def prefixedBase64(c: Column): Column =
    when(c.isNull.or(length(c) === 0), lit("")).otherwise(concat(lit("base64:"), base64(c)))

  /** 0x-prefixed lowercase hex (`models.rs:180-182`) — builtins only. */
  def prefixedHex(c: Column): Column = concat(lit("0x"), lower(hex(c)))

  /** `escape_unicode_null` (`utils.rs:22-24`) — builtin replace. */
  def escapeUnicodeNull(c: Column): Column = regexp_replace(c, "\u0000", "\\\\0")

  /** `text_timestamp_cast` (`up.sql:487-494`): epoch-ms text → timestamp. */
  def textTimestampCast(c: Column): Column = timestamp_millis(c.cast("long"))

  /** `_trunc_ts_by_secs` (`up.sql:521-528`): floor(epoch/secs)*secs. */
  def truncTsBySecs(ts: Column, secs: Long): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / secs) * secs)

  /** `_to_raw_timestamp` (`up.sql:496-519`): interval-string dispatch.
    * Fixed-width intervals use epoch flooring; 1d/1w/1M use calendar truncation
    * exactly as the reference does (date_trunc day/week/month). */
  def toRawTimestamp(ts: Column, interval: String): Column = interval match {
    case "1d" => date_trunc("day", ts)
    case "1w" => date_trunc("week", ts)
    case "1M" => date_trunc("month", ts)
    case other =>
      CandleIntervals.seconds.get(other) match {
        case Some(secs) => truncTsBySecs(ts, secs)
        case None => timestamp_seconds(lit(0)) // reference's ELSE to_timestamp(0)
      }
  }

  /** Ticker-key asset-id extraction (`mod.rs:548-581`) — regexp builtin. */
  def tickerKeyAssetId(c: Column): Column =
    regexp_extract(c, "^(.*?)__assetId2ticker__(.+)$", 2)

  /** Register SQL-callable names for the UDF subset. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("base58_encode", base58Encode)
    spark.udf.register("base58_decode", base58Decode)
    spark.udf.register("base58_is_valid", base58IsValid)
    spark.udf.register("blake2b256", blake2b256Udf)
    spark.udf.register("keccak256", keccak256Udf)
    spark.udf.register("waves_address", wavesAddress)
  }
}

/** Candle interval constants — `src/lib/consumer/models/candles.rs:24-70`. */
object CandleIntervals {
  /** The 12-edge ladder: (sourceInterval, destinationInterval). */
  val ladder: Seq[(String, String)] = Seq(
    "1m" -> "5m", "5m" -> "15m", "15m" -> "30m", "30m" -> "1h",
    "1h" -> "2h", "1h" -> "3h", "2h" -> "4h", "3h" -> "6h",
    "6h" -> "12h", "12h" -> "1d", "1d" -> "1w", "1d" -> "1M")

  val seconds: Map[String, Long] = Map(
    "1m" -> 60L, "5m" -> 300L, "15m" -> 900L, "30m" -> 1800L,
    "1h" -> 3600L, "2h" -> 7200L, "3h" -> 10800L, "4h" -> 14400L,
    "6h" -> 21600L, "12h" -> 43200L, "1d" -> 86400L)

  val all: Seq[String] = Seq("1m", "5m", "15m", "30m", "1h", "2h", "3h", "4h", "6h", "12h", "1d", "1w", "1M")
}
