package graft.convert

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Version-dependent Order → JSON serialization ≙ `models.rs:101-192`
  * (`impl Serialize for Order` + `From<OrderMeta>`), used by the exchange
  * conversion (`convert.rs:383-425`) to fill `order1`/`order2` jsonb.
  *
  * Two layers, mirroring the reference's split:
  *  - [[fromRaw]] ≙ `From<OrderMeta> for Order` (models.rs:138-192): raw
  *    bytes → display strings (base58 ids/keys/proofs, `0x`-hex eip712,
  *    buy/sell tag, WAVES-as-null asset pair, priceMode name mapping,
  *    signature = first proof or "").
  *  - [[serialize]] ≙ `impl Serialize` (models.rs:101-136): canonical
  *    compact JSON whose *field set* depends on the order version —
  *    versions 1-2 emit the 14 base fields, version 3 adds
  *    `matcherFeeAssetId`, versions ≥4 add `eip712Signature` and
  *    `priceMode`. (The serde length hint says 15/16/17, but the actual
  *    `serialize_field` calls emit 14/15/17 — we reproduce the emitted
  *    fields.) Field order follows the serialize_field order; null fields
  *    are emitted as JSON null exactly as serde serializes `None`.
  *
  * All of it is builtin expressions (`to_json`, `transform`, `when`) —
  * codegen-friendly, no UDF; base58 is the native Catalyst expression.
  */
object OrderJson {

  private def b58(c: Column): Column = graft.plans.GraftExtensions.base58Encode(c)

  /** Typed display struct from a [[RawOrder]]-shaped struct column.
    * Field values (not order) match `models.rs:138-192`; [[serialize]]
    * projects them into the canonical field order per version. */
  def fromRaw(o: Column): Column = {
    def optAsset(c: Column): Column = when(length(c) > 0, b58(c)) // len()>0 gate, models.rs:152-162
    val proofs = transform(o.getField("proofs"), p => b58(p))
    struct(
      b58(o.getField("id")).as("id"),
      o.getField("version").as("version"),
      b58(o.getField("senderAddress")).as("sender"),
      b58(o.getField("senderPublicKey")).as("senderPublicKey"),
      b58(o.getField("matcherPublicKey")).as("matcherPublicKey"),
      struct(
        optAsset(o.getField("amountAssetId")).as("amountAsset"),
        optAsset(o.getField("priceAssetId")).as("priceAsset")).as("assetPair"),
      when(o.getField("orderSide") === 0, "buy").otherwise("sell").as("orderType"),
      o.getField("amount").as("amount"),
      o.getField("price").as("price"),
      o.getField("timestamp").as("timestamp"),
      o.getField("expiration").as("expiration"),
      o.getField("matcherFee").as("matcherFee"),
      when(length(o.getField("matcherFeeAssetId")) > 0, b58(o.getField("matcherFeeAssetId")))
        .as("matcherFeeAssetId"),
      proofs.as("proofs"),
      coalesce(get(proofs, lit(0)), lit("")).as("signature"), // first proof or "", models.rs:147
      when(o.getField("version") >= 4 && o.getField("eip712Signature").isNotNull,
        concat(lit("0x"), lower(hex(o.getField("eip712Signature"))))).as("eip712Signature"), // models.rs:179-183
      when(o.getField("priceMode") === 1, "fixedDecimals")
        .when(o.getField("priceMode") === 2, "assetDecimals")
        .as("priceMode")) // models.rs:184-189: 0 → null
  }

  /** Canonical per-version JSON from a typed order struct (field names as
    * produced by [[fromRaw]]). The version decides the field SET; nulls
    * inside the set are emitted (`ignoreNullFields=false`), absent fields
    * are genuinely absent — a v1 order has no `matcherFeeAssetId` key. */
  def serialize(t: Column): Column = {
    val opts = Map("ignoreNullFields" -> "false")
    def f(name: String): Column = t.getField(name).as(name)
    val base = Seq("id", "version", "sender", "senderPublicKey", "matcherPublicKey",
      "assetPair", "orderType", "amount", "price", "timestamp", "expiration",
      "matcherFee", "proofs", "signature").map(f)
    val v3 = base :+ f("matcherFeeAssetId")
    val v4 = v3 ++ Seq(f("eip712Signature"), f("priceMode"))
    val version = t.getField("version")
    when(version <= 2, to_json(struct(base: _*), opts))
      .when(version === 3, to_json(struct(v3: _*), opts))
      .otherwise(to_json(struct(v4: _*), opts))
  }

  /** RawOrder struct column → canonical JSON string (the `order1`/`order2`
    * jsonb payload). */
  def orderJson(raw: Column): Column = when(raw.isNotNull, serialize(fromRaw(raw)))
}
