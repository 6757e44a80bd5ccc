package graft.convert

/** Typed ingest event model ≙ `src/lib/consumer/mod.rs:44-71` +
  * `models/txs/mod.rs:25-568` in `/root/reference/`.
  *
  * The reference decodes protobuf messages; our IR is a superset case class
  * per transaction with `Option`al per-type payloads — the 18-way dispatch
  * (`convert.rs:74-729`) reads the fields its type needs. Binary fields are
  * raw bytes; base58/base64/address encoding happens in [[TxConvert]],
  * exactly where the reference does it.
  */
final case class RawDataEntry(
    key: String,
    integerValue: Option[Long] = None,
    booleanValue: Option[Boolean] = None,
    binaryValue: Option[Array[Byte]] = None,
    stringValue: Option[String] = None)

final case class RawInvokeArg(
    argType: String, // integer | boolean | binary | string | list | case
    integerValue: Option[Long] = None,
    booleanValue: Option[Boolean] = None,
    binaryValue: Option[Array[Byte]] = None,
    stringValue: Option[String] = None,
    listJson: Option[String] = None)

final case class RawPayment(amount: Long, assetId: Array[Byte])

final case class RawTransfer(recipient: Array[Byte], amount: Long)

/** Per-tx asset state update (`state_update.assets[].after` ≙
  * `mod.rs:476-546`): the post-state of an asset touched by the tx. */
final case class RawAssetStateUpdate(
    assetId: Array[Byte],
    issuer: Array[Byte], // issuer public key → Address (mod.rs:515-516)
    name: String,
    description: String,
    decimals: Short,
    reissuable: Boolean,
    nft: Boolean,
    volume: Long,
    script: Option[Array[Byte]] = None,
    sponsorship: Long = 0L)

/** Per-tx data-entry state update (`state_update.data_entries[]` ≙
  * `mod.rs:548-581`): an entry whose value fields are all None is a key
  * DELETION (the protobuf keeps the key, drops the value — mod.rs:568). */
final case class RawDataEntryUpdate(
    address: Array[Byte],
    entry: Option[RawDataEntry])

/** One exchange order as decoded from the stream, meta-zipped
  * (≙ `OrderMeta`, `models.rs:73-79`: the node-resolved sender address
  * bytes and order id ride along with the protobuf order fields).
  * Empty byte arrays mean "absent" (WAVES asset / no fee asset), matching
  * the protobuf wire convention the reference's `len() > 0` gates test.
  * [[OrderJson]] turns this into the version-dependent canonical JSON the
  * reference stores in `order1`/`order2` jsonb (`models.rs:101-192`). */
final case class RawOrder(
    id: Array[Byte] = Array.emptyByteArray,
    version: Int = 1,
    senderAddress: Array[Byte] = Array.emptyByteArray,
    senderPublicKey: Array[Byte] = Array.emptyByteArray,
    matcherPublicKey: Array[Byte] = Array.emptyByteArray,
    amountAssetId: Array[Byte] = Array.emptyByteArray,
    priceAssetId: Array[Byte] = Array.emptyByteArray,
    orderSide: Int = 0, // 0 = buy, 1 = sell (models.rs:207-216)
    amount: Long = 0L,
    price: Long = 0L,
    timestamp: Long = 0L,
    expiration: Long = 0L,
    matcherFee: Long = 0L,
    matcherFeeAssetId: Array[Byte] = Array.emptyByteArray,
    proofs: Seq[Array[Byte]] = Nil,
    eip712Signature: Option[Array[Byte]] = None,
    priceMode: Int = 0) // 0 = default(null), 1 = fixedDecimals, 2 = assetDecimals

/** One transaction as decoded from the stream (`updates.rs:196-218` zips
  * txs with ids/meta; here the zip is already applied). */
final case class RawTx(
    id: Array[Byte],
    txType: Short,
    senderPublicKey: Array[Byte],
    signature: Option[Array[Byte]] = None,
    proofs: Seq[Array[Byte]] = Nil,
    txVersion: Option[Short] = None,
    fee: Long = 0L,
    feeAssetId: Option[Array[Byte]] = None,
    status: String = "succeeded",
    timeStampMs: Long = 0L,
    // per-type payload fields (superset).
    // `recipient` convention mirrors the wire data each type carries: a
    // 20-byte public-key HASH for types 1/2 (convert.rs:258-285), NODE-
    // RESOLVED address bytes from tx meta for types 4/8 (convert.rs:337,444)
    // — TxConvert base58-encodes resolved bytes directly, never re-hashes.
    recipient: Option[Array[Byte]] = None,
    recipientAlias: Option[String] = None,
    amount: Option[Long] = None,
    assetId: Option[Array[Byte]] = None,
    assetName: Option[String] = None,
    description: Option[String] = None,
    quantity: Option[Long] = None,
    decimals: Option[Short] = None,
    reissuable: Option[Boolean] = None,
    script: Option[Array[Byte]] = None,
    price: Option[Long] = None,
    amountAssetId: Option[Array[Byte]] = None,
    priceAssetId: Option[Array[Byte]] = None,
    buyMatcherFee: Option[Long] = None,
    sellMatcherFee: Option[Long] = None,
    order1: Option[RawOrder] = None,
    order2: Option[RawOrder] = None,
    leaseTxId: Option[Array[Byte]] = None,
    alias: Option[String] = None,
    attachment: Option[Array[Byte]] = None,
    transfers: Seq[RawTransfer] = Nil,
    dataEntries: Seq[RawDataEntry] = Nil,
    minSponsoredAssetFee: Option[Long] = None,
    dappAddress: Option[Array[Byte]] = None,
    dappAlias: Option[String] = None,
    functionName: Option[String] = None,
    args: Seq[RawInvokeArg] = Nil,
    payments: Seq[RawPayment] = Nil,
    ethereumBytes: Option[Array[Byte]] = None,
    // per-tx state updates (updates.rs:196-218 zips them alongside meta)
    assetStateUpdates: Seq[RawAssetStateUpdate] = Nil,
    dataEntryUpdates: Seq[RawDataEntryUpdate] = Nil)

/** One event of the decoded stream (`BlockchainUpdate`, `mod.rs:44-48`):
  * a block/microblock append or a rollback marker. */
sealed trait RawUpdate

/** One block/microblock append (`mod.rs:50-65`). `timeStampMs` None ⇒
  * microblock (provisional). */
final case class RawBlock(
    id: String,
    height: Int,
    timeStampMs: Option[Long],
    updatedWavesAmount: Option[Long],
    txs: Seq[RawTx]) extends RawUpdate

/** Chain reorg: drop everything after the named block (`mod.rs:47`). */
final case class RawRollback(toBlockId: String) extends RawUpdate
