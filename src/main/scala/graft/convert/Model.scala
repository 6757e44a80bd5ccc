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

final case class RawOrder(json: String)

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
    // per-type payload fields (superset)
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
    ethereumBytes: Option[Array[Byte]] = None)

/** One block/microblock append (`mod.rs:50-65`). `timeStampMs` None ⇒
  * microblock (provisional). */
final case class RawBlock(
    id: String,
    height: Int,
    timeStampMs: Option[Long],
    updatedWavesAmount: Option[Long],
    txs: Seq[RawTx])
