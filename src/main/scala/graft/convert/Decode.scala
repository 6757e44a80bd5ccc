package graft.convert

/** Wire-level decode policy ≙ `TryFrom<BlockchainUpdatedPB>`
  * (`updates.rs:154-263`): the stream delivers transactions, ids, and
  * metadata as PARALLEL arrays; decode zips them and a transaction whose
  * metadata slot is missing is SKIPPED with a log line, never an error
  * (`updates.rs:196-218` filter_map). [[RawTx]] is the post-zip IR — this
  * is the step that produces it.
  */
object Decode {

  /** One wire slot before the meta zip: the payload plus its (possibly
    * missing) metadata. Metadata carries the node-resolved addresses the
    * conversion needs (≙ `transactions_metadata`: sender/recipient/dApp
    * address bytes). */
  final case class RawTxWire(tx: RawTx, meta: Option[RawTxMeta])

  final case class RawTxMeta(
      recipientAddress: Option[Array[Byte]] = None,
      dappAddress: Option[Array[Byte]] = None)

  /** Zip payloads with metadata, applying the skip-on-missing-meta policy.
    * Returns the decoded txs and the skipped count (surfaced to the caller
    * for logging/metrics — a dropped tx must never be silent). */
  def zipWithMeta(wires: Seq[RawTxWire]): (Seq[RawTx], Int) = {
    val (decoded, skipped) = wires.partition(_.meta.isDefined)
    val merged = decoded.map { w =>
      val m = w.meta.get
      w.tx.copy(
        recipient = m.recipientAddress.orElse(w.tx.recipient),
        dappAddress = m.dappAddress.orElse(w.tx.dappAddress))
    }
    if (skipped.nonEmpty) {
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"skipped ${skipped.size} transaction(s) with missing metadata (updates.rs:196-218 policy)")
    }
    (merged, skipped.size)
  }

  /** Decode one block append from wire slots: zip, skip, build. */
  def decodeBlock(
      id: String,
      height: Int,
      timeStampMs: Option[Long],
      updatedWavesAmount: Option[Long],
      wires: Seq[RawTxWire]): (RawBlock, Int) = {
    val (txs, skipped) = zipWithMeta(wires)
    (RawBlock(id, height, timeStampMs, updatedWavesAmount, txs), skipped)
  }
}
