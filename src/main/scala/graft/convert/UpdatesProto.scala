package graft.convert

import graft.convert.ProtoWire.{Reader, Writer, WtLen, WtVarint}
import graft.functions.Base58

/** Wire decode of the blockchain-updates feed into the [[RawUpdate]] IR —
  * the ingestion step the reference performs with gRPC + prost
  * (`src/lib/consumer/updates.rs:154-263` in `/root/reference/`): one
  * `BlockchainUpdated` message per block/microblock/rollback, transactions
  * carried as PARALLEL arrays of payloads, ids, metadata, and per-tx state
  * updates that decode zips together, skipping a tx whose metadata slot is
  * empty (`updates.rs:196-218`).
  *
  * The wire FORMAT here is real protobuf ([[ProtoWire]]); the message
  * field-number tables in [[UpdatesProto.Schema]] were transcribed from the
  * public `waves-protobuf-schemas` definitions the reference compiles
  * against (events.proto / transaction.proto / order.proto). That repo is
  * not vendored in `/root/reference` and this build has no network, so the
  * numbers could not be re-verified against the published files — they are
  * centralized in `Schema` as the single place to realign before pointing
  * the decoder at a live node, and [[graft.ProtoSpec]] pins
  * encode→decode→convert round-trips so the machinery is correct for any
  * consistent numbering.
  *
  * Everything below is row-local (one message in, one [[RawUpdate]] out) —
  * on a cluster the decode is a map-only stage over a binary column, no
  * shuffle, no driver involvement.
  */
object UpdatesProto {

  /** Field numbers, one object per message type. */
  object Schema {
    object BlockchainUpdated { val Id = 1; val Height = 2; val Append = 11; val Rollback = 12 }
    object Rollback { val BlockId = 1 }
    object Append {
      val Block = 1; val MicroBlock = 2; val TransactionIds = 3
      val TransactionsMetadata = 7; val TransactionStateUpdates = 8
    }
    object BlockAppend { val Block = 1; val UpdatedWavesAmount = 2 }
    object MicroBlockAppend { val MicroBlock = 1 }
    object Block { val Header = 1; val Signature = 2; val Transactions = 3 }
    object Header { val Timestamp = 6 }
    object SignedMicroBlock { val MicroBlock = 1; val TotalBlockId = 3 }
    object MicroBlock { val Transactions = 3 }
    object SignedTransaction { val WavesTransaction = 1; val Proofs = 2; val EthereumTransaction = 3 }
    object Transaction {
      val ChainId = 1; val SenderPublicKey = 2; val Fee = 3; val Timestamp = 4; val Version = 5
      // oneof data — one slot per tx type 1..17 (18 rides SignedTransaction.ethereum_transaction)
      val DataBase = 100 // type t lives at field DataBase + t
    }
    object Amount { val AssetId = 1; val Amount = 2 }
    object Recipient { val PublicKeyHash = 1; val Alias = 2 }
    object Genesis { val RecipientAddress = 1; val Amount = 2 }
    object Payment { val RecipientAddress = 1; val Amount = 2 }
    object Issue { val Name = 1; val Description = 2; val Amount = 3; val Decimals = 4; val Reissuable = 5; val Script = 6 }
    object Transfer { val Recipient = 1; val Amount = 2; val Attachment = 3 }
    object Reissue { val AssetAmount = 1; val Reissuable = 2 }
    object Burn { val AssetAmount = 1 }
    object Exchange { val Amount = 1; val Price = 2; val BuyMatcherFee = 3; val SellMatcherFee = 4; val Orders = 5 }
    object Lease { val Recipient = 1; val Amount = 2 }
    object LeaseCancel { val LeaseId = 1 }
    object CreateAlias { val Alias = 1 }
    object MassTransfer { val AssetId = 1; val Transfers = 2; val Attachment = 3 }
    object MassTransferItem { val Recipient = 1; val Amount = 2 }
    object DataTx { val Data = 1 }
    object DataEntry { val Key = 1; val IntValue = 10; val BoolValue = 11; val BinaryValue = 12; val StringValue = 13 }
    object SetScript { val Script = 1 }
    object SponsorFee { val MinFee = 1 }
    object SetAssetScript { val AssetId = 1; val Script = 2 }
    object InvokeScript { val DApp = 1; val FunctionCall = 2; val Payments = 3 }
    object UpdateAssetInfo { val AssetId = 1; val Name = 2; val Description = 3 }
    object Order {
      val ChainId = 1; val SenderPublicKey = 2; val MatcherPublicKey = 3; val AssetPair = 4
      val OrderSide = 5; val Amount = 6; val Price = 7; val Timestamp = 8; val Expiration = 9
      val MatcherFee = 10; val Version = 11; val Proofs = 12; val PriceMode = 13; val Eip712Signature = 14
    }
    object AssetPair { val AmountAssetId = 1; val PriceAssetId = 2 }
    object TransactionMetadata {
      val SenderAddress = 1; val Transfer = 5; val Exchange = 7; val Lease = 8
      val InvokeScript = 9; val MassTransfer = 10; val Ethereum = 11
    }
    object TransferMeta { val RecipientAddress = 1 }
    object ExchangeMeta { val OrderIds = 1; val OrderSenderAddresses = 2 }
    object LeaseMeta { val RecipientAddress = 1 }
    object InvokeMeta { val DAppAddress = 1; val FunctionName = 2; val Arguments = 3 }
    object MassTransferMeta { val RecipientAddresses = 1 }
    object EthereumMeta { val Fee = 1; val Timestamp = 2; val FunctionName = 3; val Version = 4 }
    object MetaArgument { val IntValue = 1; val BinaryValue = 2; val StringValue = 3; val BoolValue = 4; val List = 10 }
    object ArgList { val Items = 1 }
    object StateUpdate { val Assets = 2; val DataEntries = 3 }
    object AssetStateUpdate { val After = 2 }
    object AssetDetails {
      val AssetId = 1; val Issuer = 2; val Decimals = 3; val Name = 4; val Description = 5
      val Reissuable = 6; val Volume = 7; val ScriptInfo = 8; val Sponsorship = 9; val Nft = 10
    }
    object ScriptInfo { val Script = 1 }
    object DataEntryUpdate { val Address = 1; val DataEntry = 2 }
  }

  import Schema._

  // ------------------------------------------------------------------
  // Metadata model (encode side). The feed's `transactions_metadata` is a
  // parallel array; `present = false` encodes an EMPTY slot, which decode
  // maps to a missing-metadata tx (the updates.rs:196-218 skip policy).
  // ------------------------------------------------------------------

  sealed trait MetaArg
  final case class IntArg(v: Long) extends MetaArg
  final case class BoolArg(v: Boolean) extends MetaArg
  final case class BinArg(v: Array[Byte]) extends MetaArg
  final case class StrArg(v: String) extends MetaArg
  final case class ListArg(items: Seq[MetaArg]) extends MetaArg

  final case class TxMeta(
      senderAddress: Array[Byte] = Array.emptyByteArray,
      recipientAddress: Option[Array[Byte]] = None,
      dappAddress: Option[Array[Byte]] = None,
      functionName: Option[String] = None,
      args: Seq[MetaArg] = Nil,
      orderIds: Seq[Array[Byte]] = Nil,
      orderSenderAddresses: Seq[Array[Byte]] = Nil,
      massTransferRecipients: Seq[Array[Byte]] = Nil,
      ethereumFee: Option[Long] = None,
      ethereumTimestamp: Option[Long] = None,
      ethereumVersion: Option[Int] = None,
      present: Boolean = true)

  // ------------------------------------------------------------------
  // Encode — fixture/builder side (the node's role). Deterministic, pure.
  // ------------------------------------------------------------------

  def encodeBlock(block: RawBlock, metas: Seq[TxMeta]): Array[Byte] = {
    require(metas.length == block.txs.length, "metas must parallel txs")
    val w = new Writer
    w.bytes(BlockchainUpdated.Id, Base58.decode(block.id).getOrElse(block.id.getBytes("UTF-8")))
    w.int32(BlockchainUpdated.Height, block.height)
    w.message(BlockchainUpdated.Append) { a =>
      block.timeStampMs match {
        case Some(ts) => // full block: header carries the timestamp
          a.message(Append.Block) { ba =>
            ba.message(BlockAppend.Block) { b =>
              b.message(Block.Header)(_.int64(Header.Timestamp, ts))
              block.txs.foreach(tx => b.message(Block.Transactions)(encodeSignedTx(_, tx)))
            }
            block.updatedWavesAmount.foreach(ba.int64(BlockAppend.UpdatedWavesAmount, _))
          }
        case None => // microblock append (provisional, no timestamp)
          a.message(Append.MicroBlock) { ma =>
            ma.message(MicroBlockAppend.MicroBlock) { smb =>
              smb.message(SignedMicroBlock.MicroBlock) { mb =>
                block.txs.foreach(tx => mb.message(MicroBlock.Transactions)(encodeSignedTx(_, tx)))
              }
            }
          }
      }
      block.txs.foreach(tx => a.bytesAlways(Append.TransactionIds, tx.id))
      metas.foreach(m => a.message(Append.TransactionsMetadata)(encodeMeta(_, m)))
      block.txs.foreach(tx => a.message(Append.TransactionStateUpdates)(encodeStateUpdate(_, tx)))
    }
    w.toBytes
  }

  def encodeRollback(r: RawRollback): Array[Byte] = {
    val w = new Writer
    w.bytes(BlockchainUpdated.Id, Base58.decode(r.toBlockId).getOrElse(r.toBlockId.getBytes("UTF-8")))
    w.message(BlockchainUpdated.Rollback)(
      _.bytes(Rollback.BlockId, Base58.decode(r.toBlockId).getOrElse(r.toBlockId.getBytes("UTF-8"))))
    w.toBytes
  }

  private def encodeAmount(w: Writer, field: Int, assetId: Array[Byte], amount: Long): Unit =
    w.message(field) { a => a.bytes(Amount.AssetId, assetId); a.int64(Amount.Amount, amount) }

  private def encodeRecipientPkh(w: Writer, field: Int, pkh: Array[Byte], alias: Option[String]): Unit =
    w.message(field) { r =>
      alias match {
        case Some(al) => r.string(Recipient.Alias, al)
        case None => r.bytes(Recipient.PublicKeyHash, pkh)
      }
    }

  private def encodeOrder(w: Writer, o: RawOrder): Unit = {
    w.int32(Order.ChainId, 'W'.toInt)
    w.bytes(Order.SenderPublicKey, o.senderPublicKey)
    w.bytes(Order.MatcherPublicKey, o.matcherPublicKey)
    w.message(Order.AssetPair) { p =>
      p.bytes(AssetPair.AmountAssetId, o.amountAssetId)
      p.bytes(AssetPair.PriceAssetId, o.priceAssetId)
    }
    w.int32(Order.OrderSide, o.orderSide)
    w.int64(Order.Amount, o.amount)
    w.int64(Order.Price, o.price)
    w.int64(Order.Timestamp, o.timestamp)
    w.int64(Order.Expiration, o.expiration)
    encodeAmount(w, Order.MatcherFee, o.matcherFeeAssetId, o.matcherFee)
    w.int32(Order.Version, o.version)
    o.proofs.foreach(w.bytesAlways(Order.Proofs, _))
    w.int32(Order.PriceMode, o.priceMode)
    o.eip712Signature.foreach(w.bytes(Order.Eip712Signature, _))
  }

  private def encodeDataEntry(w: Writer, e: RawDataEntry): Unit = {
    w.string(DataEntry.Key, e.key)
    e.integerValue.foreach(w.int64(DataEntry.IntValue, _))
    e.booleanValue.foreach(w.bool(DataEntry.BoolValue, _))
    e.binaryValue.foreach(w.bytes(DataEntry.BinaryValue, _))
    e.stringValue.foreach(w.string(DataEntry.StringValue, _))
  }

  private def encodeSignedTx(w: Writer, tx: RawTx): Unit = {
    if (tx.txType == 18) {
      tx.ethereumBytes.foreach(w.bytes(SignedTransaction.EthereumTransaction, _))
      tx.proofs.foreach(w.bytesAlways(SignedTransaction.Proofs, _))
      return
    }
    w.message(SignedTransaction.WavesTransaction) { t =>
      t.int32(Transaction.ChainId, 'W'.toInt)
      t.bytes(Transaction.SenderPublicKey, tx.senderPublicKey)
      encodeAmount(t, Transaction.Fee, tx.feeAssetId.getOrElse(Array.emptyByteArray), tx.fee)
      t.int64(Transaction.Timestamp, tx.timeStampMs)
      t.int32(Transaction.Version, tx.txVersion.map(_.toInt).getOrElse(0))
      t.message(Transaction.DataBase + tx.txType) { d =>
        tx.txType match {
          case 1 =>
            tx.recipient.foreach(d.bytes(Genesis.RecipientAddress, _))
            tx.amount.foreach(d.int64(Genesis.Amount, _))
          case 2 =>
            tx.recipient.foreach(d.bytes(Payment.RecipientAddress, _))
            tx.amount.foreach(d.int64(Payment.Amount, _))
          case 3 =>
            tx.assetName.foreach(d.string(Issue.Name, _))
            tx.description.foreach(d.string(Issue.Description, _))
            tx.quantity.foreach(d.int64(Issue.Amount, _))
            tx.decimals.foreach(v => d.int32(Issue.Decimals, v.toInt))
            tx.reissuable.foreach(d.bool(Issue.Reissuable, _))
            tx.script.foreach(d.bytes(Issue.Script, _))
          case 4 =>
            encodeRecipientPkh(d, Transfer.Recipient, Array.emptyByteArray, tx.recipientAlias)
            encodeAmount(d, Transfer.Amount, tx.assetId.getOrElse(Array.emptyByteArray), tx.amount.getOrElse(0L))
            tx.attachment.foreach(d.bytes(Transfer.Attachment, _))
          case 5 =>
            encodeAmount(d, Reissue.AssetAmount, tx.assetId.getOrElse(Array.emptyByteArray), tx.quantity.getOrElse(0L))
            tx.reissuable.foreach(d.bool(Reissue.Reissuable, _))
          case 6 =>
            encodeAmount(d, Burn.AssetAmount, tx.assetId.getOrElse(Array.emptyByteArray), tx.amount.getOrElse(0L))
          case 7 =>
            tx.amount.foreach(d.int64(Exchange.Amount, _))
            tx.price.foreach(d.int64(Exchange.Price, _))
            tx.buyMatcherFee.foreach(d.int64(Exchange.BuyMatcherFee, _))
            tx.sellMatcherFee.foreach(d.int64(Exchange.SellMatcherFee, _))
            Seq(tx.order1, tx.order2).flatten.foreach(o => d.message(Exchange.Orders)(encodeOrder(_, o)))
          case 8 =>
            encodeRecipientPkh(d, Lease.Recipient, Array.emptyByteArray, tx.recipientAlias)
            tx.amount.foreach(d.int64(Lease.Amount, _))
          case 9 =>
            tx.leaseTxId.foreach(d.bytes(LeaseCancel.LeaseId, _))
          case 10 =>
            tx.alias.foreach(d.string(CreateAlias.Alias, _))
          case 11 =>
            tx.assetId.foreach(d.bytes(MassTransfer.AssetId, _))
            tx.transfers.foreach { tr =>
              d.message(MassTransfer.Transfers) { item =>
                encodeRecipientPkh(item, MassTransferItem.Recipient, Array.emptyByteArray, None)
                item.int64(MassTransferItem.Amount, tr.amount)
              }
            }
            tx.attachment.foreach(d.bytes(MassTransfer.Attachment, _))
          case 12 =>
            tx.dataEntries.foreach(e => d.message(DataTx.Data)(encodeDataEntry(_, e)))
          case 13 =>
            tx.script.foreach(d.bytes(SetScript.Script, _))
          case 14 =>
            encodeAmount(d, SponsorFee.MinFee,
              tx.assetId.getOrElse(Array.emptyByteArray), tx.minSponsoredAssetFee.getOrElse(0L))
          case 15 =>
            tx.assetId.foreach(d.bytes(SetAssetScript.AssetId, _))
            tx.script.foreach(d.bytes(SetAssetScript.Script, _))
          case 16 =>
            encodeRecipientPkh(d, InvokeScript.DApp, Array.emptyByteArray, tx.dappAlias)
            tx.payments.foreach(p => encodeAmount(d, InvokeScript.Payments, p.assetId, p.amount))
          case 17 =>
            tx.assetId.foreach(d.bytes(UpdateAssetInfo.AssetId, _))
            tx.assetName.foreach(d.string(UpdateAssetInfo.Name, _))
            tx.description.foreach(d.string(UpdateAssetInfo.Description, _))
          case other => throw new IllegalArgumentException(s"unknown tx type $other")
        }
      }
    }
    tx.proofs.foreach(w.bytesAlways(SignedTransaction.Proofs, _))
  }

  private def encodeMetaArg(w: Writer, a: MetaArg): Unit = a match {
    case IntArg(v) => w.int64(MetaArgument.IntValue, v)
    case BoolArg(v) => w.bool(MetaArgument.BoolValue, v)
    case BinArg(v) => w.bytes(MetaArgument.BinaryValue, v)
    case StrArg(v) => w.string(MetaArgument.StringValue, v)
    case ListArg(items) => w.message(MetaArgument.List) { l =>
      items.foreach(i => l.message(ArgList.Items)(encodeMetaArg(_, i)))
    }
  }

  private def encodeMeta(w: Writer, m: TxMeta): Unit = {
    if (!m.present) return // empty slot ⇒ missing metadata downstream
    w.bytes(TransactionMetadata.SenderAddress, m.senderAddress)
    m.recipientAddress.foreach { r =>
      w.message(TransactionMetadata.Transfer)(_.bytes(TransferMeta.RecipientAddress, r))
    }
    if (m.orderIds.nonEmpty) w.message(TransactionMetadata.Exchange) { e =>
      m.orderIds.foreach(e.bytesAlways(ExchangeMeta.OrderIds, _))
      m.orderSenderAddresses.foreach(e.bytesAlways(ExchangeMeta.OrderSenderAddresses, _))
    }
    if (m.dappAddress.isDefined || m.functionName.isDefined || m.args.nonEmpty)
      w.message(TransactionMetadata.InvokeScript) { i =>
        m.dappAddress.foreach(i.bytes(InvokeMeta.DAppAddress, _))
        m.functionName.foreach(i.string(InvokeMeta.FunctionName, _))
        m.args.foreach(a => i.message(InvokeMeta.Arguments)(encodeMetaArg(_, a)))
      }
    if (m.massTransferRecipients.nonEmpty) w.message(TransactionMetadata.MassTransfer) { mt =>
      m.massTransferRecipients.foreach(mt.bytesAlways(MassTransferMeta.RecipientAddresses, _))
    }
    if (m.ethereumFee.isDefined || m.ethereumTimestamp.isDefined)
      w.message(TransactionMetadata.Ethereum) { e =>
        m.ethereumFee.foreach(e.int64(EthereumMeta.Fee, _))
        m.ethereumTimestamp.foreach(e.int64(EthereumMeta.Timestamp, _))
        m.functionName.foreach(e.string(EthereumMeta.FunctionName, _))
        m.ethereumVersion.foreach(e.int32(EthereumMeta.Version, _))
      }
  }

  private def encodeStateUpdate(w: Writer, tx: RawTx): Unit = {
    tx.assetStateUpdates.foreach { au =>
      w.message(StateUpdate.Assets)(_.message(AssetStateUpdate.After) { d =>
        d.bytes(AssetDetails.AssetId, au.assetId)
        d.bytes(AssetDetails.Issuer, au.issuer)
        d.int32(AssetDetails.Decimals, au.decimals.toInt)
        d.string(AssetDetails.Name, au.name)
        d.string(AssetDetails.Description, au.description)
        d.bool(AssetDetails.Reissuable, au.reissuable)
        d.int64(AssetDetails.Volume, au.volume)
        au.script.foreach(s => d.message(AssetDetails.ScriptInfo)(_.bytes(ScriptInfo.Script, s)))
        d.int64(AssetDetails.Sponsorship, au.sponsorship)
        d.bool(AssetDetails.Nft, au.nft)
      })
    }
    tx.dataEntryUpdates.foreach { du =>
      w.message(StateUpdate.DataEntries) { d =>
        d.bytes(DataEntryUpdate.Address, du.address)
        du.entry.foreach(e => d.message(DataEntryUpdate.DataEntry)(encodeDataEntry(_, e)))
      }
    }
  }

  // ------------------------------------------------------------------
  // Decode — the consumer side (updates.rs:154-263 analog).
  // ------------------------------------------------------------------

  /** Decode one `BlockchainUpdated` message. Returns the update plus the
    * count of txs skipped for missing metadata (never silent). */
  def decode(bytes: Array[Byte]): (RawUpdate, Int) = {
    val r = new Reader(bytes)
    var id: Array[Byte] = Array.emptyByteArray
    var height = 0
    var append: Option[Reader] = None
    var rollback: Option[Reader] = None
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case BlockchainUpdated.Id => id = r.readBytes()
        case BlockchainUpdated.Height => height = r.readVarint().toInt
        case BlockchainUpdated.Append => append = Some(r.subMessage())
        case BlockchainUpdated.Rollback => rollback = Some(r.subMessage())
        case _ => r.skip(tag & 7)
      }
    }
    (append, rollback) match {
      case (Some(a), _) => decodeAppend(Base58.encode(id), height, a)
      case (_, Some(rb)) =>
        var blockId = id
        while (rb.has) {
          val tag = rb.readTag()
          (tag >> 3) match {
            case Rollback.BlockId => blockId = rb.readBytes()
            case _ => rb.skip(tag & 7)
          }
        }
        (RawRollback(Base58.encode(blockId)), 0)
      case _ => throw new IllegalArgumentException("BlockchainUpdated carries neither append nor rollback")
    }
  }

  private def decodeAppend(id: String, height: Int, a: Reader): (RawBlock, Int) = {
    var timeStampMs: Option[Long] = None
    var updatedWavesAmount: Option[Long] = None
    val txReaders = scala.collection.mutable.ListBuffer.empty[Reader]
    val txIds = scala.collection.mutable.ListBuffer.empty[Array[Byte]]
    val metas = scala.collection.mutable.ListBuffer.empty[Option[DecodedMeta]]
    val states = scala.collection.mutable.ListBuffer.empty[Reader]
    while (a.has) {
      val tag = a.readTag()
      (tag >> 3) match {
        case Append.Block =>
          val ba = a.subMessage()
          while (ba.has) {
            val t2 = ba.readTag()
            (t2 >> 3) match {
              case BlockAppend.Block =>
                val b = ba.subMessage()
                while (b.has) {
                  val t3 = b.readTag()
                  (t3 >> 3) match {
                    case Block.Header =>
                      val h = b.subMessage()
                      while (h.has) {
                        val t4 = h.readTag()
                        if ((t4 >> 3) == Header.Timestamp) timeStampMs = Some(h.readVarint())
                        else h.skip(t4 & 7)
                      }
                    case Block.Transactions => txReaders += b.subMessage()
                    case _ => b.skip(t3 & 7)
                  }
                }
              case BlockAppend.UpdatedWavesAmount =>
                updatedWavesAmount = Some(ba.readVarint()).filter(_ != 0L)
              case _ => ba.skip(t2 & 7)
            }
          }
        case Append.MicroBlock =>
          val ma = a.subMessage()
          while (ma.has) {
            val t2 = ma.readTag()
            (t2 >> 3) match {
              case MicroBlockAppend.MicroBlock =>
                val smb = ma.subMessage()
                while (smb.has) {
                  val t3 = smb.readTag()
                  (t3 >> 3) match {
                    case SignedMicroBlock.MicroBlock =>
                      val mb = smb.subMessage()
                      while (mb.has) {
                        val t4 = mb.readTag()
                        if ((t4 >> 3) == MicroBlock.Transactions) txReaders += mb.subMessage()
                        else mb.skip(t4 & 7)
                      }
                    case _ => smb.skip(t3 & 7)
                  }
                }
              case _ => ma.skip(t2 & 7)
            }
          }
        case Append.TransactionIds => txIds += a.readBytes()
        case Append.TransactionsMetadata => metas += decodeMeta(a.subMessage())
        case Append.TransactionStateUpdates => states += a.subMessage()
        case _ => a.skip(tag & 7)
      }
    }
    val wires = txReaders.toSeq.zipWithIndex.map { case (txr, i) =>
      val txId = if (i < txIds.length) txIds(i) else Array.emptyByteArray
      val meta = if (i < metas.length) metas(i) else None
      val (asu, deu) =
        if (i < states.length) decodeStateUpdate(states(i))
        else (Nil, Nil)
      val tx = decodeSignedTx(txr, txId, meta).copy(
        assetStateUpdates = asu, dataEntryUpdates = deu)
      Decode.RawTxWire(tx, meta.map(m =>
        Decode.RawTxMeta(recipientAddress = m.recipientAddress, dappAddress = m.dappAddress)))
    }
    val (block, skipped) = Decode.decodeBlock(id, height, timeStampMs, updatedWavesAmount, wires)
    (block, skipped)
  }

  private final case class DecodedMeta(
      senderAddress: Array[Byte],
      recipientAddress: Option[Array[Byte]],
      dappAddress: Option[Array[Byte]],
      functionName: Option[String],
      args: Seq[RawInvokeArg],
      orderIds: Seq[Array[Byte]],
      orderSenderAddresses: Seq[Array[Byte]],
      massTransferRecipients: Seq[Array[Byte]],
      ethereumFee: Option[Long],
      ethereumTimestamp: Option[Long],
      ethereumVersion: Option[Int])

  /** Empty metadata message ⇒ None (the missing-slot skip policy). */
  private def decodeMeta(r: Reader): Option[DecodedMeta] = {
    if (!r.has) return None
    var sender = Array.emptyByteArray
    var recipient: Option[Array[Byte]] = None
    var dapp: Option[Array[Byte]] = None
    var fn: Option[String] = None
    var args: Seq[RawInvokeArg] = Nil
    var orderIds: Seq[Array[Byte]] = Nil
    var orderSenders: Seq[Array[Byte]] = Nil
    var mtRecipients: Seq[Array[Byte]] = Nil
    var ethFee: Option[Long] = None
    var ethTs: Option[Long] = None
    var ethV: Option[Int] = None
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case TransactionMetadata.SenderAddress => sender = r.readBytes()
        case TransactionMetadata.Transfer | TransactionMetadata.Lease =>
          val t = r.subMessage()
          while (t.has) {
            val t2 = t.readTag()
            if ((t2 >> 3) == TransferMeta.RecipientAddress) recipient = Some(t.readBytes())
            else t.skip(t2 & 7)
          }
        case TransactionMetadata.Exchange =>
          val e = r.subMessage()
          while (e.has) {
            val t2 = e.readTag()
            (t2 >> 3) match {
              case ExchangeMeta.OrderIds => orderIds :+= e.readBytes()
              case ExchangeMeta.OrderSenderAddresses => orderSenders :+= e.readBytes()
              case _ => e.skip(t2 & 7)
            }
          }
        case TransactionMetadata.InvokeScript =>
          val iv = r.subMessage()
          while (iv.has) {
            val t2 = iv.readTag()
            (t2 >> 3) match {
              case InvokeMeta.DAppAddress => dapp = Some(iv.readBytes())
              case InvokeMeta.FunctionName => fn = Some(iv.readString())
              case InvokeMeta.Arguments => args :+= decodeMetaArg(iv.subMessage())
              case _ => iv.skip(t2 & 7)
            }
          }
        case TransactionMetadata.MassTransfer =>
          val mt = r.subMessage()
          while (mt.has) {
            val t2 = mt.readTag()
            if ((t2 >> 3) == MassTransferMeta.RecipientAddresses) mtRecipients :+= mt.readBytes()
            else mt.skip(t2 & 7)
          }
        case TransactionMetadata.Ethereum =>
          val e = r.subMessage()
          while (e.has) {
            val t2 = e.readTag()
            (t2 >> 3) match {
              case EthereumMeta.Fee => ethFee = Some(e.readVarint())
              case EthereumMeta.Timestamp => ethTs = Some(e.readVarint())
              case EthereumMeta.FunctionName => fn = Some(e.readString())
              case EthereumMeta.Version => ethV = Some(e.readVarint().toInt)
              case _ => e.skip(t2 & 7)
            }
          }
        case _ => r.skip(tag & 7)
      }
    }
    Some(DecodedMeta(sender, recipient, dapp, fn, args, orderIds, orderSenders,
      mtRecipients, ethFee, ethTs, ethV))
  }

  /** Metadata argument → [[RawInvokeArg]]; nested lists render to the
    * canonical `[{"type":…,"value":…}]` JSON the reference stores in
    * `arg_value_list` (convert.rs InvokeScript arg handling). */
  private def decodeMetaArg(r: Reader): RawInvokeArg = {
    metaArgTree(r) match {
      case IntArg(v) => RawInvokeArg("integer", integerValue = Some(v))
      case BoolArg(v) => RawInvokeArg("boolean", booleanValue = Some(v))
      case BinArg(v) => RawInvokeArg("binary", binaryValue = Some(v))
      case StrArg(v) => RawInvokeArg("string", stringValue = Some(v))
      case l: ListArg => RawInvokeArg("list", listJson = Some(argJson(l)))
    }
  }

  private def metaArgTree(r: Reader): MetaArg = {
    var out: MetaArg = IntArg(0L) // proto3 default when no value field present
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case MetaArgument.IntValue => out = IntArg(r.readVarint())
        case MetaArgument.BoolValue => out = BoolArg(r.readBool())
        case MetaArgument.BinaryValue => out = BinArg(r.readBytes())
        case MetaArgument.StringValue => out = StrArg(r.readString())
        case MetaArgument.List =>
          val l = r.subMessage()
          var items = Seq.empty[MetaArg]
          while (l.has) {
            val t2 = l.readTag()
            if ((t2 >> 3) == ArgList.Items) items :+= metaArgTree(l.subMessage())
            else l.skip(t2 & 7)
          }
          out = ListArg(items)
        case _ => r.skip(tag & 7)
      }
    }
    out
  }

  /** JSON rendering of a list argument — element shape matches the
    * reference's jsonb (`{"type":…,"value":…}`, binary as `base64:`). */
  private def argJson(a: MetaArg): String = a match {
    case IntArg(v) => s"""{"type":"integer","value":$v}"""
    case BoolArg(v) => s"""{"type":"boolean","value":$v}"""
    case BinArg(v) =>
      s"""{"type":"binary","value":"base64:${java.util.Base64.getEncoder.encodeToString(v)}"}"""
    case StrArg(v) =>
      val esc = v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s"""{"type":"string","value":"$esc"}"""
    case ListArg(items) => items.map(argJson).mkString("[", ",", "]")
  }

  private def decodeSignedTx(r: Reader, txId: Array[Byte], meta: Option[DecodedMeta]): RawTx = {
    var proofs = Seq.empty[Array[Byte]]
    var wavesTx: Option[Reader] = None
    var ethBytes: Option[Array[Byte]] = None
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case SignedTransaction.WavesTransaction => wavesTx = Some(r.subMessage())
        case SignedTransaction.Proofs => proofs :+= r.readBytes()
        case SignedTransaction.EthereumTransaction => ethBytes = Some(r.readBytes())
        case _ => r.skip(tag & 7)
      }
    }
    ethBytes match {
      case Some(bytes) => // type 18: envelope bytes + node-computed metadata
        RawTx(id = txId, txType = 18, senderPublicKey = Array.emptyByteArray,
          proofs = proofs,
          fee = meta.flatMap(_.ethereumFee).getOrElse(0L),
          timeStampMs = meta.flatMap(_.ethereumTimestamp).getOrElse(0L),
          txVersion = meta.flatMap(_.ethereumVersion).map(_.toShort),
          functionName = meta.flatMap(_.functionName),
          ethereumBytes = Some(bytes))
      case None =>
        val t = wavesTx.getOrElse(throw new IllegalArgumentException("SignedTransaction carries no transaction"))
        decodeWavesTx(t, txId, proofs, meta)
    }
  }

  private def decodeWavesTx(
      t: Reader, txId: Array[Byte], proofs: Seq[Array[Byte]],
      meta: Option[DecodedMeta]): RawTx = {
    var senderPk = Array.emptyByteArray
    var fee = 0L
    var feeAssetId: Option[Array[Byte]] = None
    var ts = 0L
    var version: Option[Short] = None
    var txType: Short = 0
    var data: Option[Reader] = None
    while (t.has) {
      val tag = t.readTag()
      (tag >> 3) match {
        case Transaction.ChainId => t.readVarint()
        case Transaction.SenderPublicKey => senderPk = t.readBytes()
        case Transaction.Fee =>
          val (aid, amt) = decodeAmount(t.subMessage())
          fee = amt
          feeAssetId = Some(aid)
        case Transaction.Timestamp => ts = t.readVarint()
        case Transaction.Version =>
          version = Some(t.readVarint().toShort).filter(_ != 0)
        case f if f > Transaction.DataBase && f <= Transaction.DataBase + 17 =>
          txType = (f - Transaction.DataBase).toShort
          data = Some(t.subMessage())
        case _ => t.skip(tag & 7)
      }
    }
    val base = RawTx(id = txId, txType = txType, senderPublicKey = senderPk,
      proofs = proofs, txVersion = version, fee = fee, feeAssetId = feeAssetId,
      timeStampMs = ts)
    data.fold(base)(d => decodeTxData(base, d, meta))
  }

  private def decodeAmount(r: Reader): (Array[Byte], Long) = {
    var aid = Array.emptyByteArray
    var amt = 0L
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case Amount.AssetId => aid = r.readBytes()
        case Amount.Amount => amt = r.readVarint()
        case _ => r.skip(tag & 7)
      }
    }
    (aid, amt)
  }

  /** Recipient → (pkhOrEmpty, alias). */
  private def decodeRecipient(r: Reader): (Array[Byte], Option[String]) = {
    var pkh = Array.emptyByteArray
    var alias: Option[String] = None
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case Recipient.PublicKeyHash => pkh = r.readBytes()
        case Recipient.Alias => alias = Some(r.readString())
        case _ => r.skip(tag & 7)
      }
    }
    (pkh, alias)
  }

  private def decodeDataEntry(r: Reader): RawDataEntry = {
    var e = RawDataEntry("")
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case DataEntry.Key => e = e.copy(key = r.readString())
        case DataEntry.IntValue => e = e.copy(integerValue = Some(r.readVarint()))
        case DataEntry.BoolValue => e = e.copy(booleanValue = Some(r.readBool()))
        case DataEntry.BinaryValue => e = e.copy(binaryValue = Some(r.readBytes()))
        case DataEntry.StringValue => e = e.copy(stringValue = Some(r.readString()))
        case _ => r.skip(tag & 7)
      }
    }
    e
  }

  private def decodeOrder(r: Reader, idx: Int, meta: Option[DecodedMeta]): RawOrder = {
    var o = RawOrder(
      id = meta.map(_.orderIds).filter(_.length > idx).map(_(idx)).getOrElse(Array.emptyByteArray),
      senderAddress = meta.map(_.orderSenderAddresses).filter(_.length > idx).map(_(idx))
        .getOrElse(Array.emptyByteArray))
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case Order.ChainId => r.readVarint()
        case Order.SenderPublicKey => o = o.copy(senderPublicKey = r.readBytes())
        case Order.MatcherPublicKey => o = o.copy(matcherPublicKey = r.readBytes())
        case Order.AssetPair =>
          val p = r.subMessage()
          while (p.has) {
            val t2 = p.readTag()
            (t2 >> 3) match {
              case AssetPair.AmountAssetId => o = o.copy(amountAssetId = p.readBytes())
              case AssetPair.PriceAssetId => o = o.copy(priceAssetId = p.readBytes())
              case _ => p.skip(t2 & 7)
            }
          }
        case Order.OrderSide => o = o.copy(orderSide = r.readVarint().toInt)
        case Order.Amount => o = o.copy(amount = r.readVarint())
        case Order.Price => o = o.copy(price = r.readVarint())
        case Order.Timestamp => o = o.copy(timestamp = r.readVarint())
        case Order.Expiration => o = o.copy(expiration = r.readVarint())
        case Order.MatcherFee =>
          val (aid, amt) = decodeAmount(r.subMessage())
          o = o.copy(matcherFee = amt, matcherFeeAssetId = aid)
        case Order.Version => o = o.copy(version = r.readVarint().toInt)
        case Order.Proofs => o = o.copy(proofs = o.proofs :+ r.readBytes())
        case Order.PriceMode => o = o.copy(priceMode = r.readVarint().toInt)
        case Order.Eip712Signature => o = o.copy(eip712Signature = Some(r.readBytes()))
        case _ => r.skip(tag & 7)
      }
    }
    o
  }

  /** Per-type payload decode. Scalar fields start at their proto3 defaults
    * (prost's non-optional fields): an absent wire field still yields a
    * value, matching the reference's decode of NOT-NULL columns. */
  private def decodeTxData(base: RawTx, d: Reader, meta: Option[DecodedMeta]): RawTx = base.txType match {
    case 1 | 2 =>
      var tx = base.copy(recipient = Some(Array.emptyByteArray), amount = Some(0L))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case Genesis.RecipientAddress => tx = tx.copy(recipient = Some(d.readBytes()))
          case Genesis.Amount => tx = tx.copy(amount = Some(d.readVarint()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 3 =>
      var tx = base.copy(assetName = Some(""), description = Some(""),
        quantity = Some(0L), decimals = Some(0.toShort), reissuable = Some(false))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case Issue.Name => tx = tx.copy(assetName = Some(d.readString()))
          case Issue.Description => tx = tx.copy(description = Some(d.readString()))
          case Issue.Amount => tx = tx.copy(quantity = Some(d.readVarint()))
          case Issue.Decimals => tx = tx.copy(decimals = Some(d.readVarint().toShort))
          case Issue.Reissuable => tx = tx.copy(reissuable = Some(d.readBool()))
          case Issue.Script => tx = tx.copy(script = Some(d.readBytes()))
          case _ => d.skip(tag & 7)
        }
      }
      // issue asset id = tx id (node convention the reference relies on)
      tx.copy(assetId = Some(tx.id))
    case 4 =>
      var tx = base.copy(recipient = meta.flatMap(_.recipientAddress),
        assetId = Some(Array.emptyByteArray), amount = Some(0L),
        attachment = Some(Array.emptyByteArray))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case Transfer.Recipient =>
            val (_, alias) = decodeRecipient(d.subMessage())
            tx = tx.copy(recipientAlias = alias)
          case Transfer.Amount =>
            val (aid, amt) = decodeAmount(d.subMessage())
            tx = tx.copy(assetId = Some(aid), amount = Some(amt))
          case Transfer.Attachment => tx = tx.copy(attachment = Some(d.readBytes()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 5 =>
      var tx = base.copy(assetId = Some(Array.emptyByteArray),
        quantity = Some(0L), reissuable = Some(false))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case Reissue.AssetAmount =>
            val (aid, amt) = decodeAmount(d.subMessage())
            tx = tx.copy(assetId = Some(aid), quantity = Some(amt))
          case Reissue.Reissuable => tx = tx.copy(reissuable = Some(d.readBool()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 6 =>
      var tx = base.copy(assetId = Some(Array.emptyByteArray), amount = Some(0L))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case Burn.AssetAmount =>
            val (aid, amt) = decodeAmount(d.subMessage())
            tx = tx.copy(assetId = Some(aid), amount = Some(amt))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 7 =>
      var tx = base.copy(amount = Some(0L), price = Some(0L),
        buyMatcherFee = Some(0L), sellMatcherFee = Some(0L))
      var orderIdx = 0
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case Exchange.Amount => tx = tx.copy(amount = Some(d.readVarint()))
          case Exchange.Price => tx = tx.copy(price = Some(d.readVarint()))
          case Exchange.BuyMatcherFee => tx = tx.copy(buyMatcherFee = Some(d.readVarint()))
          case Exchange.SellMatcherFee => tx = tx.copy(sellMatcherFee = Some(d.readVarint()))
          case Exchange.Orders =>
            val o = decodeOrder(d.subMessage(), orderIdx, meta)
            orderIdx += 1
            if (tx.order1.isEmpty) tx = tx.copy(order1 = Some(o))
            else tx = tx.copy(order2 = Some(o))
          case _ => d.skip(tag & 7)
        }
      }
      // pair columns come from the first order's asset pair (convert.rs txs_7)
      tx.order1.fold(tx)(o1 => tx.copy(
        amountAssetId = Some(o1.amountAssetId), priceAssetId = Some(o1.priceAssetId)))
    case 8 =>
      var tx = base.copy(recipient = meta.flatMap(_.recipientAddress), amount = Some(0L))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case Lease.Recipient =>
            val (_, alias) = decodeRecipient(d.subMessage())
            tx = tx.copy(recipientAlias = alias)
          case Lease.Amount => tx = tx.copy(amount = Some(d.readVarint()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 9 =>
      var tx = base
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case LeaseCancel.LeaseId => tx = tx.copy(leaseTxId = Some(d.readBytes()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 10 =>
      var tx = base.copy(alias = Some(""))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case CreateAlias.Alias => tx = tx.copy(alias = Some(d.readString()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 11 =>
      var tx = base.copy(assetId = Some(Array.emptyByteArray),
        attachment = Some(Array.emptyByteArray))
      var amounts = Seq.empty[Long]
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case MassTransfer.AssetId => tx = tx.copy(assetId = Some(d.readBytes()))
          case MassTransfer.Transfers =>
            val item = d.subMessage()
            var amt = 0L
            while (item.has) {
              val t2 = item.readTag()
              (t2 >> 3) match {
                case MassTransferItem.Amount => amt = item.readVarint()
                case _ => item.skip(t2 & 7)
              }
            }
            amounts :+= amt
          case MassTransfer.Attachment => tx = tx.copy(attachment = Some(d.readBytes()))
          case _ => d.skip(tag & 7)
        }
      }
      // zip wire amounts with node-resolved recipient addresses from meta
      val recips = meta.map(_.massTransferRecipients).getOrElse(Nil)
      tx.copy(transfers = amounts.zipWithIndex.map { case (amt, i) =>
        RawTransfer(if (i < recips.length) recips(i) else Array.emptyByteArray, amt)
      })
    case 12 =>
      var entries = Seq.empty[RawDataEntry]
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case DataTx.Data => entries :+= decodeDataEntry(d.subMessage())
          case _ => d.skip(tag & 7)
        }
      }
      base.copy(dataEntries = entries)
    case 13 =>
      var tx = base
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case SetScript.Script => tx = tx.copy(script = Some(d.readBytes()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 14 =>
      var tx = base
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case SponsorFee.MinFee =>
            val (aid, amt) = decodeAmount(d.subMessage())
            tx = tx.copy(assetId = Some(aid),
              minSponsoredAssetFee = Some(amt).filter(_ != 0L))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 15 =>
      var tx = base
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case SetAssetScript.AssetId => tx = tx.copy(assetId = Some(d.readBytes()))
          case SetAssetScript.Script => tx = tx.copy(script = Some(d.readBytes()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 16 =>
      var tx = base.copy(
        dappAddress = meta.flatMap(_.dappAddress),
        functionName = meta.flatMap(_.functionName),
        args = meta.map(_.args).getOrElse(Nil))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case InvokeScript.DApp =>
            val (_, alias) = decodeRecipient(d.subMessage())
            tx = tx.copy(dappAlias = alias)
          case InvokeScript.FunctionCall => d.readBytes() // opaque RIDE bytes; meta carries the parse
          case InvokeScript.Payments =>
            val (aid, amt) = decodeAmount(d.subMessage())
            tx = tx.copy(payments = tx.payments :+ RawPayment(amt, aid))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case 17 =>
      var tx = base.copy(assetId = Some(Array.emptyByteArray),
        assetName = Some(""), description = Some(""))
      while (d.has) {
        val tag = d.readTag()
        (tag >> 3) match {
          case UpdateAssetInfo.AssetId => tx = tx.copy(assetId = Some(d.readBytes()))
          case UpdateAssetInfo.Name => tx = tx.copy(assetName = Some(d.readString()))
          case UpdateAssetInfo.Description => tx = tx.copy(description = Some(d.readString()))
          case _ => d.skip(tag & 7)
        }
      }
      tx
    case other => throw new IllegalArgumentException(s"unknown tx type $other")
  }

  private def decodeStateUpdate(r: Reader): (Seq[RawAssetStateUpdate], Seq[RawDataEntryUpdate]) = {
    var assets = Seq.empty[RawAssetStateUpdate]
    var entries = Seq.empty[RawDataEntryUpdate]
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case StateUpdate.Assets =>
          val au = r.subMessage()
          while (au.has) {
            val t2 = au.readTag()
            if ((t2 >> 3) == AssetStateUpdate.After) assets :+= decodeAssetDetails(au.subMessage())
            else au.skip(t2 & 7)
          }
        case StateUpdate.DataEntries =>
          val du = r.subMessage()
          var address = Array.emptyByteArray
          var entry: Option[RawDataEntry] = None
          while (du.has) {
            val t2 = du.readTag()
            (t2 >> 3) match {
              case DataEntryUpdate.Address => address = du.readBytes()
              case DataEntryUpdate.DataEntry => entry = Some(decodeDataEntry(du.subMessage()))
              case _ => du.skip(t2 & 7)
            }
          }
          entries :+= RawDataEntryUpdate(address, entry)
        case _ => r.skip(tag & 7)
      }
    }
    (assets, entries)
  }

  private def decodeAssetDetails(r: Reader): RawAssetStateUpdate = {
    var au = RawAssetStateUpdate(
      assetId = Array.emptyByteArray, issuer = Array.emptyByteArray,
      name = "", description = "", decimals = 0, reissuable = false,
      nft = false, volume = 0L)
    while (r.has) {
      val tag = r.readTag()
      (tag >> 3) match {
        case AssetDetails.AssetId => au = au.copy(assetId = r.readBytes())
        case AssetDetails.Issuer => au = au.copy(issuer = r.readBytes())
        case AssetDetails.Decimals => au = au.copy(decimals = r.readVarint().toShort)
        case AssetDetails.Name => au = au.copy(name = r.readString())
        case AssetDetails.Description => au = au.copy(description = r.readString())
        case AssetDetails.Reissuable => au = au.copy(reissuable = r.readBool())
        case AssetDetails.Volume => au = au.copy(volume = r.readVarint())
        case AssetDetails.ScriptInfo =>
          val si = r.subMessage()
          while (si.has) {
            val t2 = si.readTag()
            if ((t2 >> 3) == ScriptInfo.Script) au = au.copy(script = Some(si.readBytes()))
            else si.skip(t2 & 7)
          }
        case AssetDetails.Sponsorship => au = au.copy(sponsorship = r.readVarint())
        case AssetDetails.Nft => au = au.copy(nft = r.readBool())
        case _ => r.skip(tag & 7)
      }
    }
    au
  }
}
