package graft

import graft.convert._
import graft.convert.UpdatesProto._

/** Wire-ingestion round trips: encode a [[RawBlock]] fixture to protobuf
  * wire bytes, decode it back, and require the SAME converted tables from
  * both paths — the done-criterion for the blockchain-updates decode layer
  * (a canned protobuf fixture round-trips through TxConvert).
  */
class ProtoSpec extends SparkSpec {

  import spark.implicits._

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")
  private val pk = Array.tabulate[Byte](32)(_.toByte)
  private val pkh20 = Array.tabulate[Byte](20)(i => (i + 1).toByte)
  private val addr = Array.tabulate[Byte](26)(i => (i * 3).toByte)

  /** proto3-clean tx (absent scalar = default, so fixtures use explicit
    * defaults where the wire can't distinguish). */
  private def tx(id: String, t: Short): RawTx =
    RawTx(id = bytes(id), txType = t, senderPublicKey = pk,
      timeStampMs = 1704100000000L, fee = 100000L, txVersion = Some(2),
      feeAssetId = Some(Array.emptyByteArray),
      proofs = Seq(bytes("p1"), bytes("p2")))

  // one tx of every type 1..18, with the meta its type needs
  private val allTypes: Seq[(RawTx, TxMeta)] = Seq(
    tx("g1", 1).copy(senderPublicKey = Array.emptyByteArray, txVersion = None,
      fee = 0L, recipient = Some(pkh20), amount = Some(99L)) -> TxMeta(senderAddress = addr),
    tx("p1t", 2).copy(recipient = Some(pkh20), amount = Some(77L)) -> TxMeta(senderAddress = addr),
    tx("i1", 3).copy(assetId = Some(bytes("i1")), assetName = Some("tok"),
      description = Some("d"), quantity = Some(1000L), decimals = Some(4),
      reissuable = Some(true), script = Some(bytes("sc"))) -> TxMeta(senderAddress = addr),
    tx("t1", 4).copy(assetId = Some(bytes("as1")), amount = Some(500L),
      recipient = Some(bytes("rcpt")), attachment = Some(bytes("hi"))) ->
      TxMeta(senderAddress = addr, recipientAddress = Some(bytes("rcpt"))),
    tx("r1", 5).copy(assetId = Some(bytes("as1")), quantity = Some(50L),
      reissuable = Some(false)) -> TxMeta(senderAddress = addr),
    tx("b1", 6).copy(assetId = Some(bytes("as1")), amount = Some(5L)) -> TxMeta(senderAddress = addr),
    tx("x1", 7).copy(
      order1 = Some(RawOrder(id = bytes("o1"), version = 1, senderAddress = bytes("s1"),
        senderPublicKey = pk, matcherPublicKey = pk, amountAssetId = bytes("aa"),
        priceAssetId = Array.emptyByteArray, orderSide = 0, amount = 10L, price = 20L,
        timestamp = 1704100000000L, expiration = 1704186400000L, matcherFee = 300000L,
        matcherFeeAssetId = Array.emptyByteArray, proofs = Seq(bytes("op1"), bytes("op2")))),
      order2 = Some(RawOrder(id = bytes("o2"), version = 4, senderAddress = bytes("s2"),
        senderPublicKey = pk, matcherPublicKey = pk, amountAssetId = bytes("aa"),
        priceAssetId = Array.emptyByteArray, orderSide = 1, amount = 10L, price = 20L,
        timestamp = 1704100000000L, expiration = 1704186400000L, matcherFee = 300000L,
        matcherFeeAssetId = bytes("fa"),
        eip712Signature = Some(Array[Byte](0x0a, 0x1b.toByte)), priceMode = 2)),
      amount = Some(10L), price = Some(20L),
      amountAssetId = Some(bytes("aa")), priceAssetId = Some(Array.emptyByteArray),
      buyMatcherFee = Some(1L), sellMatcherFee = Some(2L)) ->
      TxMeta(senderAddress = addr, orderIds = Seq(bytes("o1"), bytes("o2")),
        orderSenderAddresses = Seq(bytes("s1"), bytes("s2"))),
    tx("l1", 8).copy(recipient = Some(bytes("rcpt")), amount = Some(77L)) ->
      TxMeta(senderAddress = addr, recipientAddress = Some(bytes("rcpt"))),
    tx("lc1", 9).copy(leaseTxId = Some(bytes("l1"))) -> TxMeta(senderAddress = addr),
    tx("al1", 10).copy(alias = Some("bob")) -> TxMeta(senderAddress = addr),
    tx("mt1", 11).copy(assetId = Some(bytes("as1")), attachment = Some(bytes("at")),
      transfers = Seq(RawTransfer(bytes("r1a"), 5L), RawTransfer(bytes("r2a"), 6L))) ->
      TxMeta(senderAddress = addr, massTransferRecipients = Seq(bytes("r1a"), bytes("r2a"))),
    tx("d1", 12).copy(dataEntries = Seq(
      RawDataEntry("k_int", integerValue = Some(42L)),
      RawDataEntry("k_str", stringValue = Some("hello")),
      RawDataEntry("k_bin", binaryValue = Some(Array[Byte](0, 1))),
      RawDataEntry("k_del"))) -> TxMeta(senderAddress = addr),
    tx("ss1", 13).copy(script = Some(bytes("base"))) -> TxMeta(senderAddress = addr),
    tx("sf1", 14).copy(assetId = Some(bytes("as1")),
      minSponsoredAssetFee = Some(7L)) -> TxMeta(senderAddress = addr),
    tx("sas1", 15).copy(assetId = Some(bytes("as1")), script = Some(bytes("sc2"))) ->
      TxMeta(senderAddress = addr),
    tx("iv1", 16).copy(dappAddress = Some(bytes("dapp")), functionName = Some("call"),
      args = Seq(
        RawInvokeArg("integer", integerValue = Some(7L)),
        RawInvokeArg("string", stringValue = Some("s")),
        RawInvokeArg("list", listJson = Some("""[{"type":"integer","value":5},{"type":"boolean","value":true}]"""))),
      payments = Seq(RawPayment(5L, Array.emptyByteArray), RawPayment(6L, bytes("aa")))) ->
      TxMeta(senderAddress = addr, dappAddress = Some(bytes("dapp")), functionName = Some("call"),
        args = Seq(IntArg(7L), StrArg("s"), ListArg(Seq(IntArg(5L), BoolArg(true))))),
    tx("uai1", 17).copy(assetId = Some(bytes("as1")), assetName = Some("n2"),
      description = Some("d2")) -> TxMeta(senderAddress = addr),
    tx("e1", 18).copy(senderPublicKey = Array.emptyByteArray,
      ethereumBytes = Some(Array[Byte](0x01, 0x02, 0x7f)), functionName = Some("ethCall")) ->
      TxMeta(senderAddress = addr, functionName = Some("ethCall"),
        ethereumFee = Some(100000L), ethereumTimestamp = Some(1704100000000L),
        ethereumVersion = Some(2)))

  private val block = RawBlock("b1", 100, Some(1704100000000L), Some(1000000L), allTypes.map(_._1))
  private val metas = allTypes.map(_._2)

  private lazy val decoded: (RawBlock, Int) = {
    val (upd, skipped) = UpdatesProto.decode(UpdatesProto.encodeBlock(block, metas))
    (upd.asInstanceOf[RawBlock], skipped)
  }

  test("block header round-trips: id, height, timestamp, waves amount") {
    val (b, skipped) = decoded
    assert(skipped == 0)
    // "b1" is itself valid base58, so the id round-trips verbatim
    assert(b.id == "b1")
    assert(b.height == 100)
    assert(b.timeStampMs.contains(1704100000000L))
    assert(b.updatedWavesAmount.contains(1000000L))
    assert(b.txs.length == 18)
  }

  test("every tx type round-trips through TxConvert to identical tables") {
    val origBlock = block
    val blockUids = Seq((1L, origBlock.id)).toDF("uid", "id")
    val orig = TxConvert.convert(
      TxConvert.withBlockUids(TxConvert.flatten(spark, Seq(origBlock)), blockUids))
    val rt = TxConvert.convert(
      TxConvert.withBlockUids(TxConvert.flatten(spark, Seq(decoded._1)), blockUids))
    assert(orig.keySet == rt.keySet)
    for (name <- orig.keySet.toSeq.sorted) {
      val a = orig(name)
      val b = rt(name)
      assert(a.count() == b.count(), s"$name row count")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$name differs:\norig=${a.collect().mkString("\n")}\nrt=${b.collect().mkString("\n")}")
    }
    assert(orig("txs_7").count() == 1 && orig("txs_16_args").count() == 3 &&
      orig("txs_12_data").count() == 4 && orig("txs_11_transfers").count() == 2)
  }

  test("microblock append decodes with no timestamp") {
    val micro = RawBlock("mb1", 101, None, None, Seq(allTypes.head._1))
    val (upd, _) = UpdatesProto.decode(UpdatesProto.encodeBlock(micro, Seq(TxMeta(senderAddress = addr))))
    val b = upd.asInstanceOf[RawBlock]
    assert(b.timeStampMs.isEmpty && b.height == 101 && b.txs.length == 1)
  }

  test("rollback round-trips") {
    val r = RawRollback(graft.functions.Base58.encode(bytes("blk9")))
    val (upd, skipped) = UpdatesProto.decode(UpdatesProto.encodeRollback(r))
    assert(skipped == 0)
    assert(upd == r)
  }

  test("a tx with an empty metadata slot is skipped, not failed (updates.rs:196-218)") {
    val two = RawBlock("b2", 102, Some(1704100060000L), None,
      Seq(allTypes(3)._1, allTypes(7)._1)) // one transfer, one lease
    val ms = Seq(TxMeta(present = false), allTypes(7)._2)
    val (upd, skipped) = UpdatesProto.decode(UpdatesProto.encodeBlock(two, ms))
    val b = upd.asInstanceOf[RawBlock]
    assert(skipped == 1)
    assert(b.txs.length == 1 && b.txs.head.txType == 8)
  }

  test("per-tx state updates round-trip: asset post-states and data entries") {
    val t = allTypes(2)._1.copy(
      assetStateUpdates = Seq(RawAssetStateUpdate(
        assetId = bytes("as9"), issuer = pk, name = "n", description = "d",
        decimals = 3, reissuable = true, nft = true, volume = 123L,
        script = Some(bytes("s")), sponsorship = 5L)),
      dataEntryUpdates = Seq(
        RawDataEntryUpdate(addr, Some(RawDataEntry("k", integerValue = Some(1L)))),
        RawDataEntryUpdate(addr, Some(RawDataEntry("gone"))))) // value dropped = deletion
    val one = RawBlock("b3", 103, Some(1704100120000L), None, Seq(t))
    val (upd, _) = UpdatesProto.decode(UpdatesProto.encodeBlock(one, Seq(TxMeta(senderAddress = addr))))
    val dtx = upd.asInstanceOf[RawBlock].txs.head
    val au = dtx.assetStateUpdates.head
    assert(new String(au.assetId, "UTF-8") == "as9" && au.decimals == 3 && au.nft &&
      au.volume == 123L && au.sponsorship == 5L && au.script.exists(_.sameElements(bytes("s"))))
    assert(dtx.dataEntryUpdates.length == 2)
    assert(dtx.dataEntryUpdates.head.entry.exists(_.integerValue.contains(1L)))
    val del = dtx.dataEntryUpdates(1).entry.get
    assert(del.key == "gone" && del.integerValue.isEmpty && del.stringValue.isEmpty &&
      del.booleanValue.isEmpty && del.binaryValue.isEmpty)
  }

  test("varint edges: negative and large int64 survive the wire") {
    val t = tx("neg", 4).copy(assetId = Some(Array.emptyByteArray),
      amount = Some(Long.MaxValue), recipient = Some(bytes("r")),
      attachment = Some(Array.emptyByteArray), timeStampMs = -1L)
    val one = RawBlock("b4", 104, Some(1L), None, Seq(t))
    val (upd, _) = UpdatesProto.decode(UpdatesProto.encodeBlock(one,
      Seq(TxMeta(senderAddress = addr, recipientAddress = Some(bytes("r"))))))
    val d = upd.asInstanceOf[RawBlock].txs.head
    assert(d.amount.contains(Long.MaxValue) && d.timeStampMs == -1L)
  }

  test("unknown fields are skipped (forward compatibility)") {
    import graft.convert.ProtoWire.Writer
    val base = UpdatesProto.encodeBlock(block.copy(txs = Seq(allTypes.head._1)), Seq(metas.head))
    // splice extra unknown fields at the top level: varint f90, len-delim f91
    val w = new Writer
    w.int64(90, 12345L)
    w.bytes(91, bytes("future"))
    val spliced = base ++ w.toBytes
    val (upd, _) = UpdatesProto.decode(spliced)
    assert(upd.asInstanceOf[RawBlock].height == 100)
  }

  test("nested list args render the reference's canonical JSON") {
    val iv = decoded._1.txs(15)
    assert(iv.txType == 16)
    val listArg = iv.args(2)
    assert(listArg.argType == "list")
    assert(listArg.listJson.contains("""[{"type":"integer","value":5},{"type":"boolean","value":true}]"""))
  }

  // ---- golden wire bytes (VERDICT r12 #7) ------------------------------
  // Hand-assembled byte-by-byte from UpdatesProto.Schema's documented field
  // numbers and the protobuf wire spec, INDEPENDENT of ProtoWire.Writer: a
  // Writer/Reader co-drift (both sides agreeing on a wrong field number or
  // wire type) passes every round-trip test but fails here.

  private def gVarint(v: Long): Array[Byte] = {
    var x = v
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while ((x & ~0x7fL) != 0) { b += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    b += (x & 0x7f).toByte
    b.toArray
  }
  private def gKey(field: Int, wireType: Int): Array[Byte] = gVarint((field << 3) | wireType)
  private def gLd(field: Int, body: Array[Byte]): Array[Byte] =
    gKey(field, 2) ++ gVarint(body.length) ++ body
  private def gVi(field: Int, v: Long): Array[Byte] = gKey(field, 0) ++ gVarint(v)

  test("golden bytes: hand-assembled rollback decodes to the documented fields") {
    val blockId = Array[Byte](1, 2, 3, 4, 5)
    // BlockchainUpdated { id=1 (overridden), height=2, rollback=12 { block_id=1 } }
    val msg = gLd(1, bytes("outer-id-ignored")) ++ gVi(2, 42L) ++
      gLd(12, gLd(1, blockId))
    val (upd, skipped) = UpdatesProto.decode(msg)
    assert(skipped == 0)
    assert(upd == RawRollback(graft.functions.Base58.encode(blockId)))
  }

  test("golden bytes: hand-assembled block append with one transfer tx decodes exactly") {
    val tsMs = 1704100000000L
    val blockId = Array[Byte](9, 8, 7)
    val txId = bytes("TX1")
    val senderAddr = Array.tabulate[Byte](26)(i => (i * 5).toByte)
    val rcptAddr = Array.tabulate[Byte](26)(i => (i + 40).toByte)
    // Transfer { recipient=1 Recipient{public_key_hash=1}, amount=2 Amount{amount=2:500}, attachment=3 }
    val transfer = gLd(Schema.Transfer.Recipient, gLd(Schema.Recipient.PublicKeyHash, pkh20)) ++
      gLd(Schema.Transfer.Amount, gVi(Schema.Amount.Amount, 500L)) ++
      gLd(Schema.Transfer.Attachment, bytes("hi"))
    // Transaction { chain_id=1, sender_public_key=2, fee=3 Amount{amount=2:100000},
    //               timestamp=4, version=5, transfer at oneof slot 100+4 }
    val wavesTx = gVi(Schema.Transaction.ChainId, 87L) ++
      gLd(Schema.Transaction.SenderPublicKey, pk) ++
      gLd(Schema.Transaction.Fee, gVi(Schema.Amount.Amount, 100000L)) ++
      gVi(Schema.Transaction.Timestamp, tsMs) ++
      gVi(Schema.Transaction.Version, 2L) ++
      gLd(Schema.Transaction.DataBase + 4, transfer)
    val signedTx = gLd(Schema.SignedTransaction.WavesTransaction, wavesTx) ++
      gLd(Schema.SignedTransaction.Proofs, bytes("p1"))
    val blockMsg = gLd(Schema.Block.Header, gVi(Schema.Header.Timestamp, tsMs)) ++
      gLd(Schema.Block.Transactions, signedTx)
    val blockAppend = gLd(Schema.BlockAppend.Block, blockMsg) ++
      gVi(Schema.BlockAppend.UpdatedWavesAmount, 777L)
    // TransactionMetadata { sender_address=1, transfer=5 { recipient_address=1 } }
    val metaMsg = gLd(Schema.TransactionMetadata.SenderAddress, senderAddr) ++
      gLd(Schema.TransactionMetadata.Transfer,
        gLd(Schema.TransferMeta.RecipientAddress, rcptAddr))
    val append = gLd(Schema.Append.Block, blockAppend) ++
      gLd(Schema.Append.TransactionIds, txId) ++
      gLd(Schema.Append.TransactionsMetadata, metaMsg) ++
      gLd(Schema.Append.TransactionStateUpdates, Array.emptyByteArray)
    val msg = gLd(Schema.BlockchainUpdated.Id, blockId) ++
      gVi(Schema.BlockchainUpdated.Height, 555L) ++
      gLd(Schema.BlockchainUpdated.Append, append)

    val (upd, skipped) = UpdatesProto.decode(msg)
    assert(skipped == 0)
    val b = upd.asInstanceOf[RawBlock]
    assert(b.id == graft.functions.Base58.encode(blockId))
    assert(b.height == 555)
    assert(b.timeStampMs.contains(tsMs))
    assert(b.updatedWavesAmount.contains(777L))
    assert(b.txs.length == 1)
    val t = b.txs.head
    assert(t.txType == 4)
    assert(t.id.toSeq == txId.toSeq)
    assert(t.senderPublicKey.toSeq == pk.toSeq)
    assert(t.fee == 100000L && t.feeAssetId.exists(_.isEmpty))
    assert(t.timeStampMs == tsMs && t.txVersion.contains(2.toShort))
    assert(t.amount.contains(500L) && t.assetId.exists(_.isEmpty))
    assert(t.attachment.exists(_.toSeq == bytes("hi").toSeq))
    // type-4 recipient = NODE-RESOLVED address from tx meta (Model.scala
    // convention), not the wire Recipient's public-key hash
    assert(t.recipient.exists(_.toSeq == rcptAddr.toSeq))
    assert(t.proofs.map(_.toSeq) == Seq(bytes("p1").toSeq))
  }
}
