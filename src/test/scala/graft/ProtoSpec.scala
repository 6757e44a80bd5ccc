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

  // ---- golden wire corpus: EVERY oneof slot (VERDICT r13 #4) -----------
  // The r13 golden bytes covered rollback + one transfer; the other 17 tx
  // types, microblock appends, and state-update messages still relied on
  // Writer round-trips — the one remaining Writer/Reader co-drift window.
  // Each test below hand-assembles one tx's wire bytes from Schema's field
  // numbers + the protobuf wire spec and asserts the decoded typed event
  // FIELD BY FIELD (convert.rs:74-729 field sets).

  private val gPk = Array.tabulate[Byte](32)(i => (i + 100).toByte)
  private val gSender = Array.tabulate[Byte](26)(i => (i * 7).toByte)
  private val gRcpt = Array.tabulate[Byte](26)(i => (i + 60).toByte)
  private val gTsMs = 1704100000000L

  /** Common Transaction wrapper around a hand-assembled oneof payload. */
  private def gWavesTx(slot: Int, payload: Array[Byte]): Array[Byte] =
    gVi(Schema.Transaction.ChainId, 87L) ++
      gLd(Schema.Transaction.SenderPublicKey, gPk) ++
      gLd(Schema.Transaction.Fee, gVi(Schema.Amount.Amount, 100000L)) ++
      gVi(Schema.Transaction.Timestamp, gTsMs) ++
      gVi(Schema.Transaction.Version, 2L) ++
      gLd(Schema.Transaction.DataBase + slot, payload)

  private def gSigned(wavesTx: Array[Byte]): Array[Byte] =
    gLd(Schema.SignedTransaction.WavesTransaction, wavesTx) ++
      gLd(Schema.SignedTransaction.Proofs, bytes("gp"))

  private def gAmount(assetId: Array[Byte], amount: Long): Array[Byte] =
    (if (assetId.isEmpty) Array.emptyByteArray
     else gLd(Schema.Amount.AssetId, assetId)) ++ gVi(Schema.Amount.Amount, amount)

  private val gMetaBase = gLd(Schema.TransactionMetadata.SenderAddress, gSender)

  /** Wrap ONE signed tx + its meta/state slots into a block append and
    * decode; returns the single decoded tx. */
  private def gDecodeOne(signedTx: Array[Byte], txId: Array[Byte],
      metaMsg: Array[Byte], stateMsg: Array[Byte] = Array.emptyByteArray): RawTx = {
    val blockMsg = gLd(Schema.Block.Header, gVi(Schema.Header.Timestamp, gTsMs)) ++
      gLd(Schema.Block.Transactions, signedTx)
    val append = gLd(Schema.Append.Block, gLd(Schema.BlockAppend.Block, blockMsg)) ++
      gLd(Schema.Append.TransactionIds, txId) ++
      gLd(Schema.Append.TransactionsMetadata, metaMsg) ++
      gLd(Schema.Append.TransactionStateUpdates, stateMsg)
    val msg = gLd(Schema.BlockchainUpdated.Id, Array[Byte](1)) ++
      gVi(Schema.BlockchainUpdated.Height, 9L) ++
      gLd(Schema.BlockchainUpdated.Append, append)
    val (upd, skipped) = UpdatesProto.decode(msg)
    assert(skipped == 0)
    val b = upd.asInstanceOf[RawBlock]
    assert(b.height == 9 && b.txs.length == 1)
    b.txs.head
  }

  private def gCommon(t: RawTx, typ: Int): Unit = {
    assert(t.txType == typ, s"type: ${t.txType} != $typ")
    assert(t.senderPublicKey.toSeq == gPk.toSeq)
    assert(t.fee == 100000L && t.feeAssetId.exists(_.isEmpty))
    assert(t.timeStampMs == gTsMs && t.txVersion.contains(2.toShort))
    assert(t.proofs.map(_.toSeq) == Seq(bytes("gp").toSeq))
  }

  test("golden slot 1 Genesis: recipient_address + amount") {
    val payload = gLd(Schema.Genesis.RecipientAddress, gRcpt) ++ gVi(Schema.Genesis.Amount, 99L)
    val t = gDecodeOne(gSigned(gWavesTx(1, payload)), bytes("g1"), gMetaBase)
    gCommon(t, 1)
    assert(t.recipient.exists(_.toSeq == gRcpt.toSeq) && t.amount.contains(99L))
  }

  test("golden slot 2 Payment: recipient_address + amount") {
    val payload = gLd(Schema.Payment.RecipientAddress, gRcpt) ++ gVi(Schema.Payment.Amount, 77L)
    val t = gDecodeOne(gSigned(gWavesTx(2, payload)), bytes("p2"), gMetaBase)
    gCommon(t, 2)
    assert(t.recipient.exists(_.toSeq == gRcpt.toSeq) && t.amount.contains(77L))
  }

  test("golden slot 3 Issue: name/description/amount/decimals/reissuable/script; asset_id = tx id") {
    val payload = gLd(Schema.Issue.Name, bytes("tok")) ++
      gLd(Schema.Issue.Description, bytes("dsc")) ++
      gVi(Schema.Issue.Amount, 1000L) ++ gVi(Schema.Issue.Decimals, 4L) ++
      gVi(Schema.Issue.Reissuable, 1L) ++ gLd(Schema.Issue.Script, bytes("sc"))
    val t = gDecodeOne(gSigned(gWavesTx(3, payload)), bytes("i3"), gMetaBase)
    gCommon(t, 3)
    assert(t.assetName.contains("tok") && t.description.contains("dsc"))
    assert(t.quantity.contains(1000L) && t.decimals.contains(4.toShort))
    assert(t.reissuable.contains(true) && t.script.exists(_.toSeq == bytes("sc").toSeq))
    assert(t.assetId.exists(_.toSeq == bytes("i3").toSeq), "issue asset id = tx id")
  }

  test("golden slot 4 Transfer: asset amount + attachment; recipient from meta") {
    val payload = gLd(Schema.Transfer.Recipient,
        gLd(Schema.Recipient.PublicKeyHash, pkh20)) ++
      gLd(Schema.Transfer.Amount, gAmount(bytes("as1"), 500L)) ++
      gLd(Schema.Transfer.Attachment, bytes("hi"))
    val meta = gMetaBase ++ gLd(Schema.TransactionMetadata.Transfer,
      gLd(Schema.TransferMeta.RecipientAddress, gRcpt))
    val t = gDecodeOne(gSigned(gWavesTx(4, payload)), bytes("t4"), meta)
    gCommon(t, 4)
    assert(t.assetId.exists(_.toSeq == bytes("as1").toSeq) && t.amount.contains(500L))
    assert(t.attachment.exists(_.toSeq == bytes("hi").toSeq))
    assert(t.recipient.exists(_.toSeq == gRcpt.toSeq) && t.recipientAlias.isEmpty)
  }

  test("golden slot 5 Reissue: asset_amount + reissuable") {
    val payload = gLd(Schema.Reissue.AssetAmount, gAmount(bytes("as1"), 50L)) ++
      gVi(Schema.Reissue.Reissuable, 1L)
    val t = gDecodeOne(gSigned(gWavesTx(5, payload)), bytes("r5"), gMetaBase)
    gCommon(t, 5)
    assert(t.assetId.exists(_.toSeq == bytes("as1").toSeq))
    assert(t.quantity.contains(50L) && t.reissuable.contains(true))
  }

  test("golden slot 6 Burn: asset_amount") {
    val payload = gLd(Schema.Burn.AssetAmount, gAmount(bytes("as1"), 5L))
    val t = gDecodeOne(gSigned(gWavesTx(6, payload)), bytes("b6"), gMetaBase)
    gCommon(t, 6)
    assert(t.assetId.exists(_.toSeq == bytes("as1").toSeq) && t.amount.contains(5L))
  }

  test("golden slot 7 Exchange: fees, two orders, pair from first order, ids from meta") {
    def order(side: Long, version: Long, feeAsset: Array[Byte],
        priceMode: Long, eip: Option[Array[Byte]]): Array[Byte] =
      gVi(Schema.Order.ChainId, 87L) ++
        gLd(Schema.Order.SenderPublicKey, gPk) ++
        gLd(Schema.Order.MatcherPublicKey, pk) ++
        gLd(Schema.Order.AssetPair, gLd(Schema.AssetPair.AmountAssetId, bytes("aa"))) ++
        (if (side == 0) Array.emptyByteArray else gVi(Schema.Order.OrderSide, side)) ++
        gVi(Schema.Order.Amount, 10L) ++ gVi(Schema.Order.Price, 20L) ++
        gVi(Schema.Order.Timestamp, gTsMs) ++ gVi(Schema.Order.Expiration, gTsMs + 1000L) ++
        gLd(Schema.Order.MatcherFee, gAmount(feeAsset, 300000L)) ++
        gVi(Schema.Order.Version, version) ++
        gLd(Schema.Order.Proofs, bytes("op1")) ++
        (if (priceMode == 0) Array.emptyByteArray else gVi(Schema.Order.PriceMode, priceMode)) ++
        eip.map(gLd(Schema.Order.Eip712Signature, _)).getOrElse(Array.emptyByteArray)
    val payload = gVi(Schema.Exchange.Amount, 10L) ++ gVi(Schema.Exchange.Price, 20L) ++
      gVi(Schema.Exchange.BuyMatcherFee, 1L) ++ gVi(Schema.Exchange.SellMatcherFee, 2L) ++
      gLd(Schema.Exchange.Orders, order(0L, 1L, Array.emptyByteArray, 0L, None)) ++
      gLd(Schema.Exchange.Orders, order(1L, 4L, bytes("fa"), 2L, Some(Array[Byte](0x0a, 0x1b))))
    val meta = gMetaBase ++ gLd(Schema.TransactionMetadata.Exchange,
      gLd(Schema.ExchangeMeta.OrderIds, bytes("o1")) ++
        gLd(Schema.ExchangeMeta.OrderIds, bytes("o2")) ++
        gLd(Schema.ExchangeMeta.OrderSenderAddresses, bytes("s1")) ++
        gLd(Schema.ExchangeMeta.OrderSenderAddresses, bytes("s2")))
    val t = gDecodeOne(gSigned(gWavesTx(7, payload)), bytes("x7"), meta)
    gCommon(t, 7)
    assert(t.amount.contains(10L) && t.price.contains(20L))
    assert(t.buyMatcherFee.contains(1L) && t.sellMatcherFee.contains(2L))
    // pair columns propagate from the FIRST order's asset pair
    assert(t.amountAssetId.exists(_.toSeq == bytes("aa").toSeq))
    assert(t.priceAssetId.exists(_.isEmpty))
    val o1 = t.order1.get
    assert(o1.id.toSeq == bytes("o1").toSeq && o1.senderAddress.toSeq == bytes("s1").toSeq)
    assert(o1.orderSide == 0 && o1.version == 1 && o1.matcherFee == 300000L)
    assert(o1.matcherFeeAssetId.isEmpty && o1.priceMode == 0 && o1.eip712Signature.isEmpty)
    assert(o1.proofs.map(_.toSeq) == Seq(bytes("op1").toSeq))
    val o2 = t.order2.get
    assert(o2.id.toSeq == bytes("o2").toSeq && o2.senderAddress.toSeq == bytes("s2").toSeq)
    assert(o2.orderSide == 1 && o2.version == 4 && o2.priceMode == 2)
    assert(o2.matcherFeeAssetId.toSeq == bytes("fa").toSeq)
    assert(o2.eip712Signature.exists(_.toSeq == Seq[Byte](0x0a, 0x1b)))
    assert(o2.expiration == gTsMs + 1000L)
  }

  test("golden slot 8 Lease: alias recipient on the wire, address from the Lease meta slot") {
    val payload = gLd(Schema.Lease.Recipient, gLd(Schema.Recipient.Alias, bytes("bob"))) ++
      gVi(Schema.Lease.Amount, 77L)
    // Lease metadata rides TransactionMetadata field 8 (not Transfer's 5)
    val meta = gMetaBase ++ gLd(Schema.TransactionMetadata.Lease,
      gLd(Schema.LeaseMeta.RecipientAddress, gRcpt))
    val t = gDecodeOne(gSigned(gWavesTx(8, payload)), bytes("l8"), meta)
    gCommon(t, 8)
    assert(t.amount.contains(77L))
    assert(t.recipientAlias.contains("bob"))
    assert(t.recipient.exists(_.toSeq == gRcpt.toSeq))
  }

  test("golden slot 9 LeaseCancel: lease_id") {
    val payload = gLd(Schema.LeaseCancel.LeaseId, bytes("lid"))
    val t = gDecodeOne(gSigned(gWavesTx(9, payload)), bytes("lc9"), gMetaBase)
    gCommon(t, 9)
    assert(t.leaseTxId.exists(_.toSeq == bytes("lid").toSeq))
  }

  test("golden slot 10 CreateAlias: alias") {
    val payload = gLd(Schema.CreateAlias.Alias, bytes("carol"))
    val t = gDecodeOne(gSigned(gWavesTx(10, payload)), bytes("a10"), gMetaBase)
    gCommon(t, 10)
    assert(t.alias.contains("carol"))
  }

  test("golden slot 11 MassTransfer: wire amounts zip with meta recipient addresses") {
    val item1 = gLd(Schema.MassTransferItem.Recipient,
      gLd(Schema.Recipient.PublicKeyHash, pkh20)) ++ gVi(Schema.MassTransferItem.Amount, 5L)
    val item2 = gLd(Schema.MassTransferItem.Recipient,
      gLd(Schema.Recipient.PublicKeyHash, pkh20)) ++ gVi(Schema.MassTransferItem.Amount, 6L)
    val payload = gLd(Schema.MassTransfer.AssetId, bytes("as1")) ++
      gLd(Schema.MassTransfer.Transfers, item1) ++
      gLd(Schema.MassTransfer.Transfers, item2) ++
      gLd(Schema.MassTransfer.Attachment, bytes("at"))
    val meta = gMetaBase ++ gLd(Schema.TransactionMetadata.MassTransfer,
      gLd(Schema.MassTransferMeta.RecipientAddresses, bytes("r1a")) ++
        gLd(Schema.MassTransferMeta.RecipientAddresses, bytes("r2a")))
    val t = gDecodeOne(gSigned(gWavesTx(11, payload)), bytes("m11"), meta)
    gCommon(t, 11)
    assert(t.assetId.exists(_.toSeq == bytes("as1").toSeq))
    assert(t.attachment.exists(_.toSeq == bytes("at").toSeq))
    assert(t.transfers.map(_.amount) == Seq(5L, 6L))
    assert(t.transfers.map(_.recipient.toSeq) ==
      Seq(bytes("r1a").toSeq, bytes("r2a").toSeq))
  }

  test("golden slot 12 Data: every DataEntry value branch plus a delete (key only)") {
    def entry(body: Array[Byte]) = gLd(Schema.DataTx.Data, body)
    val payload =
      entry(gLd(Schema.DataEntry.Key, bytes("k_int")) ++ gVi(Schema.DataEntry.IntValue, 42L)) ++
        entry(gLd(Schema.DataEntry.Key, bytes("k_bool")) ++ gVi(Schema.DataEntry.BoolValue, 1L)) ++
        entry(gLd(Schema.DataEntry.Key, bytes("k_bin")) ++
          gLd(Schema.DataEntry.BinaryValue, Array[Byte](0, 1))) ++
        entry(gLd(Schema.DataEntry.Key, bytes("k_str")) ++
          gLd(Schema.DataEntry.StringValue, bytes("hello"))) ++
        entry(gLd(Schema.DataEntry.Key, bytes("k_del")))
    val t = gDecodeOne(gSigned(gWavesTx(12, payload)), bytes("d12"), gMetaBase)
    gCommon(t, 12)
    assert(t.dataEntries.map(_.key) == Seq("k_int", "k_bool", "k_bin", "k_str", "k_del"))
    assert(t.dataEntries(0).integerValue.contains(42L))
    assert(t.dataEntries(1).booleanValue.contains(true))
    assert(t.dataEntries(2).binaryValue.exists(_.toSeq == Seq[Byte](0, 1)))
    assert(t.dataEntries(3).stringValue.contains("hello"))
    val del = t.dataEntries(4)
    assert(del.integerValue.isEmpty && del.booleanValue.isEmpty &&
      del.binaryValue.isEmpty && del.stringValue.isEmpty)
  }

  test("golden slot 13 SetScript: script") {
    val t = gDecodeOne(gSigned(gWavesTx(13,
      gLd(Schema.SetScript.Script, bytes("base")))), bytes("s13"), gMetaBase)
    gCommon(t, 13)
    assert(t.script.exists(_.toSeq == bytes("base").toSeq))
  }

  test("golden slot 14 SponsorFee: min_fee amount; zero min fee decodes to None") {
    val t = gDecodeOne(gSigned(gWavesTx(14,
      gLd(Schema.SponsorFee.MinFee, gAmount(bytes("as1"), 7L)))), bytes("f14"), gMetaBase)
    gCommon(t, 14)
    assert(t.assetId.exists(_.toSeq == bytes("as1").toSeq))
    assert(t.minSponsoredAssetFee.contains(7L))
    // sponsorship CANCEL: amount 0 ⇒ NULL min fee (pg NULLable column)
    val t0 = gDecodeOne(gSigned(gWavesTx(14,
      gLd(Schema.SponsorFee.MinFee, gAmount(bytes("as1"), 0L)))), bytes("f14z"), gMetaBase)
    assert(t0.minSponsoredAssetFee.isEmpty)
  }

  test("golden slot 15 SetAssetScript: asset_id + script") {
    val payload = gLd(Schema.SetAssetScript.AssetId, bytes("as1")) ++
      gLd(Schema.SetAssetScript.Script, bytes("sc2"))
    val t = gDecodeOne(gSigned(gWavesTx(15, payload)), bytes("s15"), gMetaBase)
    gCommon(t, 15)
    assert(t.assetId.exists(_.toSeq == bytes("as1").toSeq))
    assert(t.script.exists(_.toSeq == bytes("sc2").toSeq))
  }

  test("golden slot 16 InvokeScript: payments on the wire, call parse from meta") {
    val payload = gLd(Schema.InvokeScript.DApp,
        gLd(Schema.Recipient.Alias, bytes("dapp.alias"))) ++
      gLd(Schema.InvokeScript.FunctionCall, bytes("opaque-ride")) ++
      gLd(Schema.InvokeScript.Payments, gAmount(Array.emptyByteArray, 5L)) ++
      gLd(Schema.InvokeScript.Payments, gAmount(bytes("aa"), 6L))
    val argInt = gVi(Schema.MetaArgument.IntValue, 7L)
    val argStr = gLd(Schema.MetaArgument.StringValue, bytes("s"))
    val argList = gLd(Schema.MetaArgument.List,
      gLd(Schema.ArgList.Items, gVi(Schema.MetaArgument.IntValue, 5L)) ++
        gLd(Schema.ArgList.Items, gVi(Schema.MetaArgument.BoolValue, 1L)))
    val meta = gMetaBase ++ gLd(Schema.TransactionMetadata.InvokeScript,
      gLd(Schema.InvokeMeta.DAppAddress, gRcpt) ++
        gLd(Schema.InvokeMeta.FunctionName, bytes("call")) ++
        gLd(Schema.InvokeMeta.Arguments, argInt) ++
        gLd(Schema.InvokeMeta.Arguments, argStr) ++
        gLd(Schema.InvokeMeta.Arguments, argList))
    val t = gDecodeOne(gSigned(gWavesTx(16, payload)), bytes("i16"), meta)
    gCommon(t, 16)
    assert(t.dappAlias.contains("dapp.alias"))
    assert(t.dappAddress.exists(_.toSeq == gRcpt.toSeq))
    assert(t.functionName.contains("call"))
    assert(t.payments.map(_.amount) == Seq(5L, 6L))
    assert(t.payments(0).assetId.isEmpty && t.payments(1).assetId.toSeq == bytes("aa").toSeq)
    assert(t.args.map(_.argType) == Seq("integer", "string", "list"))
    assert(t.args(0).integerValue.contains(7L) && t.args(1).stringValue.contains("s"))
    assert(t.args(2).listJson.contains(
      """[{"type":"integer","value":5},{"type":"boolean","value":true}]"""))
  }

  test("golden slot 17 UpdateAssetInfo: asset_id + name + description") {
    val payload = gLd(Schema.UpdateAssetInfo.AssetId, bytes("as1")) ++
      gLd(Schema.UpdateAssetInfo.Name, bytes("n2")) ++
      gLd(Schema.UpdateAssetInfo.Description, bytes("d2"))
    val t = gDecodeOne(gSigned(gWavesTx(17, payload)), bytes("u17"), gMetaBase)
    gCommon(t, 17)
    assert(t.assetId.exists(_.toSeq == bytes("as1").toSeq))
    assert(t.assetName.contains("n2") && t.description.contains("d2"))
  }

  test("golden slot 18 Ethereum: envelope bytes on SignedTransaction, fee/ts/version from meta") {
    val ethBytes = Array[Byte](0x01, 0x02, 0x7f)
    val signed = gLd(Schema.SignedTransaction.EthereumTransaction, ethBytes) ++
      gLd(Schema.SignedTransaction.Proofs, bytes("gp"))
    val meta = gMetaBase ++ gLd(Schema.TransactionMetadata.Ethereum,
      gVi(Schema.EthereumMeta.Fee, 100000L) ++
        gVi(Schema.EthereumMeta.Timestamp, gTsMs) ++
        gLd(Schema.EthereumMeta.FunctionName, bytes("ethCall")) ++
        gVi(Schema.EthereumMeta.Version, 2L))
    val t = gDecodeOne(signed, bytes("e18"), meta)
    assert(t.txType == 18)
    assert(t.ethereumBytes.exists(_.toSeq == ethBytes.toSeq))
    assert(t.fee == 100000L && t.timeStampMs == gTsMs && t.txVersion.contains(2.toShort))
    assert(t.functionName.contains("ethCall"))
    assert(t.proofs.map(_.toSeq) == Seq(bytes("gp").toSeq))
  }

  test("golden microblock append: transactions nested in SignedMicroBlock, no timestamp") {
    val signedTx = gSigned(gWavesTx(10, gLd(Schema.CreateAlias.Alias, bytes("mb"))))
    val micro = gLd(Schema.MicroBlockAppend.MicroBlock,
      gLd(Schema.SignedMicroBlock.MicroBlock,
        gLd(Schema.MicroBlock.Transactions, signedTx)))
    val append = gLd(Schema.Append.MicroBlock, micro) ++
      gLd(Schema.Append.TransactionIds, bytes("mb10")) ++
      gLd(Schema.Append.TransactionsMetadata, gMetaBase) ++
      gLd(Schema.Append.TransactionStateUpdates, Array.emptyByteArray)
    val msg = gLd(Schema.BlockchainUpdated.Id, Array[Byte](5)) ++
      gVi(Schema.BlockchainUpdated.Height, 9L) ++
      gLd(Schema.BlockchainUpdated.Append, append)
    val (upd, skipped) = UpdatesProto.decode(msg)
    assert(skipped == 0)
    val b = upd.asInstanceOf[RawBlock]
    assert(b.timeStampMs.isEmpty, "microblock append carries no header timestamp")
    assert(b.txs.length == 1 && b.txs.head.alias.contains("mb"))
  }

  test("golden state update: asset after-state and data-entry update decode field-by-field") {
    val details = gLd(Schema.AssetDetails.AssetId, bytes("as9")) ++
      gLd(Schema.AssetDetails.Issuer, gPk) ++
      gVi(Schema.AssetDetails.Decimals, 2L) ++
      gLd(Schema.AssetDetails.Name, bytes("nm")) ++
      gLd(Schema.AssetDetails.Description, bytes("ds")) ++
      gVi(Schema.AssetDetails.Reissuable, 1L) ++
      gVi(Schema.AssetDetails.Volume, 1000L) ++
      gLd(Schema.AssetDetails.ScriptInfo, gLd(Schema.ScriptInfo.Script, bytes("si"))) ++
      gVi(Schema.AssetDetails.Sponsorship, 3L)
    val state = gLd(Schema.StateUpdate.Assets,
        gLd(Schema.AssetStateUpdate.After, details)) ++
      gLd(Schema.StateUpdate.DataEntries,
        gLd(Schema.DataEntryUpdate.Address, gRcpt) ++
          gLd(Schema.DataEntryUpdate.DataEntry,
            gLd(Schema.DataEntry.Key, bytes("k")) ++ gVi(Schema.DataEntry.IntValue, 5L)))
    val t = gDecodeOne(gSigned(gWavesTx(10, gLd(Schema.CreateAlias.Alias, bytes("x")))),
      bytes("su"), gMetaBase, state)
    assert(t.assetStateUpdates.length == 1)
    val au = t.assetStateUpdates.head
    assert(au.assetId.toSeq == bytes("as9").toSeq && au.issuer.toSeq == gPk.toSeq)
    assert(au.decimals == 2.toShort && au.name == "nm" && au.description == "ds")
    assert(au.reissuable && au.volume == 1000L && au.sponsorship == 3L && !au.nft)
    assert(au.script.exists(_.toSeq == bytes("si").toSeq))
    assert(t.dataEntryUpdates.length == 1)
    val du = t.dataEntryUpdates.head
    assert(du.address.toSeq == gRcpt.toSeq)
    assert(du.entry.exists(e => e.key == "k" && e.integerValue.contains(5L)))
  }
}
