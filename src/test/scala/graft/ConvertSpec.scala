package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.convert._
import graft.functions.{Base58, Waves}
import graft.schema.ReferenceSchemas

/** 18-way transaction conversion (convert.rs:74-729): common prefix, typed
  * payloads, child explosions, encodings, uid determinism. */
class ConvertSpec extends SparkSpec {

  import spark.implicits._

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  private val pk = Array.tabulate[Byte](32)(_.toByte)

  private def tx(id: String, t: Short): RawTx =
    RawTx(id = bytes(id), txType = t, senderPublicKey = pk,
      timeStampMs = 1704100000000L, fee = 100000L, txVersion = Some(2),
      proofs = Seq(bytes("p1"), bytes("p2")))

  private val blocks = Seq(
    RawBlock("b1", 100, Some(1704100000000L), Some(1000000L), Seq(
      tx("t1", 4).copy(assetId = Some(Array.emptyByteArray), amount = Some(500L),
        recipient = Some(bytes("rcpt")), feeAssetId = Some(Array.emptyByteArray),
        attachment = Some(bytes("hi"))),
      tx("t2", 7).copy(
        order1 = Some(RawOrder(id = bytes("o1"), version = 1,
          senderAddress = bytes("s1"), senderPublicKey = pk, matcherPublicKey = pk,
          amountAssetId = bytes("aa"), priceAssetId = Array.emptyByteArray,
          orderSide = 0, amount = 10L, price = 20L, timestamp = 1704100000000L,
          expiration = 1704186400000L, matcherFee = 300000L,
          proofs = Seq(bytes("op1"), bytes("op2")))),
        order2 = Some(RawOrder(id = bytes("o2"), version = 4,
          senderAddress = bytes("s2"), senderPublicKey = pk, matcherPublicKey = pk,
          amountAssetId = bytes("aa"), priceAssetId = Array.emptyByteArray,
          orderSide = 1, amount = 10L, price = 20L, timestamp = 1704100000000L,
          expiration = 1704186400000L, matcherFee = 300000L,
          matcherFeeAssetId = bytes("fa"),
          eip712Signature = Some(Array[Byte](0x0a, 0x1b.toByte)), priceMode = 2)),
        amount = Some(10L), price = Some(20L),
        amountAssetId = Some(bytes("aa")), priceAssetId = Some(Array.emptyByteArray),
        buyMatcherFee = Some(1L), sellMatcherFee = Some(2L),
        feeAssetId = Some(Array.emptyByteArray)),
      tx("t3", 12).copy(dataEntries = Seq(
        RawDataEntry("k_int", integerValue = Some(42L)),
        RawDataEntry("k_str", stringValue = Some("hello")),
        RawDataEntry("k_bin", binaryValue = Some(Array[Byte](0, 1))))))),
    RawBlock("b2", 101, Some(1704100060000L), None, Seq(
      tx("t4", 8).copy(recipient = Some(bytes("rcpt")), amount = Some(77L)),
      tx("t5", 9).copy(leaseTxId = Some(bytes("t4"))),
      tx("t6", 16).copy(dappAddress = Some(bytes("dapp")), functionName = Some("call"),
        feeAssetId = Some(Array.emptyByteArray),
        args = Seq(
          RawInvokeArg("integer", integerValue = Some(7L)),
          RawInvokeArg("list", listJson = Some("""[{"type":"integer","value":5}]"""))),
        payments = Seq(RawPayment(5L, Array.emptyByteArray), RawPayment(6L, bytes("aa")))),
      // genesis: no sender public key; recipient payload is the 20-byte PKH
      tx("t7", 1).copy(senderPublicKey = Array.emptyByteArray,
        recipient = Some(Array.tabulate[Byte](20)(i => (i + 1).toByte)), amount = Some(99L)))))

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    val blockFrame = Seq((1L, "b1"), (2L, "b2")).toDF("uid", "id")
    val flat = TxConvert.withBlockUids(TxConvert.flatten(spark, blocks), blockFrame)
    TxConvert.convert(flat)
  }

  test("uid assignment: height*100000 + idx in arrival order") {
    val uids = tables("txs_4").select("id", "uid").as[(String, Long)].collect().toMap
    assert(uids(Base58.encode(bytes("t1"))) == 100L * 100000)
    val t4uid = tables("txs_8").select("uid").as[Long].collect().head
    assert(t4uid == 101L * 100000)
  }

  test("common prefix populated: sender address, base58 ids, proofs, timestamps") {
    val r = tables("txs_4").collect().head
    assert(r.getAs[String]("sender") == Waves.addressFromPublicKey(pk, 'W'.toByte))
    assert(r.getAs[String]("sender_public_key") == Base58.encode(pk))
    assert(r.getAs[String]("id") == Base58.encode(bytes("t1")))
    assert(r.getSeq[String](r.fieldIndex("proofs")) == Seq(Base58.encode(bytes("p1")), Base58.encode(bytes("p2"))))
    assert(r.getAs[java.sql.Timestamp]("time_stamp").getTime == 1704100000000L)
    assert(r.getAs[Long]("block_uid") == 1L)
    assert(r.getAs[String]("status") == "succeeded")
  }

  test("decode zips meta and skips meta-less txs (updates.rs:196-218)") {
    import Decode._
    val wires = Seq(
      RawTxWire(tx("w1", 4), Some(RawTxMeta(recipientAddress = Some(bytes("addr1"))))),
      RawTxWire(tx("w2", 4), None), // missing metadata → skipped, not failed
      RawTxWire(tx("w3", 16), Some(RawTxMeta(dappAddress = Some(bytes("dapp1"))))))
    val (block, skipped) = Decode.decodeBlock("db1", 7, Some(1704100000000L), None, wires)
    assert(skipped == 1)
    assert(block.txs.map(t => new String(t.id, "UTF-8")) == Seq("w1", "w3"))
    // meta's node-resolved addresses are merged into the IR fields the
    // conversion base58-encodes (the resolved-bytes recipient convention)
    assert(block.txs.head.recipient.map(new String(_, "UTF-8")) == Some("addr1"))
    assert(block.txs(1).dappAddress.map(new String(_, "UTF-8")) == Some("dapp1"))
  }

  test("asset-update extraction: WAVES skip, NUL escape, sponsorship gate (mod.rs:476-546)") {
    val b = Seq(RawBlock("ab1", 50, Some(1704100000000L), None, Seq(
      tx("x1", 3).copy(assetStateUpdates = Seq(
        RawAssetStateUpdate(assetId = Array.emptyByteArray, issuer = pk, name = "waves",
          description = "", decimals = 8, reissuable = false, nft = false, volume = 1L), // WAVES → skipped
        RawAssetStateUpdate(assetId = bytes("as1"), issuer = pk, name = "a\u0000b",
          description = "d", decimals = 4, reissuable = true, nft = false, volume = 7L),
        RawAssetStateUpdate(assetId = bytes("as2"), issuer = pk, name = "n2",
          description = "", decimals = 2, reissuable = true, nft = true, volume = 9L,
          sponsorship = 5L))))))
    val flat = TxConvert.withBlockUids(TxConvert.flatten(spark, b), Seq((9L, "ab1")).toDF("uid", "id"))
    val out = Extract.assetUpdates(flat).orderBy("uid").collect()
    assert(out.length == 2) // WAVES update dropped (mod.rs:491-494)
    val r1 = out(0)
    assert(r1.getAs[String]("asset_id") == Base58.encode(bytes("as1")))
    assert(r1.getAs[String]("name") == "a\\0b") // escape_unicode_null
    assert(r1.isNullAt(r1.fieldIndex("sponsorship"))) // 0 → NULL (mod.rs:527-531)
    assert(r1.getAs[Long]("uid") == (50L * 100000 + 0) * 1000 + 1) // tx_uid*1000+pos
    assert(r1.getAs[Long]("block_uid") == 9L)
    val r2 = out(1)
    assert(r2.getAs[Long]("sponsorship") == 5L)
    assert(r2.getAs[Boolean]("nft"))
  }

  test("recipient conventions: PKH derivation for genesis, resolved-bytes passthrough elsewhere") {
    // type 1: recipient = 20-byte public-key hash → Address::from(PublicKeyHash)
    val g = tables("txs_1").collect().head
    val pkh = Array.tabulate[Byte](20)(i => (i + 1).toByte)
    assert(g.getAs[String]("recipient_address") == Waves.addressFromPublicKeyHash(pkh, 'W'.toByte))
    // genesis has no sender key: NULL sender/sender_public_key, NULL tx_version
    // (convert.rs:254-257) — never an address fabricated from empty bytes
    assert(g.isNullAt(g.fieldIndex("sender")))
    assert(g.isNullAt(g.fieldIndex("sender_public_key")))
    assert(g.isNullAt(g.fieldIndex("tx_version")))
    // types 4/8/16: node-resolved address bytes are base58'd, not re-hashed
    assert(tables("txs_4").collect().head.getAs[String]("recipient_address") == Base58.encode(bytes("rcpt")))
    assert(tables("txs_8").collect().head.getAs[String]("recipient_address") == Base58.encode(bytes("rcpt")))
    assert(tables("txs_16").collect().head.getAs[String]("dapp_address") == Base58.encode(bytes("dapp")))
  }

  test("order JSON: version-dependent field matrix (models.rs:101-192)") {
    def e(s: String) = Base58.encode(bytes(s))
    val pkB = Base58.encode(pk)
    val r = tables("txs_7").collect().head
    // v1: the 14 base fields, in serialize_field order; WAVES price asset →
    // null inside assetPair; signature = proofs[0]
    assert(r.getAs[String]("order1") ==
      s"""{"id":"${e("o1")}","version":1,"sender":"${e("s1")}","senderPublicKey":"$pkB",""" +
      s""""matcherPublicKey":"$pkB","assetPair":{"amountAsset":"${e("aa")}","priceAsset":null},""" +
      s""""orderType":"buy","amount":10,"price":20,"timestamp":1704100000000,""" +
      s""""expiration":1704186400000,"matcherFee":300000,""" +
      s""""proofs":["${e("op1")}","${e("op2")}"],"signature":"${e("op1")}"}""")
    // v4: + matcherFeeAssetId, 0x-hex eip712Signature, priceMode name;
    // empty proofs → [] and signature ""
    assert(r.getAs[String]("order2") ==
      s"""{"id":"${e("o2")}","version":4,"sender":"${e("s2")}","senderPublicKey":"$pkB",""" +
      s""""matcherPublicKey":"$pkB","assetPair":{"amountAsset":"${e("aa")}","priceAsset":null},""" +
      s""""orderType":"sell","amount":10,"price":20,"timestamp":1704100000000,""" +
      s""""expiration":1704186400000,"matcherFee":300000,"proofs":[],"signature":"",""" +
      s""""matcherFeeAssetId":"${e("fa")}","eip712Signature":"0x0a1b","priceMode":"assetDecimals"}""")
    // v3: adds ONLY matcherFeeAssetId (null when absent); priceMode/eip712
    // stay unserialized even if set — the version gates the field set
    val v3 = Seq(Tuple1(RawOrder(id = bytes("o3"), version = 3, priceMode = 2,
      eip712Signature = Some(Array[Byte](1))))).toDF("o")
      .select(OrderJson.orderJson(col("o")).as("j")).as[String].collect().head
    assert(v3 ==
      s"""{"id":"${e("o3")}","version":3,"sender":"","senderPublicKey":"",""" +
      """"matcherPublicKey":"","assetPair":{"amountAsset":null,"priceAsset":null},""" +
      """"orderType":"buy","amount":0,"price":0,"timestamp":0,"expiration":0,""" +
      """"matcherFee":0,"proofs":[],"signature":"","matcherFeeAssetId":null}""")
  }

  test("WAVES sentinel for empty asset ids (waves.rs:79-85)") {
    val r = tables("txs_4").collect().head
    assert(r.getAs[String]("asset_id") == "WAVES")
    assert(r.getAs[String]("fee_asset_id") == "WAVES")
    val x = tables("txs_7").collect().head
    assert(x.getAs[String]("amount_asset_id") == Base58.encode(bytes("aa")))
    assert(x.getAs[String]("price_asset_id") == "WAVES")
  }

  test("data entries explode with tagged-union typing (txs_12_data)") {
    val d = tables("txs_12_data").orderBy("position_in_tx").collect()
    assert(d.length == 3)
    assert(d(0).getAs[String]("data_type") == "integer" && d(0).getAs[Long]("data_value_integer") == 42L)
    assert(d(1).getAs[String]("data_type") == "string" && d(1).getAs[String]("data_value_string") == "hello")
    assert(d(2).getAs[String]("data_type") == "binary" && d(2).getAs[String]("data_value_binary") == "base64:AAE=")
    assert(d.map(_.getAs[Short]("position_in_tx")).toSeq == Seq(0, 1, 2))
  }

  test("invoke args + payments explode (txs_16_args / txs_16_payment)") {
    val a = tables("txs_16_args").orderBy("position_in_args").collect()
    assert(a.length == 2)
    assert(a(0).getAs[String]("arg_type") == "integer" && a(0).getAs[Long]("arg_value_integer") == 7L)
    assert(a(1).getAs[String]("arg_type") == "list" &&
      a(1).getAs[String]("arg_value_list") == """[{"type":"integer","value":5}]""")
    val p = tables("txs_16_payment").orderBy("position_in_payment").collect()
    assert(p.map(_.getAs[String]("asset_id")).toSeq == Seq("WAVES", Base58.encode(bytes("aa"))))
  }

  test("lease-cancel uid resolution via broadcast lookup (J1, pg.rs:472-505)") {
    val resolved = TxConvert.resolveLeaseUids(tables("txs_9"), tables("txs_8"))
    val r = resolved.collect().head
    assert(r.getAs[Long]("lease_tx_uid") == 101L * 100000)
  }

  test("txs union view exposes the parent-scan prefix over all 18 types") {
    val txs = TxConvert.txsUnionView(tables)
    assert(txs.columns.toSeq == ReferenceSchemas.txsCommon.map(_.name))
    assert(txs.count() == 7)
    assert(txs.select("tx_type").distinct().as[Short].collect().toSet == Set(1, 4, 7, 12, 8, 9, 16))
  }

  test("every produced table matches its registry schema's columns AND types") {
    tables.foreach { case (name, df) =>
      val expected = ReferenceSchemas.tables(name)
        .fields.map(f => f.name -> f.dataType).toMap
      // txs_9 carries the transient lease_id used by resolveLeaseUids
      val actual = df.schema.fields
        .filterNot(f => name == "txs_9" && f.name == "lease_id")
        .map(f => f.name -> f.dataType).toMap
      assert(actual.keySet == expected.keySet,
        s"$name columns: ${actual.keySet} vs ${expected.keySet}")
      for ((col, dt) <- expected) {
        // ArrayType containsNull is writer-dependent — compare erased
        val got = actual(col) match {
          case ArrayType(e, _) => ArrayType(e)
          case o => o
        }
        val want = dt match {
          case ArrayType(e, _) => ArrayType(e)
          case o => o
        }
        assert(got == want, s"$name.$col: produced ${actual(col)}, registry $dt")
      }
    }
  }
}
