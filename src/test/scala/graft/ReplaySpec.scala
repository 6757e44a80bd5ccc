package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.convert._
import graft.operators.{Candles, Pipeline, Scd2}

/** End-to-end replay (SURVEY §5, §7.2): typed blocks → conversion → candle
  * state, through microblock squash and a chain rollback; the corrected
  * state must equal a clean replay of only the surviving blocks — the
  * reference's whole correctness story (`mod.rs:190-251`) in one test. */
class ReplaySpec extends SparkSpec {

  import spark.implicits._

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")
  private val pk = Array.tabulate[Byte](32)(_.toByte)

  private def exchange(id: String, tsMs: Long, amount: Long, price: Long, pair: (String, String)): RawTx =
    RawTx(id = bytes(id), txType = 7, senderPublicKey = pk, timeStampMs = tsMs,
      fee = 1L, txVersion = Some(2),
      order1 = Some(RawOrder(id = bytes(s"o-$id"), version = 1)),
      order2 = Some(RawOrder(id = bytes(s"p-$id"), version = 1, orderSide = 1)),
      amount = Some(amount), price = Some(price),
      amountAssetId = Some(bytes(pair._1)), priceAssetId = Some(bytes(pair._2)),
      buyMatcherFee = Some(0L), sellMatcherFee = Some(0L),
      feeAssetId = Some(Array.emptyByteArray))

  private val t0 = 1704100000000L // 2024-01-01T08:26:40Z
  private val block1 = RawBlock("b1", 100, Some(t0), None, Seq(
    exchange("e1", t0, 100, 500, ("AA", "PP")),
    exchange("e2", t0 + 30000, 50, 700, ("AA", "PP"))))
  private val block2 = RawBlock("b2", 101, Some(t0 + 60000), None, Seq(
    exchange("e3", t0 + 60000, 10, 900, ("AA", "PP")),
    exchange("e4", t0 + 61000, 5, 200, ("BB", "PP"))))

  /** blocks → txs_7 trades frame via the real conversion. */
  private def tradesOf(blocks: Seq[RawBlock], blockUids: Seq[(Long, String)]): DataFrame = {
    val blockFrame = blockUids.toDF("uid", "id")
    val flat = TxConvert.withBlockUids(TxConvert.flatten(spark, blocks), blockFrame)
    TxConvert.convert(flat)("txs_7")
      .select(col("uid"), col("time_stamp"), col("amount_asset_id"), col("price_asset_id"),
        col("sender"), col("height"), col("amount"), col("price").cast("decimal(18,2)").as("price"),
        col("block_uid"))
  }

  test("append + rollback replays to the clean single-block state") {
    val both = tradesOf(Seq(block1, block2), Seq((1L, "b1"), (2L, "b2")))
    val onlyB1 = tradesOf(Seq(block1), Seq((1L, "b1")))

    // full state after both blocks
    val fullState = Candles.allIntervals(both)
    // rollback block2: facts drop block_uid > 1, candles recompute from
    // block2's first trade timestamp
    val survivingTrades = Pipeline.rollbackFacts(Map("txs_7" -> both), 1L)("txs_7")
    val rolled = Candles.rollback(fullState, survivingTrades,
      new java.sql.Timestamp(t0 + 60000))

    val clean = Candles.allIntervals(onlyB1)
    assert(rolled.exceptAll(clean).count() == 0 && clean.exceptAll(rolled).count() == 0)
  }

  test("microblock squash re-points converted facts to the key block") {
    // b1 key block, m1 provisional microblock, b2 key block arrives
    val blocks = Seq(
      (1L, "b1", 100, Some("2024-01-01 08:00:00")),
      (2L, "m1", 100, None),
      (3L, "b2", 100, Some("2024-01-01 08:01:00")))
      .toDF("uid", "id", "height", "ts")
      .select(col("uid"), col("id"), col("height"), to_timestamp(col("ts")).as("time_stamp"))
    val facts = tradesOf(Seq(block1), Seq((2L, "b1"))) // facts landed on the microblock uid
    val (squashed, remap) = Pipeline.squashMicroblocks(blocks, "b2")
    val repointed = Pipeline.repointBlockUids(facts, remap)
    assert(repointed.select("block_uid").distinct().as[Long].collect().toSeq == Seq(3L))
    assert(squashed.filter(col("uid") === 3).select("id").as[String].collect().head == "m1")
  }

  test("SCD-2 dimension follows the same rollback cut as the facts") {
    val dim = Scd2.linkBatch(Seq(
      ("AA", 10L, 1L), ("AA", 20L, 2L), ("BB", 30L, 2L))
      .toDF("asset_id", "uid", "block_uid"))
    val rolled = Scd2.rollback(dim, blockUidCut = 1L)
    val rows = rolled.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(rows == Set(("AA", 10L, graft.schema.ReferenceSchemas.MaxUid)))
  }
}
