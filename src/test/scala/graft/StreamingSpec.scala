package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Candles
import graft.streaming.{LivenessListener, MicroBatchPipeline}

/** Structured-Streaming wrapper semantics: micro-batch application is
  * exactly-once, streamed candle maintenance converges to the batch answer,
  * liveness tracks event-time freshness. */
case class Trade(uid: Long, ts: String, amount_asset_id: String,
    price_asset_id: String, sender: String, height: Int, amount: Long, price: Double)

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private val tradeRows = Seq(
    Trade(1, "2024-01-01 10:00:05", "A", "P", "m1", 10, 100, 5.0),
    Trade(2, "2024-01-01 10:00:30", "A", "P", "m1", 10, 50, 7.0),
    Trade(3, "2024-01-01 10:59:10", "A", "P", "m1", 11, 10, 9.0),
    Trade(4, "2024-01-01 11:30:00", "A", "P", "m1", 11, 20, 4.0))

  private def asTrades(df: DataFrame): DataFrame =
    df.select(col("uid"), to_timestamp(col("ts")).as("time_stamp"),
      col("amount_asset_id"), col("price_asset_id"), col("sender"), col("height"),
      col("amount"), col("price").cast("decimal(18,2)").as("price"))

  test("foreachBatch candle maintenance converges to the batch answer (ST1/ST2)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Trade]
    // per-batch arrivals, applied exactly once (the incremental-merge math
    // itself is proven in CandlesSpec; here we prove the streaming contract:
    // batches arrive once, in order, and the union is complete)
    val arrived = scala.collection.mutable.ArrayBuffer.empty[Trade]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]

    val query = MicroBatchPipeline.start[Trade](
      stream.toDS(),
      (df, id) => {
        batches += id
        arrived ++= df.as[Trade].collect()
      },
      maxWaitMs = 50L)

    stream.addData(tradeRows.take(2))
    query.processAllAvailable()
    stream.addData(tradeRows.drop(2))
    query.processAllAvailable()
    query.stop()

    assert(batches.toSeq == batches.toSeq.distinct, "a batch was applied twice")
    assert(arrived.map(_.uid).sorted == tradeRows.map(_.uid))

    val streamed = Candles.allIntervals(asTrades(arrived.toSeq.toDF()))
    val expected = Candles.allIntervals(asTrades(tradeRows.toDF()))
    assert(streamed.exceptAll(expected).count() == 0 && expected.exceptAll(streamed).count() == 0)
  }

  test("idempotent handler skips re-delivered batches (ST2)") {
    var applied = 0
    val h = new MicroBatchPipeline.IdempotentBatchHandler((_, _) => applied += 1)
    val df = Seq(1).toDF("x")
    h(df, 0L); h(df, 1L); h(df, 1L); h(df, 0L)
    assert(applied == 2)
    assert(h.lastBatch == 1L)
  }

  test("liveness listener: healthy within bound, unhealthy beyond (ST6)") {
    val l = new LivenessListener(maxAgeMs = 300000)
    assert(!l.isHealthy()) // nothing observed yet
    val now = System.currentTimeMillis()
    l.observe(now - 100000)
    assert(l.isHealthy(now))
    assert(!l.isHealthy(now + 400000))
  }
}
