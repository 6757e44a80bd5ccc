package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S1 — the streaming source, driven deterministically: replay a bounded
  * event set through a real Structured-Streaming query (MemoryStream →
  * micro-batches → foreachBatch), the same shape the gRPC subscription
  * takes in production (`updates.rs:40-87` ≙ a DSv2 micro-batch source).
  * Each chunk becomes one micro-batch, mirroring the 256-block batch close
  * (`updates.rs:117-129`). */
object StreamReplay {

  final case class StreamedEvent(event_id: Long, event_type: String)

  /** Replay `events` in `chunk`-sized micro-batches; returns one row per
    * event tagged with the micro-batch id that delivered it. */
  def replay(spark: SparkSession, events: Seq[StreamedEvent], chunk: Int): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[StreamedEvent]
    val delivered = ArrayBuffer.empty[(Long, String, Long)]
    val query = MicroBatchPipeline.start[StreamedEvent](
      stream.toDS(),
      (df, batchId) =>
        delivered.synchronized {
          delivered ++= df.collect().map(r => (r.getLong(0), r.getString(1), batchId))
        },
      maxWaitMs = 10L)
    try {
      events.grouped(chunk).foreach { g =>
        stream.addData(g)
        query.processAllAvailable()
      }
    } finally query.stop()

    delivered.toSeq.toDF("event_id", "event_type", "batch_id")
  }
}
