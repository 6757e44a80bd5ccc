package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact dedup for ingest pipelines — the streaming face of
  * [[graft.llm.Dedup.exact]]: drop re-arrivals of already-seen content
  * while the stream runs, with STATE BOUNDED BY THE WATERMARK HORIZON
  * rather than the stream's lifetime (`dropDuplicatesWithinWatermark`).
  * A duplicate arriving within `delay` of the original is guaranteed
  * dropped; state for content older than the watermark is evicted, so at
  * 100 TB/day the dedup index never outgrows (horizon × arrival rate).
  * Full-corpus dedup across arbitrary history remains the batch
  * operator's job. */
object StreamingDedup {

  /** First-occurrence pass-through keyed on the md5 of `textCol`; emits in
    * append mode. `eventTimeCol` must be a timestamp column. */
  def exactWithinWatermark(
      docs: DataFrame,
      eventTimeCol: String,
      textCol: String = "text",
      delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("__content_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")

  // bounded deterministic replay (≙ StreamReplay) for the gate/spec
  final case class DocEvent(timeStampMs: Long, text: String)

  private val seq = new AtomicInteger()

  /** Replay `events` through the dedup in `chunk`-sized micro-batches and
    * return the surviving rows' text (first occurrences). Only
    * arrival-order-independent columns are returned — which duplicate
    * instance survives is arrival-dependent by definition. */
  def replayExact(spark: SparkSession, events: Seq[DocEvent], chunk: Int,
      delay: String = "1 hour"): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[DocEvent]
    val src = stream.toDS()
      .select(timestamp_millis(col("timeStampMs")).as("event_time"), col("text"))
    val name = s"graft_stream_dedup_${seq.incrementAndGet()}"
    // bounded replay: 8 state partitions, not the session's 32 — a
    // streaming query writes one state file per partition per micro-batch
    // (same rationale as StreamingCandles' replay harness)
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try {
      val query = exactWithinWatermark(src, "event_time", delay = delay)
        .select("text")
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(10L))
        .start()
      try {
        events.grouped(chunk).foreach { g => stream.addData(g); query.processAllAvailable() }
      } finally query.stop()
    } finally spark.conf.set(key, prev)
    spark.table(name)
  }
}
