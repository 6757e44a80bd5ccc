package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-STREAM watermarked join — the one Structured-Streaming join mode
  * the engine's streaming surface did not yet cover (st7-st14 are
  * aggregations, stateful operators, and stream-static enrichment). Two
  * live event streams are joined on a key plus an EVENT-TIME range
  * condition ("click within the 30 minutes before the view" — the
  * attribution-join shape), entirely with Spark built-ins:
  * `withWatermark` on BOTH sides + an inner join whose time-range
  * predicate bounds how long each side's state is retained. No custom
  * state: the planner derives the retention window from the condition
  * (view rows age out once the click watermark passes `view_time`, click
  * rows once the view watermark passes `click_time + window`), which is
  * exactly the scale story at 100 TB/day — state is bounded by the time
  * window, never by history.
  *
  * The bounded replay feeds both MemoryStreams the same global event-time
  * order (the st13/st14 convention), so a 0-second watermark never drops
  * a row and the replay's final table equals the batch range-join over
  * the same slice — the st15 gate hash-matches a plain SQL join oracle.
  */
object StreamStreamJoin {

  final case class ViewEvent(event_id: Long, user_id: Long, tsUs: Long)
  final case class ClickEvent(ref_id: Long, ref_user_id: Long, refTsUs: Long)

  private val seq = new AtomicInteger(0)

  /** The declarative join: inner, key-equal, click in the `windowUs`
    * microseconds at-or-before the view. Both inputs must already carry
    * their watermarked event-time columns (`view_time` / `click_time`). */
  def attributionJoin(views: DataFrame, clicks: DataFrame, windowUs: Long): DataFrame =
    views.join(clicks,
      col("user_id") === col("ref_user_id") &&
        col("click_time") >= col("view_time") - expr(s"INTERVAL ${windowUs / 1000000L} SECONDS") &&
        col("click_time") <= col("view_time"))
      .select(col("event_id"), col("user_id"),
        col("tsUs").as("view_us"), col("ref_id"), col("refTsUs").as("click_us"))

  /** Bounded replay: `views` and `clicks` (each already event-time sorted)
    * are fed chunk-by-chunk in lockstep so the two watermarks advance
    * together; inner-join results appear as soon as both sides arrive, so
    * no flush sentinel is needed. Returns the final memory-sink table. */
  def replay(
      spark: SparkSession,
      views: Seq[ViewEvent],
      clicks: Seq[ClickEvent],
      windowUs: Long,
      chunk: Int): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vStream = MemoryStream[ViewEvent]
    val cStream = MemoryStream[ClickEvent]
    val name = s"graft_stream_join_${seq.incrementAndGet()}"
    val vDf = vStream.toDF()
      .withColumn("view_time", timestamp_micros(col("tsUs")))
      .withWatermark("view_time", "0 seconds")
    val cDf = cStream.toDF()
      .withColumn("click_time", timestamp_micros(col("refTsUs")))
      .withWatermark("click_time", "0 seconds")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val query = attributionJoin(vDf, cDf, windowUs).writeStream
        .outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(10L))
        .start()
      try {
        val vChunks = views.grouped(chunk).toSeq
        val cChunks = clicks.grouped(chunk).toSeq
        (0 until math.max(vChunks.length, cChunks.length)).foreach { i =>
          if (i < vChunks.length) vStream.addData(vChunks(i))
          if (i < cChunks.length) cStream.addData(cChunks(i))
          query.processAllAvailable()
        }
      } finally query.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.table(name)
  }
}
