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
  * order (the st13/st14 convention) under a 1 ms watermark delay — ordered
  * feeds never drop a row, INCLUDING equal timestamps that straddle a
  * trigger boundary (a 0 s delay loses those: see the note at the
  * withWatermark calls) — so the replay's final table equals the batch
  * range-join over the same slice; the st15 gate hash-matches a plain SQL
  * join oracle and StreamJoinPropertySpec pins the equality on random
  * tie-heavy inputs at several chunk sizes.
  */
object StreamStreamJoin {

  final case class ViewEvent(event_id: Long, user_id: Long, tsUs: Long)
  final case class ClickEvent(ref_id: Long, ref_user_id: Long, refTsUs: Long)

  /** State-store accounting across a bounded replay: `droppedLate` is the
    * watermark's silent-discard counter (must be 0 in an ordered replay),
    * `stateRowsPeak` the largest buffered-row total any micro-batch
    * committed, `stateRowsFinal` the total after the last batch. Peak is
    * the number a capacity plan needs: for a WINDOWED join it is bounded
    * by (rows in one trigger's slice + rows inside the join window), NOT
    * by history length — the claim the streaming scale row measures. */
  final case class JoinReplayStats(
      droppedLate: Long, stateRowsPeak: Long, stateRowsFinal: Long, batches: Long)

  private val seq = new AtomicInteger(0)

  /** The declarative join: key-equal, click in the `windowUs`
    * microseconds at-or-before the view. Both inputs must already carry
    * their watermarked event-time columns (`view_time` / `click_time`).
    * `joinType` "inner" emits matches as they arrive; "leftOuter" also
    * emits each unmatched view with NULL click columns — but only once
    * the watermark has passed the view's join window, so the planner
    * KNOWS no future click can match (the outer-result finalization
    * semantics st16 exists to pin). */
  def attributionJoin(
      views: DataFrame,
      clicks: DataFrame,
      windowUs: Long,
      joinType: String = "inner"): DataFrame =
    views.join(clicks,
      col("user_id") === col("ref_user_id") &&
        col("click_time") >= col("view_time") - expr(s"INTERVAL $windowUs MICROSECOND") &&
        col("click_time") <= col("view_time"),
      joinType)
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
      chunk: Int,
      joinType: String = "inner"): DataFrame =
    replayCounted(spark, views, clicks, windowUs, chunk, joinType)._1

  /** [[replay]] plus LATE-DROP ACCOUNTING (VERDICT r12 #8): the second
    * element is the total `numRowsDroppedByWatermark` across every
    * micro-batch — rows the watermark silently discarded. In an
    * event-time-ordered replay it must be ZERO (the st17 gate pins the
    * constant into its hashed output); StreamingSpec feeds a deliberately
    * late row and asserts the counter catches it, making the watermark's
    * drop behavior observable instead of silent. */
  def replayCounted(
      spark: SparkSession,
      views: Seq[ViewEvent],
      clicks: Seq[ClickEvent],
      windowUs: Long,
      chunk: Int,
      joinType: String = "inner"): (DataFrame, Long) = {
    val (df, stats) = replayMeasured(spark, views, clicks, windowUs, chunk, joinType)
    (df, stats.droppedLate)
  }

  /** [[replayCounted]] plus state-store metrics ([[JoinReplayStats]]) —
    * what the streaming-join SCALE row records: at 100× LONGER event
    * history with a FIXED per-trigger chunk (constant arrival rate), the
    * batch count grows ~100× and wall time with it, but `stateRowsPeak`
    * must stay ~flat — the join window, not the history, bounds resident
    * state. Metrics are folded from the same incremental progress drain
    * the late-drop counter uses (ring-buffer-eviction-proof). */
  def replayMeasured(
      spark: SparkSession,
      views: Seq[ViewEvent],
      clicks: Seq[ClickEvent],
      windowUs: Long,
      chunk: Int,
      joinType: String = "inner"): (DataFrame, JoinReplayStats) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vStream = MemoryStream[ViewEvent]
    val cStream = MemoryStream[ClickEvent]
    val name = s"graft_stream_join_${seq.incrementAndGet()}"
    // 1 ms — NOT 0 seconds — of watermark delay: joins late-filter RAW event
    // times (unlike windowed aggregations, which only drop whole closed
    // windows) and the filter is INCLUSIVE at the boundary, so with a 0 s
    // delay two rows CARRYING THE SAME TIMESTAMP straddling a trigger
    // boundary silently lose the second row — the watermark reaches T when
    // the first ts=T row commits, and a tie arriving next trigger is
    // <= watermark = late. Found by the StreamJoinPropertySpec generator
    // (coarse ts grid + tiny chunks), diagnosed per-batch: wm tracked
    // min(side maxima) exactly and the only dropped rows were wm-equal.
    // The unit matters: Spark truncates the delay to WHOLE MILLISECONDS
    // ("1 microsecond" → 0 ms → no protection). 1 ms keeps every tie
    // joinable while anything out of order by more still drops and is
    // still counted.
    val vDf = vStream.toDF()
      .withColumn("view_time", timestamp_micros(col("tsUs")))
      .withWatermark("view_time", "1 millisecond")
    val cDf = cStream.toDF()
      .withColumn("click_time", timestamp_micros(col("refTsUs")))
      .withWatermark("click_time", "1 millisecond")
    var droppedLate = 0L
    var statePeak = 0L
    var stateFinal = 0L
    var lastBatch = -1L
    val result = ReplayEnv.withReplayEnv(spark) {
      val query = attributionJoin(vDf, cDf, windowUs, joinType).writeStream
        .outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(10L))
        .start()
      try {
        // recentProgress is a RING BUFFER (default cap 100 entries) — a
        // one-shot sum after the replay silently undercounts drops once the
        // batch count passes the cap (ADVICE r13). Drain it incrementally
        // instead: after every processAllAvailable, fold in the entries for
        // batch ids not seen yet; the final gap check proves no entry was
        // evicted between drains (batch ids are issued contiguously from 0).
        val seenBatches = scala.collection.mutable.Set.empty[Long]
        def drainDrops(): Unit = query.recentProgress.foreach { p =>
          if (seenBatches.add(p.batchId)) {
            droppedLate += p.stateOperators.map(_.numRowsDroppedByWatermark).sum
            val total = p.stateOperators.map(_.numRowsTotal).sum
            statePeak = math.max(statePeak, total)
            if (p.batchId > lastBatch) { lastBatch = p.batchId; stateFinal = total }
          }
        }
        val vChunks = views.grouped(chunk).toSeq
        val cChunks = clicks.grouped(chunk).toSeq
        val rounds = math.max(vChunks.length, cChunks.length)
        (0 until rounds).foreach { i =>
          if (i < vChunks.length) vStream.addData(vChunks(i))
          if (i < cChunks.length) cStream.addData(cChunks(i))
          // outer modes: the flush sentinels ride the LAST chunk's trigger
          // round instead of paying one more full round (each round costs
          // a state-commit pass over both join sides — the st12 lesson,
          // NOTES r13); output is identical, every real row still
          // finalizes exactly once on the final watermark advance
          if (i < rounds - 1 || joinType == "inner") {
            query.processAllAvailable(); drainDrops()
          }
        }
        if (joinType != "inner") {
          // OUTER results only finalize once the watermark proves no
          // future match can arrive: a far-future sentinel on BOTH
          // streams pushes the global (min) watermark past every real
          // join window. The sentinels use a key no real row carries and
          // are filtered from the result by their negative ids.
          val farUs = (views.map(_.tsUs) ++ clicks.map(_.refTsUs)).max +
            windowUs + 365L * 86400L * 1000000L
          vStream.addData(Seq(ViewEvent(-1L, -1L, farUs)))
          cStream.addData(Seq(ClickEvent(-1L, -2L, farUs)))
          query.processAllAvailable()
        }
        drainDrops()
        // no-eviction proof: every batch id from 0 to max must have been
        // drained — a gap means the ring buffer dropped an entry we never
        // read, and the count would be silently low
        if (seenBatches.nonEmpty) {
          val maxB = seenBatches.max
          require((0L to maxB).forall(seenBatches.contains),
            s"progress ring buffer evicted a batch before it was drained " +
              s"(saw ${seenBatches.size} of ${maxB + 1}); droppedLate undercounts")
        }
      } finally query.stop()
      // null-SAFE sentinel filter: a FULL outer join emits unmatched clicks
      // with NULL event_id, which a bare `=!= -1` would (null-)drop — each
      // side's sentinel is excluded by ITS OWN id column instead
      spark.table(name)
        .filter(!(col("event_id") <=> -1L) && !(col("ref_id") <=> -1L))
    }
    (result, JoinReplayStats(droppedLate, statePeak, stateFinal, lastBatch + 1))
  }
}
