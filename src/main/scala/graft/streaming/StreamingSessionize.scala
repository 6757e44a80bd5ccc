package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming sessionization — the streaming face of
  * [[graft.operators.Sessionize]]: per-key custom state via
  * `flatMapGroupsWithState` holding exactly ONE open session per key, with
  * sessions emitted in append mode the moment a gap closes them. Semantics
  * are bit-identical to the batch operator (strict `gap >` threshold,
  * ties broken on event id, 0-based per-key numbering), so a replay must
  * hash-match the batch oracle over the same events — the st8 pattern
  * (streaming state vs batch SQL) applied to session windows.
  *
  * Scale shape: state is one small case class per ACTIVE key — bounded by
  * concurrent users, not history; each micro-batch sorts only its own
  * per-key slice (bounded by batch size). A production deployment closes
  * idle sessions with an event-time timeout at the watermark; the bounded
  * replay closes them deterministically with per-key sentinel events
  * instead (`Long.MaxValue` timestamps), which keeps the replay
  * watermark-free and the emission total.
  */
object StreamingSessionize {

  final case class SessEvent(eventId: Long, userId: Long, tsUs: Long)

  /** The one-open-session-per-key state. */
  final case class OpenSession(
      sessionIdx: Long, startUs: Long, lastUs: Long,
      n: Long, minId: Long, maxId: Long)

  final case class SessionRow(
      user_id: Long, session_idx: Long,
      session_start_us: Long, session_end_us: Long,
      n_events: Long, min_event_id: Long, max_event_id: Long,
      duration_us: Long)

  /** Sentinel event id: closes the key's open session without opening a
    * new one (the bounded-replay stand-in for an event-time timeout). */
  val FlushId: Long = Long.MinValue

  private def step(gapUs: Long)(
      userId: Long,
      events: Iterator[SessEvent],
      state: GroupState[OpenSession]): Iterator[SessionRow] = {
    // within a micro-batch the iterator order is arbitrary — impose the
    // batch operator's (ts, id) total order on this key's slice
    val sorted = events.toSeq.sortBy(e => (e.tsUs, e.eventId))
    val out = Seq.newBuilder[SessionRow]
    var open = state.getOption
    def close(s: OpenSession): Unit =
      out += SessionRow(userId, s.sessionIdx, s.startUs, s.lastUs,
        s.n, s.minId, s.maxId, s.lastUs - s.startUs)
    sorted.foreach { e =>
      open match {
        case None =>
          if (e.eventId != FlushId)
            open = Some(OpenSession(0L, e.tsUs, e.tsUs, 1L, e.eventId, e.eventId))
        case Some(s) =>
          if (e.eventId == FlushId) { close(s); open = None }
          else if (e.tsUs - s.lastUs > gapUs) {
            close(s)
            open = Some(OpenSession(s.sessionIdx + 1, e.tsUs, e.tsUs, 1L, e.eventId, e.eventId))
          } else {
            open = Some(s.copy(lastUs = math.max(s.lastUs, e.tsUs), n = s.n + 1,
              minId = math.min(s.minId, e.eventId), maxId = math.max(s.maxId, e.eventId)))
          }
      }
    }
    open match {
      case Some(s) => state.update(s)
      case None => state.remove()
    }
    out.result().iterator
  }

  /** Session stream over a (possibly unbounded) typed event source. */
  def sessionStream(events: Dataset[SessEvent], gapSeconds: Long): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        step(gapSeconds * 1000000L))
  }

  private val seq = new AtomicInteger(0)

  /** Bounded replay harness: feed `events` in `chunk`-sized micro-batches
    * (callers pass them in (ts, id) order so cross-batch order holds per
    * key), then one sentinel batch closing every key's open session. */
  def replay(
      spark: SparkSession,
      events: Seq[SessEvent],
      chunk: Int,
      gapSeconds: Long): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[SessEvent]
    val name = s"graft_stream_sessions_${seq.incrementAndGet()}"
    // bounded replay environment: 1 state partition + tmpfs checkpoints
    // (ReplayEnv scaladoc; NOTES r13 stage attribution)
    ReplayEnv.withReplayEnv(spark) {
      val query = sessionStream(stream.toDS(), gapSeconds)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(10L))
        .start()
      try {
        events.grouped(chunk).foreach { g => stream.addData(g); query.processAllAvailable() }
        val flush = events.map(_.userId).distinct
          .map(u => SessEvent(FlushId, u, Long.MaxValue))
        stream.addData(flush)
        query.processAllAvailable()
      } finally query.stop()
    }
    spark.table(name)
  }
}
