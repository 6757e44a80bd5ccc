package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming backward as-of enrichment — the streaming face of
  * [[graft.operators.AsofJoin.backward]]: probes and reference updates
  * arrive on ONE keyed stream, and each probe is emitted immediately,
  * enriched with the latest reference at-or-before its timestamp (the
  * trades-enriched-with-latest-asset-version shape — a real pipeline runs
  * the same enrichment its batch backfill runs, and the two must agree).
  *
  * Semantics are bit-identical to the batch operator's total order
  * (`ORDER BY ts, side, payload`): a reference at the probe's exact
  * timestamp IS visible (inclusive backward), duplicate-ts references
  * resolve to the MAX payload, keys with no earlier reference emit NULL.
  * A replay therefore hash-matches the batch o41 oracle over the same
  * slice — the st13 pattern (streaming state vs batch SQL) applied to
  * as-of enrichment.
  *
  * Scale shape: state is ONE (ts, payload) pair per ACTIVE key — bounded
  * by live keys, not by history (the batch operator's carry-forward
  * window collapsed to its running value); each micro-batch sorts only
  * its own per-key slice. The bounded replay feeds events in global
  * (ts, side) order (the st13 convention); a production deployment with
  * out-of-order arrival buffers inside the watermark and applies the same
  * per-key sort at emission time.
  */
object StreamingAsof {

  /** One element of the merged stream: side 0 = reference update
    * (`refId` meaningful), side 1 = probe (`eventId` meaningful) — the
    * batch union-merge's tagged row as a stream element. */
  final case class AsofEvent(eventId: Long, userId: Long, tsUs: Long, side: Int, refId: Long)

  /** Per-key state: the latest reference seen (ts + payload). */
  final case class LastRef(tsUs: Long, refId: Long)

  final case class EnrichedRow(event_id: Long, user_id: Long, us: Long, ref_id: Option[Long])

  private def step(
      userId: Long,
      events: Iterator[AsofEvent],
      state: GroupState[LastRef]): Iterator[EnrichedRow] = {
    // impose the batch operator's (ts, side, payload) total order on this
    // key's micro-batch slice: refs before probes at equal ts (inclusive
    // backward), payload-ascending so the last dup-ts ref wins (MAX rule)
    val sorted = events.toSeq.sortBy(e => (e.tsUs, e.side, e.refId))
    val out = Seq.newBuilder[EnrichedRow]
    var last = state.getOption
    sorted.foreach { e =>
      if (e.side == 0) {
        // events arrive in global order across batches, but stay defensive:
        // only advance (equal ts advances too — the MAX-payload rule)
        if (last.forall(l => e.tsUs > l.tsUs || (e.tsUs == l.tsUs && e.refId >= l.refId)))
          last = Some(LastRef(e.tsUs, e.refId))
      } else {
        out += EnrichedRow(e.eventId, userId, e.tsUs, last.map(_.refId))
      }
    }
    last match {
      case Some(l) => state.update(l)
      case None => state.remove()
    }
    out.result().iterator
  }

  /** Enriched probe stream over a (possibly unbounded) merged source. */
  def asofStream(events: Dataset[AsofEvent]): Dataset[EnrichedRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  private val seq = new AtomicInteger(0)

  /** Bounded replay harness: feed the merged (ts, side, payload)-sorted
    * events in `chunk`-sized micro-batches; probes emit as they arrive, so
    * no sentinel flush is needed (state is an enrichment cursor, never a
    * pending aggregate). */
  def replay(spark: SparkSession, events: Seq[AsofEvent], chunk: Int): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[AsofEvent]
    val name = s"graft_stream_asof_${seq.incrementAndGet()}"
    // bounded replay environment: 1 state partition + tmpfs checkpoints
    // (ReplayEnv scaladoc; NOTES r13 stage attribution)
    ReplayEnv.withReplayEnv(spark) {
      val query = asofStream(stream.toDS())
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(10L))
        .start()
      try {
        events.grouped(chunk).foreach { g => stream.addData(g); query.processAllAvailable() }
      } finally query.stop()
      spark.table(name)
    }
  }
}
