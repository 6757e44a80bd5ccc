package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamStreamJoin
import graft.streaming.StreamStreamJoin.{ClickEvent, ViewEvent}

/** Randomized stream-stream-join invariant: the bounded watermarked replay
  * must equal the plain batch range-join on ANY event-time-ordered input —
  * not just the fixture slice the st15 gate pins. Generated sets
  * deliberately include duplicate timestamps across and within sides,
  * view/click ties at the exact window edge (`click_us == view_us` and
  * `click_us == view_us - window`, both inclusive), a hot user, users with
  * clicks but no views (and vice versa), and chunk sizes that split the
  * stream mid-window — the replay seams where watermark bookkeeping could
  * diverge from batch semantics. Seeded generators — failures reproduce.
  * The state accounting must also hold everywhere: zero watermark drops on
  * ordered input, final resident rows never above the replay's peak. */
class StreamJoinPropertySpec extends SparkSpec {

  import spark.implicits._

  private val WindowUs = 1800L * 1000000L // the st15 attribution window

  private def gen(seed: Long, nv: Int, nc: Int): (Seq[ViewEvent], Seq[ClickEvent]) = {
    val rnd = new scala.util.Random(seed)
    val t0 = 1704100000L * 1000000L
    def user(): Long = rnd.nextInt(10) match {
      case n if n <= 4 => 7L // hot user: most pair volume
      case n if n <= 7 => n.toLong // users on both sides
      case 8 => 100L // click-only user (views never draw this id)
      case _ => 200L // view-only user
    }
    // coarse ts grid → duplicate timestamps; occasional exact window-edge
    // offsets exercise both inclusive bounds of the BETWEEN
    def ts(): Long = t0 + rnd.nextInt(50) * (WindowUs / 4)
    val views = (0 until nv).map { i =>
      val u = user(); ViewEvent(i.toLong, if (u == 100L) 101L else u, ts())
    }.sortBy(v => (v.tsUs, v.event_id))
    val clicks = (0 until nc).map { i =>
      val u = user(); ClickEvent(1000L + i, if (u == 200L) 201L else u, ts())
    }.sortBy(c => (c.refTsUs, c.ref_id))
    (views, clicks)
  }

  private def batchJoin(views: Seq[ViewEvent], clicks: Seq[ClickEvent]): Set[(Long, Long)] =
    (for {
      v <- views; c <- clicks
      if v.user_id == c.ref_user_id &&
        c.refTsUs >= v.tsUs - WindowUs && c.refTsUs <= v.tsUs
    } yield (v.event_id, c.ref_id)).toSet

  test("replay equals the batch range-join on random ordered inputs (5 seeds x varied chunks)") {
    for (seed <- 1L to 5L) {
      val (views, clicks) = gen(seed, nv = 60, nc = 60)
      // chunk from tiny (watermark advances nearly per event) to one-shot
      val chunk = Seq(3, 17, 200)(seed.toInt % 3)
      val (joined, stats) = StreamStreamJoin.replayMeasured(
        spark, views, clicks, WindowUs, chunk)
      val got = joined.select("event_id", "ref_id").as[(Long, Long)].collect().toSet
      val want = batchJoin(views, clicks)
      assert(got == want,
        s"seed=$seed chunk=$chunk: stream=${got.size} rows, batch=${want.size}; " +
          s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(stats.droppedLate == 0L, s"seed=$seed: ordered replay must drop nothing")
      assert(stats.stateRowsFinal <= stats.stateRowsPeak, s"seed=$seed: final>peak")
    }
  }

  test("outer replays equal the batch outer joins on random inputs (sentinel finalization)") {
    // the outer modes add the subtle path: unmatched rows may only emit
    // once the watermark proves no future partner can arrive, and the
    // replay finalizes the tail with far-future sentinels riding the last
    // trigger — exactly where a tie or an off-by-one watermark would emit
    // a row twice, never, or with a phantom match
    for (seed <- 10L to 12L; joinType <- Seq("leftOuter", "fullOuter")) {
      val (views, clicks) = gen(seed, nv = 40, nc = 40)
      val chunk = Seq(5, 23)(seed.toInt % 2)
      val (joined, stats) = StreamStreamJoin.replayMeasured(
        spark, views, clicks, WindowUs, chunk, joinType)
      val got = joined.select("event_id", "ref_id").collect()
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
          Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq
      val matches = batchJoin(views, clicks)
      val matchedV = matches.map(_._1)
      val matchedC = matches.map(_._2)
      val want0: Seq[(Option[Long], Option[Long])] =
        matches.toSeq.map { case (v, c) => (Some(v), Some(c)) } ++
          views.collect { case v if !matchedV(v.event_id) => (Some(v.event_id), None) } ++
          (if (joinType == "fullOuter")
            clicks.collect { case c if !matchedC(c.ref_id) => (None, Some(c.ref_id)) }
          else Nil)
      // compare as multisets: an unmatched row emitted twice must fail
      // even though the set of pairs would look identical
      val gotM = got.groupBy(identity).view.mapValues(_.size).toMap
      val wantM = want0.groupBy(identity).view.mapValues(_.size).toMap
      assert(gotM == wantM,
        s"seed=$seed $joinType chunk=$chunk: " +
          s"missing=${(wantM.keySet -- gotM.keySet).take(5)} " +
          s"extra=${(gotM.keySet -- wantM.keySet).take(5)} " +
          s"dupes=${gotM.collect { case (k, n) if n > wantM.getOrElse(k, 0) => (k, n) }.take(5)}")
      assert(stats.droppedLate == 0L, s"seed=$seed $joinType: ordered replay dropped rows")
    }
  }
}
