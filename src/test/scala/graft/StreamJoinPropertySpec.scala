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
}
