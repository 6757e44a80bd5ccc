package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Randomized as-of-join invariants: every operator in the family (plain,
  * sliced at several cell widths, auto-dispatched, tolerance, nearest)
  * must equal a brute-force per-probe reference on generated data that
  * deliberately includes NULL keys, duplicate timestamps on both sides,
  * equal-ts probe/ref ties, and a hot key — the full semantic surface the
  * pinned tie-break rules cover. Seeded generators — failures reproduce. */
object AsofPropertySpec {
  final case class P(event_id: Long, k: Option[String], us: Long)
  final case class R(k: Option[String], us: Long, ref_id: Long)
}

class AsofPropertySpec extends SparkSpec {

  import spark.implicits._
  import AsofPropertySpec.{P, R}

  private def gen(seed: Long, np: Int, nr: Int): (Seq[P], Seq[R]) = {
    val rnd = new scala.util.Random(seed)
    def key(): Option[String] = rnd.nextInt(10) match {
      case 0 => None // NULL keys: window partitioning groups them together
      case n if n <= 6 => Some("HOT") // skewed
      case n => Some(s"k${n % 3}")
    }
    // small ts range → many duplicate timestamps and equal-ts ties
    val ps = (1 to np).map(i => P(i.toLong, key(), rnd.nextInt(3000).toLong))
    val rs = (1 to nr).map(i => R(key(), rnd.nextInt(3000).toLong, i.toLong))
    (ps, rs)
  }

  /** Brute-force reference: per probe, (backward, forward, nearest) picks
    * under the operators' documented rules — backward = max (ts, payload)
    * among refs at-or-before, forward = min (ts, payload) among
    * at-or-after, nearest = closer by |Δts| with ties to backward. */
  private def brute(ps: Seq[P], rs: Seq[R]): Map[Long, (Option[R], Option[R], Option[R])] =
    ps.map { p =>
      val mine = rs.filter(_.k == p.k)
      val b = mine.filter(_.us <= p.us).sortBy(r => (r.us, r.ref_id)).lastOption
      val f = mine.filter(_.us >= p.us).sortBy(r => (r.us, r.ref_id)).headOption
      val n = (b, f) match {
        case (Some(bb), Some(ff)) =>
          if (p.us - bb.us <= ff.us - p.us) Some(bb) else Some(ff)
        case (bb, ff) => bb.orElse(ff)
      }
      p.event_id -> ((b, f, n))
    }.toMap

  private def got(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    df.select(col("event_id"), col("ref_id"))
      .as[(Long, Option[Long])].collect().toMap

  test("plain, sliced, and auto as-of joins all equal the brute-force reference") {
    for (seed <- Seq(3L, 17L, 101L)) {
      val (ps, rs) = gen(seed, np = 250, nr = 120)
      val probe = ps.toDF()
      val ref = rs.toDF()
      val bf = brute(ps, rs)
      val expB = bf.map { case (id, (b, _, _)) => id -> b.map(_.ref_id) }
      val expF = bf.map { case (id, (_, f, _)) => id -> f.map(_.ref_id) }
      val expN = bf.map { case (id, (_, _, n)) => id -> n.map(_.ref_id) }

      assert(got(AsofJoin.backward(probe, ref, Seq("k"), "us", Seq("ref_id"))) == expB,
        s"backward diverged (seed $seed)")
      assert(got(AsofJoin.forward(probe, ref, Seq("k"), "us", Seq("ref_id"))) == expF,
        s"forward diverged (seed $seed)")
      assert(got(AsofJoin.nearest(probe, ref, Seq("k"), "us", Seq("ref_id"))) == expN,
        s"nearest diverged (seed $seed)")
      for (w <- Seq(1L, 37L, 500L, 10000L)) {
        assert(got(AsofJoin.backwardSliced(probe, ref, Seq("k"), "us", Seq("ref_id"), w)) == expB,
          s"backwardSliced diverged (seed $seed, cell $w)")
        assert(got(AsofJoin.forwardSliced(probe, ref, Seq("k"), "us", Seq("ref_id"), w)) == expF,
          s"forwardSliced diverged (seed $seed, cell $w)")
        assert(got(AsofJoin.nearestSliced(probe, ref, Seq("k"), "us", Seq("ref_id"), w)) == expN,
          s"nearestSliced diverged (seed $seed, cell $w)")
      }
      // auto dispatch on both sides of the threshold
      assert(got(AsofJoin.backwardAuto(probe, ref, Seq("k"), "us", Seq("ref_id"),
        cellWidth = 500L, hotKeyRowThreshold = 10L)) == expB)
      assert(got(AsofJoin.nearestAuto(probe, ref, Seq("k"), "us", Seq("ref_id"),
        cellWidth = 500L, hotKeyRowThreshold = 1000000L)) == expN)
    }
  }

  test("tolerance variants equal the brute-force reference at several bounds") {
    for (seed <- Seq(29L); tol <- Seq(0L, 50L, 800L)) {
      val (ps, rs) = gen(seed, np = 200, nr = 100)
      val probe = ps.toDF()
      val ref = rs.toDF()
      val bf = brute(ps, rs)
      val expT = bf.map { case (id, (b, _, _)) =>
        val p = ps.find(_.event_id == id).get
        id -> b.filter(r => p.us - r.us <= tol).map(_.ref_id)
      }
      assert(got(AsofJoin.backwardWithin(probe, ref, Seq("k"), "us", Seq("ref_id"), tol)) == expT,
        s"backwardWithin diverged (tol $tol)")
      for (w <- Seq(37L, 500L)) {
        assert(got(AsofJoin.backwardWithinSliced(
          probe, ref, Seq("k"), "us", Seq("ref_id"), tol, w)) == expT,
          s"backwardWithinSliced diverged (tol $tol, cell $w)")
      }
      assert(got(AsofJoin.backwardWithinAuto(probe, ref, Seq("k"), "us", Seq("ref_id"),
        tol, cellWidth = 500L, hotKeyRowThreshold = 10L)) == expT)
    }
  }
}
