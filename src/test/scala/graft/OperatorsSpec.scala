package graft

import org.apache.spark.sql.functions._

import graft.operators.{Merge, Pipeline, Scd2}
import graft.schema.ReferenceSchemas
import graft.schema.ReferenceSchemas.MaxUid

/** SCD-2, merge, and pipeline operator semantics against the reference's
  * contracts (mod.rs:583-767, pg.rs:143-398, convert.rs:45-72). */
class OperatorsSpec extends SparkSpec {

  import spark.implicits._

  test("Scd2.linkBatch: chain is uid-monotonic and ends at MAX_UID (pg.rs:31)") {
    val batch = Seq(
      ("a", 1L), ("a", 5L), ("a", 9L),
      ("b", 2L),
      ("c", 3L), ("c", 4L)).toDF("asset_id", "uid")
    val linked = Scd2.linkBatch(batch).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(linked.toSet == Set(
      ("a", 1L, 5L), ("a", 5L, 9L), ("a", 9L, MaxUid),
      ("b", 2L, MaxUid),
      ("c", 3L, 4L), ("c", 4L, MaxUid)))
  }

  test("Scd2.applyBatch closes open rows at the batch's first uid (pg.rs:229-242)") {
    val dim = Seq(("a", 1L, MaxUid, 10L), ("b", 2L, MaxUid, 10L)).toDF("asset_id", "uid", "superseded_by", "block_uid")
    val batch = Seq(("a", 7L, 20L), ("a", 9L, 20L)).toDF("asset_id", "uid", "block_uid")
    val out = Scd2.applyBatch(dim, batch).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      ("a", 1L, 7L), // closed at batch's first uid
      ("b", 2L, MaxUid), // untouched
      ("a", 7L, 9L), ("a", 9L, MaxUid)))
  }

  test("Scd2.rollback re-opens rows whose successor was dropped (pg.rs:244-256)") {
    val dim = Seq(
      ("a", 1L, 5L, 10L), ("a", 5L, 9L, 20L), ("a", 9L, MaxUid, 30L),
      ("b", 2L, MaxUid, 10L)).toDF("asset_id", "uid", "superseded_by", "block_uid")
    val rolled = Scd2.rollback(dim, blockUidCut = 20L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rolled == Set(
      ("a", 1L, 5L),
      ("a", 5L, MaxUid), // successor (uid 9, block 30) was rolled back
      ("b", 2L, MaxUid)))
  }

  test("Scd2 rollback∘applyBatch = identity") {
    val dim = Seq(("a", 1L, MaxUid, 10L), ("b", 2L, MaxUid, 10L)).toDF("asset_id", "uid", "superseded_by", "block_uid")
    val batch = Seq(("a", 7L, 20L), ("c", 8L, 20L)).toDF("asset_id", "uid", "block_uid")
    val applied = Scd2.applyBatch(dim, batch)
    val back = Scd2.rollback(applied, blockUidCut = 10L)
    assert(back.exceptAll(dim).count() == 0 && dim.exceptAll(back).count() == 0)
  }

  test("Merge.upsert replaces on key, appends otherwise (S5)") {
    val base = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val updates = Seq((2L, "Y"), (3L, "z")).toDF("k", "v")
    val out = Merge.upsert(base, updates, Seq("k")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "x"), (2L, "Y"), (3L, "z")))
  }

  test("Merge.insertIgnore drops conflicting keys and in-batch dups (S6)") {
    val base = Seq((1L, "x")).toDF("k", "v")
    val updates = Seq((1L, "CLOBBER"), (2L, "a"), (2L, "b")).toDF("k", "v")
    val out = Merge.insertIgnore(base, updates, Seq("k")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.contains((1L, "x")) && out.exists(_._1 == 2L) && out.size == 2)
  }

  test("Merge.bulkKeyedUpdate rewrites only matched keys (S10)") {
    val base = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    val updates = Seq((2L, "new")).toDF("k", "v")
    val out = Merge.bulkKeyedUpdate(base, updates, "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "old"), (2L, "new")))
  }

  test("uid assignment resets per height and reproduces collision contract (convert.rs:45-72)") {
    val txs = Seq((100, "a"), (100, "b"), (100, "c"), (101, "d"), (101, "e"))
      .toDF("height", "id")
    val out = Pipeline.assignTxUids(txs, Seq(col("id"))).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out("a") == 100L * 100000)
    assert(out("b") == 100L * 100000 + 1)
    assert(out("c") == 100L * 100000 + 2)
    assert(out("d") == 101L * 100000) // idx reset at new height
    assert(out("e") == 101L * 100000 + 1)
  }

  test("squash re-points facts and renames the key block (mod.rs:769-792)") {
    val blocks = Seq(
      (1L, "b1", 10, Some("2024-01-01 00:00:00")),
      (2L, "m1", 10, None),
      (3L, "m2", 10, None),
      (4L, "b2", 11, Some("2024-01-01 00:01:00")))
      .toDF("uid", "id", "height", "ts")
      .select(col("uid"), col("id"), col("height"), to_timestamp(col("ts")).as("time_stamp"))
    val (squashed, remap) = Pipeline.squashMicroblocks(blocks, "b2")
    val rows = squashed.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "b1"), (4L, "m2"))) // micros deleted, b2 renamed to last micro id
    val facts = Seq((100L, 2L), (101L, 3L), (102L, 1L)).toDF("fact_id", "block_uid")
    val repointed = Pipeline.repointBlockUids(facts, remap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(repointed == Set((100L, 4L), (101L, 4L), (102L, 1L)))
  }

  test("rollbackFacts drops rows past the cut across every table (mod.rs:794-863)") {
    val t1 = Seq((1L, 10L), (2L, 20L)).toDF("id", "block_uid")
    val t2 = Seq((3L, 15L), (4L, 25L)).toDF("id", "block_uid")
    val rolled = Pipeline.rollbackFacts(Map("t1" -> t1, "t2" -> t2), 15L)
    assert(rolled("t1").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(rolled("t2").collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("groupedRowNumber equals per-group window row_number, in one shared pass") {
    import graft.operators.Pipeline
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000)
      .map(i => (i.toLong, if (rnd.nextBoolean()) "error" else "signup"))
      .toDF("event_id", "event_type")
      .repartition(9) // scrambled input
    val got = Pipeline.groupedRowNumber(rows, Seq("event_type"), col("event_id"))
      .select(col("event_type"), col("event_id"), col("__group_rn"))
      .as[(String, Long, Long)].collect()
    // reference: rank within type by event_id
    val ref = { val r = new scala.util.Random(11)
      (1 to 4000).map(i => (i.toLong, if (r.nextBoolean()) "error" else "signup")) }
      .groupBy(_._2).flatMap { case (t, xs) =>
        xs.map(_._1).sorted.zipWithIndex.map { case (id, i) => (t, id) -> (i + 1L) } }
    got.foreach { case (t, id, rn) =>
      assert(ref((t, id)) == rn, s"rank diverged at ($t, $id)")
    }
    // the plan never funnels through one partition
    val plan = Pipeline.groupedRowNumber(rows, Seq("event_type"), col("event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"), plan)
  }

  test("runningTotal equals the global-window prefix sum, without the single partition") {
    import graft.operators.Pipeline
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(i => (i.toLong, rnd.nextInt(100).toLong)).toDF("k", "v")
      .repartition(13) // scrambled input
    val got = Pipeline.runningTotal(rows, Seq(col("k")), col("v"))
      .select(col("k"), col("__running_total")).as[(Long, Long)].collect().toMap
    // local reference prefix sum
    val vals = { val r = new scala.util.Random(7); (1 to 5000).map(i => i.toLong -> r.nextInt(100).toLong).toMap }
    var acc = 0L
    (1 to 5000).foreach { i =>
      acc += vals(i.toLong)
      assert(got(i.toLong) == acc, s"prefix sum diverged at k=$i")
    }
    // descending order direction works too
    val desc = Pipeline.runningTotal(rows, Seq(col("k").desc), col("v"))
      .select(col("k"), col("__running_total")).as[(Long, Long)].collect().toMap
    var acc2 = 0L
    (5000 to 1 by -1).foreach { i =>
      acc2 += vals(i.toLong)
      assert(desc(i.toLong) == acc2, s"desc prefix sum diverged at k=$i")
    }
    // the plan never funnels through one partition
    val plan = Pipeline.runningTotal(rows, Seq(col("k")), col("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"), plan)
  }

  test("schema registry covers all 33 reference tables with txs common prefix") {
    assert(ReferenceSchemas.tables.size == 33)
    val prefix = ReferenceSchemas.txsCommon.map(_.name)
    (1 to 18).foreach { i =>
      val t = ReferenceSchemas.tables(s"txs_$i")
      assert(t.fieldNames.take(13).sameElements(prefix), s"txs_$i lost the common prefix")
    }
    assert(ReferenceSchemas.candles.fieldNames.length == 14)
    assert(ReferenceSchemas.tables("asset_updates").fieldNames.contains("superseded_by"))
  }

  test("sessionize: strict gap threshold, per-user numbering, exact micro bounds") {
    import graft.operators.Sessionize
    val base = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // µs grid on ms boundary
    val events = Seq(
      // user 1: gap of EXACTLY 1800s stays one session (strict >), then
      // 1800.000001s opens a new one
      (1L, 1L, ts(base)),
      (2L, 1L, ts(base + 1800L * 1000000)),
      (3L, 1L, ts(base + 1800L * 1000000 + 1801L * 1000000)),
      // user 2: single event = single session
      (4L, 2L, ts(base)),
      // user 1 again, out of input order: lands in session 0 (ts order)
      (5L, 1L, ts(base + 1000000))
    ).toDF("event_id", "user_id", "ts")
    val out = Sessionize.summarize(events, gapSeconds = 1800L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "min_event_id", "max_event_id", "duration_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 3L, 1L, 5L, 1800L * 1000000), // events 1,5,2 — gap == 1800s kept
      (1L, 1L, 1L, 3L, 3L, 0L),
      (2L, 0L, 1L, 4L, 4L, 0L)))
    // ts ties break on event_id: two events at the same instant, huge gap after
    val tied = Seq(
      (10L, 7L, ts(base)), (11L, 7L, ts(base)),
      (12L, 7L, ts(base + 7200L * 1000000))).toDF("event_id", "user_id", "ts")
    val assigned = Sessionize.assign(tied, 1800L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(assigned == Map(10L -> 0L, 11L -> 0L, 12L -> 1L))
  }

  test("asofBackward: inclusive equal-ts match, duplicate-ts tiebreak, null before first ref") {
    import graft.operators.AsofJoin
    val probe = Seq(
      (1L, "k1", 100L), // before any ref → NULL
      (2L, "k1", 200L), // ts == ref ts → inclusive match
      (3L, "k1", 250L), // between refs → earlier ref
      (4L, "k1", 300L), // duplicate ref ts at 300 → max payload wins
      (5L, "k2", 500L)  // other key: isolated, no bleed from k1
    ).toDF("event_id", "k", "us")
    val ref = Seq(
      ("k1", 200L, 20L), ("k1", 300L, 31L), ("k1", 300L, 30L), ("k2", 400L, 40L)
    ).toDF("k", "us", "ref_id")
    val out = AsofJoin.backward(probe, ref, Seq("k"), "us", Seq("ref_id"))
      .select("event_id", "ref_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some(20L), 3L -> Some(20L),
      4L -> Some(31L), 5L -> Some(40L)))
    // payload collision with a probe column is rejected loudly
    assert(intercept[IllegalArgumentException](
      AsofJoin.backward(probe, ref.withColumnRenamed("ref_id", "event_id"),
        Seq("k"), "us", Seq("event_id"))).getMessage.contains("collide"))
  }

  test("asofForward/Nearest: inclusive forward, min-payload dup ties, nearest distance + tie to backward") {
    import graft.operators.AsofJoin
    val probe = Seq(
      (1L, "k1", 100L), // fwd: first ref after → 20; nearest: only fwd side
      (2L, "k1", 200L), // == ref ts → inclusive fwd match; nearest dist 0 → backward
      (3L, "k1", 260L), // bwd 200 (d=60), fwd 300 (d=40) → nearest = fwd
      (4L, "k1", 250L), // equidistant (200/300) → nearest ties to backward
      (5L, "k1", 400L), // after last ref → fwd NULL; nearest = bwd
      (6L, "k1", 290L), // fwd hits the duplicate ts 300 → MIN payload (30)
      (7L, "k1", 330L)  // bwd hits the duplicate ts 300 WITHIN tolerance → MAX payload (31)
    ).toDF("event_id", "k", "us")
    val ref = Seq(
      ("k1", 200L, 20L), ("k1", 300L, 31L), ("k1", 300L, 30L)
    ).toDF("k", "us", "ref_id")
    val fwd = AsofJoin.forward(probe, ref, Seq("k"), "us", Seq("ref_id"))
      .select("event_id", "ref_id").as[(Long, Option[Long])].collect().toMap
    assert(fwd == Map(1L -> Some(20L), 2L -> Some(20L), 3L -> Some(30L),
      4L -> Some(30L), 5L -> None, 6L -> Some(30L), 7L -> None))
    // tolerance: gap == tolerance is inclusive; beyond it both payload and
    // asof_ts null out together; no-ref keys stay null
    val tol = AsofJoin.backwardWithin(probe, ref, Seq("k"), "us", Seq("ref_id"), tolerance = 60L)
      .select("event_id", "ref_id", "asof_ts")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(tol(1L) == ((None, None)))            // before any ref
    assert(tol(2L) == ((Some(20L), Some(200L)))) // gap 0
    assert(tol(3L) == ((Some(20L), Some(200L)))) // gap 60 == tolerance: inclusive
    assert(tol(4L) == ((Some(20L), Some(200L)))) // gap 50 < tolerance
    assert(tol(5L) == ((None, None)))            // gap 100 > tolerance: stale
    assert(tol(6L) == ((None, None)))            // bwd match is 200 (gap 90): stale
    assert(tol(7L) == ((Some(31L), Some(300L)))) // dup-ts ref in tolerance → MAX payload
    val near = AsofJoin.nearest(probe, ref, Seq("k"), "us", Seq("ref_id"))
      .select("event_id", "ref_id", "asof_ts")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(near == Map(
      1L -> ((Some(20L), Some(200L))),
      2L -> ((Some(20L), Some(200L))),  // distance 0 via backward
      3L -> ((Some(30L), Some(300L))),  // fwd closer (40 < 60); dup ts → min payload
      4L -> ((Some(20L), Some(200L))),  // equidistant → backward
      5L -> ((Some(31L), Some(300L))),  // no fwd → bwd (dup ts → MAX payload)
      6L -> ((Some(30L), Some(300L))),
      7L -> ((Some(31L), Some(300L))))) // no fwd → bwd dup ts → MAX payload
  }

  test("interval containment join: inclusive bounds, multi-cell spans, overlap fan-out") {
    import graft.operators.IntervalJoin
    val pts = Seq(
      (1L, "k", 10L),  // == lo of i1: inclusive
      (2L, "k", 35L),  // inside i1, spans cells with width 10
      (3L, "k", 40L),  // == hi of i1 AND == lo of i2: matches BOTH
      (4L, "k", 99L),  // outside all
      (5L, "z", 15L)   // right key range, wrong key
    ).toDF("event_id", "k", "us")
    val iv = Seq(
      ("k", 10L, 40L, "i1"), ("k", 40L, 60L, "i2")
    ).toDF("k", "lo", "hi", "name")
    val out = IntervalJoin.containmentJoin(pts, iv, Seq("k"), "us", "lo", "hi", cellWidth = 10L)
      .select("event_id", "name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "i1"), (2L, "i1"), (3L, "i1"), (3L, "i2")))
    // floor cells on negative timestamps: interval [-25, -5] catches -10
    val neg = IntervalJoin.containmentJoin(
      Seq((9L, "k", -10L)).toDF("event_id", "k", "us"),
      Seq(("k", -25L, -5L, "n1")).toDF("k", "lo", "hi", "name"),
      Seq("k"), "us", "lo", "hi", cellWidth = 10L)
    assert(neg.select("name").as[String].collect().toSeq == Seq("n1"))
  }

  test("funnel: strictly-after chaining, stalled chains, window boundary inclusive") {
    import graft.operators.Funnel
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val events = Seq(
      // u1: full chain, conversion exactly AT the window bound (inclusive)
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(100)),
      // u2: purchase BEFORE the click → chain stalls at step 2
      (2L, "view", ts(0)), (2L, "purchase", ts(5)), (2L, "click", ts(10)),
      // u3: click at the SAME instant as view → not strictly after, stalls
      (3L, "view", ts(0)), (3L, "click", ts(0)),
      // u4: full chain but too slow for the window
      (4L, "view", ts(0)), (4L, "click", ts(10)), (4L, "purchase", ts(500)),
      // u5: never does step 1 → absent from output
      (5L, "click", ts(0)), (5L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(events, Seq("view", "click", "purchase"), windowSeconds = 100L)
      .select("user_id", "steps_completed", "converted")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out == Map(
      1L -> ((3L, true)), 2L -> ((2L, false)),
      3L -> ((1L, false)), 4L -> ((3L, false))))
    // u2's click at ts(10) is after its view: step 2 fires, step 3 has no
    // purchase after the click, so t3 is NULL
    val u2 = Funnel.funnel(events, Seq("view", "click", "purchase"), 100L)
      .filter(col("user_id") === 2L).select("t2_us", "t3_us")
      .as[(Option[Long], Option[Long])].collect()(0)
    assert(u2._1.nonEmpty && u2._2.isEmpty)
  }

  test("retention: cohort by first-seen day, distinct users per offset cell") {
    import graft.operators.Funnel
    def ts(day: Long, sec: Long = 0L) =
      new java.sql.Timestamp((day * 86400L + sec) * 1000)
    val events = Seq(
      (1L, ts(0)), (1L, ts(0, 60)), // two events same day: counted once
      (1L, ts(2)),
      (2L, ts(0)), (2L, ts(1)),
      (3L, ts(1))                   // later cohort
    ).toDF("user_id", "ts")
    val out = Funnel.retention(events)
      .select("cohort_day", "day_offset", "n_users")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 0L, 2L), // u1, u2 on their first day
      (0L, 1L, 1L), // u2 back next day
      (0L, 2L, 1L), // u1 back on day 2
      (1L, 0L, 1L)  // u3's cohort
    ))
  }
}
