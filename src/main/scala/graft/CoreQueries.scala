package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Merge, Pipeline}
import graft.sources.Tables

/** Reference-parity queries: sources/sinks (S2-S10), projections/predicates
  * (O1-O8), joins (J1-J5). IDs follow SURVEY.md §2 / VERDICT.md. */
object CoreQueries {

  /** Reference insert chunk sizing: `(65535 / ncols) / 10 * 10` (`pg.rs:31-32`). */
  def chunkRows(ncols: Int): Int = 65535 / ncols / 10 * 10

  /** o55's written fact-layout path, one write per (session, sf). */
  private val layoutCache = new graft.util.SessionCache[String]

  val all: Vector[QueryDef] = Vector(

    // S1 — streaming source: a real Structured-Streaming query (MemoryStream
    // → micro-batches → foreachBatch) replays events in 256-row batches
    QueryDef("s1_stream_source",
      (s, dir) => {
        import graft.streaming.StreamReplay
        val events = Tables.events(s, dir)
          .filter(col("event_id") < 1024)
          .orderBy("event_id")
          .select("event_id", "event_type")
          .collect()
          .map(r => StreamReplay.StreamedEvent(r.getLong(0), r.getString(1)))
        StreamReplay.replay(s, events.toSeq, chunk = 256).orderBy("event_id")
      },
      Some("""SELECT event_id, event_type,
             |  CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 256) AS BIGINT) AS batch_id
             |FROM events WHERE event_id < 1024 ORDER BY event_id""".stripMargin)),

    // S1b — the DSv2 MicroBatchStream source: the 256-row size-close enforced
    // in latestOffset admission control (updates.rs:89-152); every micro-batch
    // covers exactly [256k, 256(k+1)) so batch_id == uid div 256
    QueryDef("s1b_dsv2_size_close",
      (s, dir) => {
        import scala.collection.mutable.ArrayBuffer
        val stream = s.readStream
          .format(classOf[graft.sources.BlockStreamProvider].getName)
          .option("total_rows", 1024L)
          .option("max_rows_per_batch", 256L)
          .load()
        val delivered = ArrayBuffer.empty[(Long, Int, Long)]
        val query = graft.streaming.MicroBatchPipeline.withBatchClose(
          stream.writeStream.outputMode("append")
            .foreachBatch { (df: DataFrame, id: Long) =>
              delivered.synchronized {
                delivered ++= df.collect().map(r => (r.getLong(0), r.getInt(1), id))
              }
              ()
            },
          maxWaitMs = 10L).start()
        try query.processAllAvailable() finally query.stop()
        import s.implicits._
        delivered.toSeq.toDF("uid", "height", "batch_id").orderBy("uid")
      },
      Some("""SELECT r.range AS uid, CAST(r.range // 4 + 1 AS INT) AS height,
             |  r.range // 256 AS batch_id
             |FROM range(1024) r ORDER BY uid""".stripMargin)),

    // S2 — batch accumulator: batches close at 256 rows (updates.rs:117-129)
    QueryDef("s2_batch_accumulator",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"))
        Pipeline.assignBatchIds(ev, col("event_id"), 256)
          .groupBy("batch_id")
          .agg(count(lit(1)).as("n"), min("event_id").as("first_uid"), max("event_id").as("last_uid"))
          .orderBy("batch_id")
      },
      Some("""SELECT batch_id, count(*) AS n, min(event_id) AS first_uid, max(event_id) AS last_uid
             |FROM (SELECT event_id,
             |        CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 256) AS BIGINT) AS batch_id
             |      FROM events)
             |GROUP BY batch_id ORDER BY batch_id""".stripMargin)),

    // S3 — decode raw payload into typed event (updates.rs:154-263).
    // Single-parse shape: a filter on the *parsed* column would be pushed
    // below the projection and re-evaluate the JSON parse per row (the
    // CollapseProject trap, NOTES.md), so the presence filter runs on the
    // raw string — a substring predicate pushed into the parquet scan — and
    // from_json parses exactly once (PlanShapeSpec pins both properties).
    // Exact equivalence to the strict parsed-null filter holds for well-
    // formed props (no JSON-null/malformed k), checked by the oracle hash.
    QueryDef("s3_decode_typed",
      (s, dir) => Tables.events(s, dir)
        .filter(col("props").contains("\"k\":"))
        // parallelize the JSON parse over the one-row-group fixture (guide
        // §2.5); the presence filter stays pushed at the scan below this
        .transform(Tables.parallelizeKernelInput)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
            .getField("k").as("k_value"),
          col("event_type"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value, event_type
             |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
             |ORDER BY event_id""".stripMargin)),

    // S3b — protobuf wire ingestion end-to-end (updates.rs:154-263): each
    // event row becomes a one-tx BlockchainUpdated message ENCODED to real
    // protobuf wire bytes, then DECODED back through UpdatesProto into the
    // RawTx IR. Encode+decode are row-local inside one Dataset.map — on a
    // cluster this is a map-only stage over a binary column, no shuffle —
    // and the oracle recomputes every projected field from the raw table,
    // so any wire-layer corruption breaks the hash.
    QueryDef("s3b_wire_decode",
      (s, dir) => {
        import s.implicits._
        import graft.convert._
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"))
          // the fixture is one parquet row group = ONE scan task, so the
          // encode+decode kernel (~25 µs/row measured) ran single-core.
          // Round-robin the 24-byte proxy rows across the session's
          // shuffle-partition knob before the kernel (guide §2.5: huge
          // unsplittable input — repartition immediately after the read;
          // §8: shuffle the lightweight proxy, not payloads). Result is
          // orderBy(tx_id)-final, so placement cannot change the hash.
          .transform(Tables.parallelizeKernelInput)
          .as[(Long, Long, Long)]
          .map { case (eid, uid, ms) =>
            val assetId =
              if (uid % 2 == 0) Array.emptyByteArray else s"A${uid % 4}".getBytes("UTF-8")
            val tx = RawTx(id = eid.toString.getBytes("UTF-8"), txType = 4,
              senderPublicKey = s"PK$uid".getBytes("UTF-8"),
              fee = eid % 1000, timeStampMs = ms,
              txVersion = Some(2), feeAssetId = Some(Array.emptyByteArray),
              assetId = Some(assetId), amount = Some(eid % 100),
              attachment = Some(Array.emptyByteArray))
            val meta = UpdatesProto.TxMeta(
              senderAddress = s"S$uid".getBytes("UTF-8"),
              recipientAddress = Some(s"R${eid % 7}".getBytes("UTF-8")))
            val wire = UpdatesProto.encodeBlock(
              RawBlock(s"b$eid", (uid % 1000).toInt, Some(ms), None, Seq(tx)), Seq(meta))
            val (upd, _) = UpdatesProto.decode(wire)
            val b = upd.asInstanceOf[RawBlock]
            val t = b.txs.head
            (new String(t.id, "UTF-8"), b.height, t.timeStampMs, t.amount.get, t.fee,
              t.assetId.filter(_.nonEmpty).map(new String(_, "UTF-8")).getOrElse("WAVES"),
              new String(t.recipient.get, "UTF-8"))
          }
          .toDF("tx_id", "height", "ts_ms", "amount", "fee", "asset", "recipient")
          .orderBy("tx_id")
      },
      Some("""SELECT CAST(event_id AS VARCHAR) AS tx_id,
             |  CAST(user_id % 1000 AS INT) AS height,
             |  epoch_ms(ts) AS ts_ms,
             |  event_id % 100 AS amount,
             |  event_id % 1000 AS fee,
             |  CASE WHEN user_id % 2 = 0 THEN 'WAVES'
             |       ELSE 'A' || CAST(user_id % 4 AS VARCHAR) END AS asset,
             |  'R' || CAST(event_id % 7 AS VARCHAR) AS recipient
             |FROM events ORDER BY tx_id""".stripMargin)),

    // S4 — chunked bulk-insert sizing (pg.rs:31-32, 841-872); lineitem has 11 cols
    QueryDef("s4_chunked_insert",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        Pipeline.globalRowNumber(li, struct(col("l_orderkey"), col("l_linenumber")))
          .withColumn("chunk_id", floor((col("__global_rn") - 1) / chunkRows(11)))
          .groupBy("chunk_id")
          .agg(count(lit(1)).as("n"))
          .orderBy("chunk_id")
      },
      Some(s"""SELECT chunk_id, count(*) AS n
              |FROM (SELECT CAST(floor((row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1) / ${chunkRows(11)}) AS BIGINT) AS chunk_id
              |      FROM lineitem)
              |GROUP BY chunk_id ORDER BY chunk_id""".stripMargin)),

    // S5 — upsert / ON CONFLICT DO UPDATE (pg.rs:721-773)
    QueryDef("s5_upsert",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
        val base = ev.filter(col("event_id") < 500)
        val updates = ev.filter(col("event_id") >= 400 && col("event_id") < 600)
          .withColumn("value", col("value") + 1000)
        Merge.upsert(base, updates, Seq("event_id")).orderBy("event_id")
      },
      Some("""SELECT event_id, value FROM events WHERE event_id < 400
             |UNION ALL
             |SELECT event_id, value + 1000 FROM events WHERE event_id >= 400 AND event_id < 600
             |ORDER BY event_id""".stripMargin)),

    // S6 — insert-ignore / ON CONFLICT DO NOTHING (pg.rs:176-214)
    QueryDef("s6_insert_ignore",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("value"), col("event_type"))
        val base = ev.filter(col("event_id") < 500).select("event_id", "value")
        val updates = ev.filter(col("event_type") === "click")
          .select(col("event_id"), negate(col("value")).as("value"))
        Merge.insertIgnore(base, updates, Seq("event_id")).orderBy("event_id")
      },
      Some("""SELECT event_id, value FROM events WHERE event_id < 500
             |UNION ALL
             |SELECT event_id, -value AS value FROM events WHERE event_type = 'click' AND event_id >= 500
             |ORDER BY event_id""".stripMargin)),

    // S7 — DELETE ... RETURNING (select-before-delete, pg.rs:269-313)
    QueryDef("s7_delete_returning",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val (_, deleted) = Merge.deleteWhere(ev, col("user_id") === 13)
        deleted.select("event_id", "user_id", "event_type").orderBy("event_id")
      },
      Some("SELECT event_id, user_id, event_type FROM events WHERE user_id = 13 ORDER BY event_id")),

    // S8 — DELETE scan: remaining side after predicate delete (pg.rs:160-174)
    QueryDef("s8_delete_scan",
      (s, dir) => {
        val (remaining, _) = Merge.deleteWhere(Tables.events(s, dir), col("value") > 150)
        remaining.groupBy("event_type")
          .agg(count(lit(1)).as("n"), min("event_id").as("min_uid"), max("event_id").as("max_uid"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, min(event_id) AS min_uid, max(event_id) AS max_uid
             |FROM events WHERE NOT (value > 150)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // S9 — UPDATE scan (pg.rs:151-158, 216-223)
    QueryDef("s9_update_scan",
      (s, dir) => {
        val updated = Merge.updateWhere(Tables.events(s, dir),
          col("event_type") === "error", Map("value" -> lit(0.0)))
        updated.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(CASE WHEN event_type = 'error' THEN 0 ELSE value END AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // S10/J5 — bulk keyed UPDATE via UNNEST-literal join (pg.rs:229-242)
    QueryDef("s10_bulk_keyed_update",
      (s, dir) => {
        import s.implicits._
        val base = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"))
          .withColumn("segment", lit("std"))
        val updates = Seq((3L, "vip"), (7L, "pro"), (11L, "test")).toDF("user_id", "segment")
        Merge.bulkKeyedUpdate(base, updates, "user_id", "segment").orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id,
             |  coalesce(u.segment, 'std') AS segment
             |FROM events e
             |LEFT JOIN (SELECT UNNEST([3, 7, 11]) AS user_id, UNNEST(['vip', 'pro', 'test']) AS segment) u
             |  ON e.user_id = u.user_id
             |ORDER BY e.event_id""".stripMargin)),

    // O1 — column projection (pg.rs:71-77 etc.)
    QueryDef("o1_projection",
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity")),

    // O2 — equality predicate
    QueryDef("o2_eq_predicate",
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey")),

    // O3 — range predicate
    QueryDef("o3_range_predicate",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 30 && col("l_quantity") <= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity > 30 AND l_quantity <= 45 ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)),

    // O4 — NULL predicate (via left-join miss, pg.rs:128/136 semantics)
    QueryDef("o4_null_predicate",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).select(col("o_custkey")).distinct()
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .filter(col("o_custkey").isNull)
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o ON c.c_custkey = o.o_custkey
             |WHERE o.o_custkey IS NULL ORDER BY c_custkey""".stripMargin)),

    // O5 — IN-list predicate (eq_any, pg.rs:101-107)
    QueryDef("o5_in_list",
      (s, dir) => Tables.part(s, dir)
        .filter(col("p_size").isin(1, 5, 9, 13, 21))
        .select("p_partkey", "p_size", "p_brand")
        .orderBy("p_partkey"),
      Some("SELECT p_partkey, p_size, p_brand FROM part WHERE p_size IN (1, 5, 9, 13, 21) ORDER BY p_partkey")),

    // O6 — string prefix predicate (mod.rs:554-556)
    QueryDef("o6_prefix_predicate",
      (s, dir) => Tables.customer(s, dir)
        .filter(col("c_mktsegment").startsWith("BU"))
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment LIKE 'BU%' ORDER BY c_custkey")),

    // O7 — conditional rescale expression (pg.rs:708-713 shape)
    QueryDef("o7_case_rescale",
      (s, dir) => Tables.lineitem(s, dir)
        .withColumn("rescaled",
          when(col("l_quantity") > 25, col("l_extendedprice") * 100).otherwise(col("l_extendedprice")))
        .groupBy("l_returnflag")
        .agg(sum(col("rescaled").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CAST(CASE WHEN l_quantity > 25 THEN l_extendedprice * 100 ELSE l_extendedprice END AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // O8 — per-row filter_map during ingest (mod.rs:476-546)
    QueryDef("o8_filter_map",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_type") =!= "error")
        .select(col("event_id"),
          (col("value") * 2).as("doubled"),
          upper(col("event_type")).as("kind"))
        .orderBy("event_id"),
      Some("""SELECT event_id, value * 2 AS doubled, upper(event_type) AS kind
             |FROM events WHERE event_type <> 'error' ORDER BY event_id""".stripMargin)),

    // J1 — broadcast lookup join, null on miss (pg.rs:472-505)
    QueryDef("j1_broadcast_lookup",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
        li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("s_name"))
          .orderBy("l_orderkey", "l_linenumber", "l_suppkey")
      },
      // (l_orderkey, l_linenumber) is not unique in the fixture — l_suppkey
      // completes the total order (ties beyond that are identical rows)
      Some("""SELECT l_orderkey, l_linenumber, l_suppkey, s_name FROM lineitem l
             |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |ORDER BY l_orderkey, l_linenumber, l_suppkey""".stripMargin)),

    // J2 — LEFT JOIN view composition (up.sql:466-469)
    QueryDef("j2_left_join_chain",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = broadcast(Tables.nation(s, dir))
        val r = broadcast(Tables.region(s, dir))
        c.join(n, c("c_nationkey") === n("n_nationkey"), "left")
          .join(r, n("n_regionkey") === r("r_regionkey"), "left")
          .select(col("c_custkey"), col("n_name"), col("r_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, n_name, r_name FROM customer c
             |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
             |ORDER BY c_custkey""".stripMargin)),

    // J3 — strict dimension lookup (fail-on-miss checked engine-side; the
    // query shape is the broadcast inner join + aggregation, pg.rs:710-711)
    QueryDef("j3_strict_lookup",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val p = broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")))
        li.join(p, li("l_partkey") === p("p_partkey"), "inner")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // J4 — positional zip join (mod.rs:274, convert.rs:507-520)
    QueryDef("j4_zip_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // global positional rank WITHOUT a single-partition window: the
        // real operator (per-tx array zip, mod.rs:274) is row-local; this
        // whole-stream demo ranks via the distributed groupedRowNumber —
        // BOTH event types ranked in one pass (one range shuffle + one
        // stats job shared), where the per-type globalRowNumber form paid
        // the sample + cache + stats machinery twice (VERDICT r15 #3).
        // Per-type ranks are identical: rank = position by event_id within
        // the type, so the oracle is unchanged.
        val ranked = Pipeline.groupedRowNumber(
          ev.filter(col("event_type").isin("error", "signup"))
            .select(col("event_id"), col("event_type")),
          Seq("event_type"), col("event_id"))
          .select(col("__group_rn").cast("int").as("rn"),
            col("event_type"), col("event_id"))
        def side(tpe: String, out: String): DataFrame =
          ranked.filter(col("event_type") === tpe)
            .select(col("rn"), col("event_id").as(out))
        side("error", "error_id").join(side("signup", "signup_id"), Seq("rn"), "inner")
          .orderBy("rn")
      },
      Some("""SELECT e.rn, e.event_id AS error_id, s.event_id AS signup_id
             |FROM (SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn FROM events WHERE event_type = 'error') e
             |JOIN (SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn FROM events WHERE event_type = 'signup') s
             |  ON e.rn = s.rn
             |ORDER BY e.rn""".stripMargin)),

    // J5 — UNNEST-derived literal join (pg.rs:229-242 shape)
    QueryDef("j5_unnest_join",
      (s, dir) => {
        import s.implicits._
        val lookup = Seq((1, "alpha"), (3, "beta"), (5, "gamma"), (7, "delta"))
          .toDF("n_nationkey", "tag")
        Tables.nation(s, dir)
          .join(broadcast(lookup), Seq("n_nationkey"), "inner")
          .select("n_nationkey", "n_name", "tag")
          .orderBy("n_nationkey")
      },
      Some("""SELECT n.n_nationkey, n.n_name, u.tag
             |FROM nation n
             |JOIN (SELECT UNNEST([1, 3, 5, 7]) AS n_nationkey, UNNEST(['alpha', 'beta', 'gamma', 'delta']) AS tag) u
             |  ON n.n_nationkey = u.n_nationkey
             |ORDER BY n.n_nationkey""".stripMargin)),

    // O50 — left-SEMI join as a user operator (EXISTS): customers with at
    // least one order. The reference only issues equi left/inner joins
    // (SURVEY §2.3 "absent"); semi/anti are first-class here because every
    // dedup/decontamination survivor set is one. Semi never duplicates the
    // probe side and prunes the build side's payload columns entirely
    QueryDef("o50_semi_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // O51 — left-ANTI join (NOT EXISTS): customers with no orders — the
    // dedup-drop / decontamination shape (anti against the dropped set)
    QueryDef("o51_anti_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // O52 — the TPC-H Q3 shape: 3-way join (customer ⋈ orders ⋈ lineitem)
    // + grouped revenue + top-10. The canonical multi-join plan test:
    // the customer side carries NO broadcast hint — the segment filter
    // keeps ~1/5 of customers, which broadcasts by SIZE at fixture scale
    // (under autoBroadcastJoinThreshold / AQE) but is billions of rows at
    // 100 TB, where the same code correctly shuffles on c_custkey instead
    // of shipping a multi-GB build side to every task. orders⋈lineitem
    // shuffles on the order key; TakeOrdered for the limit (never a
    // global sort). Revenue summed in integer CENTS (round before sum —
    // the score_micro convention) so the BIGINT is aggregation-order-
    // independent across engines
    QueryDef("o52_multijoin_topk",
      (s, dir) => {
        // epoch-day 10378 = 1998-06-01; pure-integer day bounds keep the
        // cutoff timezone-proof in both engines
        val cutoffDay = 10378L
        val c = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = Tables.orders(s, dir)
          .withColumn("o_day", expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000L"))
          .filter(col("o_day") < cutoffDay)
          .select("o_orderkey", "o_custkey", "o_day", "o_orderpriority")
        val l = Tables.lineitem(s, dir)
          .filter(expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000L") > cutoffDay)
          .select(col("l_orderkey"),
            round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
              .cast("long").as("cents"))
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_day"), col("o_orderpriority"))
          .agg(sum(col("cents")).as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_day, o_orderpriority,
             |  CAST(sum(cents) AS BIGINT) AS revenue_cents
             |FROM (
             |  SELECT l.l_orderkey, epoch_us(o.o_orderdate) // 86400000000 AS o_day,
             |    o.o_orderpriority,
             |    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) AS BIGINT) AS cents
             |  FROM customer c
             |  JOIN orders o ON c.c_custkey = o.o_custkey
             |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |  WHERE c.c_mktsegment = 'BUILDING'
             |    AND epoch_us(o.o_orderdate) // 86400000000 < 10378
             |    AND epoch_us(l.l_shipdate) // 86400000000 > 10378)
             |GROUP BY 1, 2, 3
             |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin)),

    // O53 — ntile ranking (absent from the reference, SURVEY §2.5): per-
    // nation account-balance quartiles — the standard "bucket a metric
    // within each group" report. PARTITIONED window (a global ntile would
    // funnel through one partition — banned by the plan sweep); the order
    // key carries c_custkey so ties are deterministic
    QueryDef("o53_ntile",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
            ntile(4).over(w).as("balance_quartile"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal,
             |  CAST(ntile(4) OVER (PARTITION BY c_nationkey
             |    ORDER BY c_acctbal, c_custkey) AS INT) AS balance_quartile
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // O54 — INTERSECT / EXCEPT set operators (absent from the reference,
    // SURVEY §2.6): customers with orders in BOTH statuses vs F-only.
    // Both engines use DISTINCT set semantics
    QueryDef("o54_set_ops",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        val p = o.filter(col("o_orderstatus") === "O").select("o_custkey")
        f.intersect(p).withColumn("op", lit("both"))
          .unionByName(f.except(p).withColumn("op", lit("f_only")))
          .orderBy("op", "o_custkey")
      },
      Some("""SELECT o_custkey, 'both' AS op FROM (
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |  INTERSECT
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
             |UNION ALL
             |SELECT o_custkey, 'f_only' AS op FROM (
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |  EXCEPT
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
             |ORDER BY op, o_custkey""".stripMargin)),

    // O55 — the declared-layout read path END TO END as an oracle gate
    // (r11; PlanShapeSpec proves the PLAN prunes — this gate proves the
    // pruned read returns exactly the right ROWS): write the chain-
    // convention fact layout (height-bucket partitions, uid-sorted files)
    // and serve the reference's (sender, uid-range) pagination read
    // through TableStore.readFactUidRange, whose derived height_bucket
    // predicate prunes partitions before listing. The oracle replays the
    // same derivation + filters over the raw events table — the layout
    // round-trip must be invisible to results
    QueryDef("o55_layout_read",
      (s, dir) => {
        import graft.sinks.TableStore
        // the layout write is a shared fixture (SessionCache, the bpeCache
        // convention): one write per (session, sf), so repeated bench reps
        // measure the PRUNED READ — the path the gate exists to exercise
        val out = layoutCache.getOrCompute(s, dir) {
          val tmp = java.nio.file.Files.createTempDirectory("graft-o55").toString
          val facts = Tables.events(s, dir).select(
            (col("event_id") % 20000).cast("int").as("height"),
            ((col("event_id") % 20000) * TableStore.UidPerHeight +
              expr("event_id div 20000")).as("uid"),
            concat(lit("addr"), (col("user_id") % 50).cast("string")).as("sender"),
            col("value").as("payload"))
          TableStore.writeFact(facts, s"$tmp/txs")
          s"$tmp/txs"
        }
        TableStore.readFactUidRange(s, out,
            3000L * TableStore.UidPerHeight, 5000L * TableStore.UidPerHeight - 1)
          .filter(col("sender") === "addr7")
          .select("uid", "height", "sender", "payload")
          .orderBy("uid")
      },
      Some("""SELECT CAST((event_id % 20000) * 100000 + event_id // 20000 AS BIGINT) AS uid,
             |  CAST(event_id % 20000 AS INT) AS height,
             |  'addr' || CAST(user_id % 50 AS VARCHAR) AS sender,
             |  value AS payload
             |FROM events
             |WHERE (event_id % 20000) * 100000 + event_id // 20000
             |    BETWEEN 300000000 AND 499999999
             |  AND user_id % 50 = 7
             |ORDER BY uid""".stripMargin)),

    // O57 — the Z-ORDER layout read path end-to-end (r12, completing the
    // o55/o56 layout family): write the events facts Morton-clustered on
    // (addr_bucket, hour_bucket) — the composite (address, timestamp)
    // btree pattern (up.sql:530-719) where NEITHER column alone is
    // selective — then serve a box read through TableStore.readBox. The
    // single-dimension-sorted control can only keep min/max tight on one
    // column; the Z layout skips row groups on BOTH predicates
    // (PlanShapeSpec pins the skip ratio) and this gate proves the
    // clustered round-trip returns exactly the right rows
    QueryDef("o57_zorder_read",
      (s, dir) => {
        import graft.sinks.TableStore
        val out = layoutCache.getOrCompute(s, "z:" + dir) {
          val tmp = java.nio.file.Files.createTempDirectory("graft-o57").toString
          val facts = Tables.events(s, dir).select(
            col("event_id"),
            (col("user_id") % 64).cast("long").as("addr_bucket"),
            floor(Tables.epochSecs(col("ts")) / 3600).cast("long").as("hour_bucket"),
            col("value").as("payload"))
          // hour rebased/rescaled to a 6-bit grid so both dims contribute
          // comparably to the interleave (writeZOrdered's width contract);
          // floorDiv (not double `/` + cast) so buckets below the rebase
          // base still land on the correct grid cell (ADVICE r12)
          TableStore.writeZOrdered(facts, s"$tmp/z",
            col("addr_bucket"),
            graft.operators.TimeCells.floorDiv(col("hour_bucket") - 473352L, lit(12L)),
            files = 32)
          s"$tmp/z"
        }
        TableStore.readBox(s, out,
            "addr_bucket", 10L, 12L, "hour_bucket", 473400L, 473600L)
          .select("event_id", "addr_bucket", "hour_bucket", "payload")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, CAST(user_id % 64 AS BIGINT) AS addr_bucket,
             |  CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_bucket,
             |  value AS payload
             |FROM events
             |WHERE user_id % 64 BETWEEN 10 AND 12
             |  AND CAST(floor(epoch(ts)) AS BIGINT) // 3600 BETWEEN 473400 AND 473600
             |ORDER BY event_id""".stripMargin)),

    // O57b — the SELF-NORMALIZING Z-order write (writeZOrderedAuto, r13):
    // the caller passes RAW unbalanced dims (addr 6-bit, hour ~10-bit) and
    // the writer range-buckets both to a balanced grid internally — the
    // misuse-proof path; same box read, same oracle (layout never changes
    // results), PlanShapeSpec pins skipping parity with hand-normalized
    QueryDef("o57b_zorder_auto_read",
      (s, dir) => {
        import graft.sinks.TableStore
        val out = layoutCache.getOrCompute(s, "za:" + dir) {
          val tmp = java.nio.file.Files.createTempDirectory("graft-o57b").toString
          val facts = Tables.events(s, dir).select(
            col("event_id"),
            (col("user_id") % 64).cast("long").as("addr_bucket"),
            floor(Tables.epochSecs(col("ts")) / 3600).cast("long").as("hour_bucket"),
            col("value").as("payload"))
          TableStore.writeZOrderedAuto(facts, s"$tmp/za",
            col("addr_bucket"), col("hour_bucket"), files = 32)
          s"$tmp/za"
        }
        TableStore.readBox(s, out,
            "addr_bucket", 10L, 12L, "hour_bucket", 473400L, 473600L)
          .select("event_id", "addr_bucket", "hour_bucket", "payload")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, CAST(user_id % 64 AS BIGINT) AS addr_bucket,
             |  CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_bucket,
             |  value AS payload
             |FROM events
             |WHERE user_id % 64 BETWEEN 10 AND 12
             |  AND CAST(floor(epoch(ts)) AS BIGINT) // 3600 BETWEEN 473400 AND 473600
             |ORDER BY event_id""".stripMargin)),

    // O58 — the HILBERT-curve layout read path (r13): o57's box read
    // served from a Hilbert-clustered write (functions/Hilbert.scala —
    // continuous curve, no Z diagonal jumps, the Delta liquid-clustering /
    // Iceberg successor to Morton). Identical oracle to o57 — the curve
    // shapes only the LAYOUT, never the result — and PlanShapeSpec pins
    // that Hilbert skips at least as well as the single-sort control
    QueryDef("o58_hilbert_read",
      (s, dir) => {
        import graft.sinks.TableStore
        val out = layoutCache.getOrCompute(s, "h:" + dir) {
          val tmp = java.nio.file.Files.createTempDirectory("graft-o58").toString
          val facts = Tables.events(s, dir).select(
            col("event_id"),
            (col("user_id") % 64).cast("long").as("addr_bucket"),
            floor(Tables.epochSecs(col("ts")) / 3600).cast("long").as("hour_bucket"),
            col("value").as("payload"))
          TableStore.writeHilbertOrdered(facts, s"$tmp/h",
            col("addr_bucket"),
            graft.operators.TimeCells.floorDiv(col("hour_bucket") - 473352L, lit(12L)),
            files = 32)
          s"$tmp/h"
        }
        TableStore.readBox(s, out,
            "addr_bucket", 10L, 12L, "hour_bucket", 473400L, 473600L)
          .select("event_id", "addr_bucket", "hour_bucket", "payload")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, CAST(user_id % 64 AS BIGINT) AS addr_bucket,
             |  CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_bucket,
             |  value AS payload
             |FROM events
             |WHERE user_id % 64 BETWEEN 10 AND 12
             |  AND CAST(floor(epoch(ts)) AS BIGINT) // 3600 BETWEEN 473400 AND 473600
             |ORDER BY event_id""".stripMargin)),

    // O58b — the SELF-NORMALIZING Hilbert write (writeHilbertOrderedAuto,
    // r14 — VERDICT r13 #6): raw unbalanced dims through the shared
    // range-ID pass, Hilbert key instead of Morton; same box read, same
    // oracle (layout never changes results), PlanShapeSpec pins skipping
    // parity with the hand-normalized Hilbert layout
    QueryDef("o58b_hilbert_auto_read",
      (s, dir) => {
        import graft.sinks.TableStore
        val out = layoutCache.getOrCompute(s, "ha:" + dir) {
          val tmp = java.nio.file.Files.createTempDirectory("graft-o58b").toString
          val facts = Tables.events(s, dir).select(
            col("event_id"),
            (col("user_id") % 64).cast("long").as("addr_bucket"),
            floor(Tables.epochSecs(col("ts")) / 3600).cast("long").as("hour_bucket"),
            col("value").as("payload"))
          TableStore.writeHilbertOrderedAuto(facts, s"$tmp/ha",
            col("addr_bucket"), col("hour_bucket"), files = 32)
          s"$tmp/ha"
        }
        TableStore.readBox(s, out,
            "addr_bucket", 10L, 12L, "hour_bucket", 473400L, 473600L)
          .select("event_id", "addr_bucket", "hour_bucket", "payload")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, CAST(user_id % 64 AS BIGINT) AS addr_bucket,
             |  CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_bucket,
             |  value AS payload
             |FROM events
             |WHERE user_id % 64 BETWEEN 10 AND 12
             |  AND CAST(floor(epoch(ts)) AS BIGINT) // 3600 BETWEEN 473400 AND 473600
             |ORDER BY event_id""".stripMargin)))
}
