package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{JdbcUpsertSink, TableStore}

/** Sink-side contracts: ON CONFLICT statement generation with the
  * reference's chunk ceiling, and the parquet layout conventions. */
class SinksSpec extends SparkSpec {

  import spark.implicits._

  test("chunk sizing matches the reference formula (pg.rs:31-32)") {
    assert(JdbcUpsertSink.chunkRows(14) == (65535 / 14) / 10 * 10)
    assert(JdbcUpsertSink.chunkRows(4) == 16380)
  }

  test("upsert SQL carries every non-key column in DO UPDATE (pg.rs:721-730)") {
    val sql = JdbcUpsertSink.upsertSql("candles",
      Seq("interval", "time_start", "low", "high"), Seq("interval", "time_start"), rows = 2)
    assert(sql.startsWith("INSERT INTO candles (interval, time_start, low, high) VALUES (?, ?, ?, ?), (?, ?, ?, ?)"))
    assert(sql.contains("ON CONFLICT (interval, time_start) DO UPDATE SET low = excluded.low, high = excluded.high"))
    assert(!sql.contains("excluded.interval"))
  }

  test("insert-ignore SQL (pg.rs:176-184)") {
    val sql = JdbcUpsertSink.insertIgnoreSql("waves_data", Seq("height", "quantity"), Seq("quantity"), rows = 1)
    assert(sql == "INSERT INTO waves_data (height, quantity) VALUES (?, ?) ON CONFLICT (quantity) DO NOTHING")
  }

  test("statement respects the bind-param ceiling") {
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.upsertSql("t", Seq("a", "b"), Seq("a"), rows = JdbcUpsertSink.chunkRows(2) + 1)
    }
  }

  test("fact layout: height buckets partition, uid sorted, round-trips") {
    val dir = Files.createTempDirectory("graft-store").toString
    val df = Seq((1L, 1500, "x"), (2L, 2500, "y"), (3L, 1500, "z"))
      .toDF("uid", "height", "payload")
    TableStore.writeFact(df, s"$dir/facts")
    val back = TableStore.readAny(spark, s"$dir/facts")
    assert(back.count() == 3)
    assert(back.select("height_bucket").distinct().as[Int].collect().toSet == Set(1, 2))
    // partition pruning: a height-bucket filter reads one directory
    val pruned = back.filter(col("height_bucket") === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 2)
  }

  test("candle layout: interval partitions round-trip") {
    val dir = Files.createTempDirectory("graft-store").toString
    val candles = Seq(
      ("1m", "A", "P", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "m"),
      ("1h", "A", "P", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "m"))
      .toDF("interval", "amount_asset_id", "price_asset_id", "time_start", "matcher_address")
    TableStore.writeCandles(candles, s"$dir/candles")
    val back = TableStore.readAny(spark, s"$dir/candles")
    assert(back.filter(col("interval") === "1h").count() == 1)
  }

  test("bucketed signature index: candidate join shuffles only the increment") {
    // persist the corpus's band signatures bucketed on the join keys; a
    // later increment's candidate join must read the index co-located —
    // the property that keeps incremental dedup batch-sized at 100 TB
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val table = "graft_test_sig_index"
    TableStore.writeBucketedIndex(
      graft.llm.Dedup.bandSignatures(docs), table,
      joinKeys = Seq("band", "band_hash"), buckets = 8)
    // force the at-scale join shape: at 100 TB neither side broadcasts,
    // so the plan under test must be the shuffle join
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBc = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    try {
      val index = spark.table(table)
      val batch = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 500000).as("doc_id"), col("text"))
      val cands = graft.llm.Dedup.incrementalCandidates(batch, index)
      val plan = cands.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
      // differential proof: against the bucketed table the join plans
      // exactly one exchange fewer than against the same index as a plain
      // frame — the missing one is the index side's
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.toString.linesIterator.count(_.contains("Exchange "))
      val plain = graft.llm.Dedup.incrementalCandidates(batch, graft.llm.Dedup.bandSignatures(docs))
      assert(exchanges(cands) == exchanges(plain) - 1,
        s"bucketed=${exchanges(cands)} plain=${exchanges(plain)}:\n$plan")
      // correctness unchanged: re-served docs produce the same candidates
      // either way
      val viaBucketed = cands.as[(Long, Long)].collect().toSet
      val viaPlain = plain.as[(Long, Long)].collect().toSet
      assert(viaBucketed == viaPlain && viaBucketed.nonEmpty)
      val expected = docs.filter(col("doc_id") % 11 === 0).select("doc_id").as[Long].collect()
        .map(i => (i + 500000L, i)).toSet
      assert(expected.subsetOf(viaBucketed), "identical re-serves must always collide")
    } finally {
      spark.conf.set(bcKey, prevBc)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("bucketed IVF-PQ index: probe join co-locates on the cell bucket, results unchanged") {
    // the vector twin of the signature-index test: persist (id, cell,
    // codes) bucketed on cell_id; a later query batch's probe join reads
    // the compressed index co-located — batch-sized search work against a
    // corpus-sized index
    import graft.llm.{Pq, Similarity}
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Pq.train(emb, dim = 64, m = 16, ks = 16, iterations = 1)
    val centroids = Similarity.seedCentroids(emb, numCells = 16)
    val idx = Pq.ivfPqIndex(emb, centroids, cb)
    val table = "graft_test_pq_index"
    TableStore.writeBucketedIndex(idx, table, joinKeys = Seq("cell_id"), buckets = 8)
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBc = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    try {
      val queries = emb.filter(col("vec_id") < 25)
      val viaTable = Pq.searchIndex(queries, spark.table(table), centroids, cb, k = 5, nprobe = 4)
      val plan = viaTable.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.toString.linesIterator.count(_.contains("Exchange "))
      val viaFrame = Pq.searchIndex(queries, idx, centroids, cb, k = 5, nprobe = 4)
      assert(exchanges(viaTable) == exchanges(viaFrame) - 1,
        s"bucketed=${exchanges(viaTable)} plain=${exchanges(viaFrame)}:\n$plan")
      // identical results through either path, and both equal the
      // one-shot composition
      val a = viaTable.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
      val b = viaFrame.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
      val c = Pq.ivfAdcTopK(queries, emb, cb, k = 5, numCells = 16, nprobe = 4)
        .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
      assert(a == b && b == c && a.nonEmpty)
    } finally {
      spark.conf.set(bcKey, prevBc)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("tokenizer artifact round-trip: shipped vocab + id tables re-encode identically") {
    import graft.llm.Bpe
    // what a tokenizer ships: the merge table, the id table, and the final
    // segmentation state — persist all three, reload, and the reloaded
    // artifacts must reproduce the direct encoding bit-for-bit, with the
    // vocab side reading CO-LOCATED from its word-bucketed table under the
    // at-scale (no-broadcast) join
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 100)
    val (merges, vocab) = Bpe.trainMerges(
      Bpe.wordFrequencies(docs.select(col("text"))), numMerges = 8)
    val ids = Bpe.vocabIds(spark, merges, vocab)
    val direct = Bpe.encodeIds(docs, vocab, ids)
      .orderBy("doc_id", "word_idx", "tok_idx").collect()
    val vtab = "graft_test_bpe_vocab"
    TableStore.writeBucketedIndex(
      vocab.select("word", "freq", "s"), vtab, joinKeys = Seq("word"), buckets = 8)
    val dir = Files.createTempDirectory("graft-tok").toString
    Bpe.mergeTable(spark, merges).write.parquet(s"$dir/merges")
    ids.write.parquet(s"$dir/vocab_ids")
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBc = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    try {
      val vocab2 = spark.table(vtab)
      val ids2 = spark.read.parquet(s"$dir/vocab_ids")
      val rel = Bpe.encodeIds(docs, vocab2, ids2, broadcastVocab = false)
        .orderBy("doc_id", "word_idx", "tok_idx")
      assert(rel.queryExecution.executedPlan.toString.contains("Bucketed: true"),
        "vocab side must read from the bucketed table")
      assert(rel.collect().sameElements(direct))
      assert(spark.read.parquet(s"$dir/merges").count() == merges.size)
    } finally {
      spark.conf.set(bcKey, prevBc)
      spark.sql(s"DROP TABLE IF EXISTS $vtab")
    }
  }
}
