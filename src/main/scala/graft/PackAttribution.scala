package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing attribution for the llm_pack_shards scale anomaly
  * (VERDICT r14 #1): the committed r14 scale window read 12.5× time at
  * 10× rows where r13 read 2.7×. This main decomposes the gate into its
  * five stages and times each at one or two dirs, so the super-linear
  * stage (if any) is NAMED rather than guessed — the llm_cluster_keeper
  * attribution methodology from r13.
  *
  * Usage: `runMain graft.PackAttribution <dirSmall> [dirBig]`
  * Prints one JSON line per (dir, stage, seconds, rows-out where cheap).
  */
object PackAttribution {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.isEmpty) Seq("/root/testdata/sf0.1", "scale/sf1") else args.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // Per-Spark-stage accounting (r15): the slow window is erratic — the
    // identical agg swings 1.5 s ↔ 73 s in one process with GC exonerated —
    // so attribute WALL time to (executor run, shuffle I/O, spill, GC,
    // scheduler gap) per stage instead of guessing at operator granularity.
    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(-1L)
        if (wall > 2000) stageLines.add(
          f"""{"stage_id":${i.stageId},"name":"${i.name.takeWhile(_ != '\n').take(60)}",""" +
          f""""wall_ms":$wall,"task_ms":${m.executorRunTime},"gc_ms":${m.jvmGCTime},""" +
          f""""cpu_ms":${m.executorCpuTime / 1000000},""" +
          f""""shuffle_write_mb":${m.shuffleWriteMetrics.bytesWritten / 1048576},""" +
          f""""shuffle_read_mb":${m.shuffleReadMetrics.remoteBytesRead / 1048576 +
            m.shuffleReadMetrics.localBytesRead / 1048576},""" +
          f""""spill_disk_mb":${m.diskBytesSpilled / 1048576},""" +
          f""""fetch_wait_ms":${m.shuffleReadMetrics.fetchWaitTime},""" +
          f""""write_ms":${m.shuffleWriteMetrics.writeTime / 1000000}}""")
      }
    })

    def timed[T](label: String, dir: String)(body: => T): T = {
      stageLines.clear()
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir","stage":"$label","sec":$sec%.3f}""")
      stageLines.forEach(l => println(s"""  SLOWSTAGE $l"""))
      r
    }

    dirs.foreach { dir =>
      import graft.llm.{Bpe, Curation}
      val docs = sources.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      println(s"""{"dir":"$dir","docs":${docs.count()}}""")

      val (merges, vocab) = timed("1_bpe_train", dir) {
        val (m, v) = Bpe.trainMergesIncremental(Bpe.wordFrequencies(docs.select(col("text"))), numMerges = 8)
        (m, v.localCheckpoint())
      }
      val ids = timed("2_vocab_ids", dir)(Bpe.vocabIds(spark, merges, vocab).localCheckpoint())
      val tok = timed("3_encode_ids_ckpt", dir)(
        Bpe.encodeIds(docs, vocab, ids).localCheckpoint())
      println(s"""{"dir":"$dir","token_rows":${tok.count()}}""")
      val pack = timed("4_counts_pack", dir) {
        val counts = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_toks"))
        val p = Curation.packByTokenCounts(counts, seqLen = 512L, tokensCol = "n_toks")
        p.queryExecution.toRdd.count()
        p
      }
      timed("5_pack_emit", dir) {
        Curation.packEmit(tok, pack, seqLen = 512L).queryExecution.toRdd.count()
      }
      timed("6_pack_shards_agg", dir) {
        Curation.packShards(tok, pack, seqLen = 512L).orderBy("seq_id")
          .queryExecution.toRdd.count()
      }
      // stage-6 decomposition (r15): the agg is the hot stage at 10x and
      // GC is exonerated (GcProbe: <=1.5 s gc in 14-35 s walls at BOTH 8 g
      // and 48 g heaps) — so split the agg into its candidate costs. Each
      // variant re-executes packEmit (~stage 5) on top of the checkpointed
      // tok; subtract stage 5 to read the agg-only cost.
      (1 to 2).foreach { i =>
        timed(s"6a_count_only_rep$i", dir) {
          Curation.packEmit(tok, pack, seqLen = 512L)
            .groupBy(col("seq_id")).agg(count(lit(1)).as("n"))
            .queryExecution.toRdd.count()
        }
        timed(s"6b_collect_nostruct_rep$i", dir) {
          Curation.packEmit(tok, pack, seqLen = 512L)
            .groupBy(col("seq_id"))
            .agg(count(lit(1)).as("n"),
              array_join(collect_list(col("token_id").cast("string")), ",").as("csv"))
            .queryExecution.toRdd.count()
        }
        timed(s"6c_packshards_current_rep$i", dir) {
          Curation.packShards(tok, pack, seqLen = 512L)
            .queryExecution.toRdd.count()
        }
        timed(s"6d_presorted_variant_rep$i", dir) {
          val e = Curation.packEmit(tok, pack, seqLen = 512L)
          e.repartition(col("seq_id"))
            .sortWithinPartitions(col("seq_id"), col("pos_in_seq"))
            .groupBy(col("seq_id"))
            .agg(count(lit(1)).as("n_tokens"),
              array_join(collect_list(col("token_id").cast("string")), ",").as("ids_csv"))
            .queryExecution.toRdd.count()
        }
      }
      // name the physical agg operator in play (ObjectHashAggregate vs
      // SortAggregate fallback) for the NOTES attribution
      val aggPlan = Curation.packShards(tok, pack, seqLen = 512L)
        .queryExecution.executedPlan.toString
      val opLines = aggPlan.linesIterator
        .filter(l => l.contains("Aggregate") || l.contains("Exchange"))
        .map(_.trim.take(120)).mkString(" | ")
      println(s"""{"dir":"$dir","agg_plan_ops":"${opLines.replace("\"", "'")}"}""")
      // the full gate exactly as the scale bench times it (rep shape):
      // BPE training re-done per rep is NOT part of the gate fn (memoized),
      // so time the post-training body twice like ScaleBench's reps
      (1 to 2).foreach { i =>
        timed(s"7_gate_body_rep$i", dir) {
          val t = Bpe.encodeIds(docs, vocab, ids).localCheckpoint()
          val c = t.groupBy(col("doc_id")).agg(count(lit(1)).as("n_toks"))
          val p = Curation.packByTokenCounts(c, seqLen = 512L, tokensCol = "n_toks")
          Curation.packShards(t, p, seqLen = 512L).orderBy("seq_id")
            .queryExecution.toRdd.count()
        }
      }
    }
    spark.stop()
  }
}
