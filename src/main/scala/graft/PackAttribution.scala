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

    def timed[T](label: String, dir: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir","stage":"$label","sec":$sec%.3f}""")
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
