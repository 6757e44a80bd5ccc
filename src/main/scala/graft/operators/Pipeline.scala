package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.ReferenceSchemas.UidsPerHeight

/** Batch-pipeline semantics of the reference consumer
  * (SURVEY.md §2.8; `mod.rs:190-251`, `mod.rs:769-863`).
  *
  * All of these are pure DataFrame transforms: given the current table state
  * and a batch/cut, they produce corrected tables, which makes
  * rollback∘append = identity property-testable (SURVEY §5).
  */
object Pipeline {

  /** Deterministic tx-uid assignment (O22) ≙ `convert.rs:45-72`:
    * `uid = height * 100000 + idx`, idx resetting per height in arrival
    * order. Reproduces the reference's collision contract for >100000
    * txs/height verbatim (SURVEY §7.4.7). Window partitions by height —
    * bounded partitions, no global sort. */
  def assignTxUids(txs: DataFrame, orderCols: Seq[Column], heightCol: String = "height"): DataFrame = {
    val w = Window.partitionBy(col(heightCol)).orderBy(orderCols: _*)
    txs.withColumn("uid",
      col(heightCol).cast("long") * UidsPerHeight + (row_number().over(w) - 1))
  }

  /** Sequence high-water mark (F22) ≙ `setval`/`nextval` (`pg.rs:190-194`,
    * `258-267`): next block of `n` uids starts after the persisted max. */
  def nextUidRange(currentMax: Long, n: Int): Seq[Long] = (currentMax + 1) to (currentMax + n)

  /** Microblock squash (ST3) ≙ `mod.rs:769-792` + `pg.rs:125-166`: when a key
    * block arrives after provisional microblocks, (1) all fact rows pointing
    * at microblock uids are re-pointed at the last key-block uid, (2) the
    * microblock rows are deleted, (3) the key block takes over the last
    * microblock's id (total-block id rename, `pg.rs:151-158`).
    *
    * @param blocks  blocks_microblocks state; microblocks have NULL time_stamp
    * @param keyBlockId  id of the arriving key block (already inserted)
    * @return corrected blocks frame and a remap (old_block_uid → new_block_uid)
    *         to apply to fact tables via [[repointBlockUids]].
    */
  def squashMicroblocks(blocks: DataFrame, keyBlockId: String): (DataFrame, DataFrame) = {
    val keyUid = blocks.filter(col("time_stamp").isNotNull && col("id") === keyBlockId)
      .agg(max("uid")).first().getLong(0)
    val micro = blocks.filter(col("time_stamp").isNull && col("uid") < keyUid)
    val remap = micro.select(col("uid").as("old_block_uid"), lit(keyUid).as("new_block_uid"))
    val lastMicroId = micro.orderBy(col("uid").desc).limit(1).select("id")
      .collect().headOption.map(_.getString(0))
    val (kept, _) = Merge.deleteWhere(blocks, col("time_stamp").isNull && col("uid") < keyUid)
    val renamed = lastMicroId match {
      case Some(newId) =>
        Merge.updateWhere(kept, col("uid") === keyUid, Map("id" -> lit(newId)))
      case None => kept
    }
    (renamed, remap)
  }

  /** Re-point fact rows at squashed block uids (`pg.rs:216-223`, `383-390`).
    * The remap is one micro-batch's microblocks — always broadcastable. */
  def repointBlockUids(fact: DataFrame, remap: DataFrame): DataFrame =
    fact.join(broadcast(remap), fact("block_uid") === remap("old_block_uid"), "left")
      .withColumn("block_uid", coalesce(col("new_block_uid"), col("block_uid")))
      .drop("old_block_uid", "new_block_uid")

  /** Rollback (ST4) ≙ `mod.rs:794-863`: drop every fact row with
    * `block_uid > cut` across all tables. Dimension re-open and candle
    * recompute are [[Scd2.rollback]] / [[Candles.rollback]]. */
  def rollbackFacts(tables: Map[String, DataFrame], blockUidCut: Long): Map[String, DataFrame] =
    tables.map { case (name, df) =>
      name -> Merge.deleteWhere(df, col("block_uid") > blockUidCut)._1
    }

  /** Startup safety rollback (ST5) ≙ `mod.rs:103-137` + `pg.rs:80-112`:
    * resolve the block uid `depth` key-blocks back from the tip. */
  def startupRollbackCut(blocks: DataFrame, depth: Int): Option[Long] = {
    val keyBlocks = blocks.filter(col("time_stamp").isNotNull)
    keyBlocks.orderBy(col("uid").desc).limit(depth + 1)
      .orderBy(col("uid").asc).limit(1)
      .select("uid").collect().headOption.map(_.getLong(0))
  }

  /** FIFO of [[globalRowNumber]]'s cached inputs — see the pool comment in
    * the method body. */
  private val persistedPool = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val PersistedPoolSize = 4

  /** Distributed global row numbering: range-partition on the order key,
    * number within partitions, add cumulative partition offsets. Unlike
    * `row_number().over(Window.orderBy(k))` this never funnels the dataset
    * through a single partition — the only driver-side state is one count
    * per partition. Returns the frame with a 1-based `__global_rn` column. */
  def globalRowNumber(events: DataFrame, orderCol: Column, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else events.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Range partitions come out in key order, so partition id IS the range
    // rank; within a sorted partition monotonically_increasing_id ascends in
    // row order. Global rn = cumulative prior-partition counts + local rank.
    // The frame is persisted BEFORE the stats pass so the sampled range
    // boundaries and AQE's partition layout are decided exactly once — the
    // stats job and the final projection read the same partitions, so the
    // pid ↔ offset map cannot drift between jobs (the failure mode that
    // previously forced an RDD zipWithIndex here). Once the cache is built,
    // its SHUFFLE FILES pin the partition boundaries: a later
    // eviction/unpersist recompute re-reads the same shuffle output, so the
    // numbering stays correct — which is what makes the bounded cache pool
    // below safe. (An eager localCheckpoint would also be leak-free but
    // loses the columnar cache and cross-call plan reuse — measured 4× on
    // the batch-accumulator path.)
    val sorted = events.repartitionByRange(n, orderCol).sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .persist()
    // bounded pool: keep at most the last few inputs cached, so repeated
    // per-micro-batch calls cannot pin storage without limit (ADVICE r3)
    persistedPool.add(sorted)
    while (persistedPool.size() > PersistedPoolSize)
      Option(persistedPool.poll()).foreach(_.unpersist(false))
    val stats = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__mid0"))
      .collect()
      .sortBy(_.getInt(0))
    var acc = 0L
    val offsets = stats.map { r =>
      val row = (r.getInt(0), acc, r.getLong(2)); acc += r.getLong(1); row
    }.toSeq
    val spark = events.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__pid", "__offset", "__mid0")
    val numbered = sorted
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("__global_rn", col("__offset") + (col("__mid") - col("__mid0")) + 1)
      .drop("__pid", "__mid", "__offset", "__mid0")
    numbered
  }

  /** [[globalRowNumber]] for SEVERAL disjoint row groups of one frame in a
    * SINGLE pass: rank rows within each `groupCols` value by `orderCol`,
    * sharing ONE range shuffle and ONE per-partition stats job across all
    * groups. The per-group form previously paid the whole machinery —
    * range sample, cache build, stats collect — once PER group (j4 ranked
    * its two event types separately; VERDICT r15 next-round #3). Range
    * keys are (groupCols, orderCol) lexicographic, so each group's rows
    * are contiguous within a partition and ordered across partitions —
    * global rank within a group = that group's prior-partition counts +
    * (mid − the group's first mid in this partition). Same persistence
    * discipline as [[globalRowNumber]] (the cached shuffle pins the
    * sampled boundaries; bounded unpersist pool). Returns the frame with a
    * 1-based `__group_rn` column. */
  def groupedRowNumber(events: DataFrame, groupCols: Seq[String], orderCol: Column,
      partitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "use globalRowNumber for the ungrouped form")
    val n = if (partitions > 0) partitions
            else events.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keys = groupCols.map(col) :+ orderCol
    val sorted = events.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .persist()
    persistedPool.add(sorted)
    while (persistedPool.size() > PersistedPoolSize)
      Option(persistedPool.poll()).foreach(_.unpersist(false))
    val statsDf = sorted.groupBy("__pid", groupCols: _*)
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__mid0"))
    val stats = statsDf.collect()
    // cumulative prior-partition counts PER GROUP, in partition-id order
    val offsetRows = stats
      .groupBy(r => groupCols.map(r.getAs[Any]))
      .values.flatMap { rs =>
        var acc = 0L
        rs.sortBy(_.getInt(0)).map { r =>
          val row = org.apache.spark.sql.Row.fromSeq(
            r.toSeq.dropRight(2) ++ Seq(acc, r.getLong(r.length - 1)))
          acc += r.getLong(r.length - 2)
          row
        }
      }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      statsDf.schema.dropRight(2) ++ Seq(
        org.apache.spark.sql.types.StructField("__offset", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__mid0", org.apache.spark.sql.types.LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val offDf = events.sparkSession.createDataFrame(offsetRows.asJava, offSchema)
    sorted
      .join(broadcast(offDf), "__pid" +: groupCols)
      .withColumn("__group_rn", col("__offset") + (col("__mid") - col("__mid0")) + 1)
      .drop("__pid", "__mid", "__offset", "__mid0")
  }

  /** Distributed inclusive prefix sum — `sum(valueCol) OVER (ORDER BY
    * orderCols)` WITHOUT the single-partition window that the window form
    * plans: range-partition on the order keys, partition-local running sums
    * (window partitioned by pid — bounded), plus broadcast cumulative
    * prior-partition totals. Same persistence discipline as
    * [[globalRowNumber]] (the cached shuffle pins the sampled range
    * boundaries; bounded unpersist pool). Returns the frame with a
    * `__running_total` column. */
  def runningTotal(events: DataFrame, orderCols: Seq[Column], valueCol: Column,
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else events.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = events.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__val", valueCol.cast("long"))
      .persist()
    persistedPool.add(sorted)
    while (persistedPool.size() > PersistedPoolSize)
      Option(persistedPool.poll()).foreach(_.unpersist(false))
    val stats = sorted.groupBy(col("__pid")).agg(sum(col("__val")).as("__s"))
      .collect().sortBy(_.getInt(0))
    var acc = 0L
    val offsets = stats.map { r => val row = (r.getInt(0), acc); acc += r.getLong(1); row }.toSeq
    val spark = events.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("__running_total", col("__offset") + sum(col("__val")).over(w))
      .drop("__pid", "__val", "__offset")
  }

  /** Batch-close folding (S2/ST1) ≙ `updates.rs:89-152`: assign each row a
    * batch id so that a batch closes at `maxSize` rows, mirroring the
    * size-close rule (time-close is the streaming trigger's job). Built on
    * [[globalRowNumber]] so the ordering never collapses to one partition. */
  def assignBatchIds(events: DataFrame, orderCol: Column, maxSize: Int): DataFrame =
    globalRowNumber(events, orderCol)
      .withColumn("batch_id", floor((col("__global_rn") - 1) / maxSize))
      .drop("__global_rn")
}
