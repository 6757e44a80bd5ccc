package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 micro-batch streaming source with the reference's SIZE-CLOSE rule
  * (S1/S2 ≙ `updates.rs:89-152`): a batch never exceeds
  * `max_rows_per_batch` rows (default 256, the reference's
  * `UPDATES_PER_REQUEST`), enforced where a production source must enforce
  * it — in `latestOffset` admission control, not in a downstream operator.
  * The wait-time close (5 s) composes as the trigger interval
  * ([[graft.streaming.MicroBatchPipeline.withBatchClose]]).
  *
  * The row payload is a deterministic synthetic block-uid sequence
  * (`uid`, `height = uid/4 + 1` — four "blocks" per height), standing in
  * for the gRPC decode: the offset/admission/partition-planning mechanics
  * are the production surface under test; swapping the reader's row
  * generator for a protobuf decode does not touch them.
  *
  * Usage: `spark.readStream.format(classOf[BlockStreamProvider].getName)
  * .option("total_rows", n).option("max_rows_per_batch", 256).load()`.
  */
object BlockStream {
  val schema: StructType = StructType(Seq(
    StructField("uid", LongType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  val DefaultMaxRowsPerBatch = 256L // UPDATES_PER_REQUEST, config/consumer.rs:10-12
  val RowsPerPartition = 64L
}

final class BlockStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BlockStream.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlockStreamTable(
      total = Option(properties.get("total_rows")).map(_.toLong).getOrElse(1024L),
      maxRows = Option(properties.get("max_rows_per_batch")).map(_.toLong)
        .getOrElse(BlockStream.DefaultMaxRowsPerBatch))
}

final class BlockStreamTable(total: Long, maxRows: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_block_stream($total)"
  override def schema(): StructType = BlockStream.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new BlockStreamScan(total, maxRows)
}

final class BlockStreamScan(total: Long, maxRows: Long) extends Scan {
  override def readSchema(): StructType = BlockStream.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BlockMicroBatchStream(total, maxRows)
}

/** Row-count offset; json form keeps restart/resume working. */
final case class BlockStreamOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class BlockMicroBatchStream(total: Long, maxRows: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = BlockStreamOffset(0L)

  /** The size-close rule: advance at most `maxRows` past the last committed
    * offset, whatever is available (`updates.rs:117-129`). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BlockStreamOffset].n
    BlockStreamOffset(math.min(total, s + maxRows))
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxRows)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "size-close source uses admission control (latestOffset(start, limit))")

  override def reportLatestOffset(): Offset = BlockStreamOffset(total)

  override def deserializeOffset(json: String): Offset = BlockStreamOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BlockStreamOffset].n
    val e = end.asInstanceOf[BlockStreamOffset].n
    (s until e by BlockStream.RowsPerPartition)
      .map(from => BlockRangePartition(from, math.min(e, from + BlockStream.RowsPerPartition)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = BlockRangeReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class BlockRangePartition(from: Long, to: Long) extends InputPartition

object BlockRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BlockRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = p.from - 1
      override def next(): Boolean = { cur += 1; cur < p.to }
      override def get(): InternalRow = InternalRow(cur, (cur / 4 + 1).toInt)
      override def close(): Unit = ()
    }
  }
}
