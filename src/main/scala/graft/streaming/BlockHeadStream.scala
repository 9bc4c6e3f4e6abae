package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom Structured Streaming source for chain block heads — the
  * Spark-native form of the reference's viem `watchBlocks` poller
  * (SURVEY S3, blockWatcher.ts:162-174).
  *
  * Offsets are block heights, so `emitMissed: true` is inherent to the
  * model: each micro-batch covers the exact height range
  * (lastCommitted, latest], and a restart resumes from the checkpointed
  * height with no gaps. Rows: (number, hash, timestamp).
  *
  * Like the batch connector, live [[BlockSource]]s are handed to
  * executors via a process-local registry rather than closure
  * serialization.
  */
object BlockHeadStream {
  val schema: StructType = StructType(Seq(
    StructField("number", LongType, nullable = false),
    StructField("hash", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  val registry: TrieMap[String, BlockSource] = TrieMap.empty
}

/** `spark.readStream.format("graft.streaming.BlockHeadStream").option("source", key)` */
final class BlockHeadStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlockHeadStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new BlockHeadTable(new CaseInsensitiveStringMap(properties).get("source"))
}

final class BlockHeadTable(sourceKey: String) extends Table with SupportsRead {
  override def name(): String = s"blockheads:$sourceKey"
  override def schema(): StructType = BlockHeadStream.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BlockHeadStream.schema
        override def toMicroBatchStream(checkpoint: String): MicroBatchStream =
          new BlockHeadMicroBatchStream(sourceKey)
      }
    }
}

/** Offset = block height (inclusive upper bound of delivered blocks). */
final case class BlockOffset(height: Long) extends Offset {
  override def json(): String = height.toString
}

final class BlockHeadMicroBatchStream(sourceKey: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def source: BlockSource = BlockHeadStream.registry(sourceKey)

  @volatile private var committed: Long = -1L
  // head pinned at query start for Trigger.AvailableNow runs
  @volatile private var availableNowCap: Option[Long] = None

  override def initialOffset(): Offset = {
    // start at the current head so a fresh query begins "now"; a restart
    // never comes through here (it uses the checkpointed offset)
    val head = source.latest().number.toLong
    BlockOffset(head - 1)
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(source.latest().number.toLong)

  override def reportLatestOffset(): Offset =
    BlockOffset(source.latest().number.toLong)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  // SupportsAdmissionControl path (used by the AvailableNow wrapper)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    BlockOffset(availableNowCap.getOrElse(source.latest().number.toLong))

  override def deserializeOffset(json: String): Offset =
    BlockOffset(json.toLong)

  override def commit(end: Offset): Unit =
    committed = end.asInstanceOf[BlockOffset].height

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[BlockOffset].height + 1
    val to = end.asInstanceOf[BlockOffset].height
    if (from > to) Array.empty
    else Array(BlockRangePartition(sourceKey, from, to))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => {
      val BlockRangePartition(key, from, to) = p.asInstanceOf[BlockRangePartition]
      new PartitionReader[InternalRow] {
        private val src = BlockHeadStream.registry(key)
        private var h = from - 1
        override def next(): Boolean = { h += 1; h <= to }
        override def get(): InternalRow = {
          // one RPC per missed height — the reference does the same
          // catch-up (emitMissed: true)
          val b = src.blockAt(BigInt(h))
          InternalRow(h, UTF8String.fromString(b.hash), b.timestamp.toLong)
        }
        override def close(): Unit = ()
      }
    }

  override def stop(): Unit = ()
}

final case class BlockRangePartition(sourceKey: String, from: Long, to: Long)
  extends InputPartition
