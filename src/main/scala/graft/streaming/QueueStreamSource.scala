package graft.streaming

import java.util

import scala.collection.immutable.TreeMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{LocalDirQueue, QueueMessage}

/** The queue ingest seam as a REAL Structured-Streaming source — the SQS
  * semantics of the reference's poll loop (`read.py:26-62,330-350`) mapped
  * onto the DSv2 `MicroBatchStream` contract instead of a driver loop:
  *
  *  - **offsets = receipts**: each trigger's `latestOffset()` long-polls
  *    up to `maxPerPoll` messages (the SQS ≤10 ceiling) and advances a
  *    batch sequence number; the messages' receipt handles ride with the
  *    batch;
  *  - **commit = ack**: Spark calls `commit(offset)` only AFTER the
  *    micro-batch's sink write succeeds, and exactly then the receipts of
  *    batches at or before that offset are acked (`DeleteMessageBatch`).
  *    A batch that fails is never acked — the messages return to the
  *    queue (visibility-timeout analog) and redeliver: at-least-once,
  *    ack-after-write, the same contract as the reference;
  *  - a restarted stream cannot replay an unacked batch's receipts (they
  *    died with the process — inherent to queue semantics, SQS included);
  *    it RECLAIMS orphaned in-flight messages instead, which then arrive
  *    as fresh batches. Downstream keyed merge absorbs the duplicates,
  *    exactly the idempotency argument of SURVEY.md §2.3.
  *
  * Usage: `spark.readStream.format("graft-queue").option("dir", d).load()`
  * → rows of (receipt STRING, body STRING). Bodies are small control
  * messages (S3 event notifications); the heavy data they point at is read
  * by executors downstream — so the driver-side poll matches both SQS
  * reality and the reference's architecture, and nothing large ever
  * transits the driver.
  */
class QueueSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-queue"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueStream.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // Spark hands getTable the case-PRESERVING map — re-wrap it so
    // .option("maxPerPoll", ...) and .option("maxperpoll", ...) both land
    val opts = new CaseInsensitiveStringMap(properties)
    val dir = opts.get("dir")
    require(dir != null, "graft-queue requires option 'dir'")
    val max = Option(opts.get("maxperpoll")).map(_.toInt).getOrElse(10)
    new QueueStreamTable(dir, max)
  }
}

final class QueueStreamTable(val dir: String, val maxPerPoll: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-queue:$dir"
  override def schema(): StructType = QueueStream.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = QueueStream.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new QueueStream(dir, maxPerPoll)
        override def description(): String = s"GraftQueueStream($dir)"
      }
    }
}

/** Offset = monotonically increasing poll-batch sequence (-1 = nothing). */
final case class QueueOffset(batch: Long) extends Offset {
  override def json(): String = batch.toString
}

final class QueueStream(dir: String, maxPerPoll: Int) extends MicroBatchStream {

  private val queue = new LocalDirQueue(dir)
  // a previous consumer's crash strands in-flight messages; reclaiming on
  // construction is the local stand-in for SQS's visibility timeout
  queue.reclaimInflight()

  // in-flight poll batches by sequence number (driver-side only; bodies are
  // small control messages by design)
  private var batches = TreeMap.empty[Long, Seq[QueueMessage]]
  // batch seqs that went through planInputPartitions — i.e. Spark actually
  // read their rows. Only these may be acked (see commit).
  private var delivered = Set.empty[Long]
  private var maxBatch = -1L

  override def initialOffset(): Offset = QueueOffset(-1L)

  override def latestOffset(): Offset = synchronized {
    val msgs = queue.receive(maxPerPoll)
    if (msgs.nonEmpty) {
      maxBatch += 1
      batches += maxBatch -> msgs
    } else if (batches.nonEmpty) {
      // Spark only commits batch N's offsets (→ our ack) while CONSTRUCTING
      // batch N+1 — with no new data it constructs nothing and the last
      // batch's receipts would sit in-flight until the next message (or a
      // visibility-timeout redelivery in real SQS: wasted duplicates).
      // Advancing the offset once more yields an EMPTY heartbeat batch
      // whose construction commits the predecessor promptly; once nothing
      // awaits ack the offset stops moving and the stream is quiescent.
      maxBatch += 1
    }
    QueueOffset(maxBatch)
  }

  /** Restores a checkpointed offset — and resyncs the batch sequence past
    * it, so post-restart polls number their messages ABOVE the restored
    * offset whenever Spark deserializes before polling (the
    * uncommitted-last-batch replay path). On a cleanly-committed restart
    * Spark 4.1 polls FIRST (latestOffset) and only deserializes the
    * restored start inside runBatch, so this resync alone cannot prevent
    * messages being numbered below the restored offset — commit()'s
    * delivered-check is the correctness backstop for that path.
    */
  override def deserializeOffset(json: String): Offset = synchronized {
    val b = json.toLong
    maxBatch = math.max(maxBatch, b)
    QueueOffset(b)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = synchronized {
    val s = start.asInstanceOf[QueueOffset].batch
    val e = end.asInstanceOf[QueueOffset].batch
    // a replayed range from a previous run has no buffered messages (its
    // receipts died with that consumer) — empty batch; the reclaimed
    // messages redeliver in later polls
    maxBatch = math.max(maxBatch, e)
    val range = batches.range(s + 1, e + 1)
    delivered ++= range.keys
    val msgs = range.values.flatten.toArray
    if (msgs.isEmpty) Array.empty
    else Array(QueuePartition(msgs))
  }

  override def createReaderFactory(): PartitionReaderFactory = QueueReaderFactory

  /** Ack-after-write: receipts of batches ≤ the committed offset — but
    * ONLY batches whose rows Spark actually planned (delivered). A batch
    * below the committed offset that never went through
    * planInputPartitions exists only after a checkpoint restart whose
    * first poll numbered fresh messages below the restored offset (the
    * poll precedes the restored start's deserialization in Spark 4.1's
    * committed-restart path); acking it would DELETE messages no sink ever
    * saw. Those are requeued above the current sequence instead, so the
    * next trigger delivers them — at-least-once holds across restarts.
    */
  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[QueueOffset].batch
    val done = batches.rangeTo(e)
    if (done.nonEmpty) {
      val (acked, undelivered) = done.partition { case (seq, _) => delivered(seq) }
      queue.ack(acked.values.flatten.map(_.receipt).toSeq)
      batches = batches.rangeFrom(e + 1)
      delivered = delivered.filter(_ > e)
      // INVARIANT: each requeued entry is one ORIGINAL poll's message list
      // (≤ maxPerPoll by construction at poll time), requeued one-to-one —
      // never coalesced — so re-numbering them above the current sequence
      // cannot produce a batch exceeding the poll ceiling.
      undelivered.values.foreach { msgs =>
        maxBatch += 1
        batches += maxBatch -> msgs
      }
    }
  }

  /** Graceful stop: whatever was received but never committed returns to
    * the queue for the next consumer (explicit abandon instead of waiting
    * out a visibility timeout).
    */
  override def stop(): Unit = synchronized {
    batches = TreeMap.empty
    queue.abandon()
  }
}

object QueueStream {
  val Schema: StructType = StructType(Seq(
    StructField("receipt", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))
}

final case class QueuePartition(msgs: Array[QueueMessage]) extends InputPartition

object QueueReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val msgs = partition.asInstanceOf[QueuePartition].msgs
      private var i = -1
      override def next(): Boolean = { i += 1; i < msgs.length }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(msgs(i).receipt),
          UTF8String.fromString(msgs(i).body)))
      override def close(): Unit = ()
    }
}
