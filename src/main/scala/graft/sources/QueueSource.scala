package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** A received queue message: opaque body + a receipt handle used to ack. */
final case class QueueMessage(receipt: String, body: String)

/** The queue seam of the ingest pipeline — the shape of the reference's
  * SQS `Poller` (`/root/reference/spark-job/read.py:26-62`):
  * `receive(max)` long-polls up to `max` messages and leaves them
  * in-flight; `commit()` acks (deletes) everything received since the last
  * commit — ack-after-write gives at-least-once delivery;
  * `abandon()` returns in-flight messages to the queue (the visibility-
  * timeout analog, taken on batch failure instead of by timer).
  */
trait QueueSource {
  def receive(max: Int): Seq[QueueMessage]
  def commit(): Unit
  def abandon(): Unit

  /** Ack a subset of in-flight messages by receipt (SQS DeleteMessageBatch
    * — the granularity the streaming source needs: a micro-batch commit
    * acks exactly the receipts of the batches at or before the committed
    * offset, never messages received for a later, still-running trigger).
    */
  def ack(receipts: Seq[String]): Unit
}

/** Local directory-backed queue (no AWS egress): each message is a file in
  * `dir/`; receiving atomically renames it to `<name>.inflight` (so a
  * concurrent consumer can't double-receive), commit deletes the inflight
  * files, abandon renames them back. FIFO by filename sort, mirroring
  * SQS's ≤10-per-receive batching (`read.py:30`).
  */
final class LocalDirQueue(dir: String) extends QueueSource {
  private val base: Path = Paths.get(dir)
  Files.createDirectories(base)
  private var inflight: List[Path] = Nil // paths with .inflight suffix

  override def receive(max: Int): Seq[QueueMessage] = {
    val listing = Files.list(base)
    val ready =
      try listing.iterator().asScala
        .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.endsWith(".inflight"))
        .toSeq.sortBy(_.getFileName.toString)
        .take(max)
      finally listing.close() // the poll loop runs forever; leaked fds add up
    val got = ready.flatMap { p =>
      val claimed = base.resolve(p.getFileName.toString + ".inflight")
      try {
        Files.move(p, claimed, StandardCopyOption.ATOMIC_MOVE)
        val body = new String(Files.readAllBytes(claimed), StandardCharsets.UTF_8)
        inflight ::= claimed
        Some(QueueMessage(claimed.toString, body))
      } catch { case _: java.nio.file.NoSuchFileException => None }
    }
    got
  }

  override def commit(): Unit = {
    inflight.foreach(Files.deleteIfExists)
    inflight = Nil
  }

  override def ack(receipts: Seq[String]): Unit = {
    val done = receipts.toSet
    val (acked, rest) = inflight.partition(p => done.contains(p.toString))
    acked.foreach(Files.deleteIfExists)
    inflight = rest
  }

  /** Return ORPHANED in-flight files (a previous consumer crashed without
    * commit or abandon) to the queue — the local analog of SQS's visibility
    * timeout expiring. Called by a new consumer before its first receive.
    */
  def reclaimInflight(): Unit = {
    val listing = Files.list(base)
    val orphans =
      try listing.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".inflight"))
        .filterNot(inflight.contains)
        .toSeq
      finally listing.close()
    orphans.foreach { p =>
      val orig = p.getFileName.toString.stripSuffix(".inflight")
      try Files.move(p, base.resolve(orig), StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.NoSuchFileException => () }
    }
  }

  override def abandon(): Unit = {
    inflight.foreach { p =>
      val orig = p.getFileName.toString.stripSuffix(".inflight")
      Files.move(p, base.resolve(orig), StandardCopyOption.ATOMIC_MOVE)
    }
    inflight = Nil
  }

  /** Producer-side helper for tests/harnesses. */
  def send(name: String, body: String): Unit =
    Files.write(base.resolve(name), body.getBytes(StandardCharsets.UTF_8))

  def pendingCount: Int = {
    val listing = Files.list(base)
    try listing.iterator().asScala
      .count(p => Files.isRegularFile(p) && !p.getFileName.toString.endsWith(".inflight"))
    finally listing.close()
  }
}
