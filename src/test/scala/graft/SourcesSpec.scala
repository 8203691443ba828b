package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.JobConfig
import graft.sources.{LocalDirQueue, S3EventParser}

class SourcesSpec extends AnyFunSuite {

  test("S3 event parser extracts all records across messages") {
    val m1 = S3EventParser.eventJson("bkt", Seq("raw/a.csv", "raw/b.csv"))
    val m2 = S3EventParser.eventJson("bkt2", Seq("raw/c.csv"))
    val paths = S3EventParser.parseBatch(Seq(m1, m2), "s3a")
    assert(paths == Seq(
      "s3a://bkt/raw/a.csv", "s3a://bkt/raw/b.csv", "s3a://bkt2/raw/c.csv"))
  }

  test("S3 event parser: file protocol builds local URIs; junk is skipped") {
    val m = S3EventParser.eventJson("/tmp/land", Seq("x.csv"))
    assert(S3EventParser.parseMessage(m, "file") == Seq("file:///tmp/land/x.csv"))
    assert(S3EventParser.parseMessage("not json", "file").isEmpty)
    assert(S3EventParser.parseMessage("""{"Records":[{}]}""", "file").isEmpty)
  }

  test("LocalDirQueue: receive claims, commit deletes, abandon restores") {
    val dir = java.nio.file.Files.createTempDirectory("q").toString
    val q = new LocalDirQueue(dir)
    q.send("m1.json", "body1")
    q.send("m2.json", "body2")
    q.send("m3.json", "body3")

    val got = q.receive(2)
    assert(got.map(_.body) == Seq("body1", "body2")) // FIFO by name
    assert(q.pendingCount == 1)                      // m3 still visible

    q.abandon()                                      // failure path: restore
    assert(q.pendingCount == 3)

    val again = q.receive(10)
    assert(again.size == 3)
    q.commit()                                       // success path: ack
    assert(q.pendingCount == 0)
    assert(q.receive(10).isEmpty)
  }

  test("JobConfig parses the reference job.json surface") {
    val json =
      """{
        |  "spark": {"spark.app.name": "x"},
        |  "input_config": {
        |    "queue_url": "/tmp/queue", "poll_interval": "60",
        |    "protocol": "file", "type": "sqs", "format": "csv",
        |    "transform_query": "", "commit_checkpoint": true,
        |    "csv_options": {"sep": "\t", "header": "true", "inferSchema": "true"}
        |  },
        |  "output_config": {
        |    "catalog_name": "c", "database": "db", "table_name": "orders",
        |    "type": "unmanaged_iceberg", "mode": "merge",
        |    "schema": "/tmp/s.avsc", "merge_query": "/tmp/m.sql",
        |    "table_type": "COW", "compression": "zstd",
        |    "partition": "destinationstate"
        |  }
        |}""".stripMargin
    val c = JobConfig.fromJson(json)
    assert(c.spark("spark.app.name") == "x")
    assert(c.input.pollInterval == 60)
    assert(c.input.csvOptions("sep") == "\t")
    assert(c.input.commitCheckpoint)
    assert(c.output.mode == "merge")
    assert(c.output.partition.contains("destinationstate"))
    assert(c.output.fqTableName == "c.db.orders")
  }

  test("JobConfig defaults: poll_interval 120, COW, no partition") {
    val c = JobConfig.fromJson(
      """{"input_config": {}, "output_config": {}}""")
    assert(c.input.pollInterval == 120) // read.py:319 default
    assert(c.output.tableType == "COW")
    assert(c.output.partition.isEmpty)
  }
}
