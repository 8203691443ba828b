package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.config.JobConfig
import graft.pipeline.IngestRunner
import graft.plans.MergeSqlRunner
import graft.sources.{LocalDirQueue, S3EventParser}

/** End-to-end golden test of the full reference pipeline semantics
  * (SURVEY.md §5.2): queue → S3-event parse → CSV batch scan → window
  * dedup → MERGE upsert into a partitioned warehouse table, with
  * ack-after-write, replay idempotency, and error-no-ack.
  *
  * The fixture mirrors the CDC shape of the reference's sampledata (tab-
  * separated, header, Op/replicadmstimestamp + 9 business columns) with
  * synthetic values: batch 1 inserts 3 keys, batch 2 updates 2 of them
  * with later timestamps (category gains a '##' marker).
  */
class IngestPipelineSpec extends SparkSpec {

  private val header =
    "Op\treplicadmstimestamp\tinvoiceid\titemid\tcategory\tprice\tquantity\torderdate\tdestinationstate\tshippingtype\treferral"

  private val batch1 = Seq(
    header,
    "I\t2025-03-01 10:00:00.000\t101\t1\tbooks\t10.50\t2\t2025-03-01\tCA\tair\tweb",
    "I\t2025-03-01 10:00:01.000\t102\t2\ttoys\t5.25\t1\t2025-03-01\tNY\tground\tad",
    "I\t2025-03-01 10:00:02.000\t103\t3\tgames\t7.00\t4\t2025-03-01\tCA\tair\tweb"
  ).mkString("\n")

  private val batch2 = Seq(
    header,
    // same keys as 101/102, later timestamps, mutated category
    "U\t2025-03-02 09:00:00.000\t101\t1\tbooks##\t11.00\t2\t2025-03-01\tCA\tair\tweb",
    "U\t2025-03-02 09:00:01.000\t102\t2\ttoys##\t5.25\t3\t2025-03-01\tNY\tground\tad",
    // intra-batch duplicate for 102: older row must lose the dedup window
    "U\t2025-03-02 08:59:59.000\t102\t2\ttoys-old\t9.99\t9\t2025-03-01\tNY\tground\tad"
  ).mkString("\n")

  private val avsc =
    """{"type":"record","name":"Silver","fields":[
      |{"name":"invoiceid","type":"int"},
      |{"name":"itemid","type":"int"},
      |{"name":"category","type":"string"},
      |{"name":"price","type":"float"},
      |{"name":"quantity","type":"int"},
      |{"name":"orderdate","type":"string"},
      |{"name":"destinationstate","type":"string"},
      |{"name":"shippingtype","type":"string"},
      |{"name":"referral","type":"string"}]}""".stripMargin

  private def mergeSql(table: String) =
    s"""MERGE INTO $table AS target
       |    USING (
       |        SELECT invoiceid, itemid, category, price, quantity,
       |               orderdate, destinationstate, shippingtype, referral
       |        FROM (
       |            SELECT *, ROW_NUMBER() OVER (
       |                PARTITION BY invoiceid, itemid
       |                ORDER BY replicadmstimestamp DESC
       |            ) AS row_num
       |            FROM source_table
       |        ) AS deduped_source
       |        WHERE row_num = 1
       |    ) AS source
       |    ON target.invoiceid = source.invoiceid AND target.itemid = source.itemid
       |    WHEN MATCHED THEN UPDATE SET
       |        target.category = source.category,
       |        target.price = source.price,
       |        target.quantity = source.quantity,
       |        target.orderdate = source.orderdate,
       |        target.destinationstate = source.destinationstate,
       |        target.shippingtype = source.shippingtype,
       |        target.referral = source.referral
       |    WHEN NOT MATCHED THEN INSERT (
       |        invoiceid, itemid, category, price, quantity, orderdate,
       |        destinationstate, shippingtype, referral
       |    ) VALUES (
       |        source.invoiceid, source.itemid, source.category, source.price,
       |        source.quantity, source.orderdate, source.destinationstate,
       |        source.shippingtype, source.referral
       |    );""".stripMargin

  test("jsonl reader: good rows parse under the schema, bad lines quarantine verbatim") {
    import org.apache.spark.sql.types.StructType
    import graft.sources.JsonlReader
    import spark.implicits._
    val dir = tmpDir("jsonl")
    Files.write(Paths.get(s"$dir/a.jsonl"),
      ("""{"id": 1, "txt": "hello world"}""" + "\n" +
       """{"id": 2, "txt": "second"}""" + "\n" +
       """{"id": 3, "txt": "trunca""" + "\n" + // truncated object
       "garbage line\n").getBytes(StandardCharsets.UTF_8))
    val schema = new StructType().add("id", "long").add("txt", "string")
    val (good, bad) = JsonlReader.readWithQuarantine(spark, dir, schema)
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "hello world"), (2L, "second")))
    // quarantine preserves the raw line VERBATIM for inspection/replay
    assert(bad.as[String].collect().toSet ==
      Set("""{"id": 3, "txt": "trunca""", "garbage line"))
    // the corrupt column is an internal contract, not a caller schema slot
    intercept[IllegalArgumentException] {
      JsonlReader.readWithQuarantine(spark, dir,
        schema.add(JsonlReader.CorruptCol, "string"))
    }
    ()
  }

  test("MergeSqlRunner parses the reference MERGE shape") {
    val p = MergeSqlRunner.parse(mergeSql("cat.db.orders"))
    assert(p.targetTable == "cat.db.orders")
    assert(p.keys == Seq("invoiceid", "itemid"))
    assert(p.updateSet.keySet.size == 7 && !p.updateSet.contains("invoiceid"))
    assert(p.insertCols.size == 9)
    assert(p.sourceSql.toLowerCase.contains("row_number"))
  }

  test("MergeSqlRunner rejects a partial INSERT column list") {
    // execution inserts full rows, so an INSERT list that names only some
    // columns would silently write unrequested values — must fail loudly
    import org.apache.spark.sql.types._
    val table = graft.table.WarehouseTable(tmpDir("whpartial") + "/t")
    table.create(StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType),
      StructField("c", StringType))))
    spark.range(1).selectExpr("1 AS a", "2 AS b", "'x' AS c")
      .createOrReplaceTempView("source_table")
    val sql =
      """MERGE INTO cat.db.t AS target USING (SELECT * FROM source_table) AS source
        |ON target.a = source.a
        |WHEN MATCHED THEN UPDATE SET target.b = source.b, target.c = source.c
        |WHEN NOT MATCHED THEN INSERT (a, b) VALUES (source.a, source.b);""".stripMargin
    val e = intercept[IllegalArgumentException] {
      MergeSqlRunner.execute(spark, sql, table)
    }
    assert(e.getMessage.contains("INSERT list"))
    spark.catalog.dropTempView("source_table")
  }

  private def setupJob(): (IngestRunner, LocalDirQueue, String) = {
    val land = tmpDir("landing")
    val queueDir = tmpDir("queue")
    val wh = tmpDir("warehouse") + "/orders"
    val schemaPath = tmpDir("cfg") + "/silver.avsc"
    val sqlPath = tmpDir("cfg") + "/merge.sql"
    Files.write(Paths.get(schemaPath), avsc.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(sqlPath),
      mergeSql("whcat.db.orders").getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$land/b1.csv"), batch1.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$land/b2.csv"), batch2.getBytes(StandardCharsets.UTF_8))

    val config = JobConfig.fromJson(
      s"""{
         |  "spark": {},
         |  "input_config": {
         |    "queue_url": "$queueDir", "poll_interval": "1",
         |    "protocol": "file", "type": "sqs", "format": "csv",
         |    "transform_query": "", "commit_checkpoint": true,
         |    "csv_options": {"sep": "\\t", "header": "true", "inferSchema": "true"}
         |  },
         |  "output_config": {
         |    "catalog_name": "whcat", "database": "db", "table_name": "orders",
         |    "type": "unmanaged_iceberg", "mode": "merge",
         |    "schema": "$schemaPath", "merge_query": "$sqlPath",
         |    "table_type": "COW", "compression": "snappy",
         |    "partition": "destinationstate"
         |  }
         |}""".stripMargin)
    val queue = new LocalDirQueue(queueDir)
    val runner = new IngestRunner(spark, config, queue, wh)
    (runner, queue, land)
  }

  test("end-to-end: insert batch then update batch yields golden table") {
    val (runner, queue, land) = setupJob()

    // poll 1: batch1 only
    queue.send("001.json", S3EventParser.eventJson(land, Seq("b1.csv")))
    assert(runner.runOnce() == 1)
    val afterB1 = runner.table.read(spark)
      .select("invoiceid", "itemid", "category").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(afterB1 == Set((101, 1, "books"), (102, 2, "toys"), (103, 3, "games")))

    // poll 2: batch2 (updates 101, 102; includes an intra-batch dup)
    queue.send("002.json", S3EventParser.eventJson(land, Seq("b2.csv")))
    assert(runner.runOnce() == 1)
    val afterB2 = runner.table.read(spark)
      .select("invoiceid", "itemid", "category", "quantity").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3))).toSet
    assert(afterB2 == Set(
      (101, 1, "books##", 2),
      (102, 2, "toys##", 3), // dedup window picked the later row
      (103, 3, "games", 4)))
    assert(queue.pendingCount == 0) // acked after write

    // replay batch2 → table unchanged (at-least-once idempotency)
    queue.send("003.json", S3EventParser.eventJson(land, Seq("b2.csv")))
    assert(runner.runOnce() == 1)
    val afterReplay = runner.table.read(spark)
      .select("invoiceid", "itemid", "category", "quantity").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3))).toSet
    assert(afterReplay == afterB2)

    // declared schema won: price is FloatType despite double inference
    assert(runner.table.read(spark).schema("price").dataType ==
      org.apache.spark.sql.types.FloatType)
  }

  test("failed batch is not acked (redelivery), then succeeds on retry") {
    val (runner, queue, land) = setupJob()
    queue.send("001.json", S3EventParser.eventJson(land, Seq("missing.csv")))
    intercept[Throwable] { runner.runOnce() }
    assert(queue.pendingCount == 1) // abandoned back to the queue

    // make it succeed: rewrite message to an existing file
    queue.receive(10); queue.commit() // drain the poison message
    queue.send("002.json", S3EventParser.eventJson(land, Seq("b1.csv")))
    assert(runner.runOnce() == 1)
    assert(runner.table.read(spark).count() == 3)
  }

  test("unknown write mode raises (read.py:241 ValueError parity)") {
    val (runner0, _, _) = setupJob()
    val bad = JobConfig.fromJson(
      """{"input_config":{"protocol":"file"},
        |"output_config":{"mode":"sideways"}}""".stripMargin)
    val queue = new LocalDirQueue(tmpDir("q2"))
    val land = tmpDir("land2")
    Files.write(Paths.get(s"$land/x.csv"),
      "a\tb\n1\t2\n".getBytes(StandardCharsets.UTF_8))
    queue.send("1.json", S3EventParser.eventJson(land, Seq("x.csv")))
    val runner = new IngestRunner(spark, bad, queue, tmpDir("wh2") + "/t")
    val e = intercept[IllegalArgumentException] { runner.runOnce() }
    assert(e.getMessage.contains("Invalid write mode"))
    runner0.table // touch to avoid unused warning
  }

  test("op-aware CDC mode: I/U/D sequence deletes, updates, inserts, replays") {
    // the reference UPSERTS deletes (read.py ignores the Op column its own
    // sampledata carries); cdc_op_column turns merge mode op-aware
    val land = tmpDir("cdcland")
    val queueDir = tmpDir("cdcqueue")
    val wh = tmpDir("cdcwh") + "/orders"
    val schemaPath = tmpDir("cdccfg") + "/silver.avsc"
    Files.write(Paths.get(schemaPath), avsc.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$land/b1.csv"), batch1.getBytes(StandardCharsets.UTF_8))
    val cdcBatch2 = Seq(
      header,
      // U updates 101; D deletes 102; I inserts 104; D on absent 999 no-ops
      "U\t2025-03-02 09:00:00.000\t101\t1\tbooks##\t11.00\t2\t2025-03-01\tCA\tair\tweb",
      "D\t2025-03-02 09:00:01.000\t102\t2\ttoys\t5.25\t1\t2025-03-01\tNY\tground\tad",
      "I\t2025-03-02 09:00:02.000\t104\t4\tpens\t1.10\t6\t2025-03-02\tWA\tair\tweb",
      "D\t2025-03-02 09:00:03.000\t999\t9\tghost\t0.00\t0\t2025-03-02\tTX\tair\tweb",
      // intra-batch sequence on 103: U first, D later — latest op must win
      "U\t2025-03-02 09:00:04.000\t103\t3\tgames##\t7.50\t4\t2025-03-01\tCA\tair\tweb",
      "D\t2025-03-02 09:00:05.000\t103\t3\tgames##\t7.50\t4\t2025-03-01\tCA\tair\tweb"
    ).mkString("\n")
    Files.write(Paths.get(s"$land/b2.csv"), cdcBatch2.getBytes(StandardCharsets.UTF_8))

    val config = JobConfig.fromJson(
      s"""{
         |  "spark": {},
         |  "input_config": {
         |    "queue_url": "$queueDir", "poll_interval": "1",
         |    "protocol": "file", "type": "sqs", "format": "csv",
         |    "commit_checkpoint": true,
         |    "cdc_op_column": "Op",
         |    "cdc_order_column": "replicadmstimestamp",
         |    "csv_options": {"sep": "\\t", "header": "true", "inferSchema": "true"}
         |  },
         |  "output_config": {
         |    "catalog_name": "whcat", "database": "db", "table_name": "orders",
         |    "type": "unmanaged_iceberg", "mode": "merge",
         |    "schema": "$schemaPath",
         |    "merge_keys": "invoiceid,itemid",
         |    "table_type": "COW", "compression": "snappy",
         |    "partition": "destinationstate"
         |  }
         |}""".stripMargin)
    assert(config.input.cdcOpColumn == "Op")
    assert(config.output.mergeKeys == Seq("invoiceid", "itemid"))
    assert(config.input.cdcDeleteValues == Seq("D"))
    val queue = new LocalDirQueue(queueDir)
    val runner = new IngestRunner(spark, config, queue, wh)

    def state(): Set[(Int, Int, String)] = runner.table.read(spark)
      .select("invoiceid", "itemid", "category").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet

    queue.send("001.json", S3EventParser.eventJson(land, Seq("b1.csv")))
    assert(runner.runOnce() == 1)
    assert(state() == Set((101, 1, "books"), (102, 2, "toys"), (103, 3, "games")))

    queue.send("002.json", S3EventParser.eventJson(land, Seq("b2.csv")))
    assert(runner.runOnce() == 1)
    val expected = Set(
      (101, 1, "books##"), // U updated
      (104, 4, "pens"))    // I inserted; 102 and 103 deleted, 999 no-op
    assert(state() == expected)
    assert(queue.pendingCount == 0)

    // at-least-once replay of the CDC batch is idempotent (incl. deletes of
    // now-absent keys)
    queue.send("003.json", S3EventParser.eventJson(land, Seq("b2.csv")))
    assert(runner.runOnce() == 1)
    assert(state() == expected)
  }

  test("op-aware CDC mode composes with MOR tables (tombstone deltas)") {
    // same I/U/D semantics through the merge-on-read path: the delete
    // lands as an O(batch) tombstone delta, resolved at read time
    val land = tmpDir("cdcmorland")
    val queueDir = tmpDir("cdcmorqueue")
    val wh = tmpDir("cdcmorwh") + "/orders"
    val schemaPath = tmpDir("cdcmorcfg") + "/silver.avsc"
    Files.write(Paths.get(schemaPath), avsc.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$land/b1.csv"), batch1.getBytes(StandardCharsets.UTF_8))
    val b2 = Seq(
      header,
      "U\t2025-03-02 09:00:00.000\t101\t1\tbooks##\t11.00\t2\t2025-03-01\tCA\tair\tweb",
      "D\t2025-03-02 09:00:01.000\t102\t2\ttoys\t5.25\t1\t2025-03-01\tNY\tground\tad"
    ).mkString("\n")
    Files.write(Paths.get(s"$land/b2.csv"), b2.getBytes(StandardCharsets.UTF_8))
    val config = JobConfig.fromJson(
      s"""{
         |  "spark": {},
         |  "input_config": {
         |    "queue_url": "$queueDir", "protocol": "file", "format": "csv",
         |    "commit_checkpoint": true,
         |    "cdc_op_column": "Op",
         |    "cdc_order_column": "replicadmstimestamp",
         |    "csv_options": {"sep": "\\t", "header": "true", "inferSchema": "true"}
         |  },
         |  "output_config": {
         |    "catalog_name": "whcat", "database": "db", "table_name": "orders",
         |    "mode": "merge", "schema": "$schemaPath",
         |    "merge_keys": "invoiceid,itemid",
         |    "table_type": "MOR", "compression": "snappy",
         |    "partition": "destinationstate"
         |  }
         |}""".stripMargin)
    val queue = new LocalDirQueue(queueDir)
    val runner = new IngestRunner(spark, config, queue, wh)
    queue.send("001.json", S3EventParser.eventJson(land, Seq("b1.csv")))
    assert(runner.runOnce() == 1)
    queue.send("002.json", S3EventParser.eventJson(land, Seq("b2.csv")))
    assert(runner.runOnce() == 1)
    val got = runner.table.read(spark)
      .select("invoiceid", "itemid", "category").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set((101, 1, "books##"), (103, 3, "games"))) // 102 deleted
  }

  test("transform_query hook filters the batch before the sink") {
    val (base, _, land) = setupJob()
    val queueDir = tmpDir("q3")
    val wh = tmpDir("wh3") + "/t"
    val cfgJson =
      s"""{
         |  "spark": {},
         |  "input_config": {
         |    "queue_url": "$queueDir", "protocol": "file", "format": "csv",
         |    "transform_query": "SELECT * FROM source_table WHERE destinationstate = 'CA'",
         |    "commit_checkpoint": true,
         |    "csv_options": {"sep": "\\t", "header": "true", "inferSchema": "true"}
         |  },
         |  "output_config": {"mode": "append"}
         |}""".stripMargin
    val queue = new LocalDirQueue(queueDir)
    val runner = new IngestRunner(spark, JobConfig.fromJson(cfgJson), queue, wh)
    queue.send("1.json", S3EventParser.eventJson(land, Seq("b1.csv")))
    assert(runner.runOnce() == 1)
    val states = runner.table.read(spark).select("destinationstate")
      .collect().map(_.getString(0)).toSet
    assert(states == Set("CA"))
    base.table // silence unused
  }
}
