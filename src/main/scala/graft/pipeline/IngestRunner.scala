package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.JobConfig
import graft.operators.Dedup
import graft.plans.MergeSqlRunner
import graft.schema.AvroSchemaConverter
import graft.sources.{CsvBatchReader, QueueSource, S3EventParser}
import graft.table.WarehouseTable

/** The engine main — the reference's poll loop (`/root/reference/spark-job/
  * read.py:330-350`) as a composable runner:
  *
  *   receive ≤10 messages → parse S3 events → read batch (ONE scan) →
  *   [optional transform_query] → create-table-if-absent → write (append /
  *   overwrite / merge) → ack — errors skip the ack so the queue redelivers
  *   (at-least-once; the keyed merge makes replays idempotent).
  *
  * `runOnce` processes a single poll (testable, injected clock-free);
  * `run` loops with the configured poll interval.
  */
final class IngestRunner(
    spark: SparkSession,
    config: JobConfig,
    queue: QueueSource,
    warehousePath: String,
    batchSize: Int = 10) {

  val table = WarehouseTable(warehousePath)

  /** One poll. Returns number of files processed (0 = queue was empty). */
  def runOnce(): Int = {
    val messages = queue.receive(batchSize)
    if (messages.isEmpty) return 0
    try {
      val paths = S3EventParser.parseBatch(messages.map(_.body), config.input.protocol)
      if (paths.nonEmpty) {
        val raw = CsvBatchReader.readAs(
          spark, config.input.format, paths, config.input.csvOptions)
        val df = applyTransform(raw)
        ensureTable(df)
        write(df)
      }
      if (config.input.commitCheckpoint) queue.commit() else queue.abandon()
      paths.size
    } catch {
      case e: Throwable =>
        // read.py:348-350: log + no ack → redelivery after visibility timeout
        queue.abandon()
        throw e
    }
  }

  /** The reference's dead-but-declared `transform_query` hook
    * (`job.json:19`, never read by read.py — SURVEY.md §4.3), implemented:
    * optional SQL over the batch (registered as `source_table`) applied
    * before the sink.
    */
  private def applyTransform(df: DataFrame): DataFrame = {
    val q = config.input.transformQuery
    if (q == null || q.trim.isEmpty) df
    else {
      df.createOrReplaceTempView("source_table")
      val out = spark.sql(q)
      out
    }
  }

  /** Create-if-absent with the declared avsc schema, COW/MOR properties and
    * partition column (read.py:199-228). Falls back to the batch's inferred
    * schema when no avsc is configured.
    */
  private def ensureTable(batch: DataFrame): Unit = {
    if (!table.exists) {
      val schema =
        if (config.output.schemaPath.nonEmpty)
          AvroSchemaConverter.load(config.output.schemaPath)
        else if (config.input.cdcOpColumn.nonEmpty)
          // CDC mode without a declared schema: the op/order columns are
          // merge plumbing, not table columns (the reference's avsc also
          // excludes Op/replicadmstimestamp)
          org.apache.spark.sql.types.StructType(batch.schema.fields.filterNot(
            f => f.name == config.input.cdcOpColumn ||
              f.name == config.input.cdcOrderColumn))
        else batch.schema
      table.create(
        schema,
        config.output.partition,
        WarehouseTable.tableProperties(
          config.output.tableType, config.output.compression))
    }
  }

  private def write(df: DataFrame): Unit = config.output.mode match {
    case "append"    => table.append(df)
    case "overwrite" => table.overwrite(df)
    case "merge" if config.input.cdcOpColumn.nonEmpty => writeCdc(df)
    case "merge" =>
      df.createOrReplaceTempView("source_table") // read.py:176
      val mergeSql = readMergeQuery()
      MergeSqlRunner.execute(spark, mergeSql, table)
      spark.catalog.dropTempView("source_table") // read.py:179
    case other =>
      // read.py:241 raises ValueError on unknown mode
      throw new IllegalArgumentException(s"Invalid write mode: $other")
  }

  /** Op-aware CDC merge (the extension point SURVEY.md §2.2 names — the
    * reference upserts deletes; a real DMS feed needs `Op='D'` to DELETE).
    * The batch is deduped to the latest op per merge key (the same window
    * the reference's merge SQL applies, ordered by `cdc_order_column`),
    * then merged with a DELETE branch: delete-marked matches drop, other
    * matches update, unmarked unmatched rows insert — a delete of an
    * absent key is a no-op, which keeps at-least-once replays idempotent.
    * The op/order columns ride along only as merge-condition inputs; the
    * written rows align to the table schema, which excludes them.
    */
  private def writeCdc(df: DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val opCol = config.input.cdcOpColumn
    val keys = config.output.mergeKeys
    val orderCol = config.input.cdcOrderColumn
    require(keys.nonEmpty, "cdc_op_column requires output_config.merge_keys")
    require(orderCol.nonEmpty, "cdc_op_column requires input_config.cdc_order_column")
    // The op column doubles as the dedup tiebreak: a same-timestamp D/U
    // tie for one key (common at ms-precision DMS feeds) must pick the
    // SAME winner on every at-least-once replay, or replays diverge —
    // without a tiebreak the row_number choice is partition-order luck.
    // 'U' > 'I' > 'D' descending ⇒ a tied upsert beats a tied delete.
    val deduped = Dedup.latestByKey(df, keys,
      orderDesc = orderCol, tiebreakDesc = Seq(opCol))
    table.merge(spark, deduped, keys,
      deleteWhere = Some(col(opCol).isin(config.input.cdcDeleteValues: _*)))
  }

  private def readMergeQuery(): String = {
    val p = config.output.mergeQueryPath
    require(p.nonEmpty, "merge mode requires output_config.merge_query")
    new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The blocking loop (read.py:330-350). `maxPolls` bounds it for tests;
    * pass -1 for run-forever.
    */
  def run(maxPolls: Int = -1): Unit = {
    var polls = 0
    while (maxPolls < 0 || polls < maxPolls) {
      try runOnce()
      catch { case e: Throwable =>
        System.err.println(s"[ingest] batch failed (will redeliver): ${e.getMessage}")
      }
      polls += 1
      if (maxPolls < 0 || polls < maxPolls)
        Thread.sleep(config.input.pollInterval * 1000L)
    }
  }
}
