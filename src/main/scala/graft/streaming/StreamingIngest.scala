package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup
import graft.table.WarehouseTable

/** Structured-Streaming face of the ingest engine — the reference's
  * poll-loop semantics (`/root/reference/spark-job/read.py:330-350`)
  * mapped onto Spark's native micro-batch machinery:
  *
  *  - SQS "≤10 messages per poll" → file source with `maxFilesPerTrigger`
  *    (each micro-batch reads a bounded file list, exactly the batch
  *    amalgamation of read.py:253-274);
  *  - ack-after-write at-least-once → the streaming checkpoint: offsets
  *    commit only after the batch function returns, so a crash replays the
  *    batch and the keyed merge absorbs the duplicate (same idempotency
  *    argument as SURVEY.md §2.3);
  *  - dedup-then-merge → `foreachBatch` runs the same [[Dedup]] +
  *    [[WarehouseTable.merge]] used by the batch path — one code path to
  *    test, two trigger mechanisms.
  *
  * Event-time rollups with watermarked late-data handling are provided by
  * [[windowedRollup]] (the streaming twin of q06_hourly_rollup).
  */
object StreamingIngest {

  /** Start a CSV-landing-dir → warehouse merge stream. */
  def start(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      csvOptions: Map[String, String],
      table: WarehouseTable,
      keys: Seq[String],
      orderDesc: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 10,
      tiebreakDesc: Seq[String] = Nil): StreamingQuery = {
    val stream = spark.readStream
      .options(csvOptions)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema)
      .csv(landingDir)
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // the tiebreak keeps checkpoint replays deterministic: a ts tie
          // within a micro-batch must pick the same winner on every attempt
          table.merge(
            batch.sparkSession,
            Dedup.latestByKey(batch, keys, orderDesc, tiebreakDesc),
            keys)
        }
        ()
      }
      .start()
  }

  /** Watermarked tumbling-window aggregation over an event stream —
    * late rows beyond the watermark are dropped, state is bounded (the
    * piece the reference's upsert pattern never needed but a streaming
    * analytics engine must have).
    */
  def windowedRollup(
      events: DataFrame, // must carry an event-time timestamp column `ts`
      windowLength: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
}
