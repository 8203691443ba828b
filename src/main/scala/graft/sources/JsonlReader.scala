package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json, trim}
import org.apache.spark.sql.types.{StringType, StructType}

/** Newline-delimited JSON (JSONL) ingest — the interchange format LLM
  * training corpora actually ship in (one JSON document per line). The
  * reference's format dispatch ([[CsvBatchReader.readAs]],
  * `/root/reference/spark-job/read.py:84-86`) covers schema-clean JSON;
  * this is the production contract on top of it:
  *
  *  - **explicit schema, never inference** — `inferSchema` scans the data
  *    an extra time before the real read (at 100 TB that is a second full
  *    pass), and a schema inferred FROM the data silently drifts with it;
  *  - **corrupt-line quarantine, never silent drops** — a malformed line
  *    (truncated upload, encoding damage, a writer bug) must neither kill
  *    the job (FAILFAST) nor vanish (DROPMALFORMED). PERMISSIVE mode
  *    captures the raw line in a corrupt-record column, and the split
  *    below routes good rows onward and bad raw lines to a quarantine
  *    output for inspection/replay — the tag-don't-drop rule applied to
  *    ingest.
  *
  * Scale shape: one distributed text-file scan; the corrupt test is a
  * per-row predicate on the scan output (both branches share the one
  * scan plan; no shuffle added by the split).
  */
object JsonlReader {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL under an explicit schema, returning `(good, quarantine)`:
    * `good` carries exactly the schema's columns (corrupt column dropped),
    * `quarantine` is `(raw_line)` — the unparsed text of every malformed
    * line, preserved verbatim for inspection/replay.
    */
  def readWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    val raw = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .json(path)
      // Spark refuses plans that reference ONLY the internal corrupt
      // column; materializing the full row set once (cache) is the
      // documented idiom and keeps both branches on one scan
      .cache()
    val good = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, quarantine)
  }

  /** The same parse/quarantine contract over a frame of RAW LINES
    * (`valueCol`) instead of a file path — the streaming-side twin: a
    * text file stream delivers one line per row, and `from_json` applies
    * the identical PERMISSIVE + corrupt-capture semantics per micro-batch
    * (equivalence with [[readWithQuarantine]] on the same files is
    * spec-asserted). Blank lines are skipped, as the JSON file source
    * does.
    */
  def parseLines(
      lines: DataFrame,
      valueCol: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    val parsed = lines
      .filter(trim(col(valueCol)) =!= "")
      .select(
        from_json(col(valueCol), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("r"),
        col(valueCol).as("_raw"))
    val good = parsed.filter(col(s"r.$CorruptCol").isNull)
      .select(schema.fieldNames.map(n => col(s"r.$n").as(n)).toSeq: _*)
    val quarantine = parsed.filter(col(s"r.$CorruptCol").isNotNull)
      .select(col("_raw").as("raw_line"))
    (good, quarantine)
  }
}
