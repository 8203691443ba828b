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
  * Scale shape: plain text scans + a per-row `from_json`; the corrupt
  * test is a map-side predicate, so neither branch adds a shuffle.
  * Each consumed branch re-scans its lines rather than pinning the
  * parsed frame in storage memory — a text scan is cheap, a cached
  * 100 TB parse is not (and a leaked one never unpins).
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
    // Composed over [[parseLines]] (text scan + from_json) rather than
    // the JSON file source: the file source's internal corrupt column
    // can't be referenced alone without caching the whole parsed frame —
    // a storage-memory leak for long-lived sessions — while text +
    // from_json gives both branches ordinary uncached scans. JSONL is
    // line-delimited by contract, so a text scan sees exactly the
    // records the JSON source would (blank lines skipped both ways);
    // equivalence with the file-source semantics is spec-asserted.
    parseLines(spark.read.text(path), "value", schema)
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
