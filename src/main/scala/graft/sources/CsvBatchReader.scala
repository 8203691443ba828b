package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch file scan with per-job CSV options — the reference's `read_csv`
  * (`/root/reference/spark-job/read.py:84-86`, options from
  * `job.json:21-25`: tab separator, header, inferSchema). All files of a
  * poll are read as ONE DataFrame/scan (batch amalgamation,
  * read.py:271-274) — one distributed `FileSourceScanExec` over the whole
  * file list, not a scan per file.
  */
object CsvBatchReader {

  def read(
      spark: SparkSession,
      paths: Seq[String],
      options: Map[String, String]): DataFrame = {
    require(paths.nonEmpty, "empty batch")
    spark.read.options(options).csv(paths: _*)
  }

  /** Format dispatch for `input_config.format` (csv today; parquet/json are
    * free since the scan node is format-agnostic).
    */
  def readAs(
      spark: SparkSession,
      format: String,
      paths: Seq[String],
      options: Map[String, String]): DataFrame = {
    require(paths.nonEmpty, "empty batch")
    format.toLowerCase match {
      case "csv"     => spark.read.options(options).csv(paths: _*)
      case "parquet" => spark.read.options(options).parquet(paths: _*)
      case "json"    => spark.read.options(options).json(paths: _*)
      case other     => throw new IllegalArgumentException(s"unknown input format: $other")
    }
  }
}
