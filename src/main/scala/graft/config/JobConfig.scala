package graft.config

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Job configuration, mirroring the reference's `job.json` surface
  * (`/root/reference/spark-job/job.json:1-39`): a `spark` conf map, an
  * `input_config` (queue + CSV options) and an `output_config` (target
  * table + write mode). Field names are kept identical so a reference
  * user's config ports unchanged; cloud-only fields (`protocol`,
  * `queue_url`) are honored by the pluggable queue/scheme seams.
  */
final case class CsvOptions(options: Map[String, String])

final case class InputConfig(
    queueUrl: String,
    pollInterval: Int,
    protocol: String,
    inputType: String,
    format: String,
    transformQuery: String,
    commitCheckpoint: Boolean,
    csvOptions: Map[String, String],
    // ---- CDC op-code extension (SURVEY.md §2.2 extension point) ---------
    // The reference IGNORES the DMS `Op` column (deletes get upserted —
    // read.py treats every row as an upsert; sampledata col 1 carries
    // I/U/D). When `cdc_op_column` names that column, merge mode becomes
    // op-aware: the batch is deduped to the LATEST op per merge key
    // (ordered by `cdc_order_column`) and rows whose op is in
    // `cdc_delete_values` (default ["D"]) DELETE their target row instead
    // of upserting — a delete-of-absent-key is a no-op, so replays stay
    // idempotent.
    cdcOpColumn: String = "",
    cdcOrderColumn: String = "",
    cdcDeleteValues: Seq[String] = Seq("D"))

final case class OutputConfig(
    catalogName: String,
    database: String,
    tableName: String,
    outputType: String,
    mode: String,
    schemaPath: String,
    mergeQueryPath: String,
    tableType: String, // COW | MOR (read.py:208-216 semantics)
    compression: String,
    partition: Option[String],
    // merge keys for the op-aware CDC mode (normally the keys live in the
    // merge SQL's ON clause; op-aware mode has no merge SQL to parse)
    mergeKeys: Seq[String] = Nil) {
  def fqTableName: String = s"$catalogName.$database.$tableName"
}

final case class JobConfig(
    spark: Map[String, String],
    input: InputConfig,
    output: OutputConfig)

object JobConfig {
  private implicit val formats: Formats = DefaultFormats

  /** Parse a job.json string. Unknown keys are ignored; missing optional
    * keys get the reference's defaults (`poll_interval` default 120 —
    * read.py:319).
    */
  def fromJson(json: String): JobConfig = {
    val root = JsonMethods.parse(json)

    def str(v: JValue, key: String, default: String = ""): String =
      (v \ key) match {
        case JString(s) => s
        case JInt(i)    => i.toString
        case JBool(b)   => b.toString
        case _          => default
      }

    val sparkConf = (root \ "spark") match {
      case JObject(fields) =>
        fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }

    val in = root \ "input_config"
    val csvOpts = (in \ "csv_options") match {
      case JObject(fields) =>
        fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    val input = InputConfig(
      queueUrl = str(in, "queue_url"),
      pollInterval = str(in, "poll_interval", "120").toInt,
      protocol = str(in, "protocol", "file"),
      inputType = str(in, "type", "sqs"),
      format = str(in, "format", "csv"),
      transformQuery = str(in, "transform_query"),
      commitCheckpoint = (in \ "commit_checkpoint") match {
        case JBool(b) => b
        case _        => true
      },
      csvOptions = csvOpts,
      cdcOpColumn = str(in, "cdc_op_column"),
      cdcOrderColumn = str(in, "cdc_order_column"),
      cdcDeleteValues = (in \ "cdc_delete_values") match {
        case JArray(vs) => vs.collect { case JString(v) => v }
        case JString(s) if s.nonEmpty => s.split(",").toSeq.map(_.trim)
        case _ => Seq("D")
      })

    val out = root \ "output_config"
    val output = OutputConfig(
      catalogName = str(out, "catalog_name"),
      database = str(out, "database"),
      tableName = str(out, "table_name"),
      outputType = str(out, "type", "unmanaged_iceberg"),
      mode = str(out, "mode", "merge"),
      schemaPath = str(out, "schema"),
      mergeQueryPath = str(out, "merge_query"),
      tableType = str(out, "table_type", "COW"),
      compression = str(out, "compression", "zstd"),
      partition = (out \ "partition") match {
        case JString(p) if p.nonEmpty => Some(p)
        case _                        => None
      },
      mergeKeys = str(out, "merge_keys").split(",").toSeq
        .map(_.trim).filter(_.nonEmpty))

    JobConfig(sparkConf, input, output)
  }

  /** Load from a local path (the reference also supports s3:// paths —
    * read.py:283-296; the scheme seam is this function).
    */
  def load(path: String): JobConfig =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
