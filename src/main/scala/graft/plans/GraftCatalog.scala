package graft.plans

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, PrunedFilteredScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.WarehouseTable

/** DataSource-V2 catalog over the graft warehouse — the fidelity layer
  * that lets plain SQL address warehouse tables exactly like the
  * reference addresses its Iceberg catalog (`job.json:6-10`):
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.plans.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *
  *   CREATE TABLE graft.db.orders (...) PARTITIONED BY (state)
  *   INSERT INTO graft.db.orders SELECT ...
  *   SELECT * FROM graft.db.orders
  * }}}
  *
  * Reads and writes bridge to the engine's [[WarehouseTable]] through the
  * public V1Scan/V1Write adapters (the same mechanism Spark's own JDBC
  * source uses): the scan hands Catalyst an RDD of the requested snapshot —
  * snapshot isolation and MOR arbitration come from `WarehouseTable.read`
  * — with negotiated column pruning and filter pushdown, and inserts map
  * to append/overwrite commits. `SELECT ... VERSION AS OF n` time-travels
  * to snapshot n. `MERGE INTO` plans natively via [[GraftMergeStrategy]];
  * the literal reference file also runs through [[MergeSqlRunner]].
  */
object GraftCatalog {
  /** Session conf that turns `INSERT INTO graft.db.t` into a STAGED
    * (write-audit-publish) snapshot under the given WAP id — the graft
    * spelling of Iceberg's `spark.wap.id`. Unset or empty = normal
    * publishing inserts.
    */
  val WapIdConf = "spark.graft.wap.id"

  /** Metadata-table suffixes served by `loadTable` when the path names no
    * real table but its parent is one (`SELECT * FROM graft.db.t.files`).
    */
  val MetaTables: Set[String] =
    Set("partitions", "snapshots", "files", "tags", "staged", "stats")
}

class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option 'warehouse'"))
  }

  override def name(): String = catalogName

  private def tablePath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$warehouse/", "/", "")

  private def warehouseTable(ident: Identifier): WarehouseTable =
    WarehouseTable(tablePath(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = java.nio.file.Paths.get(
      (warehouse +: namespace).mkString("/"))
    if (!java.nio.file.Files.isDirectory(dir)) Array.empty
    else {
      val listing = java.nio.file.Files.list(dir)
      try listing.iterator().asScala
        .filter(p => java.nio.file.Files.exists(p.resolve("_meta.json")))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
      finally listing.close()
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val wt = warehouseTable(ident)
    if (!wt.exists) {
      // METADATA TABLES — Iceberg's `SELECT * FROM db.t.partitions`
      // shape: the suffix resolves as one extra namespace level, so when
      // no real table owns the path and the parent IS a table, serve the
      // parent's metadata relation. An EXISTING real table at the path
      // always wins (checked first above); consequently the suffixes are
      // RESERVED names under a table — `CREATE TABLE db.t.partitions`
      // refuses while `db.t` is a table (Spark's existence check sees the
      // metadata relation), exactly Iceberg's reserved-name contract.
      if (ident.namespace().nonEmpty &&
          GraftCatalog.MetaTables.contains(ident.name())) {
        val parent = WarehouseTable(
          ident.namespace().mkString(s"$warehouse/", "/", ""))
        if (parent.exists) {
          // schema answered from constants; the frame itself builds
          // LAZILY at scan time — loadTable runs repeatedly during
          // analysis (and for bare existence checks), and `.files`
          // opens every parquet footer of the snapshot
          val (schema, mk): (StructType, org.apache.spark.sql.SparkSession => DataFrame) =
            ident.name() match {
              case "partitions" =>
                (WarehouseTable.PartitionsMetaSchema, parent.partitionsMeta(_))
              case "snapshots" =>
                (WarehouseTable.SnapshotsMetaSchema, parent.snapshotsMeta(_))
              case "files" =>
                (WarehouseTable.FilesMetaSchema, parent.filesMeta(_))
              case "tags" =>
                (WarehouseTable.TagsMetaSchema, parent.tagsMeta(_))
              case "staged" =>
                (WarehouseTable.StagedMetaSchema, parent.stagedMeta(_))
              case "stats" =>
                (WarehouseTable.StatsMetaSchema, parent.statsMeta(_))
            }
          return new GraftMetaTable(ident.toString, schema, mk)
        }
      }
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace().toSeq :+ ident.name())
    }
    new GraftDsv2Table(ident.toString, wt)
  }

  /** Time travel — `SELECT ... FROM graft.db.t VERSION AS OF <snapshotId>`.
    * Snapshots are immutable, so a pinned table is just a scan of an older
    * manifest; writes against a pinned table are rejected by Spark itself
    * (time-travel relations are read-only).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val wt = warehouseTable(ident)
    if (!wt.exists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace().toSeq :+ ident.name())
    val snap = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft snapshot versions are numeric snapshot ids, got '$version'")
    }
    new GraftDsv2Table(s"$ident@v$snap", wt, Some(snap))
  }

  /** Time travel — `... TIMESTAMP AS OF <ts>` (Spark hands micros). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val wt = warehouseTable(ident)
    if (!wt.exists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace().toSeq :+ ident.name())
    val snap = wt.snapshotAt(timestamp / 1000).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of $ident at or before timestamp $timestamp"))
    new GraftDsv2Table(s"$ident@t$snap", wt, Some(snap))
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val partitionCols = partitions.toSeq.map { t =>
      require(t.name() == "identity",
        s"only identity partitioning is supported, got ${t.describe()}")
      t.references().head.fieldNames().mkString(".")
    }
    require(partitionCols.size <= 1,
      "warehouse tables support at most one partition column")
    val wt = warehouseTable(ident)
    wt.create(schema, partitionCols.headOption, properties.asScala.toMap)
    new GraftDsv2Table(ident.toString, wt)
  }

  /** ALTER TABLE: ADD COLUMN (metadata-only schema evolution — old files
    * surface NULL for the new column), RENAME COLUMN / DROP COLUMN
    * (metadata-only via prior-physical-name coalesce / schema shrink,
    * with the identity-column and retired-name guards enforced in
    * [[graft.table.WarehouseTable]]), ALTER COLUMN TYPE (widening), and
    * SET/UNSET TBLPROPERTIES.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val wt = warehouseTable(ident)
    if (!wt.exists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace().toSeq :+ ident.name())
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "only top-level ADD COLUMN is supported")
        wt.addColumn(add.fieldNames.head, add.dataType)
      case set: TableChange.SetProperty =>
        wt.setProperties(Map(set.property -> set.value))
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames.length == 1,
          "only top-level ALTER COLUMN TYPE is supported")
        wt.widenColumn(upd.fieldNames.head, upd.newDataType)
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames.length == 1,
          "only top-level RENAME COLUMN is supported")
        wt.renameColumn(rn.fieldNames.head, rn.newName)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          "only top-level DROP COLUMN is supported")
        wt.dropColumn(del.fieldNames.head)
      case other =>
        throw new UnsupportedOperationException(
          s"unsupported ALTER TABLE change: $other")
    }
    new GraftDsv2Table(ident.toString, wt)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val wt = warehouseTable(ident)
    if (wt.exists) { wt.drop(); true } else false
  }

  // ---- stored procedures (CALL graft.system.<proc>(...)) ------------------
  //
  // The maintenance surface Iceberg ships as Spark procedures, re-owned:
  // snapshot rollback, expiry, orphan GC, compaction, and WAP publish all
  // addressable from PLAIN SQL — `CALL graft.system.rollback('db.t', 3)` —
  // so an operations runbook needs no JVM code. Each returns a one-row
  // summary through a LocalScan (driver-side literal; the answer is one
  // number, shipping it through executors would cost more than computing
  // it).

  /** Resolve a procedure's 'db.tbl' string argument against this
    * catalog's warehouse; fails loudly on a missing table.
    */
  private def resolveTable(qualified: String): WarehouseTable = {
    val wt = WarehouseTable(s"$warehouse/${qualified.replace('.', '/')}")
    require(wt.exists, s"no warehouse table '$qualified' under $warehouse")
    wt
  }

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got $ident")
    GraftProcedures.load(ident.name(), resolveTable)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(Identifier.of(Array("system"), _))

  /** RENAME TABLE: a directory move — snapshots/manifests/data all use
    * table-relative paths, so the layout is position-independent.
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = warehouseTable(oldIdent)
    if (!from.exists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        oldIdent.namespace().toSeq :+ oldIdent.name())
    val toPath = java.nio.file.Paths.get(tablePath(newIdent))
    require(!WarehouseTable(toPath.toString).exists,
      s"table $newIdent already exists")
    java.nio.file.Files.createDirectories(toPath.getParent)
    java.nio.file.Files.move(java.nio.file.Paths.get(tablePath(oldIdent)), toPath)
  }
}

/** One warehouse table exposed through the DSv2 Table interface;
  * `pinnedSnapshot` fixes reads to one snapshot id (time travel).
  */
final class GraftDsv2Table(
    ident: String, wt: WarehouseTable, pinnedSnapshot: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite {

  /** The engine table behind this DSv2 facade (used by the MERGE planner
    * strategy to run the join-rewrite against the real warehouse).
    */
  def warehouse: WarehouseTable = wt

  // snapshot the metadata once: the analyzer calls schema()/partitioning()
  // repeatedly while resolving a single query, and each WarehouseTable
  // accessor re-reads _meta.json from disk
  private val cachedSchema: StructType = wt.schema
  private val cachedPartitioning: Array[Transform] =
    wt.partitionColumn.map(p => Expressions.identity(p)).toArray
  private val cachedProperties: util.Map[String, String] = wt.properties.asJava

  override def name(): String = ident
  override def schema(): StructType = cachedSchema

  override def partitioning(): Array[Transform] = cachedPartitioning

  override def properties(): util.Map[String, String] = cachedProperties

  // AUTOMATIC_SCHEMA_EVOLUTION opts into the analyzer's
  // ResolveMergeIntoSchemaEvolution: `MERGE WITH SCHEMA EVOLUTION INTO`
  // computes the source-minus-target column diff and applies it through
  // `alterTable(AddColumn)` (metadata-only here) before planning — the
  // same implicit widening Iceberg performs for the reference pipeline's
  // new-column batches (SURVEY.md §1.2).
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** Scan builder with column pruning + filter pushdown (the JDBC-source
    * pattern: pushdown negotiated at the DSv2 layer, executed by the V1
    * relation). Filters we can translate back to Columns are accepted and
    * applied EXACTLY inside the inner DataFrame plan — where Catalyst
    * additionally pushes them into the parquet scan for row-group skipping
    * — and equality/IN filters on the partition column prune manifest
    * entries before Spark ever lists a file. Untranslatable filters are
    * declined and Spark re-evaluates them post-scan.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      private var required: StructType = cachedSchema
      private var pushed: Array[Filter] = Array.empty

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (ok, no) = filters.partition(GraftV1Relation.translate(_).isDefined)
        pushed = ok
        no
      }
      override def pushedFilters(): Array[Filter] = pushed

      override def build(): Scan = new V1Scan with SupportsReportStatistics {
        private val schema = required
        private val filters = pushed
        override def readSchema(): StructType = schema
        override def toV1TableScan[T <: BaseRelation with sources.TableScan](
            context: SQLContext): T =
          new GraftV1Relation(context, wt, schema, filters, pinnedSnapshot)
            .asInstanceOf[T]
        // Real size from the snapshot manifest's data files: without it a
        // DSv2 scan reports defaultSizeInBytes (≈ Long.Max) and catalog
        // SQL joins against a small warehouse table never auto-broadcast.
        // Manifest-bounded stat walk, computed once per planned scan.
        override def estimateStatistics(): Statistics = new Statistics {
          private val bytes: java.util.OptionalLong =
            try java.util.OptionalLong.of(
              math.max(1L, wt.sizeInBytes(pinnedSnapshot)))
            catch { case _: Exception => java.util.OptionalLong.empty() }
          override def sizeInBytes(): java.util.OptionalLong = bytes
          override def numRows(): java.util.OptionalLong =
            java.util.OptionalLong.empty()
        }
        override def description(): String =
          s"GraftWarehouseScan(${wt.root}, " +
            s"cols=${schema.fieldNames.mkString(",")}, " +
            s"filters=${filters.mkString(",")})"
      }
    }

  /** Write path. When the session conf `spark.graft.wap.id` is set
    * (Iceberg's `spark.wap.id` shape), an `INSERT INTO` STAGES its
    * snapshot under that WAP id instead of publishing — readers never see
    * it until `CALL graft.system.publish_changes(tbl, wap_id)` — which is
    * the whole write-audit-publish lifecycle from plain SQL. Only
    * append-shaped writes stage; an INSERT OVERWRITE under a WAP id
    * refuses loudly (its destructive half can't be deferred by an
    * append-shaped stage) rather than silently publishing.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit = {
              val wap = data.sparkSession.conf
                .get(GraftCatalog.WapIdConf, "").trim
              if (wap.nonEmpty) {
                require(!(overwrite || overwriteFlag),
                  s"INSERT OVERWRITE cannot stage under ${GraftCatalog.WapIdConf}" +
                    s"='$wap' — WAP staging is append-shaped; unset the conf " +
                    "to overwrite directly, or express the change as " +
                    "DELETE + staged INSERT")
                wt.stageAppend(data, Some(wap))
              }
              else if (overwrite || overwriteFlag) wt.overwrite(data)
              else wt.append(data)
            }
          }
      }
    }
}

/** Read-only DSv2 facade over a driver-computed metadata frame
  * (`graft.db.t.partitions` / `.snapshots` / `.files` / `.tags` /
  * `.staged`): the answer is manifest/footer-sized by construction. The
  * schema is a constant and the frame builds LAZILY at scan time —
  * loadTable may run several times per statement (and for bare
  * existence checks) without paying the metadata walk. Column pruning
  * only; no writes, no filters pushed (nothing to prune into).
  */
final class GraftMetaTable(
    ident: String, metaSchema: StructType, mk: org.apache.spark.sql.SparkSession => DataFrame)
    extends Table with SupportsRead {
  override def name(): String = ident
  override def schema(): StructType = metaSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = metaSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new V1Scan {
        private val want = required
        override def readSchema(): StructType = want
        override def toV1TableScan[T <: BaseRelation with sources.TableScan](
            context: SQLContext): T =
          new BaseRelation with sources.TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = want
            override def buildScan(): RDD[Row] =
              mk(context.sparkSession)
                .select(want.fieldNames.toIndexedSeq.map(col): _*).rdd
          }.asInstanceOf[T]
      }
    }
}

final class GraftV1Relation(
    ctx: SQLContext,
    wt: WarehouseTable,
    required: StructType,
    filters: Array[Filter],
    asOf: Option[Long] = None)
    extends BaseRelation with sources.TableScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = required

  /** Real table statistics from the snapshot manifest's data files —
    * without this override, `BaseRelation` reports
    * `spark.sql.defaultSizeInBytes` (≈ Long.Max) and a catalog-SQL join
    * against even a tiny warehouse table can never auto-broadcast: every
    * `spark.sql("... JOIN graft.db.t ...")` would plan a shuffle join.
    * Parquet bytes UNDERSTATE in-memory row size, so joins near the
    * `autoBroadcastJoinThreshold` boundary still broadcast conservatively
    * compressed data — the same bias FileSourceScanExec's own
    * `sizeInBytes` carries, corrected at runtime by AQE.
    */
  override lazy val sizeInBytes: Long =
    try math.max(1L, wt.sizeInBytes(asOf))
    catch { case _: Exception => super.sizeInBytes }

  override def buildScan(): RDD[Row] = {
    val spark = ctx.sparkSession
    // manifest-level partition pruning from conjunctive partition filters,
    // plus file-stats dir pruning from the remaining pushed filters
    val parts = wt.partitionColumn.flatMap(p => partitionValues(p, filters))
    val base = wt.read(spark, parts, filters.toSeq, asOf)
    val filtered = filters.flatMap(GraftV1Relation.translate)
      .foldLeft(base)((df, c) => df.filter(c))
    // prune AFTER the snapshot read: MOR key arbitration needs its merge
    // keys internally; Catalyst pushes this projection into the parquet
    // ReadSchema anyway
    filtered.select(required.fieldNames.toIndexedSeq.map(col): _*).rdd
  }

  /** Partition values implied by the pushed filters (None = no constraint).
    * Filters arrive conjunctive, so any single equality/IN on the
    * partition column bounds the scan.
    */
  private def partitionValues(p: String, fs: Array[Filter]): Option[Seq[Any]] =
    fs.collectFirst {
      case sources.EqualTo(`p`, v) => Seq(v)
      case sources.EqualNullSafe(`p`, v) if v != null => Seq(v)
      case sources.In(`p`, vs) if !vs.contains(null) => vs.toSeq
    }
}

/** The maintenance procedures behind `CALL graft.system.<name>(...)`.
  * Each is one [[graft.table.WarehouseTable]] operation plus a one-row
  * summary; argument 0 is always the 'db.tbl' string resolved against the
  * owning catalog's warehouse.
  */
object GraftProcedures {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}

  val names: Array[String] = Array(
    "rollback", "expire_snapshots", "remove_orphan_files", "compact",
    "compact_if_degraded",
    "publish_staged", "discard_staged",
    "staged_changes", "publish_changes", "discard_changes",
    "evolve_partition", "rewrite_to_current_spec",
    "cluster", "cluster_zorder")

  private def param(n: String, t: DataType) = ProcedureParameter.in(n, t).build()

  /** One-row (name BIGINT) result via LocalScan — a driver-side literal. */
  private def summary(name: String, value: Long): java.util.Iterator[Scan] = {
    val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(Array[Any](value)))
      override def readSchema(): StructType =
        new StructType().add(name, LongType, nullable = false)
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  private def proc(
      procName: String,
      params: Seq[ProcedureParameter],
      run: InternalRow => java.util.Iterator[Scan]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft.system.$procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft.system.$procName"
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            run(input)
        }
    }

  def load(
      name: String,
      resolve: String => WarehouseTable): UnboundProcedure = {
    def tbl(in: InternalRow) = resolve(in.getUTF8String(0).toString)
    name match {
      case "rollback" => proc(name,
        Seq(param("table", StringType), param("snapshot_id", LongType)),
        { in => val t = tbl(in); t.rollback(in.getLong(1))
          summary("current_snapshot", t.currentSnapshotId) })
      case "expire_snapshots" => proc(name,
        Seq(param("table", StringType), param("keep_last", LongType)),
        { in => val t = tbl(in); t.expireSnapshots(in.getLong(1).toInt)
          summary("current_snapshot", t.currentSnapshotId) })
      case "remove_orphan_files" => proc(name,
        Seq(param("table", StringType), param("older_than_ms", LongType)),
        { in => val t = tbl(in)
          summary("removed", t.removeOrphanFiles(in.getLong(1)).toLong) })
      case "compact" => proc(name,
        Seq(param("table", StringType)),
        { in => val t = tbl(in)
          t.compact(org.apache.spark.sql.SparkSession.active)
          summary("current_snapshot", t.currentSnapshotId) })
      // the `.stats` MOR-overlay dial (q186) closed into a maintenance
      // verb: fold ONLY partitions whose delta locality or pending
      // erasures degraded past the thresholds — untouched partitions
      // stay untouched (see WarehouseTable.compactIfDegraded)
      case "compact_if_degraded" => proc(name,
        Seq(param("table", StringType), param("overlap_threshold", DoubleType),
          param("erasure_threshold", LongType)),
        { in => val t = tbl(in)
          val folded = t.compactIfDegraded(
            org.apache.spark.sql.SparkSession.active,
            in.getDouble(1), in.getLong(2))
          summary("compacted_partitions", folded.size.toLong) })
      case "publish_staged" => proc(name,
        Seq(param("table", StringType), param("snapshot_id", LongType)),
        { in => val t = tbl(in); t.publishStaged(in.getLong(1))
          summary("current_snapshot", t.currentSnapshotId) })
      case "discard_staged" => proc(name,
        Seq(param("table", StringType), param("snapshot_id", LongType)),
        { in => val t = tbl(in); t.discardStaged(in.getLong(1))
          summary("current_snapshot", t.currentSnapshotId) })
      // The WAP-id trio: a SQL session that staged an INSERT through
      // `spark.graft.wap.id` audits and resolves by the STRING it chose —
      // it never saw a numeric snapshot id. `staged_changes` returns the
      // id (for `VERSION AS OF` audit reads), the other two finish the
      // lifecycle. All three refuse loudly on an unknown id.
      case "staged_changes" => proc(name,
        Seq(param("table", StringType), param("wap_id", StringType)),
        { in => val t = tbl(in)
          val w = in.getUTF8String(1).toString
          summary("snapshot_id", t.stagedSnapshotFor(w).getOrElse(
            throw new IllegalArgumentException(
              s"no live staged snapshot carries WAP id '$w' — " +
                "stage one with the spark.graft.wap.id session conf, " +
                "or it was already published/discarded"))) })
      case "publish_changes" => proc(name,
        Seq(param("table", StringType), param("wap_id", StringType)),
        { in => val t = tbl(in)
          val w = in.getUTF8String(1).toString
          t.publishStaged(t.stagedSnapshotFor(w).getOrElse(
            throw new IllegalArgumentException(
              s"no live staged snapshot carries WAP id '$w' — nothing to publish")))
          summary("current_snapshot", t.currentSnapshotId) })
      // discard also resolves DEAD stages (shadowed by a commit, or on a
      // rolled-back timeline): discarding one is always safe, and a SQL
      // session holds only the WAP id — without this it could never free
      // its own dead stage's bytes before GC's grace window
      case "discard_changes" => proc(name,
        Seq(param("table", StringType), param("wap_id", StringType)),
        { in => val t = tbl(in)
          val w = in.getUTF8String(1).toString
          // dead stages mirror the live resolver's ambiguity contract:
          // two dead stages under one (re-used) WAP id means "which one"
          // is a caller decision — discarding an arbitrary match would
          // hide that the other still pins its json until GC
          val sid = t.stagedSnapshotFor(w).getOrElse {
            t.deadStagedSnapshots.filter(t.stagedWapId(_).contains(w)) match {
              case Seq() => throw new IllegalArgumentException(
                s"no staged snapshot (live or dead) carries WAP id '$w' — " +
                  "already published or discarded")
              case Seq(one) => one
              case many => throw new IllegalStateException(
                s"WAP id '$w' names ${many.size} dead staged snapshots " +
                  s"(${many.mkString(", ")}) — discard them by numeric id " +
                  "(discard_staged) or let remove_orphan_files sweep them")
            }
          }
          t.discardStaged(sid)
          summary("current_snapshot", t.currentSnapshotId) })
      // Spec evolution from SQL (Iceberg spells this ALTER TABLE ... ADD
      // PARTITION FIELD via parser extensions; a procedure needs none):
      // metadata-only re-spec, then the pay-once physical migration.
      case "evolve_partition" => proc(name,
        Seq(param("table", StringType), param("column", StringType)),
        { in => val t = tbl(in)
          t.evolvePartition(in.getUTF8String(1).toString)
          summary("current_snapshot", t.currentSnapshotId) })
      case "rewrite_to_current_spec" => proc(name,
        Seq(param("table", StringType)),
        { in => val t = tbl(in)
          t.rewriteToCurrentSpec(org.apache.spark.sql.SparkSession.active)
          summary("current_snapshot", t.currentSnapshotId) })
      // Layout maintenance from SQL — Iceberg's rewrite_data_files with a
      // sort/zorder spec: range-cluster the base on one column, or
      // z-order it on a comma-separated list so range predicates on ANY
      // clustered column prune dirs by min/max stats.
      case "cluster" => proc(name,
        Seq(param("table", StringType), param("column", StringType),
          param("buckets", LongType)),
        { in => val t = tbl(in)
          t.clusterBase(org.apache.spark.sql.SparkSession.active,
            in.getUTF8String(1).toString, in.getLong(2).toInt)
          summary("current_snapshot", t.currentSnapshotId) })
      case "cluster_zorder" => proc(name,
        Seq(param("table", StringType), param("columns", StringType),
          param("buckets", LongType)),
        { in => val t = tbl(in)
          t.clusterBaseZ(org.apache.spark.sql.SparkSession.active,
            in.getUTF8String(1).toString.split(",").map(_.trim).toSeq,
            nBuckets = in.getLong(2).toInt)
          summary("current_snapshot", t.currentSnapshotId) })
      case other =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Seq("system", other)) // closest loud analysis-time error
    }
  }
}

object GraftV1Relation {
  import org.apache.spark.sql.functions.{lit, not}

  /** sources.Filter → Column, for the translatable subset (None ⇒ the
    * filter is declined and Spark evaluates it post-scan).
    */
  def translate(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case sources.Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case sources.Not(c) => translate(c).map(not)
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
