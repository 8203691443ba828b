package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.table.WarehouseTable

/** Executes the reference's literal merge-SQL file
  * (`/root/reference/spark-job/mergeSQL.sql`) against a [[WarehouseTable]]
  * without Iceberg: the statement is parsed into its components (target,
  * source subquery, ON keys, UPDATE SET list, INSERT list), the subquery is
  * planned by Catalyst via `spark.sql` (so the window dedup inside it gets
  * the built-in `WindowGroupLimit` optimization), and the merge itself is
  * the join-rewrite in [[graft.operators.MergeInto]].
  *
  * Supported statement shape (the reference's, and Iceberg's common case):
  * {{{
  * MERGE INTO <table> AS <t> USING ( <subquery> ) AS <s>
  * ON <t>.<k1> = <s>.<k1> [AND ...]
  * WHEN MATCHED THEN UPDATE SET <t>.<c> = <s>.<c>, ...
  * WHEN NOT MATCHED THEN INSERT (<cols>) VALUES (<s>.<cols>)
  * }}}
  */
object MergeSqlRunner {

  final case class ParsedMerge(
      targetTable: String,
      targetAlias: String,
      sourceSql: String,
      sourceAlias: String,
      keys: Seq[String],
      updateSet: Map[String, String], // target col -> source col
      insertCols: Seq[String])

  private val MergePattern =
    (raw"(?is)\s*MERGE\s+INTO\s+([\w.]+)\s+AS\s+(\w+)\s+USING\s*\((.*)\)\s*AS\s+(\w+)\s*" +
      raw"ON\s+(.*?)\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*?)\s*" +
      raw"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*\((.*?)\)\s*VALUES\s*\((.*?)\)\s*;?\s*").r

  def parse(sql: String): ParsedMerge = sql match {
    case MergePattern(table, tAlias, sub, sAlias, on, set, insCols, _) =>
      val keys = on.split("(?i)\\s+AND\\s+").toSeq.map { clause =>
        val sides = clause.split("=").map(_.trim)
        require(sides.length == 2, s"unsupported ON clause: $clause")
        val tSide = sides.find(_.toLowerCase.startsWith(s"${tAlias.toLowerCase}."))
          .getOrElse(throw new IllegalArgumentException(s"no target side in: $clause"))
        tSide.substring(tSide.indexOf('.') + 1)
      }
      val updates = set.split(",").toSeq.map { a =>
        val Array(l, r) = a.split("=").map(_.trim)
        stripAlias(l, tAlias) -> stripAlias(r, sAlias)
      }.toMap
      val cols = insCols.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      ParsedMerge(table, tAlias, sub.trim, sAlias, keys, updates, cols)
    case _ =>
      throw new IllegalArgumentException(
        "unsupported MERGE statement shape (see MergeSqlRunner scaladoc)")
  }

  private def stripAlias(expr: String, alias: String): String =
    if (expr.toLowerCase.startsWith(s"${alias.toLowerCase}."))
      expr.substring(expr.indexOf('.') + 1)
    else expr

  /** Plan the source subquery (against whatever temp views are registered —
    * the pipeline registers the batch as `source_table`, read.py:176).
    */
  def planSource(spark: SparkSession, parsed: ParsedMerge): DataFrame =
    spark.sql(parsed.sourceSql)

  /** Full execution against a warehouse table (the engine's
    * `execute_merge`, read.py:173-180). A SET list covering every non-key
    * column runs as the fast whole-row upsert; a partial SET list runs the
    * per-column arbitration so non-listed target columns survive on
    * matched rows.
    */
  def execute(spark: SparkSession, sql: String, table: WarehouseTable): Unit = {
    val parsed = parse(sql)
    // only same-name assignments are supported (target.c = source.c) — a
    // renaming SET would silently write the wrong column otherwise
    parsed.updateSet.foreach { case (tCol, sCol) =>
      require(tCol == sCol,
        s"unsupported MERGE assignment: $tCol = $sCol (columns must match)")
    }
    // the executor always inserts full rows (upsertAll/upsertColumns), so a
    // MERGE whose INSERT list names only a subset of columns would silently
    // write values the statement did not ask for — reject it until partial
    // INSERT lists are actually supported
    val declared = parsed.insertCols.map(_.toLowerCase).toSet
    val missing = table.schema.fieldNames.filterNot(c => declared(c.toLowerCase))
    require(missing.isEmpty,
      s"unsupported MERGE INSERT list: missing columns ${missing.mkString(", ")} " +
        "(inserts write full rows; the INSERT list must cover the table schema)")
    val source = planSource(spark, parsed)
    val nonKeys = table.schema.fieldNames.filterNot(parsed.keys.contains)
    val partial = nonKeys.exists(c => !parsed.updateSet.contains(c))
    table.merge(spark, source, parsed.keys,
      if (partial) Some(parsed.updateSet.keys.toSeq) else None)
  }
}
