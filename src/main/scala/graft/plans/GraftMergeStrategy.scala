package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.operators.MergeInto
import graft.operators.MergeInto.{DeleteClause, InsertClause, MergeClauses, UpdateClause}

/** Planner strategy that makes literal `MERGE INTO` SQL execute against
  * graft warehouse tables — the role `IcebergSparkSessionExtensions` plays
  * for the reference (`/root/reference/spark-job/job.json:5`), done
  * Spark-first:
  *
  * Stock Spark fully ANALYZES a `MergeIntoTable` plan over any DSv2
  * catalog table (conditions, WHEN clauses and assignments are resolved
  * and type-coerced by Catalyst — we write zero SQL parsing code) and only
  * the physical planner rejects it when the table lacks
  * `SupportsRowLevelOperations`. This strategy claims the plan first and
  * lowers it onto [[WarehouseTable.mergeClauses]] — the partition-pruned
  * COW join-rewrite — so the full WHEN-clause surface works, including
  * conditional updates and `WHEN MATCHED ... THEN DELETE` (the CDC delete
  * branch the reference's mergeSQL.sql omits; SURVEY.md §2.2).
  *
  * Enable per-session at build time
  * (`.config("spark.sql.extensions", "graft.plans.GraftSparkSessionExtensions")`)
  * or at runtime on a live session (`GraftMergeStrategy.register(spark)`).
  *
  * Supported shape (v1): equi-key ON conjunction where each source key
  * column either already carries the target key's name or can be aliased
  * to it without colliding; WHEN clause conditions over both sides; no
  * NOT MATCHED BY SOURCE clauses; no schema evolution.
  */
case class GraftMergeStrategy(spark: SparkSession) extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: MergeIntoTable =>
      graftTable(m.targetTable).map { table =>
        GraftMergeExec(spark, table, m) :: Nil
      }.getOrElse(Nil)
    case d: DeleteFromTable =>
      graftTable(d.table).map { table =>
        GraftDmlExec(spark, table, d.table, Left(d.condition)) :: Nil
      }.getOrElse(Nil)
    case u: UpdateTable =>
      graftTable(u.table).map { table =>
        GraftDmlExec(spark, table, u.table,
          Right((u.assignments, u.condition))) :: Nil
      }.getOrElse(Nil)
    case _ => Nil
  }

  private def graftTable(plan: LogicalPlan): Option[GraftDsv2Table] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftDsv2Table => Some(t)
      case _ => None
    }
    // V2ScanRelationPushDown rewrites the relation before planning runs
    case r: DataSourceV2ScanRelation => graftTable(r.relation)
    case SubqueryAlias(_, child) => graftTable(child)
    case _ => None
  }
}

object GraftMergeStrategy {
  /** Attach the strategy to an already-built session (no
    * spark.sql.extensions config needed — useful when the session is
    * constructed by a host we don't control, e.g. the verify driver).
    */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.exists(_.isInstanceOf[GraftMergeStrategy]))
      spark.experimental.extraStrategies = strategies :+ GraftMergeStrategy(spark)
  }

  /** A WAP session stages its changes for audit — only append-shaped
    * INSERTs can stage, and every other DML would PUBLISH immediately,
    * silently breaking the session's nothing-visible-until-publish
    * guarantee. Refuse loudly instead (the same contract as the INSERT
    * OVERWRITE refusal in the catalog's write builder).
    */
  private[plans] def refuseUnderWap(spark: SparkSession, what: String): Unit = {
    val wap = spark.conf.get(GraftCatalog.WapIdConf, "").trim
    require(wap.isEmpty,
      s"$what cannot run under ${GraftCatalog.WapIdConf}='$wap' — it would " +
        "publish immediately, not stage; unset the conf to run it against " +
        "the published table, or express the change as a staged INSERT")
  }
}

/** Config-time registration: `spark.sql.extensions=graft.plans.GraftSparkSessionExtensions`. */
class GraftSparkSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(session => GraftMergeStrategy(session))
}

/** Physical node executing the lowered MERGE. Runs once (lazily) on the
  * driver like any DSv2 command exec; returns no rows.
  */
case class GraftMergeExec(
    spark: SparkSession,
    table: GraftDsv2Table,
    merge: MergeIntoTable) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val done: Array[InternalRow] = { run(); Array.empty }

  override def executeCollect(): Array[InternalRow] = done

  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(done.toSeq, 1)

  // ---- lowering ----------------------------------------------------------

  private def run(): Unit = {
    GraftMergeStrategy.refuseUnderWap(spark, "MERGE INTO")
    // WITH SCHEMA EVOLUTION needs no work here: the analyzer's
    // ResolveMergeIntoSchemaEvolution has already diffed source vs target
    // and applied AddColumn through GraftCatalog.alterTable (gated on the
    // AUTOMATIC_SCHEMA_EVOLUTION capability), then reloaded the relation —
    // by planning time `table.warehouse.schema` is the widened schema and
    // the clause assignments cover it.
    val targetAttrs = merge.targetTable.output
    val sourceAttrs = merge.sourceTable.output
    val targetIds = targetAttrs.map(_.exprId).toSet
    val sourceIds = sourceAttrs.map(_.exprId).toSet
    val tableCols = table.warehouse.schema.fieldNames.toSeq

    // ON conjunction → same-name equi keys (aliasing source keys when safe)
    var src = GraftBridge.ofRows(spark, merge.sourceTable)
    val keys = splitConjuncts(merge.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (t, s) =
          if (targetIds(a.exprId) && sourceIds(b.exprId)) (a, b)
          else if (targetIds(b.exprId) && sourceIds(a.exprId)) (b, a)
          else throw new IllegalArgumentException(
            s"MERGE ON clause must compare a target and a source column: $a = $b")
        if (s.name != t.name) {
          require(!src.columns.contains(t.name),
            s"cannot alias source key ${s.name} to ${t.name}: name already taken")
          src = src.withColumn(t.name, GraftBridge.column(s))
        }
        t.name
      case other => throw new IllegalArgumentException(
        s"only equi-key MERGE conditions are supported, got: ${other.sql}")
    }

    // resolved Expression → Column over the arbitration frame (source
    // columns keep their names, target columns appear as __t_<name>)
    def toCol(e: Expression): Column = GraftBridge.column(e.transform {
      case a: AttributeReference if targetIds(a.exprId) =>
        UnresolvedAttribute(Seq("__t_" + a.name))
      case a: AttributeReference if sourceIds(a.exprId) =>
        UnresolvedAttribute(Seq(a.name))
    })

    def assignmentMap(assignments: Seq[Assignment]): Map[String, Column] =
      assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new IllegalArgumentException(
            s"only top-level column assignments are supported: ${other.sql}")
        }
        name -> toCol(a.value)
      }.toMap

    val matched = merge.matchedActions.map {
      case UpdateAction(cond, assignments, _) =>
        UpdateClause(cond.map(toCol), assignmentMap(assignments))
      case DeleteAction(cond) => DeleteClause(cond.map(toCol))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN MATCHED action: $other")
    }
    val notMatched = merge.notMatchedActions.map {
      case InsertAction(cond, assignments) =>
        val values = assignmentMap(assignments)
        val missing = tableCols.filterNot(values.contains)
        require(missing.isEmpty,
          s"MERGE INSERT must cover the table schema; missing: ${missing.mkString(", ")}")
        InsertClause(cond.map(toCol), values)
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }
    // target-only clauses: conditions/values reference target columns only
    // (Catalyst enforces this during analysis), so toCol maps them all to
    // __t_ names resolvable on the arbitration frame
    val notMatchedBySource = merge.notMatchedBySourceActions.map {
      case UpdateAction(cond, assignments, _) =>
        UpdateClause(cond.map(toCol), assignmentMap(assignments))
      case DeleteAction(cond) => DeleteClause(cond.map(toCol))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }

    table.warehouse.mergeClauses(spark, src, keys,
      MergeClauses(matched, notMatched, notMatchedBySource))
    // the table contents changed under any cached plans over this relation
    spark.sharedState.cacheManager.recacheByPlan(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], merge.targetTable)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** Physical node for `DELETE FROM` (Left(condition)) and `UPDATE`
  * (Right(assignments, condition)) statements against warehouse tables —
  * lowered onto the dir-surgery rewrites, with a conservative Filter
  * rendering of the condition driving partition/file-stats pruning.
  */
case class GraftDmlExec(
    spark: SparkSession,
    table: GraftDsv2Table,
    targetPlan: LogicalPlan,
    dml: Either[Expression, (Seq[Assignment], Option[Expression])])
    extends LeafExecNode {

  override def output: Seq[Attribute] = Nil
  private lazy val done: Array[InternalRow] = { run(); Array.empty }
  override def executeCollect(): Array[InternalRow] = done
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(done.toSeq, 1)

  private def toCol(e: Expression): Column = GraftBridge.column(e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  })

  /** Conservative sources.Filter rendering of a condition's conjuncts for
    * pruning only — untranslatable conjuncts are simply dropped (fewer
    * filters ⇒ less pruning, never wrong results).
    */
  private def pruneFilters(e: Expression): Seq[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.{sources => f}
    def lit(l: Literal): Any =
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType)
    def conjuncts(x: Expression): Seq[Expression] = x match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    conjuncts(e).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) => Some(f.EqualTo(a.name, lit(l)))
      case EqualTo(l: Literal, a: AttributeReference) => Some(f.EqualTo(a.name, lit(l)))
      case GreaterThan(a: AttributeReference, l: Literal) => Some(f.GreaterThan(a.name, lit(l)))
      case GreaterThan(l: Literal, a: AttributeReference) => Some(f.LessThan(a.name, lit(l)))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => Some(f.GreaterThanOrEqual(a.name, lit(l)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => Some(f.LessThanOrEqual(a.name, lit(l)))
      case LessThan(a: AttributeReference, l: Literal) => Some(f.LessThan(a.name, lit(l)))
      case LessThan(l: Literal, a: AttributeReference) => Some(f.GreaterThan(a.name, lit(l)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) => Some(f.LessThanOrEqual(a.name, lit(l)))
      case LessThanOrEqual(l: Literal, a: AttributeReference) => Some(f.GreaterThanOrEqual(a.name, lit(l)))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(f.In(a.name, vs.map(v => lit(v.asInstanceOf[Literal])).toArray))
      case _ => None
    }
  }

  private def run(): Unit = {
    GraftMergeStrategy.refuseUnderWap(spark, "DELETE/UPDATE")
    dml match {
      case Left(cond) =>
        // honor the table's declared delete mode (Iceberg
        // write.delete.mode): merge-on-read tables take an
        // O(matching-rows) position-delete sidecar; copy-on-write
        // tables take the stats-pruned dir-level rewrite
        val wt = table.warehouse
        if (wt.properties.get("write.delete.mode").contains("merge-on-read"))
          wt.deleteWhereMor(spark, toCol(cond))
        else
          wt.deleteRows(spark, toCol(cond), pruneFilters(cond))
      case Right((assignments, cond)) =>
        val set = assignments.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => throw new IllegalArgumentException(
              s"only top-level column assignments are supported: ${other.sql}")
          }
          name -> toCol(a.value)
        }.toMap
        table.warehouse.updateRows(spark, set, cond.map(toCol),
          cond.map(pruneFilters).getOrElse(Nil))
    }
    spark.sharedState.cacheManager.recacheByPlan(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], targetPlan)
  }
}
