package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO (upsert) semantics over plain DataFrames — the join-rewrite of
  * the reference's Iceberg merge (`/root/reference/spark-job/mergeSQL.sql:
  * 23-43`: `ON target.k = source.k WHEN MATCHED THEN UPDATE SET <all
  * non-keys> WHEN NOT MATCHED THEN INSERT <all>`), without an Iceberg jar.
  *
  * Two physical strategies, picked by what the MERGE updates:
  *
  *  - [[upsertAll]] (reference semantics: UPDATE SET overwrites every
  *    non-key column): result = source ∪ (target ⟕anti source). A LEFT ANTI
  *    join ships only the join keys of the source to the target side and
  *    never materializes matched pairs — strictly cheaper than the textbook
  *    full-outer rewrite. At scale the anti join broadcasts when the source
  *    micro-batch is small (the common CDC shape: GB-scale target, MB-scale
  *    batch), so the target is never shuffled at all.
  *
  *  - [[upsertColumns]] (partial UPDATE SET list): full-outer join +
  *    per-column arbitration `coalesce`/`when`, needed only when unmatched
  *    target columns must survive on matched rows.
  *
  * Preconditions mirror Iceberg's: the source must have ≤1 row per key
  * (the caller runs [[Dedup.latestByKey]] first, exactly like
  * `mergeSQL.sql:14-21` guarantees before its MERGE — SURVEY.md §2.2
  * "multiple-match safety").
  */
object MergeInto {

  /** Upsert where matched rows take ALL columns from the source. */
  def upsertAll(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val src = source.select(target.columns.map(col).toIndexedSeq: _*)
    val kept = target.join(source.select(keys.map(col): _*), keys, "left_anti")
    src.unionByName(kept)
  }

  // ---- general MERGE programs (SQL WHEN-clause semantics) ----------------

  /** One WHEN MATCHED clause. Conditions and values are Columns over a
    * frame where SOURCE columns keep their original names and TARGET
    * columns appear as `__t_<name>` (so a clause can compare both sides,
    * e.g. `col("__t_updated_at") < col("updated_at")`).
    */
  sealed trait MatchedClause { def cond: Option[Column] }
  /** UPDATE SET: assigned target column -> value expression. Unassigned
    * non-key columns keep their target values.
    */
  final case class UpdateClause(cond: Option[Column], set: Map[String, Column])
      extends MatchedClause
  /** DELETE: the matched target row is removed. */
  final case class DeleteClause(cond: Option[Column]) extends MatchedClause

  /** One WHEN NOT MATCHED clause: full-row insert values (source columns
    * only — there is no target row to reference).
    */
  final case class InsertClause(cond: Option[Column], values: Map[String, Column])

  /** A full MERGE program. Clauses apply FIRST-MATCH-WINS in declaration
    * order (SQL MERGE semantics): a matched pair falls through the matched
    * clauses until one condition holds (none ⇒ target row kept as-is); an
    * unmatched source row falls through the insert clauses (none ⇒
    * dropped); an unmatched target row falls through the
    * `notMatchedBySource` clauses (SQL's WHEN NOT MATCHED BY SOURCE —
    * conditions/values may reference TARGET columns only, spelled
    * `__t_<name>`; none firing ⇒ the row is kept).
    */
  final case class MergeClauses(
      matched: Seq[MatchedClause],
      notMatched: Seq[InsertClause],
      notMatchedBySource: Seq[MatchedClause] = Nil)

  /** The plain upsert as a program (UPDATE SET all + INSERT all) — what the
    * reference's mergeSQL.sql expresses.
    */
  def upsertProgram(columns: Seq[String], keys: Seq[String]): MergeClauses =
    MergeClauses(
      matched = Seq(UpdateClause(None,
        columns.filterNot(keys.contains).map(c => c -> col(c)).toMap)),
      notMatched = Seq(InsertClause(None, columns.map(c => c -> col(c)).toMap)))

  /** Execute a [[MergeClauses]] program: one full-outer join on the keys
    * (standard SQL equality by default — null keys never match, as in
    * Iceberg/ANSI MERGE), then row arbitration as a single codegen'd
    * CASE cascade. The caller guarantees ≤1 source row per key
    * (Iceberg's multiple-match precondition); output column order/types
    * follow the target schema.
    *
    * `nullSafeKeys` switches the join to `<=>`: the right semantics when
    * the keys are GROUP identities rather than ANSI merge keys — a
    * grouped rollup legitimately carries a NULL group, and under ANSI
    * equality every maintenance window would re-INSERT it as a fresh
    * row instead of folding (the bug the null-group agg-view spec pins).
    */
  def applyClauses(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      clauses: MergeClauses,
      nullSafeKeys: Boolean = false): DataFrame = {
    val tCols = target.columns.toIndexedSeq
    require(!tCols.exists(source.columns.map("__t_" + _).contains),
      "source columns may not start with __t_ (reserved for target refs)")
    val t = target.select(
      (tCols.map(c => col(c).as(s"__t_$c")) :+ lit(true).as("__t_p")): _*)
    val s = source.withColumn("__s_p", lit(true))
    val joinCond = keys.map(k =>
      if (nullSafeKeys) t(s"__t_$k") <=> s(k) else t(s"__t_$k") === s(k))
      .reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val tPresent = col("__t_p").isNotNull
    val sPresent = col("__s_p").isNotNull
    // first-match-wins decision index per side (-1 = no clause fired)
    def decide(conds: Seq[Option[Column]]): Column =
      conds.zipWithIndex.foldRight(lit(-1)) { case ((c, i), els) =>
        when(c.getOrElse(lit(true)), lit(i)).otherwise(els)
      }
    val mDec = decide(clauses.matched.map(_.cond))
    val iDec = decide(clauses.notMatched.map(_.cond))
    val nDec = decide(clauses.notMatchedBySource.map(_.cond))

    def deleteDecision(cls: Seq[MatchedClause], dec: Column): Column = {
      val idx = cls.zipWithIndex.collect { case (_: DeleteClause, i) => i }
      if (idx.isEmpty) lit(true) else !idx.map(i => dec === i).reduce(_ || _)
    }
    val keep =
      when(tPresent && sPresent, deleteDecision(clauses.matched, mDec))
      .when(tPresent, deleteDecision(clauses.notMatchedBySource, nDec))
      .otherwise(iDec =!= -1)

    def clauseValue(cls: Seq[MatchedClause], dec: Column, c: String, dt: org.apache.spark.sql.types.DataType): Column =
      cls.zipWithIndex.foldRight(col(s"__t_$c")) {
        case ((UpdateClause(_, set), i), els) if set.contains(c) =>
          when(dec === i, set(c).cast(dt)).otherwise(els)
        case (_, els) => els
      }
    val outCols = tCols.map { c =>
      val dt = target.schema(c).dataType
      val insertValue = clauses.notMatched.zipWithIndex
        .foldRight(lit(null).cast(dt)) { case ((InsertClause(_, values), i), els) =>
          when(iDec === i, values(c).cast(dt)).otherwise(els)
        }
      when(tPresent && sPresent, clauseValue(clauses.matched, mDec, c, dt))
        .when(tPresent, clauseValue(clauses.notMatchedBySource, nDec, c, dt))
        .otherwise(insertValue)
        .cast(dt).as(c)
    }
    joined.filter(keep).select(outCols: _*)
  }

  /** Upsert with an explicit UPDATE SET column list; non-listed, non-key
    * target columns keep their target values on matched rows.
    */
  def upsertColumns(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCols: Seq[String]): DataFrame = {
    // presence markers, not key-isNotNull: the join condition is null-safe
    // (<=>), so a row with a null key can legitimately match — testing the
    // key column would misclassify it and invert update/keep behavior
    val t = target.withColumn("__t_present", lit(true)).alias("t")
    val s = source.withColumn("__s_present", lit(true)).alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val matched = col("s.__s_present").isNotNull
    val targetPresent = col("t.__t_present").isNotNull
    val joined = t.join(s, cond, "full_outer")
    val outCols = target.columns.toIndexedSeq.map { c =>
      if (keys.contains(c))
        when(targetPresent, col(s"t.$c")).otherwise(col(s"s.$c")).as(c)
      else if (updateCols.contains(c))
        when(matched, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      else
        when(targetPresent, col(s"t.$c")).otherwise(col(s"s.$c")).as(c)
    }
    joined.select(outCols: _*)
  }
}
