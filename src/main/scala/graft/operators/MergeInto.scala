package graft.operators

import org.apache.spark.sql.DataFrame
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
