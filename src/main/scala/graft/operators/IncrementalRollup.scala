package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollup table — materialized-view maintenance
  * for additive/mergeable aggregates (the pre-aggregation every recurring
  * dashboard/report query wants at 100 TB: arrivals fold into a per-key
  * aggregate table; readers scan keys, never history).
  *
  * The hard part is EXACTLY-ONCE: unlike every keyed upsert in this
  * engine, "add the batch's counts" is NOT idempotent — a checkpoint
  * replay would double-count. A side ledger table can't fix that (the
  * data commit and the ledger commit are two snapshots; a crash between
  * them re-opens the window). Instead the batch marker lives IN the
  * rollup row: each row carries `last_batch`, and the fold is ONE merge
  * program whose matched-UPDATE is guarded by `target.last_batch <
  * batchId` — the aggregate delta and the marker that suppresses its
  * replay commit in the SAME snapshot, so the exactly-once window is
  * closed by the table's own atomicity (the Iceberg/Flink sink pattern).
  * Micro-batch ids from a streaming checkpoint are monotone, which is all
  * the guard needs; a replayed batch finds every key it touched already
  * marked and leaves it untouched, while keys the crash left unfolded
  * still accept it.
  *
  * Merge functions are the self-mergeable ones (`sum`, `min`, `max` —
  * partial aggregation of the same op); the batch is pre-aggregated to
  * one row per key HERE (never trusted from the caller — duplicate
  * source keys would multiply through the merge's outer join). `count`
  * is `sum` over a `lit(1)` measure; `avg` is a `(sum, count)` pair
  * finished at read time — the classic decomposition.
  *
  * Scale shape: one map-side partial agg over the batch (arrival-bound),
  * then a keyed COW merge that rewrites only the partitions carrying a
  * touched key. The rollup table is key-cardinality-sized, not
  * history-sized — the whole point of maintaining it incrementally.
  */
object IncrementalRollup {

  val BatchCol = "last_batch"

  /** Fold one batch of raw rows into the rollup table (created on first
    * commit). `merges` maps each measure column of `arrivals` to its
    * merge function: `"sum"`, `"min"` or `"max"`. Replay-safe per the
    * class docs: re-committing the same (batch, batchId) is a no-op.
    */
  def commit(
      spark: SparkSession,
      arrivals: DataFrame, // keys ++ measure columns (raw, any multiplicity)
      keys: Seq[String],
      merges: Map[String, String],
      table: graft.table.WarehouseTable,
      batchId: Long): Unit = {
    require(merges.nonEmpty, "at least one measure required")
    merges.values.foreach(f => require(Set("sum", "min", "max").contains(f),
      s"unsupported merge function '$f' (sum/min/max)"))
    val measures = merges.keys.toSeq.sorted
    def partial(c: String): Column = merges(c) match {
      case "sum" => sum(col(c)).as(c)
      case "min" => min(col(c)).as(c)
      case "max" => max(col(c)).as(c)
    }
    val delta = arrivals
      .groupBy(keys.map(col): _*)
      .agg(partial(measures.head), measures.tail.map(partial): _*)
    if (!table.exists)
      table.create(
        delta.schema.add(BatchCol, org.apache.spark.sql.types.LongType,
          nullable = false),
        properties =
          graft.table.WarehouseTable.tableProperties("COW", "snappy"))
    def fold(c: String): Column = merges(c) match {
      case "sum" => col(s"__t_$c") + col(c)
      case "min" => least(col(s"__t_$c"), col(c))
      case "max" => greatest(col(s"__t_$c"), col(c))
    }
    val fresh = col(s"__t_$BatchCol") < lit(batchId)
    // nullSafeKeys: the rollup's keys are GROUP identities — a NULL
    // group is a real group (groupBy put it there) and must FOLD, not
    // re-insert a fresh row every window (ANSI merge equality would)
    table.mergeClauses(spark, delta, keys, MergeInto.MergeClauses(
      matched = Seq(MergeInto.UpdateClause(Some(fresh),
        measures.map(c => c -> fold(c)).toMap + (BatchCol -> lit(batchId)))),
      notMatched = Seq(MergeInto.InsertClause(None,
        (keys ++ measures).map(c => c -> col(c)).toMap +
          (BatchCol -> lit(batchId))))),
      nullSafeKeys = true)
  }

  /** [[commit]] with a REPAIR overlay, fused into the SAME merge program
    * (one snapshot commit instead of two): rows of `repair` name groups
    * whose `repairCols` must be SET to the repair's values instead of
    * folded — the MIN/MAX recompute-on-regress consumer, where folding
    * via least/greatest cannot lower a stored extreme and the truth
    * read's values must land verbatim (including NULLs for an emptied
    * group). Non-repaired groups fold exactly as [[commit]]; replay
    * safety is unchanged (the fused matched-UPDATE sits behind the same
    * `last_batch < batchId` guard, and a replayed window's repair values
    * are the same truth it already wrote). Fusing halves the view's
    * write amplification per regressed window — at scale that is one
    * commit, one manifest and one folded file set per window, not two.
    */
  def commitWithRepair(
      spark: SparkSession,
      arrivals: DataFrame,
      keys: Seq[String],
      merges: Map[String, String],
      repair: DataFrame, // keys ++ repairCols (truth values; NULL = clear)
      repairCols: Seq[String],
      table: graft.table.WarehouseTable,
      batchId: Long): Unit = {
    require(merges.nonEmpty, "at least one measure required")
    merges.values.foreach(f => require(Set("sum", "min", "max").contains(f),
      s"unsupported merge function '$f' (sum/min/max)"))
    require(repairCols.forall(merges.contains),
      s"repair columns ${repairCols.mkString(", ")} must be measures")
    val measures = merges.keys.toSeq.sorted
    def partial(c: String): Column = merges(c) match {
      case "sum" => sum(col(c)).as(c)
      case "min" => min(col(c)).as(c)
      case "max" => max(col(c)).as(c)
    }
    val delta = arrivals
      .groupBy(keys.map(col): _*)
      .agg(partial(measures.head), measures.tail.map(partial): _*)
    if (!table.exists)
      table.create(
        delta.schema.add(BatchCol, org.apache.spark.sql.types.LongType,
          nullable = false),
        properties =
          graft.table.WarehouseTable.tableProperties("COW", "snappy"))
    // attach the repair overlay: null-safe (group identities), flagged so
    // a repair row whose truth value is legitimately NULL still overrides
    val rep = repair.select(
      (keys.map(col) ++ repairCols.map(c => col(c).as(s"__rep_$c"))): _*)
      .withColumn("__rep", lit(true))
    val joinCond = keys.map(k => col(s"d.$k") <=> col(s"r.$k")).reduce(_ && _)
    val src = delta.alias("d").join(rep.alias("r"), joinCond, "left")
      .select(keys.map(k => col(s"d.$k").as(k)) ++
        measures.map(c => col(s"d.$c").as(c)) ++
        repairCols.map(c => col(s"r.__rep_$c").as(s"__rep_$c")) :+
        coalesce(col("r.__rep"), lit(false)).as("__rep"): _*)
    def fold(c: String): Column = merges(c) match {
      case "sum" => col(s"__t_$c") + col(c)
      case "min" => least(col(s"__t_$c"), col(c))
      case "max" => greatest(col(s"__t_$c"), col(c))
    }
    def foldOrRepair(c: String): Column =
      if (repairCols.contains(c))
        when(col("__rep"), col(s"__rep_$c")).otherwise(fold(c))
      else fold(c)
    def insertVal(c: String): Column =
      if (repairCols.contains(c))
        when(col("__rep"), col(s"__rep_$c")).otherwise(col(c))
      else col(c)
    val fresh = col(s"__t_$BatchCol") < lit(batchId)
    table.mergeClauses(spark, src, keys, MergeInto.MergeClauses(
      matched = Seq(MergeInto.UpdateClause(Some(fresh),
        measures.map(c => c -> foldOrRepair(c)).toMap + (BatchCol -> lit(batchId)))),
      notMatched = Seq(MergeInto.InsertClause(None,
        keys.map(c => c -> col(c)).toMap ++
          measures.map(c => c -> insertVal(c)).toMap +
          (BatchCol -> lit(batchId))))),
      nullSafeKeys = true)
  }

  /** The rollup's user-facing read: measures per key, marker dropped. */
  def read(spark: SparkSession,
      table: graft.table.WarehouseTable): DataFrame =
    table.read(spark).drop(BatchCol)
}
