package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AT-REST interval index — [[TemporalJoins.intervalJoin]]'s stored twin,
  * completing the at-rest family (minhash/IVF/IVFADC/pHash/BM25/KMV/CMS/
  * percentile/cluster/rollup all commit incrementally; the interval side
  * of a recurring range join should too). Intervals are materialized ONCE
  * into a warehouse table partitioned by the grid cells they overlap
  * (`cell = bound div bucketWidth`, the q117 grid), so later point
  * batches probe ONLY the partitions their own cells name — a
  * session/validity-window store probed by event arrivals, without
  * re-scanning or re-exploding the interval corpus per batch.
  *
  * The grid parameters ARE the index format (a probe under a different
  * width would join cells computed under a different grid and return
  * garbage or nothing), so `bucketWidth` and the column names persist as
  * table properties and every probe/commit validates against them — the
  * same contract the minhash index enforces for its banding.
  *
  * Scale shape: the probe's distinct cell set is batch-bounded (the
  * batch's time span over the width — a bounded driver collect, the same
  * manifest-pruning planning step as every other at-rest lookup); the
  * containment filter runs map-side after the pruned equi-join; a point
  * owns exactly one cell, so each qualifying (point, interval) pair is
  * met exactly once. Commits explode ONLY the arrival intervals and
  * keyed-MERGE into the touched cell partitions — replay-idempotent.
  */
object RangeIndex {

  val CellCol = "cell"

  private def withCells(
      intervals: DataFrame, startCol: String, endCol: String,
      width: Long): DataFrame =
    intervals.withColumn(CellCol,
      explode(sequence(
        expr(s"`$startCol` div $width"),
        expr(s"`$endCol` div $width"))))
      .withColumn(CellCol, col(CellCol).cast("int"))

  /** Build the index: one explode of the interval corpus, one
    * cell-partitioned write. `keyCols` identify an interval row (the
    * commit MERGE key, together with the cell).
    */
  def indexAtRest(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keyCols: Seq[String],
      table: graft.table.WarehouseTable,
      bucketWidth: Long,
      compression: String = "snappy"): Unit = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    val idx = withCells(intervals, startCol, endCol, bucketWidth)
    table.create(idx.schema, partition = Some(CellCol),
      properties = graft.table.WarehouseTable.tableProperties("COW", compression) ++
        Map(
          "range.bucketWidth" -> bucketWidth.toString,
          "range.startCol" -> startCol,
          "range.endCol" -> endCol,
          "range.keys" -> keyCols.mkString(",")))
    table.append(idx)
  }

  /** Probe a point batch against the index: the points' cells decide
    * which partitions to READ (manifest-level pruning), containment is
    * exact. Output = points' columns ++ interval columns, one row per
    * qualifying pair.
    */
  def lookupAtRest(
      spark: SparkSession,
      points: DataFrame,
      pointCol: String,
      table: graft.table.WarehouseTable): DataFrame = {
    val props = table.properties
    def param(k: String): String = props.getOrElse(s"range.$k",
      throw new IllegalArgumentException(
        s"index table has no range.$k property — not a range index"))
    val width = param("bucketWidth").toLong
    val startCol = param("startCol"); val endCol = param("endCol")
    val pts = points
      .withColumn(CellCol, expr(s"`$pointCol` div $width").cast("int"))
      .localCheckpoint()
    // batch-bounded: the arrival batch's span over the grid width
    val cells = pts.select(col(CellCol)).distinct().collect().map(_.get(0)).toSeq
    val idx = table.read(spark, partitions = Some(cells))
    pts.join(idx, Seq(CellCol))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(CellCol)
  }

  /** Fold an arrival batch of intervals into the index: explode ONLY the
    * batch, MERGE keyed by (interval keys, cell) — only touched cell
    * partitions rewrite; a checkpoint replay upserts identical rows.
    */
  def indexCommit(
      spark: SparkSession,
      newIntervals: DataFrame,
      table: graft.table.WarehouseTable): Unit = {
    val props = table.properties
    def param(k: String): String = props.getOrElse(s"range.$k",
      throw new IllegalArgumentException(
        s"index table has no range.$k property — not a range index"))
    val idx = withCells(newIntervals,
      param("startCol"), param("endCol"), param("bucketWidth").toLong)
    table.merge(spark, idx,
      param("keys").split(",").toSeq :+ CellCol)
  }
}
