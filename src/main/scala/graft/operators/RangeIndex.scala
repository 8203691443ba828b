package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AT-REST interval index — [[TemporalJoins.intervalJoin]]'s stored twin,
  * completing the at-rest family (minhash/IVF/IVFADC/pHash/BM25/KMV/CMS/
  * percentile/cluster/rollup all commit incrementally; the interval side
  * of a recurring range join should too). Intervals are materialized ONCE
  * into a warehouse table keyed by the grid cells they overlap
  * (`cell = bound div bucketWidth`, the q117 grid), so later point
  * batches probe ONLY the slices their own cells name — a
  * session/validity-window store probed by event arrivals, without
  * re-scanning or re-exploding the interval corpus per batch.
  *
  * The PARTITION column is `pcell = cell mod partBuckets`, NOT the cell
  * itself: cell cardinality grows without bound with the time axis, and
  * one directory per cell would explode the partition count as the
  * corpus ages (measured: a 30-day corpus at 10-min cells is ~4.3k dirs,
  * and every commit's COW pass pays the metadata bill). The bounded mod
  * keeps the layout at ≤ `partBuckets` directories forever — the same
  * move the minhash index makes with `pb = band·B + bh mod B`. Pruning
  * still holds: a probe reads `min(distinct probe cells, partBuckets)`
  * partitions, the equi-join on the exact `cell` column discards the
  * other cells sharing a partition, and the containment filter makes the
  * output exact.
  *
  * The grid parameters ARE the index format (a probe under a different
  * width or bucket count would read the wrong slices), so `bucketWidth`,
  * `partBuckets` and the column names persist as table properties and
  * every probe/commit validates against them — the same contract the
  * minhash index enforces for its banding.
  *
  * Scale shape: the probe's partition set is bounded by `partBuckets`
  * (driver collect bounded by construction); the containment filter runs
  * map-side after the pruned equi-join; a point owns exactly one cell,
  * so each qualifying (point, interval) pair is met exactly once.
  * Commits explode ONLY the arrival intervals and keyed-MERGE into the
  * touched `pcell` partitions — replay-idempotent.
  */
object RangeIndex {

  val CellCol = "cell"
  val PartCol = "pcell"

  private def withCells(
      intervals: DataFrame, startCol: String, endCol: String,
      width: Long, partBuckets: Int): DataFrame =
    intervals.withColumn(CellCol,
      explode(sequence(
        expr(s"`$startCol` div $width"),
        expr(s"`$endCol` div $width"))))
      .withColumn(PartCol, pmod(col(CellCol), lit(partBuckets)).cast("int"))

  /** Build the index: one explode of the interval corpus, one
    * bounded-partition write. `keyCols` identify an interval row (the
    * commit MERGE key, together with the cell).
    */
  def indexAtRest(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keyCols: Seq[String],
      table: graft.table.WarehouseTable,
      bucketWidth: Long,
      partBuckets: Int = 64,
      compression: String = "snappy"): Unit = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    require(partBuckets >= 1 && partBuckets <= 4096,
      s"partBuckets=$partBuckets out of range [1, 4096]")
    val idx = withCells(intervals, startCol, endCol, bucketWidth, partBuckets)
    table.create(idx.schema, partition = Some(PartCol),
      properties = graft.table.WarehouseTable.tableProperties("COW", compression) ++
        Map(
          "range.bucketWidth" -> bucketWidth.toString,
          "range.partBuckets" -> partBuckets.toString,
          "range.startCol" -> startCol,
          "range.endCol" -> endCol,
          "range.keys" -> keyCols.mkString(",")))
    table.append(idx)
  }

  private def param(table: graft.table.WarehouseTable, k: String): String =
    table.properties.getOrElse(s"range.$k",
      throw new IllegalArgumentException(
        s"index table has no range.$k property — not a range index"))

  /** Probe a point batch against the index: the points' cells decide
    * which `pcell` partitions to READ (manifest-level pruning, ≤
    * partBuckets of them), the `cell` equi-join keeps only the exact
    * grid cells, containment is exact. Output = points' columns ++
    * interval columns, one row per qualifying pair.
    */
  def lookupAtRest(
      spark: SparkSession,
      points: DataFrame,
      pointCol: String,
      table: graft.table.WarehouseTable): DataFrame = {
    val width = param(table, "bucketWidth").toLong
    val partBuckets = param(table, "partBuckets").toInt
    val startCol = param(table, "startCol"); val endCol = param(table, "endCol")
    val pts = points
      .withColumn(CellCol, expr(s"`$pointCol` div $width"))
      .withColumn(PartCol, pmod(col(CellCol), lit(partBuckets)).cast("int"))
      .localCheckpoint()
    // bounded by construction: at most partBuckets distinct values
    val parts = pts.select(col(PartCol)).distinct().collect().map(_.get(0)).toSeq
    val idx = table.read(spark, partitions = Some(parts)).drop(PartCol)
    pts.drop(PartCol)
      .join(idx, Seq(CellCol))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(CellCol)
  }

  /** Probe the index with a batch of INTERVALS (overlap semantics —
    * closed, touching endpoints overlap) — [[TemporalJoins.overlapJoin]]
    * against the stored side: the query intervals explode to their own
    * cells, the probe reads only the touched `pcell` partitions, the
    * `cell` equi-join meets candidate pairs in every shared cell, and the
    * owner-cell rule (emit only in the cell of `max(starts)` — always in
    * both covers when the intervals overlap) makes each pair exactly
    * once, no distinct. Query columns must be disjoint from the stored
    * interval's columns.
    */
  def overlapLookupAtRest(
      spark: SparkSession,
      intervals: DataFrame,
      qStartCol: String,
      qEndCol: String,
      table: graft.table.WarehouseTable): DataFrame = {
    val width = param(table, "bucketWidth").toLong
    val partBuckets = param(table, "partBuckets").toInt
    val startCol = param(table, "startCol"); val endCol = param(table, "endCol")
    require(!intervals.columns.contains(startCol) &&
      !intervals.columns.contains(endCol),
      "query interval columns must be disjoint from the stored interval's")
    val q = withCells(intervals, qStartCol, qEndCol, width, partBuckets)
      .localCheckpoint()
    val parts = q.select(col(PartCol)).distinct().collect().map(_.get(0)).toSeq
    val idx = table.read(spark, partitions = Some(parts)).drop(PartCol)
    q.drop(PartCol)
      .join(idx, Seq(CellCol))
      .filter(col(qStartCol) <= col(endCol) && col(startCol) <= col(qEndCol))
      .filter(col(CellCol) ===
        expr(s"greatest(`$qStartCol`, `$startCol`) div $width"))
      .drop(CellCol)
  }

  /** Fold an arrival batch of intervals into the index: explode ONLY the
    * batch, MERGE keyed by (interval keys, cell) — only touched `pcell`
    * partitions rewrite; a checkpoint replay upserts identical rows.
    */
  def indexCommit(
      spark: SparkSession,
      newIntervals: DataFrame,
      table: graft.table.WarehouseTable): Unit = {
    val idx = withCells(newIntervals,
      param(table, "startCol"), param(table, "endCol"),
      param(table, "bucketWidth").toLong, param(table, "partBuckets").toInt)
    table.merge(spark, idx,
      param(table, "keys").split(",").toSeq :+ CellCol)
  }
}
