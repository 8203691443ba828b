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
    // MOR + no stats: commit batches scatter cells over every pcell
    // partition, so a COW merge would rewrite the whole index per batch;
    // MOR deltas keep commits O(batch) (threshold compaction folds them).
    // The merge key includes the cell, and pcell is a function of the
    // cell, so a key tuple lives in exactly ONE partition — pruned MOR
    // arbitration is exact by construction. Reads prune by partition
    // value only, never by min/max stats ('stats.mode=none' skips the
    // per-commit footer harvest).
    table.create(idx.schema, partition = Some(PartCol),
      properties = graft.table.WarehouseTable.tableProperties("MOR", compression) ++
        Map(
          "stats.mode" -> "none",
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

  /** Index flavor: "cells" (the exploded-cover default, pre-`kind` tables
    * included) vs "endpoint" (two rows per interval, counts only).
    */
  private def kindOf(table: graft.table.WarehouseTable): String =
    table.properties.getOrElse("range.kind", { param(table, "bucketWidth"); "cells" })

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
    require(kindOf(table) == "cells", "lookupAtRest needs a cell index")
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
    require(kindOf(table) == "cells", "overlapLookupAtRest needs a cell index")
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
    * batch, MERGE keyed by (interval keys, cell) — a checkpoint replay
    * upserts identical rows and rewrites nothing new.
    *
    * BOUNDS ARE MUTABLE: re-committing a key with changed `[start, end]`
    * (a session that extends, a validity window that closes) first
    * merge-DELETES the key's cells that the new cover no longer names —
    * otherwise stale `(key, cell)` rows would keep the old extent alive
    * and later probes could emit from it (or twice, when the owner cell
    * moves). The stale scan is a semi-join of the table against the
    * batch's keys anti-joined with the new cover: EMPTY on pure replays
    * and append-only ingest (the delete merge then touches nothing), and
    * bounded by the batch's keys' old rows otherwise. Exactness over a
    * mutable store costs that one table-read semi-join per commit; the
    * upsert half still rewrites only touched `pcell` partitions.
    */
  def indexCommit(
      spark: SparkSession,
      newIntervals: DataFrame,
      table: graft.table.WarehouseTable): Unit = {
    require(kindOf(table) == "cells", "indexCommit needs a cell index")
    val keys = param(table, "keys").split(",").toSeq
    val idx = withCells(newIntervals,
      param(table, "startCol"), param(table, "endCol"),
      param(table, "bucketWidth").toLong, param(table, "partBuckets").toInt)
      .localCheckpoint()
    val stale = table.read(spark)
      .join(idx.select(keys.map(col): _*).distinct(), keys, "left_semi")
      .join(idx.select((keys :+ CellCol).map(col): _*), keys :+ CellCol,
        "left_anti")
    table.merge(spark, stale, keys :+ CellCol, deleteWhere = Some(lit(true)))
    table.merge(spark, idx, keys :+ CellCol)
  }

  // ---- endpoint COUNT index — the pair-free at-rest form ----

  val VCol = "ep_v"
  val IsStartCol = "ep_is_s"
  val IsEndCol = "ep_is_e"

  private def endpoints(
      intervals: DataFrame, startCol: String, endCol: String,
      width: Long, partBuckets: Int): DataFrame =
    intervals.withColumn("__ep",
      explode(array(
        struct(col(startCol).cast("long").as("v"), lit(1L).as("s")),
        struct(col(endCol).cast("long").as("v"), lit(0L).as("s")))))
      .withColumn(VCol, col("__ep.v"))
      .withColumn(IsStartCol, col("__ep.s"))
      .withColumn(IsEndCol, lit(1L) - col("__ep.s"))
      .drop("__ep", startCol, endCol)
      .withColumn(CellCol, expr(s"`$VCol` div $width"))
      .withColumn(PartCol, pmod(col(CellCol), lit(partBuckets)).cast("int"))

  /** ENDPOINT index — [[TemporalJoins.overlapCounts]]' stored twin, for
    * the count-shaped question ("how many stored intervals overlap this
    * probe?") that [[overlapLookupAtRest]] answers by materializing
    * pairs. Each interval stores exactly TWO rows — its start and its
    * end, each filed under the grid cell of its own VALUE — so the two
    * ranks of the identity `count = |{starts ≤ qEnd}| − |{ends < qStart}|`
    * are answerable per probe from per-cell totals plus a scan of the
    * probe's own cell. No explode proportional to interval length, no
    * stale-cover problem: two rows per key, keyed by (keys, is_start),
    * bounds update in place.
    */
  def countIndexAtRest(
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
    val eps = endpoints(intervals, startCol, endCol, bucketWidth, partBuckets)
    // MOR + no stats, same reasoning as the cell index: endpoints scatter
    // over pcell partitions, the merge key contains pcell (one partition
    // per key tuple — pruned arbitration exact), and probes prune by
    // partition value only.
    table.create(eps.schema, partition = Some(PartCol),
      properties = graft.table.WarehouseTable.tableProperties("MOR", compression) ++
        Map(
          "stats.mode" -> "none",
          "range.kind" -> "endpoint",
          "range.bucketWidth" -> bucketWidth.toString,
          "range.partBuckets" -> partBuckets.toString,
          "range.startCol" -> startCol,
          "range.endCol" -> endCol,
          "range.keys" -> keyCols.mkString(",")))
    table.append(eps)
  }

  /** Fold an arrival batch into the endpoint index: MERGE keyed by
    * (keys, is_start, pcell). An unchanged replay upserts identical
    * rows; a changed-bounds re-commit updates `ep_v`/`cell` in place
    * when the endpoint stays in its partition, and the stale-row
    * anti-join (same shape as [[indexCommit]]'s) deletes the old row
    * when the endpoint MOVES partition — never two rows per endpoint.
    */
  def countIndexCommit(
      spark: SparkSession,
      newIntervals: DataFrame,
      table: graft.table.WarehouseTable): Unit = {
    require(kindOf(table) == "endpoint",
      "countIndexCommit needs an endpoint index (range.kind=endpoint)")
    val keys = param(table, "keys").split(",").toSeq
    val eps = endpoints(newIntervals,
      param(table, "startCol"), param(table, "endCol"),
      param(table, "bucketWidth").toLong, param(table, "partBuckets").toInt)
      .localCheckpoint()
    val mergeKey = keys ++ Seq(IsStartCol, PartCol)
    val stale = table.read(spark)
      .join(eps.select(keys.map(col): _*).distinct(), keys, "left_semi")
      .join(eps.select(mergeKey.map(col): _*), mergeKey, "left_anti")
    table.merge(spark, stale, mergeKey, deleteWhere = Some(lit(true)))
    table.merge(spark, eps, mergeKey)
  }

  /** PAIR-FREE overlap COUNTS of a probe batch against the endpoint
    * index: for each probe interval (closed ends, non-null long bounds,
    * rows UNIQUE as tuples — they are the reassembly identity),
    * `n_overlaps` = the number of STORED intervals overlapping it,
    * excluding stored rows sharing `excludeKey`'s value when given (a
    * probe that is itself stored counts itself unless excluded that way).
    *
    * Execution is the [[TemporalJoins.overlapCounts]] two-level rank on
    * the stored multisets: per-cell start/end totals aggregate over a
    * COLUMN-PRUNED full scan (cell + two 0/1 columns), prefix-sum in one
    * task over the bounded cell table (probe cells unioned in at zero so
    * every probe bucket has an offset), and the within-cell residual
    * windows over ONLY the probe-touched `pcell` partitions (manifest
    * pruning, ≤ partBuckets) unioned with the probe's two query rows.
    * The same-key correction ranks within the key group over a key
    * semi-join of the store — key-bound, not corpus-bound. No pair is
    * ever materialized; output is one row per probe.
    */
  def overlapCountsAtRest(
      spark: SparkSession,
      probes: DataFrame,
      qStartCol: String,
      qEndCol: String,
      excludeKey: Option[String],
      table: graft.table.WarehouseTable): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kindOf(table) == "endpoint",
      "overlapCountsAtRest needs an endpoint index (range.kind=endpoint)")
    val width = param(table, "bucketWidth").toLong
    val partBuckets = param(table, "partBuckets").toInt
    val storedKeys = param(table, "keys").split(",").toSeq
    require(!probes.columns.exists(_.startsWith("__oc_")),
      "probe column names starting with __oc_ are reserved")
    excludeKey.foreach { k =>
      require(probes.columns.contains(k), s"excludeKey $k not in probes")
      require(storedKeys.contains(k), s"excludeKey $k not a stored key")
    }
    val baseCols = probes.columns.toSeq
    // two query rows per probe: B(side 0) ranks ends < qStart, A(side 2)
    // ranks starts ≤ qEnd; stored starts ride at side 1, ends at side 3
    val q = probes.select(
      (baseCols.map(col) :+ explode(array(
        struct(col(qStartCol).cast("long").as("v"), lit(0).as("side")),
        struct(col(qEndCol).cast("long").as("v"), lit(2).as("side"))))
        .as("__oc_q")): _*)
      .select((baseCols.map(col) ++ Seq(
        col("__oc_q.v").as("__oc_v"), col("__oc_q.side").as("__oc_side"),
        lit(0L).as("__oc_is_s"), lit(0L).as("__oc_is_e"))): _*)
      .withColumn(CellCol, expr(s"__oc_v div $width"))
      .withColumn(PartCol, pmod(col(CellCol), lit(partBuckets)).cast("int"))
      .localCheckpoint()
    // bounded by construction: at most partBuckets distinct values
    val parts = q.select(col(PartCol)).distinct().collect().map(_.get(0)).toSeq
    def storedAsEvents(df: DataFrame, keepKey: Option[String]): DataFrame =
      df.select(
        (baseCols.map(c =>
          if (keepKey.contains(c)) col(c)
          else lit(null).cast(probes.schema(c).dataType).as(c)) ++ Seq(
          col(VCol).as("__oc_v"),
          when(col(IsStartCol) === 1L, lit(1)).otherwise(lit(3))
            .as("__oc_side"),
          col(IsStartCol).as("__oc_is_s"), col(IsEndCol).as("__oc_is_e"),
          col(CellCol), col(PartCol))): _*)
    // global ranks: offsets from full-store per-cell totals (probe cells
    // unioned in at zero), residual over touched partitions only
    val totals = table.read(spark).groupBy(col(CellCol))
      .agg(sum(col(IsStartCol)).as("__oc_bs"), sum(col(IsEndCol)).as("__oc_be"))
    val wB = Window.orderBy(col(CellCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = q.select(col(CellCol)).distinct()
      .unionByName(totals.select(col(CellCol))).distinct()
      .join(totals, Seq(CellCol), "left")
      .na.fill(0L, Seq("__oc_bs", "__oc_be"))
      .withColumn("__oc_off_s", coalesce(sum(col("__oc_bs")).over(wB), lit(0L)))
      .withColumn("__oc_off_e", coalesce(sum(col("__oc_be")).over(wB), lit(0L)))
      .select(col(CellCol), col("__oc_off_s"), col("__oc_off_e"))
    val wIn = Window.partitionBy(col(CellCol))
      .orderBy(col("__oc_v"), col("__oc_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globalG = q.unionByName(
        storedAsEvents(table.read(spark, partitions = Some(parts)), None))
      .join(broadcast(offsets), Seq(CellCol))
      .withColumn("__oc_cs",
        col("__oc_off_s") + sum(col("__oc_is_s")).over(wIn))
      .withColumn("__oc_ce",
        col("__oc_off_e") + sum(col("__oc_is_e")).over(wIn))
      .filter(col("__oc_side").isin(0, 2))
      .groupBy(baseCols.map(col): _*)
      .agg(
        max(when(col("__oc_side") === 2, col("__oc_cs"))).as("__oc_a_cs"),
        max(when(col("__oc_side") === 0, col("__oc_ce"))).as("__oc_b_ce"))
    excludeKey match {
      case None =>
        globalG.withColumn("n_overlaps",
          (col("__oc_a_cs") - col("__oc_b_ce")).cast("long"))
          .select((baseCols.map(col) :+ col("n_overlaps")): _*)
      case Some(k) =>
        // same-key correction: identical identity within the key group,
        // over the store semi-joined to the probing keys only
        val storedK = storedAsEvents(
          table.read(spark)
            .join(probes.select(col(k)).distinct(), Seq(k), "left_semi"),
          keepKey = Some(k))
        val wK = Window.partitionBy(col(k))
          .orderBy(col("__oc_v"), col("__oc_side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val keyG = q.unionByName(storedK)
          .withColumn("__oc_ks", sum(col("__oc_is_s")).over(wK))
          .withColumn("__oc_ke", sum(col("__oc_is_e")).over(wK))
          .filter(col("__oc_side").isin(0, 2))
          .groupBy(baseCols.map(col): _*)
          .agg(
            max(when(col("__oc_side") === 2, col("__oc_ks"))).as("__oc_a_ks"),
            max(when(col("__oc_side") === 0, col("__oc_ke"))).as("__oc_b_ke"))
        // null-safe reassembly join on the probe tuple (rows unique by
        // contract; <=> keeps null-valued probe columns joinable)
        val g = globalG.alias("g"); val kg = keyG.alias("k")
        val cond = baseCols.map(c => col(s"g.$c") <=> col(s"k.$c"))
          .reduce(_ && _)
        g.join(kg, cond)
          .withColumn("n_overlaps",
            (col("__oc_a_cs") - col("__oc_b_ce") -
              (col("__oc_a_ks") - col("__oc_b_ke"))).cast("long"))
          .select((baseCols.map(c => col(s"g.$c")) :+ col("n_overlaps")): _*)
    }
  }
}
