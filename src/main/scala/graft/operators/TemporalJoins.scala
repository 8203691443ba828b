package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators the reference engine lacks entirely (SURVEY.md §2.3
  * gap list): as-of joins and gap-based sessionization — both expressed as
  * compositions of built-in window functions (preference order (a) of the
  * build rules: no custom physical operator needed, Catalyst plans a
  * single shuffle on the key).
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the single newest right row with
    * the same key and `rightTime <= leftTime` (backward-looking, inclusive).
    *
    * Implementation is the union-and-carry-forward pattern, not a per-row
    * subquery: tag both inputs, union, and run ONE window ordered by
    * (time, side) per key where `last(right-value, ignoreNulls)` carries
    * the most recent right row forward onto each left row. Cost = one
    * shuffle of |L|+|R| rows + one sort per key — the same shape a
    * dedicated AsOfJoinExec would produce, with AQE/skew handling for free.
    *
    * @param leftTime/rightTime epoch-comparable numeric or timestamp cols
    * @param tiebreak  ordering among right rows with equal time (larger
    *                  wins, matching "latest")
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      tiebreak: String): DataFrame = {
    val lCols = left.columns.toSeq
    // normalized frames: key..., __t, __side (0=right so right sorts first
    // on time ties — inclusive <=), payload
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(Long.MaxValue))
    val r0 = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(tiebreak).cast("long"))
    // align schemas: left payload nulled on right rows and vice versa.
    // The right payload travels as ONE struct column: the struct is
    // non-null for every right row even when individual value columns are
    // NULL, so last(ignoreNulls) carries the newest right ROW atomically —
    // per-column carries would silently mix columns from different right
    // rows whenever the newest match has a NULL (and would resurrect older
    // non-null values DuckDB's ASOF JOIN correctly returns as NULL).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)))
    val lPart = l.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb")) ++
        lCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rStructType).as("__r")): _*)
    val rPart = r0.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValueCols.map(col): _*).as("__r")): _*)
    val unioned = lPart.unionByName(rPart)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) ++
        rightValueCols.map(c => col("__r").getField(c).as(s"asof_$c"))): _*)
  }

  /** Forward as-of join: for each left row, attach the single EARLIEST
    * right row with the same key and `rightTime >= leftTime` (inclusive)
    * — the mirror of [[asofJoinBackward]], same union-and-carry shape
    * (one shuffle, one sort per key): right rows sort AFTER left rows at
    * equal time, and `first(right-struct, ignoreNulls)` over the
    * current-row-to-following frame carries the next right row backward
    * onto each left row. Ties among right rows with equal time: SMALLEST
    * `tiebreak` wins (matching "earliest").
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      tiebreak: String): DataFrame = {
    val lCols = left.columns.toSeq
    // side: 0=left so right rows at the SAME time fall in the following
    // frame (inclusive >=)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", lit(Long.MinValue))
    val r0 = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", col(tiebreak).cast("long"))
    val rStructType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)))
    val lPart = l.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb")) ++
        lCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rStructType).as("__r")): _*)
    val rPart = r0.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValueCols.map(col): _*).as("__r")): _*)
    val unioned = lPart.unionByName(rPart)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("__r", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select((lCols.map(col) ++
        rightValueCols.map(c => col("__r").getField(c).as(s"asof_$c"))): _*)
  }

  /** Nearest as-of join: attach the right row minimizing
    * `|rightTime − leftTime|` (both must be integer epoch columns in the
    * same unit), NULL when no right row lands within `tolerance`.
    * Deterministic tie rules: equal backward/forward distance prefers the
    * BACKWARD row; equal-time backward rows resolve to the largest
    * `tiebreak` (the [[asofJoinBackward]] rule), equal-time forward rows
    * to the smallest (the [[asofJoinForward]] rule).
    *
    * ONE shuffle and ONE sort: both the backward carry
    * (`last` over preceding) and the forward carry (`first` over
    * following) are frames over the same window sort, so Catalyst plans a
    * single Exchange + Sort feeding one WindowExec pair; the
    * closer-candidate choice and the tolerance gate are map-side. Output:
    * left columns ++ `asof_<c>` ++ `asof_dist` (NULL when out of
    * tolerance). Right rows at exactly the left time sort BEFORE the left
    * row, so they surface through the backward carry at distance 0.
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      tiebreak: String,
      tolerance: Long = Long.MaxValue): DataFrame = {
    require(tolerance >= 0, "tolerance must be non-negative")
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(Long.MaxValue))
    val r0 = right
      .withColumn("__t", col(rightTime).cast("long"))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(tiebreak).cast("long"))
    // the right struct carries its own time (__rt) so distances are
    // computable after the carry without a second join
    val rStructType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__rt",
          org.apache.spark.sql.types.LongType))
    val lPart = l.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb")) ++
        lCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rStructType).as("__r")): _*)
    val rPart = r0.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct((rightValueCols.map(col) :+ col("__t").as("__rt")): _*).as("__r")): _*)
    val unioned = lPart.unionByName(rPart)
    val sort = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
    val bwd = last(col("__r"), ignoreNulls = true)
      .over(sort.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__r"), ignoreNulls = true)
      .over(sort.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val distB = col("__t") - col("__b").getField("__rt")
    val distF = col("__f").getField("__rt") - col("__t")
    val chosen = when(col("__b").isNotNull &&
        (col("__f").isNull || distB <= distF), col("__b"))
      .otherwise(col("__f"))
    unioned
      .withColumn("__b", bwd).withColumn("__f", fwd)
      .filter(col("__side") === 1)
      .withColumn("__n", chosen)
      .withColumn("__d", abs(col("__t") - col("__n").getField("__rt")))
      .withColumn("__n", when(col("__d") <= tolerance, col("__n")))
      .select((lCols.map(col) ++
        rightValueCols.map(c => col("__n").getField(c).as(s"asof_$c")) :+
        when(col("__n").isNotNull, col("__d")).as("asof_dist")): _*)
  }

  /** Gap-based sessionization: rows of the same key belong to one session
    * while consecutive gaps are ≤ `maxGap` (in the time column's units).
    * Classic lag + flag + running-sum — two window passes over one
    * shuffle, no state store needed in batch.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String,
      maxGap: Long): DataFrame = {
    val ord = Seq(col(timeCol).asc, col(tiebreak).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull || col(timeCol) - col("__prev") > maxGap, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new_session")
  }

  /** Point-in-interval RANGE JOIN via grid bucketing — the non-equi join
    * Spark's planner would otherwise execute as a broadcast nested loop
    * (one side fully in driver/executor memory, O(|P|·|I|) compare — dead
    * at 100 TB). Bucketing turns it into an ordinary shuffled equi-join:
    * every interval `[start, end]` explodes to the grid cells
    * `start div w .. end div w` it overlaps (`len/w + 1` rows — bounded
    * when interval length is bounded relative to `bucketWidth`), every
    * point maps to its single cell `p div w`, the equi-join on the cell
    * id meets exactly the pairs that can match, and the exact containment
    * filter (`start ≤ p ≤ end`, closed on both ends) runs map-side after
    * the join. Because a point owns exactly ONE cell, each qualifying
    * pair is emitted exactly once — no distinct pass.
    *
    * `div` truncation vs floor is immaterial: `x div w` is monotone
    * nondecreasing in `x` either way, so `sequence(start div w,
    * end div w)` covers every cell a value in `[start, end]` can map to —
    * negative coordinates included.
    *
    * Scale shape: one shuffle of |P| + |I|·(len/w + 1) rows on the cell
    * id; the filter is codegen'd. Pick `bucketWidth` ≈ the typical
    * interval length: smaller widths multiply interval rows, larger
    * widths let each cell pair points with intervals they can't match
    * (more post-filter waste). Dense time regions make hot cells — AQE
    * skew-join splits them at runtime (enabled in the session).
    *
    * Column names of `points` and `intervals` must be disjoint (the
    * output carries both sides' columns, exactly like a SQL join).
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must have disjoint column names")
    val ivals = intervals.withColumn("_rj_cell",
      explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        expr(s"`$endCol` div $bucketWidth"))))
    val pts = points.withColumn("_rj_cell", expr(s"`$pointCol` div $bucketWidth"))
    pts.join(ivals, Seq("_rj_cell"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_rj_cell")
  }

  /** Interval-OVERLAP range join (`lStart ≤ rEnd ∧ rStart ≤ lEnd`, closed
    * — touching endpoints overlap) on the same grid as [[intervalJoin]],
    * with the OWNER-CELL rule replacing the point's unique cell: both
    * sides explode to their covered cells, the equi-join on the cell id
    * meets every candidate pair in EVERY cell both cover, and the pair is
    * emitted only in the single cell owning `max(lStart, rStart)`. That
    * cell is always in both covers (the later start lies inside both
    * intervals whenever they overlap), so each overlapping pair is
    * emitted exactly once — no distinct pass, no row-id bookkeeping, and
    * never the O(|L|·|R|) nested loop Spark plans for raw inequality
    * joins.
    *
    * Scale shape: one shuffle of Σ(len/w + 1) rows per side on the cell
    * id; both filters are codegen'd map-side. Same width guidance and
    * AQE-skew note as [[intervalJoin]].
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left and right must have disjoint column names")
    def cells(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_oj_cell",
        explode(sequence(
          expr(s"`$s` div $bucketWidth"), expr(s"`$e` div $bucketWidth"))))
    cells(left, lStart, lEnd)
      .join(cells(right, rStart, rEnd), Seq("_oj_cell"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_oj_cell") ===
        expr(s"greatest(`$lStart`, `$rStart`) div $bucketWidth"))
      .drop("_oj_cell")
  }

  /** PAIR-FREE interval-overlap COUNTS — the scale-safe form of the
    * count-shaped question [[overlapJoin]] answers by materializing pairs.
    * For each interval row `i` (closed ends, non-null `long`-comparable
    * bounds, `start ≤ end`), `n_overlaps` = the number of OTHER rows that
    * overlap it, optionally excluding rows sharing `excludeKey`'s value
    * (e.g. "sessions of the same user don't count").
    *
    * The identity: the intervals NOT overlapping `i` are exactly those
    * entirely before (`end_j < start_i`) or entirely after
    * (`start_j > end_i`) — disjoint events — so
    * `overlaps(i) = |{j : start_j ≤ end_i}| − |{j : end_j < start_i}| − 1`
    * (the −1 removes `i` itself, which always "overlaps" itself). Both
    * terms are RANKS of `i`'s endpoints in the global multisets of starts
    * and ends — order statistics, zero pair materialization. The
    * same-key exclusion subtracts the identical identity evaluated within
    * `i`'s key group. Output grows LINEARLY with the input where the pair
    * join's output is quadratic in dense windows — at 10× users in the
    * same wall-clock window, pairs grow ~100×, counts grow 10×.
    *
    * Ranks are computed WITHOUT a global sort (the `Batching.lengthBuckets`
    * two-level pattern, on a time grid instead of a value table): each
    * interval emits 4 tagged rows — a start EVENT and an end EVENT (the
    * multisets) plus two QUERY rows (rank-of-`end_i` among starts,
    * rank-of-`start_i` among ends). Per grid bucket (`v div bucketWidth`),
    * event totals aggregate map-side; the prefix sum over the bucket table
    * runs in one task BOUNDED by time-span / bucketWidth (a coordination
    * table, broadcast back); the within-bucket residual is a running sum
    * over one bucket's rows — no task ever sorts more than a bucket.
    * Inclusive vs strict lands in the tie-break side ordering: at equal
    * value, the ends-rank query (side 0) sorts BEFORE end events (side 3)
    * so `end_j = start_i` is NOT counted as "before" (strict <, i.e. a
    * touching endpoint overlaps), and start events (side 1) sort BEFORE
    * the starts-rank query (side 2) so `start_j = end_i` IS counted
    * (inclusive ≤). Ties beyond (value, side) cannot perturb the sums:
    * query rows contribute 0 to both running counts.
    *
    * Scale shape: one explode (4 rows/interval), one map-side bucket agg,
    * one broadcast of the bounded bucket-offset table, one bucket-keyed
    * window shuffle + (with `excludeKey`) one key-keyed window shuffle,
    * one final group-by — all linear, no joins between interval rows.
    *
    * Rows of `intervals` must be UNIQUE as whole tuples (they are the
    * group-by identity for reassembling the 4 tagged rows); column names
    * must not start with the reserved `__oc_` prefix.
    *
    * @return `intervals`' columns + `n_overlaps` (long), one row per input
    *         row (zero-overlap rows included — counts, not pairs).
    */
  def overlapCounts(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      excludeKey: Option[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    require(!intervals.columns.exists(_.startsWith("__oc_")),
      "column names starting with __oc_ are reserved")
    excludeKey.foreach(k => require(intervals.columns.contains(k),
      s"excludeKey $k is not a column of the input"))
    val baseCols = intervals.columns.toSeq
    // 4 tagged rows per interval: B-query(0) at start, start event(1),
    // A-query(2) at end, end event(3); is_s/is_e are the running-sum
    // payloads (events only — queries ride at zero)
    val tagged = intervals.select(
      (baseCols.map(col) :+ explode(array(
        struct(col(startCol).cast("long").as("v"), lit(0).as("side"),
          lit(0L).as("is_s"), lit(0L).as("is_e")),
        struct(col(startCol).cast("long").as("v"), lit(1).as("side"),
          lit(1L).as("is_s"), lit(0L).as("is_e")),
        struct(col(endCol).cast("long").as("v"), lit(2).as("side"),
          lit(0L).as("is_s"), lit(0L).as("is_e")),
        struct(col(endCol).cast("long").as("v"), lit(3).as("side"),
          lit(0L).as("is_s"), lit(1L).as("is_e")))).as("__oc_e")): _*)
      .select((baseCols.map(col) ++ Seq(
        col("__oc_e.v").as("__oc_v"), col("__oc_e.side").as("__oc_side"),
        col("__oc_e.is_s").as("__oc_is_s"),
        col("__oc_e.is_e").as("__oc_is_e"))): _*)
      .withColumn("__oc_bkt", expr(s"__oc_v div $bucketWidth"))
    // level 1: per-bucket event totals → prefix sums over the bucket table
    // only (one task, bounded by time-span/bucketWidth), broadcast back
    val wB = Window.orderBy(col("__oc_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tagged.groupBy(col("__oc_bkt"))
      .agg(sum(col("__oc_is_s")).as("__oc_bs"),
        sum(col("__oc_is_e")).as("__oc_be"))
      .withColumn("__oc_off_s", coalesce(sum(col("__oc_bs")).over(wB), lit(0L)))
      .withColumn("__oc_off_e", coalesce(sum(col("__oc_be")).over(wB), lit(0L)))
      .select(col("__oc_bkt"), col("__oc_off_s"), col("__oc_off_e"))
    // level 2: within-bucket running counts; global rank = offset + local
    val wIn = Window.partitionBy(col("__oc_bkt"))
      .orderBy(col("__oc_v"), col("__oc_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var ranked = tagged.join(broadcast(offsets), Seq("__oc_bkt"))
      .withColumn("__oc_cs", col("__oc_off_s") + sum(col("__oc_is_s")).over(wIn))
      .withColumn("__oc_ce", col("__oc_off_e") + sum(col("__oc_is_e")).over(wIn))
    // same-key correction: the identical identity within the key group —
    // one window keyed by excludeKey (no bucket split needed: a key's rows
    // are one user's sessions, the same bound sessionize itself sorts)
    excludeKey match {
      case Some(k) =>
        val wK = Window.partitionBy(col(k))
          .orderBy(col("__oc_v"), col("__oc_side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ranked = ranked
          .withColumn("__oc_ks", sum(col("__oc_is_s")).over(wK))
          .withColumn("__oc_ke", sum(col("__oc_is_e")).over(wK))
      case None =>
        ranked = ranked
          .withColumn("__oc_ks", lit(0L)).withColumn("__oc_ke", lit(0L))
    }
    // reassemble: each interval's 4 tagged rows share its (unique) tuple;
    // the A-query carries the starts-rank, the B-query the ends-rank
    val sameTerm = excludeKey match {
      case Some(_) => col("__oc_a_ks") - col("__oc_b_ke") - 1L
      case None => lit(0L)
    }
    ranked.groupBy(baseCols.map(col): _*)
      .agg(
        max(when(col("__oc_side") === 2, col("__oc_cs"))).as("__oc_a_cs"),
        max(when(col("__oc_side") === 0, col("__oc_ce"))).as("__oc_b_ce"),
        max(when(col("__oc_side") === 2, col("__oc_ks"))).as("__oc_a_ks"),
        max(when(col("__oc_side") === 0, col("__oc_ke"))).as("__oc_b_ke"))
      .withColumn("n_overlaps",
        (col("__oc_a_cs") - col("__oc_b_ce") - 1L - sameTerm).cast("long"))
      .select((baseCols.map(col) :+ col("n_overlaps")): _*)
  }
}
