package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the ingested event table — the questions a
  * product/ops team actually asks of the reference's landed `events` data
  * (reference scope: `read.py` lands raw events; analytics are downstream):
  * ordered-funnel conversion, cohort retention, hopping-window rollups.
  *
  * Scale shapes, by construction:
  *  - [[funnel]] is a chain of `steps.length` aggregations ALL keyed by the
  *    user column — every shuffle lands on the same key, so AQE plans them
  *    as co-partitioned hash joins with map-side partial mins; there is no
  *    per-user sort (a `Window.partitionBy(user).orderBy(ts)` would sort
  *    the whole corpus to answer a 3-number report). Step k's candidate
  *    set is filtered to ONE event type before its shuffle, so each round
  *    moves only that type's slice.
  *  - [[retentionCohorts]] is two user-keyed aggregations (first-touch,
  *    then per-(user,period) dedup) and a final small rollup — the
  *    (cohort, offset) matrix is weeks×weeks, driver-tiny, but the
  *    dedup stays distributed because its key includes the user.
  *  - [[hoppingWindows]] explodes each event to exactly `len/hop` window
  *    instances (the fan-out IS the semantics — an event belongs to that
  *    many overlapping windows) and aggregates on (window, type): one
  *    shuffle whose volume is a constant multiple of the input, map-side
  *    combinable. No self-join, no range join.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, step 1's time is the user's earliest
    * `steps(0)` event; step k's time is the earliest `steps(k-1)` event
    * STRICTLY after the user's step k-1 time (same-microsecond events do
    * not advance the funnel — both engines compare the same integers, so
    * the tie rule is deterministic). Returns one row per step:
    * `(step_idx, step, n_users, sum_lag_us)` where `sum_lag_us` is the
    * exact integer sum over converting users of (step time − step-1 time).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      timeCol: String,
      steps: Seq[String],
      maxLag: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxLag > 0, "maxLag must be positive")
    val u = col(userCol)
    // per-user step times t1..tk, built left-to-right; acc holds (user, t1..ti)
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(timeCol)).as("t1"))
    for (i <- 2 to steps.length) {
      val prev = s"t${i - 1}"
      // a CONVERSION WINDOW (maxLag < MaxValue) additionally requires
      // every later step within maxLag of the user's step-1 time —
      // "purchased within 24h of first view", the product framing.
      // Unwindowed callers pay no extra predicate (always-true filter
      // folds away under Long.MaxValue since t > t1 always holds first).
      val carry = if (prev == "t1") Seq(col("t1")) else Seq(col("t1"), col(prev))
      val nxt = events.filter(col(typeCol) === steps(i - 1))
        .join(acc.select((u +: carry): _*), Seq(userCol))
        .filter(col(timeCol) > col(prev) &&
          (if (maxLag == Long.MaxValue) lit(true)
           else col(timeCol) - col("t1") <= maxLag))
        .groupBy(u).agg(min(col(timeCol)).as(s"t$i"))
      acc = acc.join(nxt, Seq(userCol), "left")
    }
    val perStep = (1 to steps.length).map { i =>
      val lag: Column = if (i == 1) lit(0L) else (col(s"t$i") - col("t1"))
      acc.filter(col(s"t$i").isNotNull)
        .agg(count(lit(1)).as("n_users"),
          coalesce(sum(lag), lit(0L)).as("sum_lag_us"))
        .select(lit(i).as("step_idx"), lit(steps(i - 1)).as("step"),
          col("n_users"), col("sum_lag_us"))
    }
    perStep.reduce(_ unionByName _)
  }

  /** Cohort retention matrix: a user's cohort is the period (e.g. week)
    * of their FIRST event; for every (cohort, later activity period) cell,
    * count the distinct cohort members active in it. `periodUs` divides
    * the integer time column (epoch µs) — period ids are `time div
    * periodUs`, offsets are activity period − cohort period (offset 0 =
    * the cohort's own period, so every cohort's offset-0 count is its
    * size). Output: `(cohort_period, period_offset, n_users)`.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      periodUs: Long): DataFrame = {
    require(periodUs >= 1, "periodUs must be positive")
    val u = col(userCol)
    // integer `div`, not `/` (double division) — period ids stay exact
    val firstTouch = events.groupBy(u)
      .agg(expr(
        s"(min(`$timeCol`) - pmod(min(`$timeCol`), $periodUs)) div $periodUs")
        .as("cohort_period"))
    events.select(u, expr(
        s"(`$timeCol` - pmod(`$timeCol`, $periodUs)) div $periodUs").as("p"))
      .join(firstTouch, Seq(userCol))
      .select(u, col("cohort_period"),
        (col("p") - col("cohort_period")).as("period_offset"))
      .distinct()
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Hopping (sliding) window rollup: windows of length `lenUs` starting
    * every `hopUs` (`lenUs` must be a multiple of `hopUs`); an event at
    * time t lands in the `lenUs/hopUs` windows whose start satisfies
    * `ws <= t < ws + lenUs`. Returns per (window_start, group column)
    * exact counts and a 2-decimal exact sum of `valueCol` surfaced as
    * double — the same decimal-sum rule every money-summing query here
    * uses. Time is an integer column (epoch µs); window starts are
    * FLOOR-aligned (`t − pmod(t, hop)`, not truncating `div`), so a
    * negative event time still lands in exactly the `lenUs/hopUs`
    * instances that COVER it — the fan-out invariant holds on the whole
    * integer domain, matching DuckDB's floor-division `//`.
    */
  def hoppingWindows(
      events: DataFrame,
      timeCol: String,
      groupCol: String,
      valueCol: String,
      lenUs: Long,
      hopUs: Long): DataFrame = {
    require(hopUs >= 1 && lenUs >= hopUs && lenUs % hopUs == 0,
      s"window length $lenUs must be a positive multiple of hop $hopUs")
    val wsMax = expr(s"`$timeCol` - pmod(`$timeCol`, $hopUs)")
    val wsMin = wsMax - (lenUs / hopUs - 1) * hopUs
    events
      .withColumn("window_start",
        explode(sequence(wsMin, wsMax, lit(hopUs))))
      .groupBy(col("window_start"), col(groupCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** PATH ANALYSIS, transition form — the Markov view of user behavior:
    * count each (previous event type → next event type) step over every
    * user's time-ordered event sequence, with the per-prev transition
    * probability in EXACT parts-per-million (`(n · 10^6) div Σn` — a ring
    * op both engines compute identically; no engine-native division).
    * Ordering ties break on `tieCol`, the house (time, id) rule.
    *
    * Scale: one user-keyed window (single exchange + in-partition sort —
    * co-partitioned with every other user-keyed op here) feeding a
    * (prev, next) count whose domain is |types|², map-side combinable;
    * the probability window runs on that tiny aggregate, not the events.
    */
  def transitions(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      timeCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(timeCol), col(tieCol))
    events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .withColumn("p_e6", expr("(n * 1000000) div __tot"))
      .drop("__tot")
  }

  /** PATH ANALYSIS, prefix form: each user's first `k` event types joined
    * into an ordered path string ("view>click>purchase"), counted across
    * users — the "what do people actually do first" report. The path is
    * rebuilt deterministically from (rank, type) structs via `array_sort`
    * (collect order is partition-dependent; the sort pins it), so the
    * result is partitioning-invariant.
    *
    * Scale: rank is the same single user-keyed window as [[transitions]],
    * the `rk <= k` cut drops all but k rows per user BEFORE the group-by,
    * and the final count groups by path — distinct-paths-sized, tiny.
    */
  def userPaths(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      timeCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 64, s"k=$k out of range [1, 64]")
    val w = Window.partitionBy(col(userCol)).orderBy(col(timeCol), col(tieCol))
    events
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col(userCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rk"), col(typeCol).as("t")))),
          x => x("t")),
        ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** ROBUST ANOMALY DETECTION over per-type daily event counts — the
    * ops question downstream of an event landing table ("which days
    * spiked?"), answered with median/MAD instead of mean/stddev so one
    * outlier can't mask itself by inflating its own baseline. EXACT
    * integers throughout: `windowDays` must be ODD, so the median of the
    * trailing window (this day + the `windowDays-1` most recent observed
    * days per type) is an element of it, and the MAD (median of absolute
    * deviations) likewise — no interpolation, bit-identical across
    * engines. A day is anomalous when `|n − med| · 100 > thresholdE2 ·
    * MAD` (thresholdE2 = 350 ⇒ 3.5 MADs); a zero MAD (≥ half the window
    * identical) flags ANY deviation — the natural limit of the rule.
    * Incomplete leading windows are skipped, not padded.
    *
    * Scale shape: the raw event table collapses FIRST through one
    * map-side-combinable aggregation to (type, day) — domain-bounded
    * output (|types|·|days| rows), so the per-type ordered window that
    * follows runs on the aggregate, never the corpus; its frame holds
    * `windowDays` longs. The hottest event type costs |days| rows.
    */
  def dailyCountAnomalies(
      events: DataFrame,
      typeCol: String,
      tsNanosCol: String,
      windowDays: Int = 7,
      thresholdE2: Long = 350): DataFrame = {
    require(thresholdE2 >= 0, "thresholdE2 must be non-negative")
    val nanosPerDay = 86400L * 1000 * 1000 * 1000
    val counts = events
      .groupBy(col(typeCol),
        expr(s"$tsNanosCol div $nanosPerDay").as("day"))
      .agg(count(lit(1)).as("n"))
    anomaliesFromCounts(counts, typeCol, "day", "n", windowDays, thresholdE2)
  }

  /** The window half of [[dailyCountAnomalies]], over an ALREADY
    * AGGREGATED (type, day, n) table — the form the streaming stage
    * reuses against its incrementally-maintained rollup.
    */
  def anomaliesFromCounts(
      counts: DataFrame,
      typeCol: String,
      dayCol: String,
      nCol: String,
      windowDays: Int,
      thresholdE2: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowDays % 2 == 1 && windowDays >= 3 && windowDays <= 365,
      s"windowDays=$windowDays must be odd, in [3, 365]")
    val mid = (windowDays + 1) / 2 // element_at is 1-based
    val w = Window.partitionBy(col(typeCol)).orderBy(col(dayCol))
      .rowsBetween(-(windowDays - 1), 0)
    counts
      .withColumn("win", collect_list(col(nCol)).over(w))
      .filter(size(col("win")) === windowDays)
      .withColumn("med",
        element_at(sort_array(col("win")), mid))
      .withColumn("mad",
        element_at(sort_array(transform(col("win"),
          x => abs(x - col("med")))), mid))
      .select(col(typeCol), col(dayCol), col(nCol), col("med"), col("mad"),
        (abs(col(nCol) - col("med")) * lit(100L) >
          lit(thresholdE2) * col("mad")).as("is_anomaly"))
  }
}
