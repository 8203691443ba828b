package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("funnel: strict ordering — out-of-order and same-instant events do not advance") {
    val ev = Seq(
      // u1 converts fully: view@10 click@20 purchase@30 (lag 20)
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: click BEFORE first view never counts; the click at the same
      // instant as the view doesn't either (strict >) -> stops at view
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 10L),
      // u3: purchase before click -> stops at click (lag 15)
      (3L, "view", 0L), (3L, "purchase", 7L), (3L, "click", 15L),
      // u4 never views: no step at all, even with click+purchase
      (4L, "click", 1L), (4L, "purchase", 2L),
      // u5: two views; funnel measures from the FIRST (t1=2), click@4,
      // purchase@9 -> lags 2 and 7
      (5L, "view", 6L), (5L, "view", 2L), (5L, "click", 4L), (5L, "purchase", 9L)
    ).toDF("user_id", "event_type", "t")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "t", steps)
      .select("step_idx", "n_users", "sum_lag_us")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, 4L, 0L),       // u1 u2 u3 u5
      (2, 3L, 10L + 15L + 2L), // u1 u3 u5
      (3, 2L, 20L + 7L)))      // u1 u5
  }

  test("funnel with conversion window: later steps count only within maxLag of step 1") {
    val ev = Seq(
      // u1: click at lag 50 (in), purchase at lag 150 (OUT of window 100)
      (1L, "view", 0L), (1L, "click", 50L), (1L, "purchase", 150L),
      // u2: full conversion inside the window (lags 30, 90)
      (2L, "view", 1000L), (2L, "click", 1030L), (2L, "purchase", 1090L),
      // u3: click exactly AT the boundary (lag 100 — inclusive)
      (3L, "view", 0L), (3L, "click", 100L)
    ).toDF("user_id", "event_type", "t")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "t",
        steps, maxLag = 100L)
      .select("step_idx", "n_users", "sum_lag_us")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, 3L, 0L),             // all three view
      (2, 3L, 50L + 30L + 100L), // boundary lag 100 counts (inclusive)
      (3, 1L, 90L)))           // only u2 purchases inside the window
    // the unwindowed default is unchanged: u1's purchase now counts
    val open = EventAnalytics.funnel(ev, "user_id", "event_type", "t", steps)
      .select("step_idx", "n_users").as[(Int, Long)].collect().toMap
    assert(open(3) == 2L)
  }

  test("funnel: empty steps keep an explicit zero row") {
    val ev = Seq((1L, "view", 10L)).toDF("user_id", "event_type", "t")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "t", steps)
      .select("step_idx", "step", "n_users", "sum_lag_us")
      .as[(Int, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "view", 1L, 0L), (2, "click", 0L, 0L),
      (3, "purchase", 0L, 0L)))
  }

  test("retentionCohorts: cohort = first-touch period, offset 0 row counts the whole cohort") {
    // period = 10: u1 first at 5 (cohort 0), active periods {0,2};
    // u2 first at 12 (cohort 1), active {1}; u3 first at 7 (cohort 0),
    // active {0, 2} -> (0,0)=2, (0,2)=2, (1,0)=1
    val ev = Seq(
      (1L, 5L), (1L, 25L), (2L, 12L), (3L, 7L), (3L, 29L), (1L, 27L)
    ).toDF("user_id", "t")
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "t", 10L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((0L, 0L, 2L), (0L, 2L, 2L), (1L, 0L, 1L)))
  }

  test("hoppingWindows: each event lands in exactly len/hop instances covering it") {
    // len 40, hop 10 -> 4 windows per event
    val ev = Seq(("a", 1.0, 35L), ("a", 2.5, 39L), ("b", 4.0, 0L))
      .toDF("event_type", "value", "t")
    val out = EventAnalytics
      .hoppingWindows(ev, "t", "event_type", "value", lenUs = 40L, hopUs = 10L)
      .as[(Long, String, Long, Double)].collect()
    // fan-out is exactly 4 per input row
    assert(out.map(_._3).sum == 3 * 4)
    // every emitted instance actually covers its event times
    out.foreach { case (ws, typ, _, _) =>
      val times = Seq(("a", 35L), ("a", 39L), ("b", 0L)).filter(_._1 == typ)
      assert(times.exists { case (_, t) => ws <= t && t < ws + 40L })
    }
    // both 'a' events share windows 0,10,20,30: summed there
    val a0 = out.find(r => r._1 == 0L && r._2 == "a").get
    assert(a0._3 == 2L && a0._4 == 3.5)
    // 'b' at t=0 belongs to windows -30,-20,-10,0
    assert(out.filter(_._2 == "b").map(_._1).sorted.toSeq ==
      Seq(-30L, -20L, -10L, 0L))
  }

  test("hoppingWindows: NEGATIVE event times land in the instances that cover them (floor alignment)") {
    // t=-5 at len 10 / hop 10 must land in exactly window -10 (covering
    // [-10, 0)) — truncating div would emit window 0, which misses it
    val ev = Seq(("a", 1.0, -5L)).toDF("event_type", "value", "t")
    val out = EventAnalytics
      .hoppingWindows(ev, "t", "event_type", "value", lenUs = 10L, hopUs = 10L)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._3)) == Seq((-10L, 1L)))
    // len 20 / hop 10: two covering instances, both actually cover
    val out2 = EventAnalytics
      .hoppingWindows(ev, "t", "event_type", "value", lenUs = 20L, hopUs = 10L)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out2.map(_._1).sorted == Seq(-20L, -10L))
    out2.foreach { case (ws, _, _, _) => assert(ws <= -5L && -5L < ws + 20L) }
  }

  test("hoppingWindows: rejects a length that is not a multiple of the hop") {
    val ev = Seq(("a", 1.0, 0L)).toDF("event_type", "value", "t")
    intercept[IllegalArgumentException] {
      EventAnalytics.hoppingWindows(ev, "t", "event_type", "value", 25L, 10L)
    }
  }

  test("transitions: per-user ordered bigrams, exact ppm probabilities, tie by id") {
    val ev = Seq(
      // u1: view > click > purchase
      (1L, "view", 10L, 100L), (1L, "click", 20L, 101L), (1L, "purchase", 30L, 102L),
      // u2: view > view > click; same-instant events order by event_id
      (2L, "view", 5L, 200L), (2L, "view", 5L, 201L), (2L, "click", 9L, 202L),
      // u3: a single event contributes no transition
      (3L, "view", 1L, 300L)
    ).toDF("user_id", "event_type", "t", "event_id")
    val out = EventAnalytics.transitions(ev, "user_id", "event_type", "t", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    // from view: view>click ×2, view>view ×1 → ppm 666666 / 333333 (floor)
    assert(out == Set(
      ("view", "click", 2L, 666666L),
      ("view", "view", 1L, 333333L),
      ("click", "purchase", 1L, 1000000L)))
  }

  test("userPaths: first-k ordered prefix per user, partitioning-invariant") {
    val ev = Seq(
      (1L, "view", 10L, 100L), (1L, "click", 20L, 101L),
      (1L, "purchase", 30L, 102L), (1L, "view", 40L, 103L), // 4th cut at k=3
      (2L, "view", 5L, 200L), (2L, "click", 9L, 201L), (2L, "purchase", 11L, 202L),
      (3L, "view", 1L, 300L) // short path: just "view"
    ).toDF("user_id", "event_type", "t", "event_id")
    val out = EventAnalytics.userPaths(ev, "user_id", "event_type", "t", "event_id", 3)
      .as[(String, Long)].collect().toSet
    assert(out == Set(("view>click>purchase", 2L), ("view", 1L)))
    // repartitioning cannot change the collected path order
    val shuffled = EventAnalytics.userPaths(
      ev.repartition(7), "user_id", "event_type", "t", "event_id", 3)
      .as[(String, Long)].collect().toSet
    assert(shuffled == out)
  }

  test("dailyCountAnomalies: exact median/MAD, zero-MAD limit, incomplete windows skipped") {
    val day = 86400L * 1000 * 1000 * 1000
    // type A: 5 events/day for days 1-7, 50 on day 8 (the spike);
    // type B: alternating 2/4 (nonzero MAD), steady -> never anomalous
    val rows =
      (1 to 7).flatMap(d => Seq.fill(5)(("A", d * day + 1))) ++
        Seq.fill(50)(("A", 8 * day + 1)) ++
        (1 to 9).flatMap(d => Seq.fill(if (d % 2 == 0) 4 else 2)(("B", d * day + 1)))
    val ev = rows.toDF("event_type", "ts")
    val out = EventAnalytics.dailyCountAnomalies(ev, "event_type", "ts", 7, 350)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    // incomplete leading windows (days 1-6) are absent
    assert(!out.contains(("A", 1L)) && !out.contains(("A", 6L)))
    // steady week: med 5, mad 0, no deviation -> not anomalous
    assert(out(("A", 7L)) == ((5L, 5L, 0L, false)))
    // spike against a zero-MAD baseline: any deviation flags
    assert(out(("A", 8L)) == ((50L, 5L, 0L, true)))
    // alternating 2/4: window [2,4,2,4,2,4,2] med 2, deviations
    // [0,2,0,2,0,2,0] -> mad 0... use day 8 (window [4,2,4,2,4,2,4]):
    // med 4, |dev| [0,2,0,2,0,2,0] sorted mid = 0 -> mad 0; |4-4|=0 ok
    assert(out(("B", 7L)) == ((2L, 2L, 0L, false)))
    assert(out(("B", 8L)) == ((4L, 4L, 0L, false)))
    assert(out(("B", 9L)) == ((2L, 2L, 0L, false)))
  }
}
