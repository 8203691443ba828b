package graft

import org.apache.spark.sql.functions._

import graft.operators.{SkewTools, TemporalJoins}

class TemporalSkewSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoinBackward attaches newest right row at-or-before left time") {
    val trades = Seq(
      (1, 100L, "t1"), (1, 205L, "t2"), (2, 50L, "t3")
    ).toDF("k", "t", "trade")
    val quotes = Seq(
      (1, 90L, 10.0), (1, 100L, 11.0), (1, 200L, 12.0), (2, 60L, 99.0)
    ).toDF("k", "t", "px").withColumn("qid", monotonically_increasing_id())
    val out = TemporalJoins.asofJoinBackward(
      trades, quotes, Seq("k"), "t", "t", Seq("px"), tiebreak = "qid")
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").contains(11.0)) // inclusive: quote at exactly t=100
    assert(out("t2").contains(12.0)) // newest ≤ 205
    assert(out("t3").isEmpty)        // no quote at or before t=50
  }

  test("asofJoinBackward carries the newest right ROW even when it has NULLs") {
    // newest quote for t1 (t=200) has px=NULL but src='b': true as-of
    // semantics (and DuckDB ASOF JOIN) attach that row as-is — a NULL px
    // and src='b' — never px from an older row mixed with src from the new
    val trades = Seq((1, 205L, "t1")).toDF("k", "t", "trade")
    val quotes = Seq(
      (1, 100L, Some(11.0), "a"), (1, 200L, None: Option[Double], "b")
    ).toDF("k", "t", "px", "src").withColumn("qid", monotonically_increasing_id())
    val out = TemporalJoins.asofJoinBackward(
      trades, quotes, Seq("k"), "t", "t", Seq("px", "src"), tiebreak = "qid")
      .select("trade", "asof_px", "asof_src")
      .as[(String, Option[Double], Option[String])].collect()
    assert(out.toSeq == Seq(("t1", None, Some("b"))))
  }

  test("asofJoinForward attaches earliest right row at-or-after; ties pick smallest tiebreak") {
    val trades = Seq(
      (1, 100L, "t1"), (1, 205L, "t2"), (2, 500L, "t3")
    ).toDF("k", "t", "trade")
    val quotes = Seq(
      (1, 100L, 11.0, 7L), (1, 100L, 13.0, 3L), (1, 300L, 12.0, 1L),
      (2, 60L, 99.0, 2L)
    ).toDF("k", "t", "px", "qid")
    val out = TemporalJoins.asofJoinForward(
      trades, quotes, Seq("k"), "t", "t", Seq("px"), tiebreak = "qid")
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").contains(13.0)) // inclusive t=100; tie -> qid 3 < 7
    assert(out("t2").contains(12.0)) // earliest >= 205
    assert(out("t3").isEmpty)        // nothing at or after t=500
  }

  test("asofJoinNearest picks min |Δt|, prefers backward on ties, nulls outside tolerance") {
    val L = Seq(
      (1, 100L, "a"), // bwd@90 (d10) vs fwd@105 (d5) -> fwd
      (1, 200L, "b"), // bwd@195 (d5) vs fwd@205 (d5) -> tie -> bwd
      (1, 400L, "c"), // only bwd@205, d195 > tol 100 -> null
      (2, 50L, "d"),  // right at exactly 50 -> dist 0
      (3, 10L, "e")   // no right rows for key at all -> null
    ).toDF("k", "t", "tag")
    val R = Seq(
      (1, 90L, 1L), (1, 105L, 2L), (1, 195L, 3L), (1, 205L, 4L),
      (2, 50L, 5L)
    ).toDF("k", "rt", "rid")
    val out = TemporalJoins.asofJoinNearest(
      L, R, Seq("k"), "t", "rt", Seq("rid"), tiebreak = "rid",
      tolerance = 100L)
      .select("tag", "asof_rid", "asof_dist")
      .as[(String, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a") == ((Some(2L), Some(5L))))
    assert(out("b") == ((Some(3L), Some(5L))))
    assert(out("c") == ((None, None)))
    assert(out("d") == ((Some(5L), Some(0L))))
    assert(out("e") == ((None, None)))
  }

  test("asofJoinNearest plans ONE exchange: both direction carries share a single sort") {
    val L = Seq((1, 100L, "a")).toDF("k", "t", "tag")
    val R = Seq((1, 90L, 1L)).toDF("k", "rt", "rid")
    val plan = TemporalJoins.asofJoinNearest(
      L, R, Seq("k"), "t", "rt", Seq("rid"), "rid")
      .queryExecution.executedPlan.toString
    val nEx = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(nEx <= 2, s"expected at most one shuffle round, got:\n$plan")
  }

  test("sessionize splits on gaps and keeps runs together") {
    val ev = Seq(
      (1, 0L, 1L), (1, 100L, 2L), (1, 5000L, 3L), (1, 5050L, 4L),
      (2, 10L, 5L)
    ).toDF("u", "t", "id")
    val out = TemporalJoins.sessionize(ev, Seq("u"), "t", "id", maxGap = 1000L)
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1 && out(2L) == 1) // same session (gap 100)
    assert(out(3L) == 2 && out(4L) == 2) // new session after gap 4900
    assert(out(5L) == 1)
  }

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 1000).map(i => ("hot", i.toDouble)) ++
      (1 to 10).map(i => (s"k$i", i.toDouble))
    val in = df.toDF("k", "v")
    val salted = SkewTools.saltedSumCount(in, Seq("k"), "v", saltBuckets = 8)
      .select("k", "sum_v", "n").as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val plain = in.groupBy("k").agg(sum("v"), count(lit(1)))
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted == plain)
  }

  test("salted broadcast join equals plain join") {
    val fact = ((1 to 500).map(_ => (7, "hot")) ++ Seq((1, "a"), (2, "b")))
      .toDF("id", "payload")
    val dim = Seq((7, "seven"), (1, "one"), (2, "two"), (3, "three"))
      .toDF("id", "name")
    val salted = SkewTools.saltedBroadcastJoin(fact, dim, "id", 4)
      .groupBy("id", "name").count()
      .as[(Int, String, Long)].collect().toSet
    val plain = fact.join(dim, "id").groupBy("id", "name").count()
      .as[(Int, String, Long)].collect().toSet
    assert(salted == plain)
  }

  test("intervalJoin: closed bounds, multi-cell intervals, negatives; each pair exactly once; no nested loop") {
    val pts = Seq(-12L, -5L, 0L, 5L, 9L, 10L, 25L, 100L).map(Tuple1(_))
      .toDF("p")
    val ivals = Seq(
      (1L, -15L, -5L),  // negative-domain interval
      (2L, 0L, 10L),    // closed on both ends
      (3L, 4L, 37L),    // spans 4 cells at width 10
      (4L, 90L, 90L)    // point-width interval, no match
    ).toDF("iv", "s", "e")
    val out = TemporalJoins.intervalJoin(pts, ivals, "p", "s", "e", 10L)
      .select("iv", "p").as[(Long, Long)].collect().toSeq
    // brute-force oracle: every (interval, point) with s <= p <= e, once
    val expect = for {
      (iv, s, e) <- Seq((1L, -15L, -5L), (2L, 0L, 10L), (3L, 4L, 37L), (4L, 90L, 90L))
      p <- Seq(-12L, -5L, 0L, 5L, 9L, 10L, 25L, 100L) if s <= p && p <= e
    } yield (iv, p)
    assert(out.sorted == expect.sorted)
    assert(out.size == out.distinct.size) // exactly once, no dedup pass
    // the whole point of the operator: the physical plan is an equi-join
    // (sort-merge or shuffled hash), never a broadcast nested loop
    val phys = TemporalJoins.intervalJoin(pts, ivals, "p", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      phys)
  }

  test("overlapJoin: owner-cell emits each overlapping pair exactly once; touching endpoints overlap; no nested loop") {
    val lefts = Seq(
      (1L, 0L, 25L),    // spans 3 cells at width 10
      (2L, 5L, 5L),     // zero-length
      (3L, -14L, -10L), // negative domain
      (4L, 40L, 41L)
    )
    val rights = Seq(
      (11L, 20L, 60L),  // shares cells 2..6 with l1 -> must emit once
      (12L, 5L, 9L),    // touches l2 at a point
      (13L, -10L, -1L), // touches l3 at -10 (closed -> overlap)
      (14L, 42L, 99L)   // misses l4 by 1
    )
    val l = lefts.toDF("lid", "ls", "le")
    val r = rights.toDF("rid", "rs", "re")
    val out = TemporalJoins.overlapJoin(l, r, "ls", "le", "rs", "re", 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val expect = for {
      (lid, ls, le) <- lefts
      (rid, rs, re) <- rights if ls <= re && rs <= le
    } yield (lid, rid)
    assert(out.sorted == expect.sorted)
    assert(out.size == out.distinct.size) // exactly once despite shared cells
    val phys = TemporalJoins.overlapJoin(l, r, "ls", "le", "rs", "re", 10L)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      phys)
  }

  test("overlapCounts: rank identity equals the brute pair count — ties, touching endpoints, negatives, zero-overlap rows, same-key exclusion") {
    // deterministic pseudo-random intervals engineered for tie pressure:
    // coordinates land on a tiny value grid so equal starts/ends, touching
    // endpoints, and identical (value, side) collisions all occur
    val ivals = (0 until 120).map { i =>
      val key = i % 7
      val st = ((i * 37 + 11) % 23).toLong - 8  // negatives included
      val len = ((i * 13) % 5).toLong           // zero-length included
      (key, i.toLong, st, st + len)
    }
    val df = ivals.toDF("user", "iv", "st", "en")
    def brute(sameKeyExcluded: Boolean): Map[Long, Long] =
      ivals.map { case (k, id, s, e) =>
        id -> ivals.count { case (k2, id2, s2, e2) =>
          id2 != id && s2 <= e && s <= e2 &&
            (!sameKeyExcluded || k2 != k)
        }.toLong
      }.toMap
    // with the same-key exclusion (the q148 shape)
    val got = TemporalJoins.overlapCounts(
        df, "st", "en", excludeKey = Some("user"), bucketWidth = 5L)
      .select("iv", "n_overlaps").as[(Long, Long)].collect().toMap
    assert(got == brute(sameKeyExcluded = true))
    assert(got.size == ivals.size) // every row present, zero counts included
    // without exclusion: every other interval counts
    val gotAll = TemporalJoins.overlapCounts(
        df, "st", "en", excludeKey = None, bucketWidth = 5L)
      .select("iv", "n_overlaps").as[(Long, Long)].collect().toMap
    assert(gotAll == brute(sameKeyExcluded = false))
    // pair-free: the plan has no join between interval rows at all
    val phys = TemporalJoins.overlapCounts(
        df, "st", "en", Some("user"), 5L)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct") && !phys.contains("SortMergeJoin"),
      phys)
  }

  test("RangeIndex: pruned at-rest probe equals the direct interval join; commits fold and replay as no-ops; grid params enforced") {
    import graft.operators.RangeIndex
    val ivals = Seq(
      (1L, 0L, 25L), (2L, 5L, 5L), (3L, -14L, -10L), (4L, 40L, 41L),
      (5L, 18L, 33L)
    )
    val pts = Seq(-12L, -5L, 0L, 5L, 9L, 10L, 25L, 30L, 100L)
    val ptsDf = pts.map(Tuple1(_)).toDF("p")
    val table = graft.table.WarehouseTable(tmpDir("rix") + "/idx")
    // build on the first three, commit the rest, replay the commit
    val (seed, late) = ivals.splitAt(3)
    RangeIndex.indexAtRest(seed.toDF("iv", "s", "e"), "s", "e",
      Seq("iv"), table, bucketWidth = 10L)
    RangeIndex.indexCommit(spark, late.toDF("iv", "s", "e"), table)
    RangeIndex.indexCommit(spark, late.toDF("iv", "s", "e"), table)
    val got = RangeIndex.lookupAtRest(spark, ptsDf, "p", table)
      .select("iv", "p").as[(Long, Long)].collect().toSeq
    val expect = for {
      (iv, s, e) <- ivals
      p <- pts if s <= p && p <= e
    } yield (iv, p)
    assert(got.sorted == expect.sorted)
    assert(got.size == got.distinct.size)
    // direct operator agreement on the same inputs
    val direct = TemporalJoins.intervalJoin(
      ptsDf, ivals.toDF("iv", "s", "e"), "p", "s", "e", 10L)
      .select("iv", "p").as[(Long, Long)].collect().toSeq
    assert(got.sorted == direct.sorted)
    // a non-index table refuses probes instead of joining garbage
    val plain = graft.table.WarehouseTable(tmpDir("rix") + "/plain")
    plain.create(ptsDf.schema)
    intercept[IllegalArgumentException] {
      RangeIndex.lookupAtRest(spark, ptsDf, "p", plain)
    }
  }

  test("RangeIndex.indexCommit with CHANGED bounds deletes stale cells — no phantom or double emission") {
    import graft.operators.RangeIndex
    val table = graft.table.WarehouseTable(tmpDir("mut") + "/idx")
    RangeIndex.indexAtRest(Seq((1L, 0L, 25L), (2L, 40L, 45L)).toDF("iv", "s", "e"),
      "s", "e", Seq("iv"), table, bucketWidth = 10L, partBuckets = 4)
    // interval 1 SHRINKS to [30, 35] (old cells 0..2 stale, new cell 3),
    // interval 2 extends to [40, 61] (keeps old cell, gains two)
    RangeIndex.indexCommit(spark,
      Seq((1L, 30L, 35L), (2L, 40L, 61L)).toDF("iv", "s", "e"), table)
    val pts = Seq(5L, 33L, 44L, 60L).map(Tuple1(_)).toDF("p")
    val got = RangeIndex.lookupAtRest(spark, pts, "p", table)
      .select("iv", "p").as[(Long, Long)].collect().toSeq
    // p=5 must NOT hit iv 1's stale [0,25] extent; each hit exactly once
    assert(got.sorted == Seq((1L, 33L), (2L, 44L), (2L, 60L)))
    // overlap probe: a query on iv 1's OLD extent must miss too
    val q = Seq((9L, 0L, 25L)).toDF("qid", "qs", "qe")
    val hits = RangeIndex.overlapLookupAtRest(spark, q, "qs", "qe", table)
      .select("iv").as[Long].collect().toSeq
    assert(hits.isEmpty)
  }

  test("RangeIndex endpoint index: pair-free at-rest counts equal brute force; commits replay and move bounds correctly") {
    import graft.operators.RangeIndex
    val stored = Seq(
      (0, 11L, 20L, 60L), (0, 12L, 5L, 9L), (1, 13L, -10L, -1L),
      (1, 14L, 42L, 99L), (2, 15L, 7L, 7L)
    )
    val table = graft.table.WarehouseTable(tmpDir("epix") + "/idx")
    val (seed, late) = stored.splitAt(2)
    RangeIndex.countIndexAtRest(seed.toDF("grp", "iv", "s", "e"),
      "s", "e", Seq("grp", "iv"), table, bucketWidth = 10L, partBuckets = 4)
    // first commit plants iv 15 at a WRONG extent far away (cell moves
    // on the fix-up), then the fixed bounds, then an exact replay
    RangeIndex.countIndexCommit(spark,
      (late.dropRight(1) :+ ((2, 15L, 777L, 777L))).toDF("grp", "iv", "s", "e"), table)
    RangeIndex.countIndexCommit(spark, late.toDF("grp", "iv", "s", "e"), table)
    RangeIndex.countIndexCommit(spark, late.toDF("grp", "iv", "s", "e"), table)
    // store holds exactly 2 endpoint rows per interval — no stale rows
    assert(table.read(spark).count() == 2L * stored.size)
    val probes = Seq(
      (0, 91L, 0L, 25L), (0, 92L, 5L, 5L), (1, 93L, -14L, -10L),
      (2, 94L, 40L, 41L), (2, 95L, 777L, 777L)
    )
    def brute(excl: Boolean): Map[Long, Long] =
      probes.map { case (g, id, qs, qe) =>
        id -> stored.count { case (g2, _, s, e) =>
          s <= qe && qs <= e && (!excl || g2 != g)
        }.toLong
      }.toMap
    val p = probes.toDF("grp", "pid", "qs", "qe")
    val got = RangeIndex.overlapCountsAtRest(
        spark, p, "qs", "qe", excludeKey = Some("grp"), table)
      .select("pid", "n_overlaps").as[(Long, Long)].collect().toMap
    assert(got == brute(excl = true))
    val gotAll = RangeIndex.overlapCountsAtRest(
        spark, p, "qs", "qe", excludeKey = None, table)
      .select("pid", "n_overlaps").as[(Long, Long)].collect().toMap
    assert(gotAll == brute(excl = false))
    // flavor guards: cell probes refuse endpoint tables and vice versa
    intercept[IllegalArgumentException] {
      RangeIndex.lookupAtRest(spark, p.select(col("qs").as("p")), "p", table)
    }
  }

  test("RangeIndex.overlapLookupAtRest equals direct overlapJoin; owner-cell exactly-once across shared cells") {
    import graft.operators.RangeIndex
    val stored = Seq(
      (11L, 20L, 60L), (12L, 5L, 9L), (13L, -10L, -1L), (14L, 42L, 99L)
    )
    val queries = Seq(
      (1L, 0L, 25L), (2L, 5L, 5L), (3L, -14L, -10L), (4L, 40L, 41L),
      (5L, 18L, 63L) // shares 5 cells with iv 11 -> one emission
    )
    val table = graft.table.WarehouseTable(tmpDir("orix") + "/idx")
    RangeIndex.indexAtRest(stored.toDF("iv", "s", "e"), "s", "e",
      Seq("iv"), table, bucketWidth = 10L, partBuckets = 4)
    val q = queries.toDF("qid", "qs", "qe")
    val got = RangeIndex.overlapLookupAtRest(spark, q, "qs", "qe", table)
      .select("qid", "iv").as[(Long, Long)].collect().toSeq
    val direct = TemporalJoins.overlapJoin(
      q, stored.toDF("iv", "s", "e"), "qs", "qe", "s", "e", 10L)
      .select("qid", "iv").as[(Long, Long)].collect().toSeq
    assert(got.sorted == direct.sorted)
    assert(got.size == got.distinct.size)
    val expect = for {
      (qid, qs, qe) <- queries
      (iv, s, e) <- stored if qs <= e && s <= qe
    } yield (qid, iv)
    assert(got.sorted == expect.sorted)
  }
}
