package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, MergeInto}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-scalacheck property driver (no scalatestplus bridge in the
    * offline cache): deterministic seeds, N trials.
    */
  private def forAllSeeded[A](gen: Gen[A], trials: Int = 8)(body: A => Unit): Unit =
    (0 until trials).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(42L + i)).get)
    }

  test("latestByKey keeps exactly the newest row per key, tiebreak applies") {
    val df = Seq(
      (1, "a", 10L, 100L),
      (1, "b", 20L, 101L),
      (1, "c", 20L, 99L), // same ts as b: tiebreak on id desc -> b wins
      (2, "x", 5L, 1L)
    ).toDF("k", "v", "ts", "id")
    val out = Dedup.latestByKey(df, Seq("k"), "ts", Seq("id"))
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(out == Set((1, "b"), (2, "x")))
  }

  test("exactByColumns keeps the min-keep row per duplicate group") {
    val df = Seq(
      ("dup", 3), ("dup", 1), ("dup", 2), ("solo", 9)
    ).toDF("txt", "id")
    val out = Dedup.exactByColumns(df, Seq("txt"), "id")
      .as[(String, Int)].collect().toSet
    assert(out == Set(("dup", 1), ("solo", 9)))
  }

  test("upsertAll: source wins on match, others preserved, inserts appear") {
    val target = Seq((1, "t1"), (2, "t2")).toDF("k", "v")
    val source = Seq((2, "s2"), (3, "s3")).toDF("k", "v")
    val out = MergeInto.upsertAll(target, source, Seq("k"))
      .as[(Int, String)].collect().toSet
    assert(out == Set((1, "t1"), (2, "s2"), (3, "s3")))
  }

  test("upsertColumns: null keys match null-safely with correct arbitration") {
    val target = Seq((Option.empty[Int], "t1", "keep")).toDF("k", "v", "w")
    val source = Seq((Option.empty[Int], "s1", "SRC")).toDF("k", "v", "w")
    val out = MergeInto.upsertColumns(target, source, Seq("k"), Seq("v"))
      .select("v", "w").as[(String, String)].collect().toSeq
    // the <=> join matches the null keys: v updates, w stays from target
    assert(out == Seq(("s1", "keep")))
  }

  test("upsertColumns: non-listed columns keep target values on match") {
    val target = Seq((1, "t1", "keep1"), (2, "t2", "keep2")).toDF("k", "v", "w")
    val source = Seq((2, "s2", "SRC"), (3, "s3", "SRC")).toDF("k", "v", "w")
    val out = MergeInto.upsertColumns(target, source, Seq("k"), Seq("v"))
      .as[(Int, String, String)].collect().toSet
    assert(out == Set(
      (1, "t1", "keep1"),
      (2, "s2", "keep2"), // v updated, w kept from target
      (3, "s3", "SRC")))  // insert takes all source columns
  }

  // ---- merge algebra properties (SURVEY.md §5.4) -------------------------

  private val rowGen = for {
    k <- Gen.choose(0, 20)
    ts <- Gen.choose(0L, 50L)
    v <- Gen.alphaStr.map(_.take(6))
  } yield (k, ts, v)

  private val batchGen = Gen.listOfN(30, rowGen)
  private val twoBatches = Gen.zip(batchGen, batchGen)

  test("property: upsert is idempotent") {
    forAllSeeded(twoBatches) { case (t0, b) =>
      val target = Dedup.latestByKey(
        t0.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val batch = Dedup.latestByKey(
        b.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val once = MergeInto.upsertAll(target, batch, Seq("k"))
      val twice = MergeInto.upsertAll(once, batch, Seq("k"))
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("property: result keys = union of target and source keys") {
    forAllSeeded(twoBatches) { case (t0, b) =>
      val target = Dedup.latestByKey(
        t0.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val batch = Dedup.latestByKey(
        b.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val out = MergeInto.upsertAll(target, batch, Seq("k"))
      val keys = out.select("k").as[Int].collect().toSet
      assert(keys == (t0.map(_._1).toSet ++ b.map(_._1).toSet))
      // and still <= 1 row per key
      assert(out.count() == keys.size)
    }
  }

  test("property: the upsert MERGE program == upsertAll on any input") {
    // applyClauses with the plain upsert program must be observationally
    // identical to the specialized anti-join rewrite
    forAllSeeded(twoBatches) { case (t0, b) =>
      val target = Dedup.latestByKey(
        t0.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val batch = Dedup.latestByKey(
        b.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val viaProgram = MergeInto.applyClauses(target, batch, Seq("k"),
        MergeInto.upsertProgram(Seq("k", "ts", "v"), Seq("k")))
      val viaAnti = MergeInto.upsertAll(target, batch, Seq("k"))
      assert(viaProgram.collect().toSet == viaAnti.collect().toSet)
    }
  }

  test("property: delete clause == upsert then anti-join on delete keys") {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    forAllSeeded(twoBatches) { case (t0, b) =>
      val target = Dedup.latestByKey(
        t0.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val batch = Dedup.latestByKey(
        b.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val del = col("ts") % 3 === 0 // arbitrary predicate over the batch
      val viaProgram = MergeInto.applyClauses(target, batch, Seq("k"),
        MergeInto.MergeClauses(
          matched = Seq(
            MergeInto.DeleteClause(Some(del)),
            MergeInto.UpdateClause(None, Map("ts" -> col("ts"), "v" -> col("v")))),
          notMatched = Seq(MergeInto.InsertClause(
            Some(not(coalesce(del, lit(false)))),
            Map("k" -> col("k"), "ts" -> col("ts"), "v" -> col("v"))))))
      // reference semantics: upsert the non-delete rows, then remove all
      // keys the batch marked for deletion
      val deletes = batch.filter(del).select("k")
      val expected = MergeInto.upsertAll(target, batch.filter(!del), Seq("k"))
        .join(deletes, Seq("k"), "left_anti")
      assert(viaProgram.collect().toSet == expected.collect().toSet)
    }
  }

  test("property: last-writer-wins — B1 then B2 == dedup(B1 ∪ B2) when ts distinct") {
    // force globally distinct timestamps so LWW order is total
    forAllSeeded(twoBatches) { case (b1raw, b2raw) =>
      val b1 = b1raw.zipWithIndex.map { case ((k, _, v), i) => (k, i.toLong * 2, v) }
      val off = b1raw.size * 2L
      val b2 = b2raw.zipWithIndex.map { case ((k, _, v), i) => (k, off + i * 2L, v) }
      val d1 = Dedup.latestByKey(b1.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val d2 = Dedup.latestByKey(b2.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      val sequential = MergeInto.upsertAll(d1, d2, Seq("k"))
      val combined = Dedup.latestByKey(
        (b1 ++ b2).toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
      assert(sequential.select("k", "v").collect().toSet ==
        combined.select("k", "v").collect().toSet)
    }
  }
}
