package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Forget
import graft.table.WarehouseTable

class ForgetSpec extends SparkSpec {
  import spark.implicits._

  test("forget cascades across COW corpus, multi-row index, and MOR table; audit counts; replay no-op") {
    val root = tmpDir("forget")
    val docs = (1L to 40L).map(i => (i, s"text-$i")).toDF("doc_id", "text")
    val corpus = WarehouseTable(s"$root/corpus")
    corpus.create(docs.schema, None, WarehouseTable.tableProperties("COW", "snappy"))
    corpus.append(docs)
    // band-index-like derived table: 3 rows per doc, keyed (doc_id, band)
    val bands = docs.select(col("doc_id"),
      explode(array(lit(0), lit(1), lit(2))).as("band"))
    val idx = WarehouseTable(s"$root/idx")
    idx.create(bands.schema, None, Map.empty)
    idx.append(bands)
    // MOR table keyed doc_id
    val mor = WarehouseTable(s"$root/mor")
    mor.create(docs.schema, None, WarehouseTable.tableProperties("MOR", "snappy"))
    mor.append(docs)

    val ids = Seq(3L, 7L, 7L, 11L, 999L).toDF("the_id") // dup + absent ids
    val targets = Seq(
      Forget.Target(corpus, "doc_id"),
      Forget.Target(idx, "doc_id", keys = Seq("doc_id", "band")),
      Forget.Target(mor, "doc_id"))
    val report = Forget.forget(spark, ids, targets)
    // audit receipt: rows deleted per table (3 docs present, 999 absent)
    assert(report(corpus.root) == 3L)
    assert(report(idx.root) == 9L)
    assert(report(mor.root) == 3L)
    val expect = (1L to 40L).filterNot(Set(3L, 7L, 11L)).toSeq
    assert(corpus.read(spark).select("doc_id").as[Long]
      .collect().sorted.toSeq == expect)
    assert(idx.read(spark).select("doc_id").distinct().as[Long]
      .collect().sorted.toSeq == expect)
    assert(idx.read(spark).count() == expect.size * 3L)
    assert(mor.read(spark).select("doc_id").as[Long]
      .collect().sorted.toSeq == expect)
    // replay: the same request deletes nothing further
    val again = Forget.forget(spark, ids, targets)
    assert(again.values.forall(_ == 0L))
    assert(corpus.read(spark).count() == expect.size.toLong)
  }

  test("forgetWhere: predicate cascade — position deletes on MOR, dir rewrite on COW, replay no-op") {
    val root = tmpDir("forgetw")
    val docs = (1L to 30L).map(i =>
      (i, s"text-$i", if (i % 3 == 0) "bad-src" else "good-src"))
      .toDF("doc_id", "text", "source")
    val cow = WarehouseTable(s"$root/cow")
    cow.create(docs.schema, None, WarehouseTable.tableProperties("COW", "snappy"))
    cow.append(docs)
    val mor = WarehouseTable(s"$root/mor")
    mor.create(docs.schema, None, WarehouseTable.tableProperties("MOR", "snappy"))
    mor.append(docs)
    // "forget everything from bad-src" — no key columns anywhere
    val report = Forget.forgetWhere(
      spark, col("source") === "bad-src", Seq(cow, mor))
    assert(report(cow.root) == 10L)
    assert(report(mor.root) == 10L)
    val expect = (1L to 30L).filterNot(_ % 3 == 0).toSeq
    assert(cow.read(spark).select("doc_id").as[Long]
      .collect().sorted.toSeq == expect)
    assert(mor.read(spark).select("doc_id").as[Long]
      .collect().sorted.toSeq == expect)
    // the MOR path wrote a sidecar, not a rewrite
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(mor.root, "posdel")))
    // replay: the predicate matches nothing now
    val again = Forget.forgetWhere(
      spark, col("source") === "bad-src", Seq(cow, mor))
    assert(again.values.forall(_ == 0L))
  }
}
