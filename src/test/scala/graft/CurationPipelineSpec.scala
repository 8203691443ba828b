package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CurationPipeline
import graft.pipeline.CurationPipeline.Config

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config(minWords = 5, sampleHex = "zz") // keep-all sample

  test("curation tags each stage's decision and keep is their conjunction") {
    // ≥12 distinct words each: a fully-diverse doc under ~11 words would
    // trip the 0.18 bigram floor (2/n) — see the Repetition scaladoc
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near an oak"),  // clean
      (2L, "the quick brown fox jumps over a lazy dog near an oak"),  // dup of 1
      (3L, "spam spam spam spam spam spam spam spam"),                // repetitive
      (4L, "too few words"),                                          // short
      (5L, "mail me at someone@example.com for the long details today ok thanks much")
    ).toDF("doc_id", "text")
    val tagged = CurationPipeline.curate(docs, "doc_id", "text", cfg)
      .select("doc_id", "exact_dup", "repetitive", "short", "keep", "n_email")
      .as[(Long, Int, Int, Int, Int, Long)].collect().sortBy(_._1)
    assert(tagged(0) == ((1L, 0, 0, 0, 1, 0L)))
    assert(tagged(1) == ((2L, 1, 0, 0, 0, 0L))) // first occurrence (id 1) wins
    assert(tagged(2) == ((3L, 0, 1, 0, 0, 0L)))
    assert(tagged(3) == ((4L, 0, 1, 1, 0, 0L))) // short AND bigram-floor repetitive
    assert(tagged(4) == ((5L, 0, 0, 0, 1, 1L))) // scrubbed but kept
    // the kept corpus carries no raw PII
    val kept = CurationPipeline.keepOnly(
      CurationPipeline.curate(docs, "doc_id", "text", cfg))
    assert(kept.filter(col("text").contains("@example.com")).count() == 0L)
    assert(kept.filter(col("text").contains("[EMAIL]")).count() == 1L)
  }

  test("audit is one aggregation whose sums match the tagged frame") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val tagged = CurationPipeline.curate(docs, "doc_id", "text", cfg).cache()
    val a = CurationPipeline.audit(tagged, cfg).collect().head
    assert(a.getAs[Long]("n_docs") == tagged.count())
    assert(a.getAs[Long]("n_kept") == tagged.filter(col("keep") === 1).count())
    assert(a.getAs[Long]("n_exact_dup") ==
      tagged.filter(col("exact_dup") === 1).count())
    // conjunction invariant: kept rows carry no flag
    assert(tagged.filter(col("keep") === 1)
      .filter(col("exact_dup") === 1 || col("repetitive") === 1
        || col("short") === 1 || col("sampled_out") === 1).count() == 0L)
    tagged.unpersist()
    ()
  }

  test("scrub=false trusts pre-scrubbed input: zero PII audit, text as-is") {
    val docs = Seq(
      (1L, "already scrubbed content [EMAIL] with plenty of distinct words here ok thanks")
    ).toDF("doc_id", "text")
    val tagged = CurationPipeline.curate(docs, "doc_id", "text",
      cfg.copy(scrub = false))
      .select("doc_id", "text", "n_email", "keep")
      .as[(Long, String, Long, Int)].collect()
    assert(tagged.head._2.contains("[EMAIL]")) // untouched
    assert(tagged.head._3 == 0L)
    assert(tagged.head._4 == 1)
  }

  test("null text flows through as empty: tagged short, never dropped") {
    val docs = Seq(
      (1L, "a perfectly ordinary document with plenty of distinct words in here"),
      (2L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val tagged = CurationPipeline.curate(docs, "doc_id", "text", cfg)
      .select("doc_id", "short", "keep")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(tagged.length == 2) // the null-text row is not silently lost
    assert(tagged(1) == ((2L, 1, 0)))
  }

  test("dedup keeps the scrubbed-identical pair together") {
    // two docs whose RAW texts differ only in their PII payload become
    // identical after scrubbing — the dedup must see the scrubbed text
    val docs = Seq(
      (1L, "reach me at alice@example.com about the big contract now"),
      (2L, "reach me at bob@other.org about the big contract now")
    ).toDF("doc_id", "text")
    val tagged = CurationPipeline.curate(docs, "doc_id", "text", cfg)
      .select("doc_id", "exact_dup").as[(Long, Int)].collect().sortBy(_._1)
    assert(tagged(0) == ((1L, 0)))
    assert(tagged(1) == ((2L, 1))) // dup only because dedup ran post-scrub
  }
}
