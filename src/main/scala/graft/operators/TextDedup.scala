package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shingles
import graft.functions.SimHash64

/** Near-duplicate detection for document corpora, built as candidate
  * pruning (LSH) + exact verification — the only shape that scales: the
  * verify step makes the output well-defined (all pairs with shingle
  * Jaccard ≥ τ among candidates), while the candidate generator bounds the
  * join so nothing is O(n²) at 100 TB.
  *
  * Three candidate generators over the same verification core:
  *  - [[allPairsByShingle]]  — exact: every pair sharing ≥1 shingle
  *    (inverted-index join, the brute-force baseline)
  *  - [[minHashCandidates]]  — MinHash signatures banded into buckets
  *    (Broder 1997; banding per Leskovec/Rajaraman/Ullman ch.3)
  *  - [[simHashCandidates]]  — 64-bit SimHash, candidates share one of
  *    four 16-bit blocks (pigeonhole over hamming ≤ 3)
  *
  * All three are pure DataFrame programs: map-side signature computation,
  * one shuffle on the bucket key, distinct, verify. No driver-side loops.
  */
object TextDedup {

  /** doc_id, shingle-array, shingle-count for a text column. */
  def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))

  /** Exact verification of candidate pairs (columns d1, d2) against the
    * shingle sets; emits pairs with Jaccard ≥ threshold.
    */
  def verifyPairs(
      candidates: DataFrame,
      sh: DataFrame,
      threshold: Double): DataFrame = {
    val left = sh.select(col("doc_id").as("d1"), col("sh").as("sh1"), col("n_sh").as("n1"))
    val right = sh.select(col("doc_id").as("d2"), col("sh").as("sh2"), col("n_sh").as("n2"))
    candidates
      .join(left, "d1").join(right, "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Inverted-index candidate join: pairs sharing at least one shingle.
    * Exact (recall 1.0) but the per-shingle fanout is quadratic in document
    * frequency — fine when shingles are rare, the baseline for comparing
    * the LSH generators.
    */
  def allPairsByShingle(sh: DataFrame): DataFrame = {
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("tok"))
    val exB = ex.select(col("doc_id").as("doc_id_b"), col("tok").as("tok_b"))
    ex.join(exB, col("tok") === col("tok_b") && col("doc_id") < col("doc_id_b"))
      .select(col("doc_id").as("d1"), col("doc_id_b").as("d2"))
      .distinct()
  }

  /** MinHash signature: for hash function i, sig_i = min over shingles of
    * xxhash64(i, shingle). Pure column expressions — the signature is
    * computed map-side in codegen, one pass per document.
    */
  def minHashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, x => xxhash64(lit(i), x)))
    }: _*)

  /** Banded MinHash candidates: `bands` buckets of `rows` signature slots
    * each; two documents are candidates iff some band hashes identically.
    * P(candidate | jaccard j) = 1-(1-j^rows)^bands — with (16,4):
    * j=0.9 → ~1-2e-8, j=0.3 → 0.12.
    */
  def minHashCandidates(sh: DataFrame, bands: Int = 16, rows: Int = 4): DataFrame = {
    val withSig = sh.withColumn("sig", minHashSignature(col("sh"), bands * rows))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rows).map(r => col("sig")(b * rows + r)): _*).as("bh"))
    }
    val exploded = withSig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val right = exploded.select(
      col("doc_id").as("doc_id_b"), col("band").as("band_b"), col("bh").as("bh_b"))
    exploded.join(right,
        col("band") === col("band_b") && col("bh") === col("bh_b") &&
          col("doc_id") < col("doc_id_b"))
      .select(col("doc_id").as("d1"), col("doc_id_b").as("d2"))
      .distinct()
  }

  /** SimHash candidates: fingerprint the token array (custom codegen
    * expression [[SimHash64]]), split into eight 8-bit blocks, equi-join on
    * any equal block (pigeonhole: hamming ≤ 7 ⇒ ≥1 equal block), then keep
    * pairs within `maxHamming` bits. Block width trades join fanout against
    * guaranteed recall radius — at corpus scale use 16-bit blocks and a
    * multi-probe rotation instead.
    */
  def simHashCandidates(
      docsTokens: DataFrame, // doc_id, toks (array<string>)
      maxHamming: Int = 20): DataFrame = {
    val fp = docsTokens.select(
      col("doc_id"), SimHash64(col("toks")).as("fp"))
    val blocks = fp.select(
      col("doc_id"), col("fp"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("fp"), b * 8).bitwiseAND(lit(0xffL)).as("bv"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("fp"), col("bk.blk").as("blk"), col("bk.bv").as("bv"))
    val right = blocks.select(
      col("doc_id").as("doc_id_b"), col("fp").as("fp_b"),
      col("blk").as("blk_b"), col("bv").as("bv_b"))
    blocks.join(right,
        col("blk") === col("blk_b") && col("bv") === col("bv_b") &&
          col("doc_id") < col("doc_id_b"))
      .select(col("doc_id").as("d1"), col("doc_id_b").as("d2"),
        bit_count(col("fp").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"))
      .distinct()
  }
}
