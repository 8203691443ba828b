package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SimHash64
import graft.operators.TextDedup

/** One-off measurement harness for the SimHash128 radius choice: prints the
  * 128-bit hamming distance of every TRUE near-dup pair (shingle Jaccard ≥
  * 0.5, the q11/q13 contract) per SF dir, worst-first. Only the signal tail
  * matters for the radius: a noise pair inside the radius is harmless (the
  * exact-Jaccard verify kills it), a signal pair outside it is a recall
  * bug. The q13 radius is set from these numbers with margin, not from a
  * Gaussian estimate.
  */
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sh = TextDedup.shingled(docs, "doc_id", "text", 3).cache()
      val fp = sh.select(
        col("doc_id"),
        SimHash64(col("sh")).as("fp1"),
        SimHash64.part2(col("sh")).as("fp2"))
      val truePairs = TextDedup.verifyPairs(
        TextDedup.allPairsByShingle(sh), sh, 0.5).cache()
      val f1 = fp.select(col("doc_id").as("d1"),
        col("fp1").as("fp1_1"), col("fp2").as("fp2_1"))
      val f2 = fp.select(col("doc_id").as("d2"),
        col("fp1").as("fp1_2"), col("fp2").as("fp2_2"))
      val sig = truePairs.join(f1, "d1").join(f2, "d2")
        .select(col("d1"), col("d2"), col("jaccard"),
          (bit_count(col("fp1_1").bitwiseXOR(col("fp1_2"))) +
            bit_count(col("fp2_1").bitwiseXOR(col("fp2_2")))).as("h128"))
        .orderBy(col("h128").desc)
      println(s"== $dir signal (true pairs, worst 10 of ${truePairs.count()}) ==")
      sig.show(10, truncate = false)
      sh.unpersist(); truePairs.unpersist()
    }
    spark.stop()
  }
}
