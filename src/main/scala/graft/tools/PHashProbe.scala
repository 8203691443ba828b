package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** One-off measurement: planted-copy vs organic pHash hamming separation
  * on the synthesized image corpus — picks/validates the q69 radius.
  * Usage: runMain graft.tools.PHashProbe <sfDir>
  */
object PHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val originals = Multimodal.synthesizeImages(spark, docs, "doc_id")
    val copies = originals.filter(_.id % 10 == 0).map(r =>
      MediaRow(r.id + 1000000000000L, Multimodal.ImageCodec.resize(r.content, 2)))
    val hashes = Multimodal.imagePHashes(originals.union(copies)).cache()
    val n = hashes.count()
    // planted pair hammings (exact, by construction)
    val planted = hashes.as("a").join(hashes.as("b"),
        col("a.id") + 1000000000000L === col("b.id"))
      .select(expr("bit_count(a.phash ^ b.phash)").as("h"))
      .agg(min("h"), max("h"), avg("h")).collect()(0)
    println(s"n_images=$n planted min/max/avg hamming = $planted")
    // organic pair hammings among ORIGINALS (brute force — ok at probe SF)
    val orig = hashes.filter(col("id") < 1000000000000L)
    val organic = orig.as("a").join(orig.as("b"), col("a.id") < col("b.id"))
      .select(expr("bit_count(a.phash ^ b.phash)").as("h"))
    organic.groupBy(col("h")).count().orderBy("h").limit(12).show()
    // and cross pairs arrivals x non-matching originals
    val cross = hashes.filter(col("id") >= 1000000000000L).as("a")
      .join(orig.as("b"), col("a.id") - 1000000000000L =!= col("b.id"))
      .select(expr("bit_count(a.phash ^ b.phash)").as("h"))
    println("min organic=" + organic.agg(min("h")).collect()(0) +
      " min cross=" + cross.agg(min("h")).collect()(0))
    spark.stop()
  }
}
