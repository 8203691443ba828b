package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SimHash64
import graft.operators.TextDedup

/** Stage-level profile of the q13 SimHash128 path. */
object Q13Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[q13prof] $l%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    (1 to 2).foreach { rep =>
      System.err.println(s"[q13prof] --- rep $rep ---")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sh = TextDedup.shingled(docs, "doc_id", "text", 3)
      time("shingle.count")(sh.count())
      val toks = sh.select(col("doc_id"), col("sh").as("toks"))
      val fp = toks.select(col("doc_id"),
        SimHash64(col("toks")).as("fp1"), SimHash64.part2(col("toks")).as("fp2"))
      time("fp.count")(fp.count())
      val cands = TextDedup.simHash128Candidates(toks, maxHamming = 27)
      time("cands.count")(cands.count())
      time("verify.count")(TextDedup.verifyPairs(cands, sh, 0.5).count())
      // bucket-size skew: pairs enumerated per (blk, bv) key
      val nBlocks = 28
      val bounds = (0 to nBlocks).map(i => i * 128 / nBlocks)
      val fpr = fp.repartition(col("doc_id"))
      def bits(lo: Int, hi: Int) = {
        def from(word: org.apache.spark.sql.Column, base: Int) = {
          val l = math.max(lo, base); val h = math.min(hi, base + 64)
          if (l >= h) lit(0L)
          else {
            val width = h - l
            val mask = if (width == 64) -1L else (1L << width) - 1
            val piece = shiftrightunsigned(word, l - base).bitwiseAND(lit(mask))
            if (l == lo) piece else shiftleft(piece, l - lo)
          }
        }
        from(col("fp1"), 0).bitwiseOR(from(col("fp2"), 64))
      }
      val blocks = fpr.select(col("doc_id"),
        explode(array((0 until nBlocks).map { b =>
          struct(lit(b).as("blk"), bits(bounds(b), bounds(b + 1)).as("bv"))
        }: _*)).as("bk"))
        .select(col("bk.blk").as("blk"), col("bk.bv").as("bv"))
      val sizes = blocks.groupBy("blk", "bv").count()
      time("pairTotal")(System.err.println("[q13prof] total pairs = " +
        sizes.agg(sum(col("count") * (col("count") - 1) / 2)).head().get(0) +
        " max bucket = " + sizes.agg(max("count")).head().get(0)))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
