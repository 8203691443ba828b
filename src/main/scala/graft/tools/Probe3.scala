package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(l: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime()-t0)/1e9
      }
      println(f"[probe] $l%-34s min ${ts.min}%6.2f  (${ts.map(t=>f"$t%.2f").mkString("/")})")
    }
    // synthesize a base+deltas arbitration input: 45k rows, 40k keys
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val base = docs.withColumn("__seq", lit(0L)).withColumn("__ts", lit(false))
    val frames = (1 to 6).map(i => docs.filter(col("doc_id") % 4 === 0)
      .withColumn("__seq", lit(i.toLong)).withColumn("__ts", lit(false)))
    val unioned = (base +: frames).reduce(_ unionByName _).localCheckpoint()
    println("rows=" + unioned.count())
    time("arb window row_number")(
      graft.operators.Dedup.latestByKey(unioned, Seq("doc_id"), orderDesc = "__seq")
        .filter(!col("__ts")))
    time("arb max_by struct")(
      unioned.groupBy(col("doc_id"))
        .agg(max_by(struct(col("lang"), col("n_chars"), col("__ts")), col("__seq")).as("w"))
        .select(col("doc_id"), col("w.lang"), col("w.n_chars"), col("w.__ts"))
        .filter(!col("__ts")))
    spark.stop()
  }
}
