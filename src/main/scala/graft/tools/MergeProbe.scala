package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the fixed cost of a small keyed merge — the per-commit bill
  * every warehouse gate (and at 100 TB every micro-batch ingest) pays.
  * Interleaved A/B in one JVM, same methodology as the round-16 write
  * fan-out probes: each labeled step times best-of-N on the SAME batch so
  * box drift cancels. Steps:
  *
  *   srcNoop   — evaluate the batch plan through the noop sink (the floor:
  *               what the merge's input costs with no table machinery)
  *   plainWrite— bare df.write.partitionBy(parquet) of the batch, no
  *               warehouse involvement (the Spark writer floor)
  *   mergeMor  — full WarehouseTable.merge on a MOR table
  *   mergeCow  — full WarehouseTable.merge on a COW table
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        concat(col("text"), lit(" [u]")).as("text"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    def timed(label: String, reps: Int)(f: => Unit): Unit = {
      f // warmup
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      System.err.println(f"[probe] $label%-16s $best%7.3f s")
    }
    timed("srcNoop", 3) {
      batch.write.format("noop").mode("overwrite").save()
    }
    val tmp = java.nio.file.Files.createTempDirectory("mergeprobe").toString
    var n = 0
    timed("plainWrite", 3) {
      n += 1
      batch.write.partitionBy("lang").parquet(s"$tmp/plain$n")
    }
    timed("plainWrite32", 3) {
      n += 1
      batch.repartition(cpus.toInt, col("lang"))
        .write.partitionBy("lang").parquet(s"$tmp/plain$n")
    }
    def freshTable(mode: String): graft.table.WarehouseTable = {
      n += 1
      val t = graft.table.WarehouseTable(s"$tmp/t$n")
      t.create(docs.schema, Some("lang"),
        graft.table.WarehouseTable.tableProperties(mode, "snappy") +
          ("compact.delta.threshold" -> "0"))
      t.merge(spark, docs, Seq("doc_id"))
      t
    }
    val morT = freshTable("MOR")
    timed("mergeMor", 3) { morT.merge(spark, batch, Seq("doc_id")) }
    val cowT = freshTable("COW")
    timed("mergeCow", 3) { cowT.merge(spark, batch, Seq("doc_id")) }
    // an EMPTY batch: the pure machinery floor (no rows move)
    val empty = docs.filter(lit(false))
    timed("mergeMorEmpty", 3) { morT.merge(spark, empty, Seq("doc_id")) }
    timed("mergeCowEmpty", 3) { cowT.merge(spark, empty, Seq("doc_id")) }
    spark.stop()
  }
}
