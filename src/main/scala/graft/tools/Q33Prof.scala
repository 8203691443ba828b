package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown for q33_cdc_delete_pipeline (round-12 bench moved it
  * 1.25 -> 1.52 s; which phase grew?):
  * runMain graft.tools.Q33Prof [sfDir]
  */
object Q33Prof {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[q33]   $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    (1 to 3).foreach { round =>
      val fn = graft.SparkEntry.queries("q33_cdc_delete_pipeline")
      time(s"warm$round-total") { fn(s, dir).collect() }
    }
    // phase breakdown, mirroring the gate body
    import graft.operators.Dedup
    val wh = sys.props("java.io.tmpdir") + "/graft_q33_scratch/events_t"
    val table = graft.table.WarehouseTable(wh)
    table.drop()
    val evdf = time("read-events") {
      // the gate's raw-long schema read (SparkEntry.events) + ns-normalize
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      spark.read.schema(schema).parquet(s"$dir/events.parquet")
        .withColumn("ts",
          when(col("ts") < 40000000000000000L, col("ts") * 1000L)
            .otherwise(col("ts")))
        .withColumn("ts_us", expr("ts div 1000"))
    }
    val keys = Seq("user_id", "event_type")
    val cut = lit(1705363200L * 1000000000L)
    val cols = Seq("user_id", "event_type", "event_id", "value")
    val b1 = Dedup.latestByKey(evdf.filter(col("ts") < cut), keys, "ts_us",
      Seq("event_id")).select(cols.map(col): _*)
    val b2 = Dedup.latestByKey(evdf.filter(col("ts") >= cut), keys, "ts_us",
      Seq("event_id")).select(cols.map(col): _*)
      .withColumn("op",
        when(col("event_id") % 10 === 0, lit("D")).otherwise(lit("U")))
    time("create") { table.create(b1.schema, partition = Some("event_type"),
      properties = graft.table.WarehouseTable.tableProperties("COW", "snappy")) }
    time("merge1") { table.merge(s, b1, keys) }
    time("merge2") { table.merge(s, b2, keys,
      deleteWhere = Some(col("op").isin("D"))) }
    time("read") { table.read(s).select(cols.map(col): _*).collect() }
    spark.stop()
  }
}
