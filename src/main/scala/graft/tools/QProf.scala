package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc single-query profiler: runMain graft.tools.QProf <query> [sfDir] */
object QProf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[qprof]   $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def trivial(spark: SparkSession, label: String): Unit = {
    val t0 = System.nanoTime()
    spark.range(1000).selectExpr("sum(id)").collect()
    System.err.println(f"[qprof]   trivial-$label ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def q17stages(spark: SparkSession, dir: String): Unit = {
    trivial(spark, "pre")
    import graft.operators.Dedup
    val s = spark
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString + "/events_t"
    val table = graft.table.WarehouseTable(wh)
    val ev = graft.SparkEntry.queries // force object init
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val evdf = s.read.schema(schema).parquet(s"$dir/events.parquet")
      // normalize to epoch-nanos whichever unit the testdata generation
      // used (micros since round 7 — the SparkEntry.events rule)
      .withColumn("ts",
        when(col("ts") < 40000000000000000L, col("ts") * 1000L)
          .otherwise(col("ts")))
      .withColumn("ts_us", expr("ts div 1000"))
    val keys = Seq("user_id", "event_type")
    val cut = lit(1705363200000000000L)
    val cols = Seq("user_id", "event_type", "event_id", "value")
    val b1 = Dedup.latestByKey(evdf.filter(col("ts") < cut), keys, "ts_us", Seq("event_id"))
      .select(cols.map(col): _*)
    val b2 = Dedup.latestByKey(evdf.filter(col("ts") >= cut), keys, "ts_us", Seq("event_id"))
      .select(cols.map(col): _*)
    time("b1.count")(b1.count())
    time("b2.count")(b2.count())
    time("create")(table.create(b1.schema, partition = Some("event_type"),
      properties = graft.table.WarehouseTable.tableProperties("COW", "snappy")))
    time("merge b1")(table.merge(s, b1, keys))
    trivial(spark, "mid")
    time("merge b2")(table.merge(s, b2, keys))
    trivial(spark, "post")
    time("read.count")(table.read(s).count())
    trivial(spark, "end")
  }

  def q35stages(spark: SparkSession, dir: String): Unit = {
    val np = spark.sparkContext.defaultParallelism
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fps = graft.operators.TextDedup.winnowFingerprints(
      docs, "doc_id", "text", k = 3, window = 4)
    time("fps.count")(fps.count())
    time("fps agg-minfp")( // forces real fp evaluation (count() prunes it)
      fps.groupBy(col("doc_id")).agg(min(col("fp"))).count())
    val distinctOnly = fps.select(col("doc_id"), col("fp")).distinct()
    time("distinct.count")(distinctOnly.count())
    val dfp = distinctOnly.repartition(np, col("fp"))
    time("dfp.count")(dfp.count())
    System.err.println(dfp.queryExecution.executedPlan.toString.take(4000))
    val right = dfp.select(col("doc_id").as("doc_id_b"), col("fp").as("fp_b"))
    val pairs = dfp.join(right,
        col("fp") === col("fp_b") && col("doc_id") < col("doc_id_b"))
      .groupBy(col("doc_id").as("d1"), col("doc_id_b").as("d2"))
      .agg(count(lit(1)).as("shared"))
    time("pairs.count")(pairs.count())
    // variant: checkpoint the (small) fingerprint index, then join
    val ck = time("dfp.localCheckpoint")(distinctOnly.localCheckpoint())
    val ckR = ck.repartition(np, col("fp"))
    val rightCk = ckR.select(col("doc_id").as("doc_id_b"), col("fp").as("fp_b"))
    val pairsCk = ckR.join(rightCk,
        col("fp") === col("fp_b") && col("doc_id") < col("doc_id_b"))
      .groupBy(col("doc_id").as("d1"), col("doc_id_b").as("d2"))
      .agg(count(lit(1)).as("shared"))
    time("pairsCk.count")(pairsCk.count())
    // variant: wider shuffle for the distinct
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    time("distinct @256")(fps.select(col("doc_id"), col("fp")).distinct().count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("distinct @256 noAQE")(fps.select(col("doc_id"), col("fp")).distinct().count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", np.toString)
    time("full q35")(
      graft.operators.TextDedup.winnowMatches(fps, 0.5).count())
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    (1 to reps).foreach { i =>
      if (name.contains(",")) {
        name.split(",").foreach { n =>
          val t0 = System.nanoTime()
          if (n == "q17stages") q17stages(spark, sfDir)
          else if (n == "q35stages") q35stages(spark, sfDir)
          else {
            // noop sink, not count(): full-plan evaluation (see Bench)
            graft.SparkEntry.queries(n)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          }
          System.err.println(f"[qprof] run$i $n ${(System.nanoTime() - t0) / 1e9}%8.2f s")
          spark.catalog.clearCache()
          System.gc()
        }
      } else if (name == "q17stages") {
        val t0 = System.nanoTime()
        q17stages(spark, sfDir)
        System.err.println(f"[qprof] run$i total ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } else if (name == "q35stages") {
        val t0 = System.nanoTime()
        q35stages(spark, sfDir)
        System.err.println(f"[qprof] run$i total ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } else {
        val t0 = System.nanoTime()
        // noop sink, not count(): full-plan evaluation (see Bench)
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[qprof] run$i $name $dt%8.2f s")
      }
    }
    spark.stop()
  }
}
