package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(l: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime()-t0)/1e9
      }
      println(f"[probe] $l%-34s min ${ts.min}%6.2f  (${ts.map(t=>f"$t%.2f").mkString("/")})")
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    time("li scan all cols")(li)
    time("li scan 6 cols")(li.select("l_shipdate","l_returnflag","l_linestatus","l_quantity","l_extendedprice","l_discount"))
    val filtered = li.filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
    time("q01 full")(graft.SparkEntry.queries("q01_pricing_summary")(spark, dir))
    time("q01 no countDistinct")(
      filtered.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows")))
    time("q01 countDistinct only")(
      filtered.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders")))
    time("q01 double sums (non-oracle)")(
      filtered.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")))
    time("q02 full")(graft.SparkEntry.queries("q02_revenue_by_nation")(spark, dir))
    time("q29 full")(graft.SparkEntry.queries("q29_unpivot")(spark, dir))
    graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).explain("formatted")
    spark.stop()
  }
}
