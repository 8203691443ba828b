package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the EXECUTED physical plan of one gated query (post-AQE, the plan
  * that actually ran — a pre-execution explain still shows speculative
  * join strategies). runMain graft.tools.PlanDump <queryName> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val n = df.count()
    // scalastyle:off println
    println(s"=== $name rows=$n executed plan ===")
    println(df.queryExecution.executedPlan.toString)
    // scalastyle:on println
    spark.stop()
  }
}
