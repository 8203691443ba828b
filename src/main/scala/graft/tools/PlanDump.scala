package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the EXECUTED physical plans of one gated query (post-AQE, the
  * plans that actually ran — a pre-execution explain still shows
  * speculative join strategies, and driving execution with count() would
  * let Catalyst prune the plan under audit). The query is materialized
  * through the noop sink and every action's executed plan is captured via
  * a QueryExecutionListener (side-effecting queries run several).
  * runMain graft.tools.PlanDump <queryName> [sfDir]
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
    val plans = ExecutedPlans.capture(spark) {
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    // scalastyle:off println
    if (plans.isEmpty) {
      println(s"=== $name: WARN — no executed plans captured " +
        "(listener bus delivered nothing within the wait budget) ===")
    }
    plans.zipWithIndex.foreach { case (p, i) =>
      println(s"=== $name executed plan ${i + 1} ===")
      println(p)
    }
    // scalastyle:on println
    spark.stop()
    if (plans.isEmpty) sys.exit(1)
  }
}
