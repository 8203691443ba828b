package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the physical-plan markers that matter at scale for
  * each query (pushdown, window-group-limit, join strategies, partial
  * aggregation, codegen coverage) so regressions in plan shape are visible
  * without reading full explains. runMain graft.tools.ExplainAudit [sfDir]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val markers = Seq(
      "PushedFilters" -> "pushed",
      "WindowGroupLimit" -> "wgl",
      "BroadcastHashJoin" -> "bhj",
      "SortMergeJoin" -> "smj",
      "BroadcastNestedLoopJoin" -> "bnlj",
      "CartesianProduct" -> "cartesian",
      "partial_" -> "partialAgg",
      "WholeStageCodegen" -> "codegen",
      "ReusedExchange" -> "reusedEx")
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      // the warehouse queries execute side effects on explain; skip them
      if (!Set("q17_warehouse_cdc", "q23_sql_merge", "q30_merge_schema_evolution").contains(name)) {
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val found = markers.collect { case (m, tag) if plan.contains(m) => tag }
          println(s"[audit] $name: ${found.mkString(" ")}")
        } catch {
          case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
        }
      }
    }
    spark.stop()
  }
}
