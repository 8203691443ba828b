package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan audit: prints the physical-plan markers that matter at scale for
  * each query (pushdown, window-group-limit, join strategies, partial
  * aggregation, codegen coverage) so regressions in plan shape are visible
  * without reading full explains. runMain graft.tools.ExplainAudit [sfDir]
  *
  * Side-effecting warehouse queries (q17/q23/q30) cannot be audited by
  * explaining the returned frame alone — explain would EXECUTE their merges
  * and the interesting plans (the partition-pruned COW rewrites) run inside
  * the pipeline, not in the final read. They are audited by EXECUTION
  * instead: a [[QueryExecutionListener]] captures every action's executed
  * plan while the query runs against its scratch warehouse, and the markers
  * aggregate over all captured plans — so merge-path plan regressions (a
  * broadcast falling back to shuffle, a cartesian sneaking into the
  * matched-partition probe) are visible in the same one-line format.
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
      "ShuffledHashJoin" -> "shj",
      "BroadcastNestedLoopJoin" -> "bnlj",
      "CartesianProduct" -> "cartesian",
      "partial_" -> "partialAgg",
      // executed-plan tree strings render whole-stage codegen spans as
      // "*(n) Operator" prefixes, not the node class name
      "*(" -> "codegen",
      "ReusedExchange" -> "reusedEx")
    // EVERY query is audited BY EXECUTION: a pre-execution explain shows
    // AQE's speculative plan (join strategies may still flip, and
    // WholeStageCodegen spans only appear in the final plan). The listener
    // captures each action's executed plan — for side-effecting queries
    // (q17/q23/q30/q33/q34) that includes the merge-path plans that run
    // inside the pipeline, for iterative ones (q36) every round.
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      try {
        // materialize via the noop SINK: under count() Catalyst prunes
        // every operator that can't change cardinality (q45's outer join
        // to a unique-keyed aggregate vanishes; map-only queries reduce
        // to row-count scans), so the captured "executed plan" was a
        // reduced one. The noop write evaluates the full plan.
        val plans = ExecutedPlans.capture(spark) {
          fn(spark, sfDir) // constructing fn executes pipeline side effects
            .write.format("noop").mode("overwrite").save()
        }
        val found = markers.collect {
          case (m, tag) if plans.exists(_.contains(m)) => tag
        }
        val empty = if (plans.isEmpty) "  WARN: nothing captured" else ""
        println(s"[audit] $name: ${found.mkString(" ")} (executed, ${plans.size} plans)$empty")
      } catch {
        case e: Throwable => println(s"[audit] $name: ERROR ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    spark.stop()
  }
}
