package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this bridge re-exports
  * the two conversions needed to expose custom Catalyst expressions (e.g.
  * graft.functions.SimHash64) as user-facing `Column`s.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an analyzed logical plan (`Dataset.ofRows` went
    * `private[sql]` with the classic/connect split) — needed to hand a
    * MERGE statement's already-resolved source plan back to the DataFrame
    * API inside the planner strategy.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
