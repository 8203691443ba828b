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

  /** Codegen'd Bloom membership probe — Spark's internal
    * `BloomFilterMightContain` (the expression its own runtime row-level
    * filtering injects), exposed for engine operators that pre-build a
    * `org.apache.spark.util.sketch.BloomFilter` and probe it map-side.
    * `filterBytes` is the sketch's `writeTo` serialization (embedded as a
    * foldable binary literal; the expression deserializes it ONCE per
    * executor via its lazy cache); `hashed` must be a LongType column —
    * hash with `xxhash64(...)` and build the filter over the same hashes.
    * Replaces a Scala UDF probe: stays inside whole-stage codegen, no
    * per-row boxing or closure dispatch.
    */
  def bloomMightContain(filterBytes: Array[Byte], hashed: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      expression(org.apache.spark.sql.functions.lit(filterBytes)),
      expression(hashed)))
}
