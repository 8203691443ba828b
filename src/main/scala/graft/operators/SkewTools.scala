package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand-rolled counterpart of AQE's
  * skew-join splitting, for the cases AQE cannot fix (skewed aggregation
  * state, or a skewed key on the build side of a shuffle join).
  */
object SkewTools {

  /** Two-phase (salted) aggregation: partial-aggregate on (key, salt) to
    * spread one hot key over `saltBuckets` reducers, then final-aggregate
    * on key. Correct for decomposable aggregates (sum/count/min/max).
    *
    * At 100 TB a single hot key (null ids, default values, bot users) can
    * hold an entire stage hostage; salting bounds any reducer's share of a
    * key at 1/saltBuckets.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltBuckets: Int): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        sum(col(valueCol)).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted broadcast-replicated join for a skewed fact side against a
    * small dimension: the fact side gets a random salt in [0, n), the
    * dimension is exploded n ways, and the join key becomes (key, salt) —
    * no reducer sees more than ~1/n of a hot key's rows. The dimension is
    * broadcast, so the fact side is never shuffled at all.
    */
  def saltedBroadcastJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact
      .join(broadcast(replicatedDim), Seq(key, "__salt"))
      .drop("__salt")
  }
}
