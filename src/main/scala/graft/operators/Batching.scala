package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batching — the dynamic-batching prep stage: group
  * documents into equal-count token-length quantile buckets, then cut each
  * bucket into fixed-size batches, so a batch's members have near-equal
  * lengths and padding waste is minimized (the alternative to full q41
  * packing when examples must stay un-concatenated).
  *
  * The global length-ordered rank is computed WITHOUT a global sort: a
  * value-keyed count aggregate, a prefix sum over the DISTINCT-value table
  * (bounded by the token-length value space — a coordination table of at
  * most a few thousand rows, the same trick as `Sampling.stableRank`),
  * and a per-value `row_number` joined back on the value key. No task
  * ever sorts more than one length-value's rows; a flat
  * `row_number() OVER (ORDER BY n_tokens)` would serialize the corpus
  * through one task.
  *
  * Bucket and batch assignment are EXACT integer arithmetic on the rank
  * (`div`, no floats): `bucket = (rank−1)·K div N`, and the batch counts
  * from the bucket's first rank `ceil(bucket·N/K)`. Deterministic under
  * any partitioning (doc id is the in-value tiebreak) and portable to any
  * engine with integer division.
  */
object Batching {

  def lengthBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 16,
      batchSize: Int = 8): DataFrame = {
    require(numBuckets >= 1, "numBuckets must be positive")
    require(batchSize >= 1, "batchSize must be positive")
    val toks = docs.select(
      col(idCol),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
    val counts = toks.groupBy(col("n_tokens")).agg(count(lit(1)).as("cnt"))
    // prefix sum over distinct length values only: the single-partition
    // window is bounded by value-space cardinality, not corpus size
    val offsets = counts
      .withColumn("off", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("n_tokens"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("n_tokens"), col("off"))
    val tot = toks.agg(count(lit(1)).as("big_n"))
    toks
      .join(offsets, Seq("n_tokens"))
      .crossJoin(broadcast(tot)) // 1-row total — provably bounded
      .withColumn("rank", col("off") +
        row_number().over(
          Window.partitionBy(col("n_tokens")).orderBy(col(idCol))))
      .withColumn("bucket", expr(s"(rank - 1) * $numBuckets div big_n"))
      .withColumn("batch_id", expr(
        s"(rank - 1 - (bucket * big_n + $numBuckets - 1) div $numBuckets) " +
          s"div $batchSize"))
      .select(col(idCol), col("n_tokens"), col("rank"),
        col("bucket"), col("batch_id"))
  }
}
