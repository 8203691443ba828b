package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key percentile normalization — "where does this document sit
  * WITHIN ITS SOURCE" (rank-normalize a quality/length signal per group
  * before a global cut, so a uniformly-low-scoring source still keeps its
  * best documents — the CCNet per-shard stratification move, and the
  * right input to any cross-source quality gate).
  *
  * `pct_e4 = floor(smaller/(n−1)·10⁴ + 0.5)` where `smaller` = rows in
  * the key with a STRICTLY smaller value and n = group size — exactly
  * SQL `percent_rank()` (ties share the percentile, as a normalization
  * should: which duplicate "ranks higher" is meaningless), single-row
  * groups pin to 0. Pure integer/stable-rounded arithmetic,
  * engine-reproducible.
  *
  * Scale shape (the q62/q67 two-level rule, taken one step further): a
  * flat `percent_rank() OVER (PARTITION BY key ORDER BY value)` sorts
  * each key in ONE task — a billion-doc source is a straggler by
  * construction. Here NOTHING row-level is ever sorted: per-(key, value)
  * tie counts (one hash agg, map-side partial), an exclusive prefix sum
  * over the per-key DISTINCT-VALUE table (bounded by distinct values per
  * key, not rows), and a join back. Tie-sharing is what makes this
  * possible — a total-order rank would force a within-tie sort, and a
  * degenerate constant signal would make that tie class the whole key.
  */
object Percentiles {

  def perKeyPercentile(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(idCol), col(keyCol).as("pk_key"),
      col(valueCol).cast("long").as("pk_v"))
    val ties = base.groupBy(col("pk_key"), col("pk_v"))
      .agg(count(lit(1)).as("pk_nv"))
    // exclusive prefix over the per-key distinct-value table: rows with a
    // strictly smaller value
    val wKey = Window.partitionBy(col("pk_key")).orderBy(col("pk_v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val coord = ties
      .withColumn("pk_off", coalesce(sum(col("pk_nv")).over(wKey), lit(0L)))
      .select(col("pk_key"), col("pk_v"), col("pk_off"))
    val sizes = base.groupBy(col("pk_key")).agg(count(lit(1)).as("pk_n"))
    base
      .join(coord, Seq("pk_key", "pk_v"))
      .join(sizes, Seq("pk_key"))
      .withColumn("pct_e4",
        when(col("pk_n") === 1L, 0L).otherwise(
          floor(col("pk_off").cast("double")
            / (col("pk_n") - 1L).cast("double") * 10000.0 + 0.5).cast("long")))
      .select(col(idCol), col("pk_key").as(keyCol),
        col("pk_v").as(valueCol), col("pct_e4"))
  }
}
