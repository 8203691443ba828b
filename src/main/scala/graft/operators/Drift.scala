package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution DRIFT monitor — the data-quality alarm a continuously-fed
  * corpus needs: has an arrival batch's signal distribution (lengths,
  * quality scores, token densities) moved away from the frozen reference
  * the pipeline was tuned on? Retrain/retune decisions hang on this.
  *
  * The statistic is TOTAL VARIATION DISTANCE over the engine's own
  * geometric value buckets ([[Percentiles.logBucket]] — the q90 sketch
  * mapping, so the reference model is bucket-bounded, never
  * corpus-sized), with add-one smoothing over the union bucket set, and
  * it is computed in EXACT integer arithmetic: per bucket
  * `|a·(Tb+B) − b·(Ta+B)|` (cross-multiplied — no division anywhere),
  * summed as DECIMAL(38,0); `TVD = num / den` with
  * `den = 2·(Ta+B)·(Tb+B)` is never materialized as a float — the
  * drift alarm compares `4·num > den` (TVD > 0.25) in exact integers.
  * PSI's per-bucket `ln` would put a libm ulp between two engines; TVD
  * is a pure ring operation, so two engines (or two cluster runs) CANNOT
  * disagree by a bit. Decimal(38) products keep the cross-multiply exact
  * up to ~1e18-row sides.
  *
  * Scale shape: reference and batch reduce to ≤ buckets·keys rows each
  * (one map-side-combinable aggregation over the data; everything after
  * is bucket-table-sized); the comparison is a key+bucket full-outer
  * join plus key-keyed rollups — model-sized, never data-sized.
  */
object Drift {

  /** Per-(key, bucket) counts — the frozen reference artifact (and the
    * per-batch summary): geometric buckets keep it bounded (≤ ~2^bits ·
    * 57 buckets per key over the whole long range).
    */
  def bucketCounts(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      bits: Int): DataFrame =
    df.groupBy((keyCols.map(col) :+
        Percentiles.logBucket(col(valueCol).cast("long"), bits).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Compare a batch's bucket counts against the reference's, per key.
    * Output per key: `tv_num`, `tv_den` (DECIMAL(38,0) — `TVD =
    * tv_num/tv_den`, left as an exact ratio), `n_buckets` (union), and
    * `drifted` = TVD > 1/4, decided integer-exactly.
    */
  def tvd(
      reference: DataFrame,
      batch: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val ref = reference.select((keys :+ col("bucket") :+
      col("cnt").as("ra")): _*)
    val bat = batch.select((keys :+ col("bucket") :+
      col("cnt").as("rb")): _*)
    val joined = ref.join(bat, keyCols :+ "bucket", "full_outer")
      .select((keys :+ col("bucket") :+
        coalesce(col("ra"), lit(0L)).as("ra") :+
        coalesce(col("rb"), lit(0L)).as("rb")): _*)
    val totals = joined.groupBy(keys: _*).agg(
      sum(col("ra")).as("ta"), sum(col("rb")).as("tb"),
      count(lit(1)).as("nb"))
    val dec = "decimal(38,0)"
    joined.join(totals, keyCols)
      .withColumn("a", (col("ra") + 1).cast(dec))
      .withColumn("b", (col("rb") + 1).cast(dec))
      .withColumn("taB", (col("ta") + col("nb")).cast(dec))
      .withColumn("tbB", (col("tb") + col("nb")).cast(dec))
      .withColumn("term",
        abs(col("a") * col("tbB") - col("b") * col("taB")))
      .groupBy(keys: _*)
      .agg(
        sum(col("term")).cast(dec).as("tv_num"),
        (lit(2).cast(dec) * first(col("taB")) * first(col("tbB")))
          .cast(dec).as("tv_den"),
        first(col("nb")).as("n_buckets"))
      .withColumn("drifted",
        lit(4).cast(dec) * col("tv_num") > col("tv_den"))
  }
}
