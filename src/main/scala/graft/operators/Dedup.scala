package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record-per-key dedup — the reference's one relational query
  * (`/root/reference/spark-job/mergeSQL.sql:14-21`: `ROW_NUMBER() OVER
  * (PARTITION BY invoiceid, itemid ORDER BY replicadmstimestamp DESC)`
  * + `WHERE row_num = 1`), generalized to any key/order columns.
  *
  * Scale notes:
  *  - The `rn = 1` filter over a ranking window is rewritten by Catalyst's
  *    `InferWindowGroupLimit` into `WindowGroupLimitExec` (top-1 per group
  *    with partial + final stages), so the shuffle carries at most one row
  *    per key per map partition — this is the map-side-combine shape you
  *    want at 100 TB, not a full sort of every group.
  *  - The reference's ordering is non-deterministic on timestamp ties
  *    (SURVEY.md §2.2); we always append deterministic tiebreak columns so
  *    reruns and the DuckDB oracle agree bit-for-bit.
  */
object Dedup {

  /** Keep the single latest row per key.
    *
    * @param keys      partition keys (the business key)
    * @param orderDesc column ranked descending (event time); ties broken by
    *                  `tiebreakDesc` columns, also descending.
    */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      orderDesc: String,
      tiebreakDesc: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = (orderDesc +: tiebreakDesc).map(c => col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate removal by a set of columns: keeps the row with the
    * smallest `keepMin` value within each duplicate group (deterministic,
    * unlike `dropDuplicates` which keeps an arbitrary row).
    */
  def exactByColumns(df: DataFrame, cols: Seq[String], keepMin: String): DataFrame = {
    val w = Window.partitionBy(cols.map(col): _*).orderBy(col(keepMin).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
