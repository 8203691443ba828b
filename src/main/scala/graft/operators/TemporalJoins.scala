package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators the reference engine lacks entirely (SURVEY.md §2.3
  * gap list): as-of joins and gap-based sessionization — both expressed as
  * compositions of built-in window functions (preference order (a) of the
  * build rules: no custom physical operator needed, Catalyst plans a
  * single shuffle on the key).
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the single newest right row with
    * the same key and `rightTime <= leftTime` (backward-looking, inclusive).
    *
    * Implementation is the union-and-carry-forward pattern, not a per-row
    * subquery: tag both inputs, union, and run ONE window ordered by
    * (time, side) per key where `last(right-value, ignoreNulls)` carries
    * the most recent right row forward onto each left row. Cost = one
    * shuffle of |L|+|R| rows + one sort per key — the same shape a
    * dedicated AsOfJoinExec would produce, with AQE/skew handling for free.
    *
    * @param leftTime/rightTime epoch-comparable numeric or timestamp cols
    * @param tiebreak  ordering among right rows with equal time (larger
    *                  wins, matching "latest")
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      tiebreak: String): DataFrame = {
    val lCols = left.columns.toSeq
    // normalized frames: key..., __t, __side (0=right so right sorts first
    // on time ties — inclusive <=), payload
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(Long.MaxValue))
    val r0 = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(tiebreak).cast("long"))
    // align schemas: left payload nulled on right rows and vice versa.
    // The right payload travels as ONE struct column: the struct is
    // non-null for every right row even when individual value columns are
    // NULL, so last(ignoreNulls) carries the newest right ROW atomically —
    // per-column carries would silently mix columns from different right
    // rows whenever the newest match has a NULL (and would resurrect older
    // non-null values DuckDB's ASOF JOIN correctly returns as NULL).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)))
    val lPart = l.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb")) ++
        lCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rStructType).as("__r")): _*)
    val rPart = r0.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValueCols.map(col): _*).as("__r")): _*)
    val unioned = lPart.unionByName(rPart)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) ++
        rightValueCols.map(c => col("__r").getField(c).as(s"asof_$c"))): _*)
  }

  /** Gap-based sessionization: rows of the same key belong to one session
    * while consecutive gaps are ≤ `maxGap` (in the time column's units).
    * Classic lag + flag + running-sum — two window passes over one
    * shuffle, no state store needed in batch.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String,
      maxGap: Long): DataFrame = {
    val ord = Seq(col(timeCol).asc, col(tiebreak).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull || col(timeCol) - col("__prev") > maxGap, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new_session")
  }
}
