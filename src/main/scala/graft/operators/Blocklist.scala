package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WordShinglesAll

/** Blocklist (badwords) filtering — the C4 cleanup stage the reference
  * pipeline has no analogue of (`/root/reference/spark-job/read.py` does
  * pure relational ingest): flag every document containing any phrase
  * from a curated blocklist, on WORD boundaries (a substring match would
  * flag 'class' for 'ass' — the classic badwords-filter bug), and report
  * which phrases hit. Tag-don't-drop (the q48 curation rule): the caller
  * decides the cut, the engine reports the evidence.
  *
  * Scale shape: the blocklist is small BY DEFINITION (C4's largest list
  * is ~2k entries) → broadcast; documents explode to positional n-grams
  * only for the lengths that actually occur in the list (bounded by the
  * longest phrase, not by the text); one map-side broadcast equi-join,
  * one doc-keyed aggregation. Nothing corpus-sized shuffles except the
  * per-doc hit rows, which are match-bounded.
  */
object Blocklist {

  /** `(id, n_hits, hits, is_blocked)` — `n_hits` counts every positional
    * occurrence, `hits` is the comma-joined sorted distinct phrase set,
    * `is_blocked` = 1 iff any hit. Phrases normalize to single-spaced
    * word sequences; matching is exact on whitespace tokens.
    */
  def flag(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    val norm = phrases.map(_.trim.replaceAll("\\s+", " ")).filter(_.nonEmpty).distinct
    val lens = norm.map(_.split(" ").length).distinct.sorted
    val spark = docs.sparkSession
    import spark.implicits._
    val bl = broadcast(norm.toDF("phrase")) // blocklist-sized: bounded
    val grams = lens.map { n =>
      docs.select(col(idCol),
        explode(WordShinglesAll(col(textCol), n)).as("phrase"))
    }.reduce(_ unionByName _)
    val hits = grams.join(bl, Seq("phrase"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        array_join(array_sort(collect_set(col("phrase"))), ",").as("hits"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("hits"), lit("")).as("hits"),
        when(col("n_hits").isNotNull, lit(1L)).otherwise(lit(0L)).as("is_blocked"))
  }
}
