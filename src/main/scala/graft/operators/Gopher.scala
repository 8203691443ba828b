package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
  * App. A1.1) — the published rule set most corpus pipelines start from,
  * as a single tag-don't-drop pass: every document lands with its raw
  * signals, its per-rule bits, and the combined gate, so a curation run
  * can re-cut without re-scanning (the q48 rule). The reference engine
  * has no text analysis; this extends the quality-scoring family
  * (q08–q10, q45).
  *
  * Rules implemented (thresholds are the paper's):
  *  - word count in [50, 100 000]
  *  - mean word length in [3, 10]
  *  - symbol-to-word ratio ('#' or '...') ≤ 0.1
  *  - ≤ 90 % of lines start with a bullet ('•' or '- ')
  *  - ≤ 30 % of lines end with an ellipsis ('…' or '...')
  *  - ≥ 80 % of words contain ≥ 1 alphabetic character
  *  - ≥ 2 distinct stop words from {the, be, to, of, and, that, have, with}
  *
  * Every signal is exact-integer or e4-stable-rounded
  * (`floor(x·10⁴ + 0.5)`), so the DuckDB oracle hash-matches; all
  * arithmetic is map-side (one projection, no shuffle at all — the 100 TB
  * shape for any per-doc gate).
  */
object Gopher {

  private val StopWords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def e4(x: Column): Column = floor(x * lit(10000.0) + lit(0.5)).cast("long")

  /** Occurrences of literal `pat` in `c` via length difference — the
    * engine-portable counter (`replace` is non-overlapping left-to-right
    * in both Spark and DuckDB).
    */
  private def countLit(c: Column, pat: String): Column =
    ((length(c) - length(replace(c, lit(pat), lit("")))) / pat.length).cast("long")

  def rules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val lines = split(t, "\n")
    val nWords = size(toks).cast("long")
    val nLines = size(lines).cast("long")
    // sum of token lengths (exact BIGINT via HOF aggregate)
    val sumWlen = aggregate(toks, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val nAlphaWords = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val nBulletLines = size(filter(lines,
      l => l.startsWith("•") || l.startsWith("- "))).cast("long")
    val nEllipsisLines = size(filter(lines,
      l => l.endsWith("…") || l.endsWith("..."))).cast("long")
    val nSymbols = countLit(t, "#") + countLit(t, "...")
    val stopHits = size(array_intersect(toks,
      array(StopWords.map(lit): _*))).cast("long")

    val meanWlenE4 = when(nWords === 0L, lit(0L))
      .otherwise(e4(sumWlen.cast("double") / nWords.cast("double")))
    val symRatioE4 = when(nWords === 0L, lit(0L))
      .otherwise(e4(nSymbols.cast("double") / nWords.cast("double")))
    val alphaFracE4 = when(nWords === 0L, lit(0L))
      .otherwise(e4(nAlphaWords.cast("double") / nWords.cast("double")))
    val bulletFracE4 = when(nLines === 0L, lit(0L))
      .otherwise(e4(nBulletLines.cast("double") / nLines.cast("double")))
    val ellipsisFracE4 = when(nLines === 0L, lit(0L))
      .otherwise(e4(nEllipsisLines.cast("double") / nLines.cast("double")))

    val bits: Seq[(String, Column)] = Seq(
      "r_word_count" -> (nWords >= 50L && nWords <= 100000L),
      "r_mean_word_len" -> (meanWlenE4 >= 30000L && meanWlenE4 <= 100000L),
      "r_symbol_ratio" -> (symRatioE4 <= 1000L),
      "r_bullet_lines" -> (bulletFracE4 <= 9000L),
      "r_ellipsis_lines" -> (ellipsisFracE4 <= 3000L),
      "r_alpha_words" -> (alphaFracE4 >= 8000L),
      "r_stop_words" -> (stopHits >= 2L))

    docs.select(
      (col(idCol) +:
        nWords.as("n_words") +:
        meanWlenE4.as("mean_wlen_e4") +:
        symRatioE4.as("sym_ratio_e4") +:
        alphaFracE4.as("alpha_frac_e4") +:
        bulletFracE4.as("bullet_frac_e4") +:
        ellipsisFracE4.as("ellipsis_frac_e4") +:
        stopHits.as("stop_hits") +:
        bits.map { case (n, c) => c.cast("long").as(n) }): _*)
      .withColumn("n_rules_failed",
        bits.map { case (n, _) => lit(1L) - col(n) }.reduce(_ + _))
      .withColumn("pass", (col("n_rules_failed") === 0L).cast("long"))
  }
}
