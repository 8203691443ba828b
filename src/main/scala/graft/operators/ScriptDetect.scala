package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script profiling — the multilingual-curation signal next to
  * [[graft.operators.LangId]]'s n-gram language guess: per-document
  * counts of characters in the major script blocks, the dominant script,
  * and a mixed-script flag (a strong spam/boilerplate indicator — real
  * prose rarely interleaves scripts outside quotations).
  *
  * Entirely map-side, codegen'd `regexp_count` per script class — no
  * shuffle, no UDF. Counts are BMP code points (each listed block is in
  * the basic plane, where UTF-16 length == code-point count, so Spark
  * and a UTF-8 engine count identically; supplementary-plane scripts
  * would need the code-point rule `CharHist` uses).
  *
  * Dominant script = the FIRST class in [[ScriptDetect.Classes]] order
  * achieving the maximum count ("first wins ties" — a fixed, engine-
  * replayable rule); `none` when every count is zero. `mixed` = at least
  * two LETTER scripts present (digits excluded — numerals are
  * script-neutral).
  */
object ScriptDetect {

  /** (name, Java/RE2-compatible single-char class) in tie-break order. */
  val Classes: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "cjk" -> "[\\u4E00-\\u9FFF]",
    "arabic" -> "[\\u0600-\\u06FF]",
    "greek" -> "[\\u0370-\\u03FF]")

  /** Adds `n_<script>` per class, `dominant`, and `mixed`. */
  def profile(df: DataFrame, textCol: String): DataFrame = {
    val counted = Classes.foldLeft(df) { case (acc, (name, cls)) =>
      acc.withColumn(s"n_$name", regexp_count(col(textCol), lit(cls)))
    }
    val names = Classes.map(_._1)
    val maxCount = greatest(names.map(n => col(s"n_$n")): _*)
    val dominant = names.foldRight(lit("none"): Column) { (n, rest) =>
      when(col(s"n_$n") > 0 && col(s"n_$n") === maxCount, lit(n))
        .otherwise(rest)
    }
    // foldRight builds latin-first when-chain: first class at max wins
    val lettersPresent = names
      .map(n => when(col(s"n_$n") > 0, 1).otherwise(0))
      .reduce(_ + _)
    counted
      .withColumn("dominant", dominant)
      .withColumn("mixed", lettersPresent >= 2)
  }
}
