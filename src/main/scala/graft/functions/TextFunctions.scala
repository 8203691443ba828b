package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline ops.
  *
  * All functions are pure `org.apache.spark.sql.functions` compositions, so
  * they stay inside whole-stage codegen and are expressible 1:1 in ANSI SQL
  * for the DuckDB oracle (no UDFs in the hot path).
  *
  * Extends the reference's text-free ETL surface (the reference engine at
  * `/root/reference/spark-job/read.py` has no scalar-function usage at all —
  * SURVEY.md §2.3) with the operators a large-scale corpus pipeline needs.
  */
object TextFunctions {

  /** Whitespace tokens of a document. Empty/blank text → empty array.
    * Mirrors `regexp_split_to_array(trim(text), '\s+')` in the oracle.
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count (the "token counting" op; a cheap proxy for a
    * BPE tokenizer's pre-split pass).
    */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish sub-word unit count: words are further split on letter/digit
    * boundaries and long words are counted as ceil(len/4) units — a
    * deterministic, SQL-expressible approximation of byte-pair token counts.
    */
  def bpeishCount(text: Column): Column = {
    val t = tokens(text)
    // sum over words of greatest(1, ceil(len(word)/4))
    aggregate(
      transform(t, w => greatest(lit(1L), ceil(length(w) / lit(4.0)).cast("long"))),
      lit(0L),
      (acc, x) => acc + x
    )
  }

  /** Punctuation character count, via length difference (regex dialect-safe
    * between Java and DuckDB's RE2: a plain character class).
    */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))

  /** Ratio of alphabetic characters to total characters; 0.0 for empty. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))

  /** Mean word length over whitespace tokens; 0.0 for empty. */
  def meanWordLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(
        aggregate(transform(t, w => length(w).cast("double")), lit(0.0), _ + _)
          / size(t))
  }

  // Small per-language stopword marker sets for the n-gram/stopword
  // language-ID heuristic. Chosen to be disjoint across languages.
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "fr" -> Seq("le", "la", "les", "et", "de", "des", "une", "est"),
    "es" -> Seq("el", "los", "las", "y", "que", "una", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "不")
  )

  /** Count of hits of `words` among the whitespace tokens of `text`. */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(tokens(text), w => array_contains(wordArr, w)))
  }

  /** Stopword ratio against the union of all marker sets (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(stopwordHits(text, all).cast("double") / tokenCount(text))
  }

  /** Heuristic language ID: argmax of per-language stopword hits, ties and
    * zero-hit documents → "und" (undetermined). Deterministic tie-break by
    * language code order (en < fr < es < de < zh is NOT alphabetical — we
    * use explicit priority = alphabetical code order for determinism).
    */
  def langIdGuess(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted // de, en, es, fr, zh
    val hitCols = langs.map(l => stopwordHits(text, stopwords(l)))
    val maxHits = greatest(hitCols: _*)
    val pick = langs.zip(hitCols).foldRight(lit("und")) {
      case ((lang, hits), elseCol) =>
        when(hits === maxHits, lit(lang)).otherwise(elseCol)
    }
    when(maxHits === 0, lit("und")).otherwise(pick)
  }

  /** Composite quality score in [0,1]: weighted blend of length band,
    * alpha ratio, stopword presence and mean word length band. All terms
    * SQL-expressible for the oracle.
    */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val alphaT = alphaRatio(text)
    val stopT = least(stopwordRatio(text) * 4.0, lit(1.0))
    val mwl = meanWordLen(text)
    val mwlTerm = when(mwl >= 3 && mwl <= 10, lit(1.0)).otherwise(lit(0.5))
    // ENGINE-STABLE rounding: Spark's round() goes through BigDecimal (the
    // double's shortest decimal repr, HALF_UP) while DuckDB rounds the
    // binary double — a score landing on an exact x.xxxx5 boundary flips
    // between them (measured at sf0.1: one doc at 0.78375 → 0.7838 vs
    // 0.7837). floor(x·10⁴ + 0.5)/10⁴ is pure IEEE arithmetic, identical
    // in both engines for the same input double.
    floor((lenTerm * 0.25 + alphaT * 0.25 + stopT * 0.25 + mwlTerm * 0.25)
      * 10000.0 + 0.5) / 10000.0
  }

  /** Document fingerprint: md5 of normalized text (lowercase, collapsed
    * whitespace). Content-addressed identity for exact dedup; identical in
    * DuckDB (`md5(...)`).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word n-gram shingles (distinct), the input of MinHash / Jaccard
    * dedup. Delegates to the native [[WordShingles]] expression — the
    * equivalent HOF composition (`transform(sequence, slice, concat_ws)` +
    * `array_distinct`) evaluates interpreted per element and dominated the
    * dedup operators' runtime. Semantics are identical (same split, same
    * first-occurrence dedup, same short-text edge).
    */
  def shingles(text: Column, n: Int): Column = WordShingles(text, n)
}
