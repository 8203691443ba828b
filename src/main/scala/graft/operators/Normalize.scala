package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text canonicalization — the normalization pass every dedup/fingerprint
  * stage assumes has already run (C4/RefinedWeb-style): casefold, strip
  * punctuation to spaces, collapse whitespace runs, trim. MinHash, SimHash,
  * winnowing and segment dedup are all defined over the NORMALIZED token
  * stream; without this stage, `"Hello, world!"` and `"hello world"` never
  * collide.
  *
  * Engine portability: the character class is spelled `[^a-z0-9\s]`
  * explicitly (not `\p{Punct}`/`\W`) because Java and RE2 Unicode classes
  * differ at the edges; `\s` agrees between the engines for every
  * whitespace character the corpus can contain. Spark's `regexp_replace`
  * is global by default; a DuckDB oracle needs the `'g'` flag.
  *
  * Scale shape: pure per-row scalar expressions — codegen'd, no shuffle,
  * no UDF; composes in front of any dedup stage at zero plan cost.
  */
object Normalize {

  /** Canonical form: lowercase, non-[a-z0-9-whitespace] → space,
    * whitespace runs collapsed to one space, ends trimmed.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** Per-document normalization audit: the canonical text plus the
    * before/after sizes (the shrinkage is itself a quality signal — a
    * document that loses most of its bytes to punctuation stripping is
    * markup or junk, not prose).
    */
  def normalized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      normalize(col(textCol)).as("norm"),
      length(col(textCol)).cast("long").as("n_raw"))
      .withColumn("n_norm", length(col("norm")).cast("long"))
}
