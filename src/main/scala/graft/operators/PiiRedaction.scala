package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the content-scrubbing stage of a training-data pipeline
  * (the one standard stage the reference's dedup-upsert core lacks; quality
  * scoring and decontamination live in `TextFunctions` / q42).
  *
  * Design: each PII class is a (regex, token) pair; scrubbing is a CHAIN of
  * `regexp_replace` calls — scalar, codegen-friendly, no UDF, no shuffle —
  * plus a per-class match count (`regexp_extract_all` length on the raw
  * text) so the pipeline emits an audit trail of how much was redacted per
  * class. At 100 TB this is a map-only pass: no state, no exchange, prunes
  * to exactly the text column.
  *
  * Patterns are restricted to the syntax Java regex and RE2 share
  * (character classes, bounded repetition, `\b`, `\d`) so the DuckDB oracle
  * (q43) can run the IDENTICAL pattern: no lookbehind, no backreferences.
  * Replacement tokens deliberately match none of the patterns, making
  * `redact` idempotent — a replayed scrub is a no-op.
  */
object PiiRedaction {

  /** One redaction class: `name` labels the audit column, `pattern` is a
    * Java∩RE2 regex, `token` is the replacement.
    */
  final case class PiiClass(name: String, pattern: String, token: String)

  /** Default classes, most-specific first: the SSN shape must be consumed
    * before the phone shape gets a chance to bite into its tail digits.
    */
  val defaultClasses: Seq[PiiClass] = Seq(
    PiiClass("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    PiiClass("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    PiiClass("phone", "\\b555-\\d{4}\\b", "[PHONE]"),
    PiiClass("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]")
  )

  /** The scrubbed text: `regexp_replace` chain in class order. */
  def redact(text: Column, classes: Seq[PiiClass] = defaultClasses): Column =
    classes.foldLeft(text)((c, k) => regexp_replace(c, k.pattern, k.token))

  /** Match count for one class on the RAW text (pre-redaction). */
  def matchCount(text: Column, k: PiiClass): Column =
    size(regexp_extract_all(text, lit(k.pattern), lit(0))).cast("long")

  /** Adds `redacted` plus one `n_<class>` audit column per class. */
  def scrub(
      df: DataFrame,
      textCol: String,
      classes: Seq[PiiClass] = defaultClasses): DataFrame = {
    val withCounts = classes.foldLeft(df)((d, k) =>
      d.withColumn(s"n_${k.name}", matchCount(col(textCol), k)))
    withCounts.withColumn("redacted", redact(col(textCol), classes))
  }
}
