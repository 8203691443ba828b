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

  /** HTML/markup stripping — the extraction step in front of every
    * web-crawl pipeline (raw crawl text arrives tagged and
    * entity-encoded; every downstream signal — tokens, LM scores, dedup
    * fingerprints — must run over the rendered text, not the markup):
    *
    *  1. tags (`<[^>]*>`) → a space (tag boundaries are word boundaries:
    *     `a<br>b` must not fuse to `ab`), BEFORE entity decoding, so an
    *     encoded `&lt;script&gt;` in the text stays literal text and
    *     entities inside attributes vanish with their tag;
    *  2. the five common entities + `&amp;` LAST (decoding `&amp;` first
    *     would double-decode `&amp;lt;`);
    *  3. whitespace runs collapse, ends trim.
    *
    * Output per document: `n_tags` (tag occurrences removed), raw/clean
    * char counts (the shrinkage ratio is the "mostly markup" quality
    * signal), and `clean_md5` keying the extracted text for downstream
    * exact dedup.
    *
    * Engine portability: fixed-string entity replaces in a FIXED order
    * and an explicit `<[^>]*>` tag class — both replayable verbatim in a
    * SQL oracle. Entirely map-side, codegen'd, no shuffle.
    */
  /** The extracted (rendered) text as a column expression — tag strip,
    * fixed-order entity decode, whitespace canonicalization. Shared by
    * [[stripMarkup]] and the streaming markup scrubber.
    */
  def cleanMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Tag-occurrence count of the raw text (the markup-density signal). */
  def markupTagCount(text: Column): Column =
    size(regexp_extract_all(text, lit("<[^>]*>"), lit(0))).cast("long")

  def stripMarkup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val raw = col(textCol)
    val clean = cleanMarkup(raw)
    docs.select(
      col(idCol),
      markupTagCount(raw).as("n_tags"),
      length(raw).cast("long").as("n_chars_raw"),
      length(clean).cast("long").as("n_chars_clean"),
      md5(clean).as("clean_md5"))
  }

  /** Encoding-damage signals — the mojibake/transcoding-failure detector
    * a web-scale corpus needs BEFORE any text statistic is trusted
    * (damaged decoding corrupts every downstream signal: tokens, LM
    * scores, dedup fingerprints):
    *
    *  - `n_repl`: U+FFFD replacement characters — the decoder's own
    *    "this byte sequence was invalid" marker, the highest-precision
    *    damage signal there is;
    *  - `n_ctrl`: C0 control characters other than tab/newline/CR —
    *    binary content or charset confusion, never prose;
    *  - `n_non_ascii`: plain non-ASCII count — NOT damage by itself
    *    (most languages are non-ASCII), kept as the normalizing context
    *    for the two damage counts;
    *  - `ascii_ratio_e4`: exact integer `ascii·10⁴ div chars`;
    *  - `damaged`: `n_repl > 0 OR n_ctrl > 0` — the gate bit.
    *
    * Counts are length-difference after `regexp_replace` (code-point
    * semantics in both engines — no regexp_count dialect divergence).
    * Entirely map-side, codegen'd; tag-don't-drop.
    */
  def encodingSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = length(col(textCol)).cast("long")
    def cnt(pattern: String): Column =
      (n - length(regexp_replace(col(textCol), pattern, ""))).cast("long")
    docs.select(
      col(idCol),
      cnt("\\uFFFD").as("n_repl"),
      cnt("[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F]").as("n_ctrl"),
      cnt("[^\\u0000-\\u007F]").as("n_non_ascii"),
      n.as("n_chars"))
      .withColumn("ascii_ratio_e4",
        expr("(n_chars - n_non_ascii) * 10000 div greatest(n_chars, 1)"))
      .withColumn("damaged", col("n_repl") > 0 || col("n_ctrl") > 0)
  }
}
