package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{PiiRedaction, Repetition, Sampling}

/** End-to-end corpus curation as ONE Spark program — the stage chain a
  * training-data build runs (scrub → exact dedup → repetition/length
  * quality gates → deterministic sampling), composed from the gated
  * operators.
  *
  * Design rule: TAG, don't drop. Each stage appends a decision column to
  * the same frame instead of materializing a filtered copy, so
  *
  *  - no stage materializes an intermediate corpus copy; the program is
  *    three map-side scans of the (scrubbed) source — the fingerprint
  *    pass plus the word and bigram aggregates, each inherent to its
  *    stage. The scrub expression re-evaluates on each scan (Spark has no
  *    cross-branch CSE); a production layout lands the scrubbed corpus
  *    first (`StreamingIngest.startScrubber` / a scrub-only pass) and
  *    runs `curate(scrub = false)` over it, reducing this to stat scans;
  *  - the audit is a single aggregation over the decision columns — at
  *    100 TB "count the rows each stage dropped" must not cost one action
  *    per stage;
  *  - decisions are INDEPENDENTLY inspectable after the fact (why did doc
  *    X fall out? read its row), which per-stage filtering destroys.
  *
  * Every decision is deterministic — regex scrub, min-(id,pos) first
  * occurrence, rounded-fraction thresholds, md5-prefix sampling — so the
  * pipeline is reproducible across runs, partitionings, engines (q48
  * gates it against DuckDB), and the batch/stream boundary.
  */
object CurationPipeline {

  /** Stage toggles + thresholds. `sampleHex = "zz"` keeps everything
    * (every md5 prefix sorts below it); `"d0"` keeps ≈ 208/256.
    * `scrub = false` for input that was already scrubbed on landing
    * (e.g. by `StreamingIngest.startScrubber`) — the PII audit columns
    * are then emitted as zeros and the downstream stages read the text
    * as-is, avoiding the re-evaluated regex chain entirely.
    */
  final case class Config(
      scrub: Boolean = true,
      piiClasses: Seq[PiiRedaction.PiiClass] = PiiRedaction.defaultClasses,
      dupWordMax: Double = 0.5,
      topBigramMax: Double = 0.18,
      minWords: Long = 10,
      sampleHex: String = "zz")

  /** Returns the tagged frame: one row per input doc with the scrubbed
    * text, per-class PII counts, and INT decision columns
    * (`exact_dup`, `repetitive`, `short`, `sampled_out`, `keep`).
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      config: Config = Config()): DataFrame = {
    // null text is normalized to '' up front: every stage treats the doc
    // as empty (0 words → short) instead of each reacting differently —
    // explode-based stages would silently DROP a null-text row from their
    // aggregates, and an inner join downstream would lose the doc
    val nonNull = docs.na.fill("", Seq(textCol))
    // 1. scrub FIRST: dedup and quality then see normalized text, and raw
    //    PII never flows past this point
    val scrubbed =
      if (config.scrub)
        PiiRedaction.scrub(nonNull, textCol, config.piiClasses)
          .withColumn(textCol, col("redacted")).drop("redacted")
      else
        config.piiClasses.foldLeft(nonNull)((d, k) =>
          d.withColumn(s"n_${k.name}", lit(0L)))
    // 2. exact dedup on the scrubbed text (q07's normalization), first
    //    occurrence by id wins — one hash shuffle on the fingerprint
    val fpWin = Window.partitionBy(col("fp")).orderBy(col(idCol))
    val deduped = scrubbed
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withColumn("exact_dup",
        when(row_number().over(fpWin) > 1, 1).otherwise(0))
    // 3. repetition + length gates (Gopher rules) on the scrubbed text
    val rep = Repetition.signals(
      scrubbed.select(col(idCol), col(textCol)), idCol, textCol,
      config.dupWordMax, config.topBigramMax)
      .select(col(idCol), col("n_words"), col("is_repetitive").as("repetitive"))
    // 4. deterministic sampling — a pure function of the id
    deduped
      .join(rep, Seq(idCol))
      .withColumn("short", when(col("n_words") < config.minWords, 1).otherwise(0))
      .withColumn("sampled_out",
        when(Sampling.keep(col(idCol), lit(config.sampleHex)), 0).otherwise(1))
      .withColumn("keep",
        when(col("exact_dup") === 0 && col("repetitive") === 0
          && col("short") === 0 && col("sampled_out") === 0, 1).otherwise(0))
      .drop("fp")
  }

  /** The curated corpus: rows every stage accepted. */
  def keepOnly(tagged: DataFrame): DataFrame = tagged.filter(col("keep") === 1)

  /** One-row audit over the tagged frame — a single aggregation, never
    * one action per stage.
    */
  def audit(tagged: DataFrame, config: Config = Config()): DataFrame = {
    val piiCols = config.piiClasses.map(k => sum(col(s"n_${k.name}")).as(s"n_${k.name}"))
    val flagCols = Seq("exact_dup", "repetitive", "short", "sampled_out")
      .map(f => sum(col(f)).cast("long").as(s"n_$f"))
    val keepCols = Seq(
      count(lit(1)).as("n_docs"),
      sum(col("keep")).cast("long").as("n_kept"))
    tagged.agg(keepCols.head, (keepCols.tail ++ flagCols ++ piiCols): _*)
  }
}
