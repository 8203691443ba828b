package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative ingest CONTRACTS — the expectation layer a landing zone
  * runs before anything downstream trusts a batch (the role Delta
  * constraints / DLT expectations play): each rule names a violation
  * predicate, rows are TAGGED with the comma-joined names of every rule
  * they break (tag-don't-drop, the engine-wide convention — quarantine
  * and drop policies become trivial filters over the tag), and a summary
  * rolls violations up per rule.
  *
  * Scale shape: row rules are pure map-side predicates (one projection,
  * no shuffle). The one structural rule — uniqueness — is explicitly a
  * helper ([[withDupFlag]]) because it genuinely costs a key-hashed
  * shuffle: a count per key joined back ON THE SAME KEY (co-partitioned,
  * map-side combinable), never a window sort. The summary is one
  * explode + rule-keyed aggregation bounded by |rules|·|violating rows|.
  */
object Contracts {

  /** `predicate` is TRUE when the row VIOLATES the rule. Names must not
    * contain the comma the tag joins on.
    */
  final case class Rule(name: String, predicate: Column) {
    require(!name.contains(","), s"rule name '$name' must not contain ','")
  }

  def notNull(name: String, c: Column): Rule = Rule(name, c.isNull)
  def inRange(name: String, c: Column, lo: Long, hi: Long): Rule =
    Rule(name, c.isNull || c < lo || c > hi)
  def inSet(name: String, c: Column, allowed: Seq[String]): Rule =
    Rule(name, c.isNull || !c.isin(allowed: _*))
  def matches(name: String, c: Column, pattern: String): Rule =
    Rule(name, c.isNull || !c.rlike(pattern))

  /** Dup-count flag for a uniqueness contract: `flagCol` is TRUE on every
    * row whose `keyCol` value appears more than once — NULL keys
    * included: the aggregation groups NULLs into one group (as SQL's
    * `count(*) OVER (PARTITION BY key)` does) and the join back is
    * NULL-SAFE (`<=>`), so two NULL-keyed rows read as duplicates
    * instead of silently clean (a plain equi-join would drop them and
    * leave the flag NULL — the one way a uniqueness audit must not
    * fail). One key-hashed aggregation + a same-key join — AQE
    * co-partitions them; the flag is never NULL by construction.
    */
  def withDupFlag(df: DataFrame, keyCol: String, flagCol: String): DataFrame = {
    val cnts = df.groupBy(col(keyCol)).agg(count(lit(1)).as(s"__${flagCol}_n"))
      .withColumnRenamed(keyCol, s"__${flagCol}_k")
    df.join(cnts, col(keyCol) <=> col(s"__${flagCol}_k"), "left")
      .withColumn(flagCol,
        coalesce(col(s"__${flagCol}_n") > 1, lit(false)))
      .drop(s"__${flagCol}_k", s"__${flagCol}_n")
  }

  /** Tag every row: `violations` = comma-joined names of broken rules in
    * the given rule order ('' when clean — never NULL, the
    * array_to_string drift trap designed out), `clean` = no rule broken.
    */
  def tag(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val parts = rules.map(r => when(r.predicate, lit(r.name)))
    df.withColumn("violations", concat_ws(",", parts: _*))
      .withColumn("clean", col("violations") === "")
  }

  /** Per-rule violation counts over a [[tag]]ged frame; rules with zero
    * violations keep an explicit zero row (a silent missing rule reads
    * as "checked and clean" when it might mean "never checked").
    */
  def summary(tagged: DataFrame, rules: Seq[Rule]): DataFrame = {
    val counts = tagged
      .filter(col("violations") =!= "")
      .select(explode(split(col("violations"), ",")).as("rule"))
      .groupBy(col("rule")).agg(count(lit(1)).as("n_violations"))
    val spark = org.apache.spark.sql.SparkSession.active
    val all = spark.createDataset(rules.map(_.name))(
      org.apache.spark.sql.Encoders.STRING).toDF("rule")
    all.join(counts, Seq("rule"), "left")
      .select(col("rule"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
  }
}
