package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KMinValues

/** Mergeable sketch statistics over a corpus — the bounded-memory
  * aggregates a 100 TB statistics pass runs instead of exact
  * `count(distinct)` (whose shuffle IS the distinct key set).
  *
  * The reference has no statistics pass at all (`read.py` writes blind);
  * a training-data pipeline needs per-source cardinalities constantly
  * (dedup rates, mixture audits, crawl-snapshot diffs), and at corpus
  * scale they must come from sketches.
  *
  * Everything here is md5-deterministic (the q37 rule) so the DuckDB
  * oracle replays the sketch exactly — same retained hashes, same
  * estimate bits.
  */
object Sketches {

  /** 2^52 — hashes live in [0, 2^52): 13 hex chars parse exactly on any
    * engine whose only integer-capable type is a double (and a LONG sum
    * of billions of them stays < 2^63).
    */
  val HashSpace: Double = 4503599627370496.0

  /** Uniform-deterministic 52-bit hash of a key: the first 13 hex chars
    * of md5, as a LONG. DuckDB twin: `('0x' || substring(md5(k),1,13))::BIGINT`.
    */
  def hash52(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast("long")

  /** Per-group approximate distinct count via a k-minimum-values sketch.
    *
    * Output per group: `kept` (how many distinct hashes the sketch holds,
    * = min(k, true distinct)), `kth` (the largest retained hash), and
    * `est_e4` = floor(estimate · 10⁴):
    *  - sketch saturated (`kept == k`): `(k-1) · 2^52 / kth` — the
    *    classic KMV estimator (uniform order statistics);
    *  - not saturated: the sketch IS the distinct set, so the estimate
    *    is exact = `kept`.
    *
    * Scale shape: ONE aggregation whose partial state is ≤ k longs per
    * (partition, group) — the shuffle moves sketches, not keys. Sketches
    * for disjoint batches union-then-trim losslessly, so incremental
    * maintenance (re-aggregate yesterday's sketch table with today's
    * batch) never rescans the corpus.
    *
    * All arithmetic after the integer hashes is IEEE double ops on
    * exactly-representable inputs (k-1 and 2^52 are exact; the product is
    * exact for any sane k), so the floored 1e-4 quantization is
    * engine-reproducible bit-for-bit.
    */
  /** Heavy-hitter word frequencies via a count-min sketch (Cormode &
    * Muthukrishnan 2005): `depth` hash rows × `width` counters, estimate =
    * min over rows of the hashed counter. One-sided error (estimates never
    * undercount; overcount ≤ εN w.h.p. with ε = e/width), so a "top tokens"
    * report built from it never misses a true heavy hitter.
    *
    * Scale shape: the counter table is bounded at `depth·width` rows no
    * matter the corpus (map-side partial aggregation reduces every
    * partition to that before the shuffle — exact per-word counts shuffle
    * the vocabulary itself, q67's cost); counters are MERGEABLE by
    * elementwise addition, so per-batch sketches compose incrementally.
    * The estimate join is keyed by the queried words only.
    *
    * Determinism: the row hashes are md5-derived (`h_r(w) = md5("r:w")`
    * mod width) — no seeds, no processing-order dependence (unlike
    * Misra-Gries-style summaries, whose content depends on arrival
    * order), so the DuckDB oracle replays counters and estimates exactly.
    *
    * Output: the `topK` words by (estimate DESC, word ASC) with their
    * estimated counts — the q61-style corpus report, from bounded state.
    */
  def countMinTopWords(
      docs: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 1024,
      topK: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 hash rows, width >= 2")
    val toks = docs.select(
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
    val hashed = toks
      .select(col("w"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("b",
        conv(substring(
          md5(concat(col("r").cast("string"), lit(":"), col("w"))), 1, 8),
          16, 10).cast("long") % width)
    val counters = hashed.groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c")) // ≤ depth·width rows
    hashed.select(col("w"), col("r"), col("b")).distinct()
      .join(counters, Seq("r", "b"))
      .groupBy(col("w"))
      .agg(min(col("c")).as("est"))
      .orderBy(col("est").desc, col("w").asc)
      .limit(topK) // TakeOrderedAndProject: per-partition heaps, no full sort
  }

  /** Incrementally maintain a per-group KMV sketch table AT REST — the
    * statistics analog of the minhash-index commit: each arrival batch
    * folds its key hashes into the stored sketches WITHOUT rescanning
    * anything older. The stored row per group is the ascending k-mins
    * array; the update explodes only the TOUCHED groups' stored arrays
    * (≤ k values each), re-aggregates them with the batch hashes (the
    * lossless union-then-trim the merge spec proves), and MERGEs the new
    * rows back — a keyed upsert, so replaying the same batch is
    * idempotent. After any number of batches the table equals the
    * whole-corpus sketch.
    */
  def sketchTableCommit(
      spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      table: graft.table.WarehouseTable): Unit = {
    val batchHashes = batch.select(col(groupCol).as("g"),
      hash52(col(keyCol)).as("h52"))
    val withStored =
      if (table.exists) {
        val stored = table.read(spark)
          .join(batchHashes.select(col("g")).distinct(), Seq("g"), "left_semi")
          .select(col("g"), explode(col("kmins")).as("h52"))
        batchHashes.unionByName(stored)
      } else batchHashes
    val updated = withStored.groupBy(col("g"))
      .agg(KMinValues(col("h52"), k).as("kmins"))
    if (!table.exists)
      table.create(updated.schema,
        properties = graft.table.WarehouseTable.tableProperties("COW", "snappy")
          ++ Map("kmv.k" -> k.toString))
    else require(table.properties.get("kmv.k").forall(_ == k.toString),
      s"sketch table was built with kmv.k=${table.properties("kmv.k")} but " +
        s"the commit passed k=$k — sketches of different k never merge")
    table.merge(spark, updated, Seq("g"))
  }

  def approxDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      k: Int): DataFrame = {
    val kmins = df
      .select(groupCols.map(col) :+ hash52(col(keyCol)).as("h52"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(KMinValues(col("h52"), k).as("kmins"))
    estimate(kmins, k)
  }

  /** The KMV estimator columns over a frame carrying a `kmins` array —
    * shared by the one-shot aggregate and the at-rest sketch table read.
    */
  def estimate(kmins: DataFrame, k: Int): DataFrame =
    kmins
      .withColumn("kept", size(col("kmins")).cast("long"))
      .withColumn("kth", element_at(col("kmins"), size(col("kmins"))))
      .withColumn("est_e4",
        floor(
          when(col("kept") < k, col("kept").cast("double"))
            .otherwise(lit((k - 1).toDouble * HashSpace) / col("kth").cast("double"))
          * 10000.0).cast("long"))
      .drop("kmins")
}
