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
    * Null keys hash to null (dropped by the sketch aggregates — a null
    * key is not a distinct value).
    */
  def hash52(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast("long")

  /** Count-min counters over the corpus token stream (Cormode &
    * Muthukrishnan 2005): `depth` md5-hash rows × `width` counters. THIS
    * is the bounded, mergeable artifact — ≤ depth·width rows at any
    * corpus size (map-side partials get it there before the exchange),
    * counters add elementwise across batches. Seedless md5 row hashes ⇒
    * no processing-order dependence (why Misra-Gries-style summaries,
    * whose content is arrival-order-dependent, were NOT chosen).
    */
  def countMinCounters(
      docs: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 hash rows, width >= 2")
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .select(col("w"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), cmBucket(col("w"), col("r"), width).as("b"))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c")) // ≤ depth·width rows
  }

  private def cmBucket(w: Column, r: Column, width: Int): Column =
    conv(substring(md5(concat(r.cast("string"), lit(":"), w)), 1, 8),
      16, 10).cast("long") % width

  /** Estimated counts for a BOUNDED queried-word set — the access
    * pattern CMS exists for: `words × depth` probe rows join the
    * depth·width counter table; nothing vocabulary-sized is touched.
    * Estimate = min over rows; one-sided error (never undercounts,
    * overcount ≤ εN w.h.p., ε = e/width).
    */
  def cmsEstimateFor(
      counters: DataFrame, // r, b, c
      words: DataFrame,    // w
      depth: Int = 4,
      width: Int = 1024): DataFrame =
    words.select(col("w")).where(col("w").isNotNull).distinct()
      .select(col("w"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("w"), col("r"), cmBucket(col("w"), col("r"), width).as("b"))
      .join(counters, Seq("r", "b"), "left")
      .groupBy(col("w"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  /** Top-`topK` words by CMS estimate — a q61-style corpus REPORT. Be
    * honest about its cost: enumerating every word's estimate is a
    * vocabulary-keyed pass (the same cost class as q67's exact ranking);
    * what the sketch buys here is not this report but the MERGEABLE
    * counter table behind it (per-batch counters roll up by addition,
    * and [[cmsEstimateFor]] answers bounded watchlist queries from it
    * without touching the corpus or the vocabulary again).
    */
  def countMinTopWords(
      docs: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 1024,
      topK: Int = 20): DataFrame = {
    val counters = countMinCounters(docs, textCol, depth, width)
    val vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .distinct()
    cmsEstimateFor(counters, vocab, depth, width)
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
      .where(col("h52").isNotNull) // null keys are not distinct values
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

  /** Incrementally maintain count-min counters AT REST — the frequency
    * analog of [[sketchTableCommit]]. Rows are keyed `(bid, r, b)`: each
    * arrival batch MERGEs its own ≤ depth·width counter partials under
    * its batch id, WITHOUT reading anything stored. Because the partials
    * are a pure function of the batch content, a checkpoint replay
    * upserts byte-identical rows — idempotent with no read-modify-write
    * (CMS adds are NOT idempotent, so folding into a single running
    * total at commit time would double-count on replay; per-batch keying
    * sidesteps that entirely). The `cms.maxBid` high-water property
    * additionally no-ops any batch id at or below the last committed one,
    * which is what keeps replays safe AFTER [[countersTableFold]] has
    * collapsed the per-batch rows away (the streaming batch-id rule).
    *
    * Scale shape: commit cost = one map-side scan of the BATCH plus a
    * merge of ≤ depth·width rows; nothing corpus-sized is touched, ever.
    */
  def countersTableCommit(
      spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame,
      textCol: String,
      batchId: Long,
      table: graft.table.WarehouseTable,
      depth: Int = 4,
      width: Int = 1024): Unit = {
    require(batchId >= 0, s"batchId=$batchId must be >= 0 (negative ids are " +
      "reserved for fold output)")
    if (table.exists) {
      val p = table.properties
      Seq("cms.depth" -> depth, "cms.width" -> width).foreach { case (k, v) =>
        require(p.get(k).forall(_ == v.toString),
          s"counter table was built with $k=${p(k)} but the commit passed " +
            s"$v — counters of different geometry never add")
      }
      if (p.get("cms.maxBid").exists(_.toLong >= batchId)) return // replay
    }
    val partial = countMinCounters(batch, textCol, depth, width)
      .select(lit(batchId).as("bid"), col("r"), col("b"), col("c"))
    if (!table.exists)
      table.create(partial.schema,
        properties = graft.table.WarehouseTable.tableProperties("COW", "snappy")
          ++ Map("cms.depth" -> depth.toString, "cms.width" -> width.toString))
    table.merge(spark, partial, Seq("bid", "r", "b"))
    // Property write AFTER the merge: a crash between the two leaves the
    // replay guard unset, and the replayed merge is byte-idempotent anyway.
    table.setProperties(Map("cms.maxBid" -> batchId.toString))
  }

  /** Whole-history counters from the at-rest table: sum the per-batch
    * partials elementwise. ≤ nBatches·depth·width stored rows in,
    * ≤ depth·width out — feeds [[cmsEstimateFor]] directly.
    */
  def countersTableRead(
      spark: org.apache.spark.sql.SparkSession,
      table: graft.table.WarehouseTable): DataFrame =
    table.read(spark).groupBy(col("r"), col("b")).agg(sum(col("c")).as("c"))

  /** Collapse the per-batch history into one folded row set (bid = -1) so
    * the table stays ≤ depth·width rows no matter how many batches have
    * committed. Crash-safe by ordering: the `cms.maxBid` replay guard was
    * already persisted by the last commit, and the overwrite is a single
    * snapshot commit — so at every point the table either holds the
    * unfolded rows (read sums to the same counters) or the folded ones,
    * and replays of pre-fold batch ids stay no-ops via the property.
    */
  def countersTableFold(
      spark: org.apache.spark.sql.SparkSession,
      table: graft.table.WarehouseTable): Unit = {
    require(table.properties.contains("cms.maxBid"),
      "counter table has no cms.maxBid property — not a CMS counter table")
    val folded = countersTableRead(spark, table)
      .select(lit(-1L).as("bid"), col("r"), col("b"), col("c"))
    table.overwrite(folded)
  }

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
  def approxDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      k: Int): DataFrame = {
    val kmins = df
      .select(groupCols.map(col) :+ hash52(col(keyCol)).as("h52"): _*)
      .where(col("h52").isNotNull) // null keys are not distinct values
      .groupBy(groupCols.map(col): _*)
      .agg(KMinValues(col("h52"), k).as("kmins"))
    estimate(kmins, k)
  }

  /** The KMV estimator columns over a frame carrying a `kmins` array —
    * shared by the one-shot aggregate and the at-rest sketch table read.
    * A group whose keys were ALL null carries an empty sketch: kept 0,
    * null kth, estimate 0 (guarded — `element_at(arr, 0)` would throw).
    */
  def estimate(kmins: DataFrame, k: Int): DataFrame =
    kmins
      .withColumn("kept", size(col("kmins")).cast("long"))
      .withColumn("kth",
        when(col("kept") > 0L, element_at(col("kmins"), size(col("kmins"))))
          .otherwise(lit(null).cast("long")))
      .withColumn("est_e4",
        floor(
          when(col("kept") < k, col("kept").cast("double"))
            .otherwise(lit((k - 1).toDouble * HashSpace) / col("kth").cast("double"))
          * 10000.0).cast("long"))
      .drop("kmins")
}
