package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/sharding primitives — the decision is a pure
  * function of the row KEY (md5 hex prefix), never `rand()`:
  *
  *  - reproducible across engines (the DuckDB oracle computes the same
  *    md5), across runs, and across partitionings — no seed plumbing, no
  *    per-partition RNG state;
  *  - stable across the batch/stream boundary: a row keeps the same shard
  *    whether it arrives in a backfill or through a micro-batch, so
  *    train/val/test membership never flips on replay or reprocessing
  *    (the property a checkpoint-replayed streaming sampler needs);
  *  - auditable: the kept fraction of a stratum is the threshold itself
  *    (hex prefix < "29" keeps 41/256 ≈ 16%).
  *
  * Shared by batch q37 (stratified sample), q39 (mixture construction)
  * and the streaming sampler stage
  * [[graft.streaming.StreamingIngest.startSampler]].
  */
object Sampling {

  /** Two-hex-char uniform hash of the key: 256 deterministic buckets. */
  def keyHash(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Keep-decision: hash < threshold keeps ≈ (number of hex prefixes
    * below `thresholdHex`)/256 of rows. The threshold may be a per-row
    * Column (per-stratum mixtures) or `lit("28")`-style constant.
    */
  def keep(key: Column, thresholdHex: Column): Column =
    keyHash(key) < thresholdHex

  /** Shard assignment from cumulative hex cut points, e.g.
    * `Seq("val" -> "08", "test" -> "10")` with `default = "train"`:
    * hash < "08" → val (~3%), < "10" → test (~3%), else train.
    * Cuts must be ascending; every key lands in exactly one shard.
    */
  def shard(key: Column, cuts: Seq[(String, String)], default: String): Column = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cut points must ascend")
    val h = keyHash(key)
    cuts.foldRight(lit(default)) { case ((name, cut), rest) =>
      when(h < cut, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic global training order: every row gets a 16-way shard
    * (first md5 hex char of its key) and a dense 1-based position within
    * that shard, ordered by the next 16 hex chars (a reproducible
    * pseudo-random permutation — the shuffled-shard layout a training
    * run reads).
    *
    * Semantically this is `row_number() OVER (PARTITION BY shard ORDER BY
    * hashkey, id)` — but a direct window would sort each shard in ONE
    * task (16 tasks for 100 TB). Instead the rank is built two-level:
    *
    *  1. micro-bucket = next `bucketChars` hex chars of the hash key
    *     (256 buckets/shard at 2 chars, 4096/shard at 3), so row_number
    *     runs per (shard, bucket) — thousands of parallel sorts;
    *  2. a (shard, bucket) count table (≤ 16·16^bucketChars rows — a
    *     coordination table, never data-sized) turned into per-bucket
    *     prefix-sum offsets with a window over the TINY table, then
    *     broadcast back: pos = bucket offset + within-bucket rank.
    *
    * The two-level order equals the flat order because the bucket is a
    * PREFIX of the order key: (bucket asc, suffix asc) = hashkey asc.
    * Ties on the full 16-char key break on the id, so the permutation is
    * total and engine-reproducible.
    */
  def trainingOrder(df: DataFrame, idCol: String, bucketChars: Int = 2): DataFrame =
    stableRank(
      df.select(col(idCol),
        substring(md5(col(idCol).cast("string")), 1, 1).as("shard")),
      Seq("shard"), idCol, bucketChars)
      .select(col(idCol), col("shard"), col("pos"))

  /** Distributed stable rank within ARBITRARY partition keys: appends
    * `pos` = `row_number() OVER (PARTITION BY partCols ORDER BY
    * md5-order-key, id)` — without ever sorting a whole partition in one
    * task. The two-level construction (micro-bucket rank + per-bucket
    * prefix-sum offsets over a (keys × 16^bucketChars)-row count table)
    * is [[trainingOrder]]'s, generalized; correctness rests on the same
    * prefix argument (bucket = prefix of the order key ⇒ two-level order
    * = flat order, id tiebreak makes it total).
    *
    * The offsets join is NOT broadcast-hinted: with high-cardinality keys
    * (per-domain caps over millions of domains) the count table is
    * data-sized; AQE size-dispatches (broadcast at 16-shard scale,
    * shuffle join beyond).
    */
  def stableRank(
      df: DataFrame,
      partCols: Seq[String],
      idCol: String,
      bucketChars: Int = 2): DataFrame = {
    require(bucketChars >= 1 && bucketChars <= 8, "bucketChars in [1,8]")
    require(partCols.nonEmpty, "at least one partition column")
    val parts = partCols.map(col)
    val keyed = df
      .withColumn("okey", substring(md5(col(idCol).cast("string")), 2, 16))
      .withColumn("bucket", substring(col("okey"), 1, bucketChars))
    val offsets = keyed
      .groupBy((parts :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(
        sum(col("n")).over(Window.partitionBy(parts: _*).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select((parts :+ col("bucket") :+ col("offset")): _*)
    val inBucket = Window.partitionBy((parts :+ col("bucket")): _*)
      .orderBy(col("okey"), col(idCol))
    keyed
      .withColumn("rn", row_number().over(inBucket))
      .join(offsets, partCols :+ "bucket")
      .withColumn("pos", col("offset") + col("rn"))
      .drop("okey", "bucket", "rn", "offset", "n")
  }

  /** SOURCE-BALANCED training order (mixture interleave): rank each doc
    * within its source by the [[trainingOrder]] md5 order, then place
    * source `s`'s rank-`r` doc at the global position a fair round-robin
    * over sources produces — WITHOUT any global sort. With per-source
    * counts `c_s'` and 0-based rank `r0`:
    * {{{ gpos(s, r0) = Σ_s' min(c_s', r0)  +  |{s' < s : c_s' > r0}| }}}
    * (rows of every source with a smaller rank precede; same-rank rows
    * of lexicographically earlier sources precede). Every prefix of the
    * order then carries each source as evenly as arithmetic allows —
    * the curriculum property mixture training wants (q46's global
    * shuffle randomizes; this one BALANCES) — and a doc's position is a
    * pure function of (source, rank, counts): engine-reproducible,
    * partition-invariant, no zipWithIndex, no sort. The counts table is
    * |sources|-sized (planning-bounded driver collect); the only
    * distributed work is [[stableRank]]'s two-level rank.
    */
  def interleaveBySource(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      bucketChars: Int = 2): DataFrame = {
    val ranked = stableRank(
      df.select(col(idCol), col(srcCol)), Seq(srcCol), idCol, bucketChars)
    // |sources|-bounded: mixture source lists are enumerable by contract
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val r0 = col("pos") - lit(1L)
    // own source contributes min(c_s, r0) = r0 and never the +1 term,
    // so summing over ALL sources folds the own-prefix count in
    val gpos = counts.map { case (s2, c) =>
      least(lit(c), r0) +
        when(lit(s2) < col(srcCol) && lit(c) > r0, lit(1L)).otherwise(lit(0L))
    }.reduce(_ + _)
    ranked.select(col(idCol), col(srcCol),
      col("pos").cast("long").as("src_rank"),
      gpos.cast("long").as("gpos"))
  }

  /** C4-style per-key document cap: keep at most `maxPerKey` rows per
    * key, chosen by the deterministic md5 order (not arrival order — a
    * re-partitioned rerun keeps the SAME rows). The classic use is
    * per-domain caps, where key cardinality is data-sized and key skew is
    * the norm (one domain with 10⁹ docs) — exactly where a flat
    * `row_number() OVER (PARTITION BY domain)` dies in one task and this
    * two-level rank doesn't.
    */
  def capPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      maxPerKey: Long,
      bucketChars: Int = 2): DataFrame =
    stableRank(df, keyCols, idCol, bucketChars)
      .filter(col("pos") <= maxPerKey)

  /** Exactly-k deterministic sample: the `k` rows smallest in the md5
    * order (id as tiebreak) — the fixed-SIZE complement to the
    * fixed-RATE samplers above, for carving eval/calibration sets whose
    * size must be exact regardless of corpus growth. Membership is still
    * a pure function of the key set: rerun-stable, partition-independent,
    * and any row's inclusion is auditable by comparing its hash to the
    * k-th smallest. Spark plans the ordered limit as
    * `TakeOrderedAndProject` (per-partition k-heaps + driver merge of k
    * rows — never a global sort; k rows on the driver is the entire
    * coordination cost).
    */
  def exactK(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    df.withColumn("okey", md5(col(idCol).cast("string")))
      .orderBy(col("okey"), col(idCol))
      .limit(k)
      .drop("okey")
  }

  /** Temperature-rebalanced mixture sampling (the UnifiedQA/mT5 rule):
    * stratum `i` is sampled with probability ∝ `n_i^T`, so `T = 1`
    * preserves the natural mix, `T → 0` flattens toward uniform, and the
    * expected output size is `targetFrac · N`. The per-stratum keep rate
    * `p_i = min(1, targetFrac · N · w_i / n_i)` with
    * `w_i = n_i^T / Σ n_j^T` is quantized to a 256-bucket md5 cut (the
    * engine's deterministic-sampling idiom): the realized rate is exactly
    * `floor(p_i·256)/256` — reproducible across engines, runs, replays
    * and partitionings, with the quantization PUBLISHED per stratum
    * rather than hidden in float jitter.
    *
    * `pow` is the one libm call: its output is quantized to 1e-8 fixed
    * point before the cut arithmetic so a last-ulp divergence between
    * JVM and C `pow` cannot flip a bucket boundary.
    *
    * Scale shape: one hash-agg for stratum sizes (stratum-count rows —
    * bounded by the label space, broadcast-safe by construction, same
    * argument as q10's language table), one join back, one scalar filter.
    * No window, no sort, no driver loop.
    */
  /** Weighted exactly-k sample (Efraimidis & Spirakis 2006 priority
    * sampling — [[exactK]]'s weighted complement): each row draws a
    * deterministic uniform `u = (h52+1)/2^52` from the md5 of its id (the
    * q37 rule) and is ranked by the priority `ln(u)/w` — selecting the k
    * LARGEST priorities is the A-Res weighted reservoir rule, so a row's
    * selection probability scales with its weight (an importance- or
    * length-weighted eval draw a fixed-rate sampler can't express).
    *
    * The priority is quantized to 1e-6 fixed point (`floor` — the
    * q53/q38 libm rule) with id-ASC ties, so membership is a pure
    * function of the (id, weight) set: partition-independent,
    * replay-stable, engine-reproducible. Plans as `TakeOrderedAndProject`
    * (per-partition k-heaps + a k-row driver merge — never a global
    * sort, the q63 argument).
    */
  def weightedPriorityK(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    val u = (Sketches.hash52(col(idCol)) + 1).cast("double") / Sketches.HashSpace
    df
      .where(col(weightCol) > 0)
      .withColumn("pri_e6",
        floor(log(u) / col(weightCol).cast("double") * 1000000.0).cast("long"))
      .orderBy(col("pri_e6").desc, col(idCol).asc)
      .limit(k)
  }

  def temperatureSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      temperature: Double,
      targetFrac: Double): DataFrame = {
    require(temperature > 0 && temperature <= 1, "temperature in (0, 1]")
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac in (0, 1]")
    // n^T quantized to 1e-8 fixed point AS A LONG: the normalizer Σ n_j^T
    // is then an EXACT integer sum (a floating Σ is partition-order
    // dependent — the q53 portability rule), and every subsequent double
    // op is a fixed left-associated expression both engines evaluate
    // identically
    val sizes = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("nw8",
        floor(pow(col("n").cast("double"), temperature) * 1e8 + 0.5)
          .cast("long"))
    // Σ n_j^T and N: a one-row aggregate, cross-joined back (1-row
    // broadcast — provably bounded, the only hinted-broadcast class)
    val tot = sizes.agg(
      sum(col("nw8")).as("z8"), sum(col("n")).as("big_n"))
    val rates = sizes.crossJoin(broadcast(tot))
      .withColumn("p", least(lit(1.0),
        lit(targetFrac) * col("big_n") * col("nw8") / col("z8") / col("n")))
      .withColumn("cut", floor(col("p") * 256).cast("int"))
      // int cut -> two lowercase hex chars via digit lookup (portable to
      // any SQL engine without conv()/to_hex agreement)
      .withColumn("cut_hex", concat(
        lit("0123456789abcdef")
          .substr(floor(col("cut") / 16).cast("int") + 1, lit(1)),
        lit("0123456789abcdef").substr((col("cut") % 16) + 1, lit(1))))
      .select(col(stratumCol), col("cut"), col("cut_hex"))
    df.join(rates, stratumCol)
      .filter(col("cut") === 256 || keyHash(col(keyCol)) < col("cut_hex"))
      .drop("cut_hex")
  }
}
