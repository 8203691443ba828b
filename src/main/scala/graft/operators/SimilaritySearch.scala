package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSim
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Baseline: [[bruteForceTopK]] — broadcast the (small) query set against
  * the full corpus, exact cosine, windowed top-k. At 100 TB the corpus side
  * stays partition-parallel and nothing shuffles except the final top-k
  * (WindowGroupLimit keeps ≤k rows per query per partition before the
  * shuffle).
  *
  * Scale path: [[ivfTopK]] — inverted-file search: corpus vectors are
  * bucketed by a coarse quantizer (here: nearest of the per-`label`
  * centroids, computed with one aggregation); a query probes only the
  * `nprobe` nearest centroids' buckets, cutting the scanned fraction to
  * nprobe/nlist. Recall is measured against the brute-force baseline in
  * the test suite rather than assumed.
  */
object SimilaritySearch {

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * Deterministic: ties broken by corpus id ascending.
    */
  def bruteForceTopK(
      queries: DataFrame, // qid, qvec
      corpus: DataFrame,  // id, vec
      k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cos", CosineSim(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** Hard-negative mining (the DPR/contrastive-training data stage): for
    * each query, the k MOST similar corpus vectors whose label differs —
    * the near-misses that make a retrieval/embedding model actually
    * learn, where random negatives are trivially separable. Same plan as
    * [[bruteForceTopK]] with the label-mismatch predicate applied BEFORE
    * ranking (a negative's rank counts only negatives, the training
    * contract), exact and deterministic (cos desc, id asc).
    *
    * Scale shape: identical to the exact-kNN family — broadcast probe set
    * × corpus scan here; the same mining composes with
    * [[bruteForceTopKShuffle]] for large query batches or the IVF probes
    * for sublinear scan, since the label filter is a per-row predicate
    * that pushes into any of them.
    */
  def hardNegatives(
      queries: DataFrame, // qid, qvec, qlabel
      corpus: DataFrame,  // id, vec, label
      k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cos", CosineSim(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("label"), col("cos"), col("rank"))
  }

  /** MMR diversified selection (Carbonell & Goldstein, SIGIR 1998) — pick
    * k items that are RELEVANT but not redundant: greedily maximize
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`. The eval-set /
    * few-shot-pool selector of a training-data pipeline: a plain top-k
    * returns near-duplicates of one neighborhood; MMR trades relevance
    * against novelty.
    *
    * Cross-engine determinism (the q53 rule): relevance and pairwise
    * similarities are 1e-6-quantized BIGINTs, λ is integer millionths,
    * and the greedy objective `λe6·rel_e6 − (1e6−λe6)·maxsim_e6` is
    * exact integer arithmetic with the id-asc tiebreak — both engines
    * replay the selection step-for-step.
    *
    * Scale shape: MMR is inherently sequential in k, so the preferred
    * plan is bounded-candidate greedy — candidates are a top-N retrieval
    * result (N is a query parameter, like k), the N² pairwise sims are
    * computed distributed with the codegen'd [[graft.functions.CosineSim]]
    * kernel, and the ≤N + N² collect is planning-scale, not corpus-scale
    * (the q72/q85 bounded-collect rule). That bound is now ENFORCED, not
    * assumed: above `maxDriverCandidates` (default 10k ⇒ ≤10⁸ driver
    * pairs) the method switches to a DISTRIBUTED greedy — each of the k
    * steps scores all remaining candidates against the ≤k selected
    * vectors executor-side (a broadcast of the selected rows, N·|sel|
    * codegen'd pairs, one aggregate) and collects exactly ONE argmax
    * row. k sequential jobs is the textbook q85 anti-pattern for
    * DRIVER-SIZED inputs, and exactly the right trade when the
    * alternative is an O(N²) driver matrix: selection identity is
    * spec-asserted against the driver path, integer scores and id-asc
    * tiebreaks make the two replay step-for-step.
    */
  def mmrDiversify(
      candidates: DataFrame, // id, vec, rel_e6
      k: Int,
      lambdaE6: Long = 500000L,
      maxDriverCandidates: Int = 10000): DataFrame = {
    require(k >= 1, "k must be positive")
    require(lambdaE6 >= 0L && lambdaE6 <= 1000000L, "lambdaE6 in [0, 1e6]")
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand = candidates.select(col("id").cast("long").as("id"),
      col("vec"), col("rel_e6").cast("long").as("rel_e6")).localCheckpoint()
    val n = cand.count()
    if (n > maxDriverCandidates)
      return mmrDistributed(cand, k, lambdaE6, n)
    val relMap: Map[Long, Long] = cand
      .select(col("id"), col("rel_e6"))
      .as[(Long, Long)].collect().toMap
    val a = cand.select(col("id").as("ia"), col("vec").as("va"))
    val b = cand.select(col("id").as("ib"), col("vec").as("vb"))
    val sim = scala.collection.mutable.HashMap[(Long, Long), Long]()
    a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        floor(CosineSim(col("va"), col("vb")) * 1000000.0 + lit(0.5))
          .cast("long").as("sim_e6"))
      .as[(Long, Long, Long)].collect()
      .foreach { case (x, y, s) => sim((x, y)) = s; sim((y, x)) = s }
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ relMap.keys
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      var bestId = -1L
      var bestScore = Long.MinValue
      // SortedSet iterates id-ascending, so strict '>' = id-asc tiebreak
      remaining.foreach { d =>
        val maxSim =
          if (selected.isEmpty) 0L else selected.map(s => sim((d, s))).max
        val sc = lambdaE6 * relMap(d) - (1000000L - lambdaE6) * maxSim
        if (sc > bestScore) { bestScore = sc; bestId = d }
      }
      picked += ((bestId, rank, bestScore))
      selected += bestId
      remaining -= bestId
      rank += 1
    }
    picked.toSeq.toDF("id", "mmr_rank", "score_q")
  }

  /** The over-bound arm of [[mmrDiversify]]: per greedy step, max-sim
    * against the selected set is a broadcast join of ALL candidates with
    * the ≤k selected vectors (never an N² matrix anywhere), the argmax
    * is a 1-row collect with the same `score desc, id asc` rule the
    * driver path's strict-`>`-over-ascending-ids implements.
    */
  private def mmrDistributed(
      cand: DataFrame, k: Int, lambdaE6: Long, n: Long): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    var rank = 1
    while (rank <= k && sel.size < n) {
      val scored =
        if (sel.isEmpty)
          cand.withColumn("maxsim", lit(0L))
        else {
          val selDf = broadcast(cand
            .filter(col("id").isin(sel.toSeq: _*))
            .select(col("vec").as("svec")))
          cand.filter(!col("id").isin(sel.toSeq: _*))
            .crossJoin(selDf) // ≤k broadcast rows per candidate — bounded
            .withColumn("sim_e6",
              floor(CosineSim(col("vec"), col("svec")) * 1000000.0 + lit(0.5))
                .cast("long"))
            .groupBy(col("id"), col("rel_e6"))
            .agg(max(col("sim_e6")).as("maxsim"))
        }
      val row = scored
        .withColumn("score_q",
          lit(lambdaE6) * col("rel_e6") -
            (lit(1000000L) - lit(lambdaE6)) * col("maxsim"))
        .orderBy(col("score_q").desc, col("id").asc)
        .limit(1).select(col("id"), col("score_q")).head()
      picked += ((row.getLong(0), rank, row.getLong(1)))
      sel += row.getLong(0)
      rank += 1
    }
    picked.toSeq.toDF("id", "mmr_rank", "score_q")
  }

  /** Batch-kNN for LARGE query sets. [[bruteForceTopK]]'s
    * `crossJoin(broadcast(queries))` is the right plan for a handful of
    * probe vectors but caps the query side at broadcast size — a
    * million-query batch would OOM the broadcast. This variant distributes
    * the same all-pairs compute as an EQUI-JOIN: corpus rows hash into
    * `blocks` disjoint blocks, each query replicates into every block
    * (explode of a `blocks`-long sequence — shuffle volume `blocks × |Q|`,
    * the knob trading replication against per-task pair count), and a
    * per-(query, block) top-k (WindowGroupLimit keeps ≤k rows per group
    * per partition) shrinks the global shuffle to `blocks × k` rows per
    * query before the final per-query top-k. Nothing is broadcast, nothing
    * is a cartesian; both sides scale horizontally.
    *
    * Output is identical to [[bruteForceTopK]] (exact search, same
    * tiebreaks) — asserted in the suite. [[topKAuto]] dispatches between
    * the two by query count.
    */
  def bruteForceTopKShuffle(
      queries: DataFrame, // qid, qvec
      corpus: DataFrame,  // id, vec
      k: Int,
      blocks: Int = 64): DataFrame = {
    val c = corpus.withColumn("blk", pmod(xxhash64(col("id")), lit(blocks)))
    val q = queries.withColumn("blk",
      explode(sequence(lit(0L), lit(blocks - 1L))))
    val scored = c.join(q, "blk")
      .withColumn("cos", CosineSim(col("qvec"), col("vec")))
    val wLocal = Window.partitionBy(col("qid"), col("blk"))
      .orderBy(col("cos").desc, col("id").asc)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    scored
      .withColumn("lr", row_number().over(wLocal))
      .filter(col("lr") <= k)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** Size-dispatching front door for exact top-k: broadcast path for small
    * query sets (one cheap count on the query side — negligible next to
    * the kNN itself), shuffle path beyond the bound. The default bound
    * (100k queries ≈ a few MB of vectors) stays far under Spark's 8 GB
    * broadcast ceiling while keeping the common probe-set case on the
    * cheaper plan.
    */
  def topKAuto(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      maxBroadcastQueries: Long = 100000,
      blocks: Int = 64): DataFrame =
    // limit(bound+1).count() answers "≤ bound?" scanning at most bound+1
    // rows — a full count() would execute the whole query-side plan once
    // for the dispatch and again in the chosen path, which is exactly the
    // unbounded work the shuffle path exists to avoid
    if (queries.limit(boundedLimit(maxBroadcastQueries)).count() <= maxBroadcastQueries)
      bruteForceTopK(queries, corpus, k)
    else bruteForceTopKShuffle(queries, corpus, k, blocks)

  // limit() takes an Int: clamp so a Long bound >= Int.MaxValue means
  // "always broadcast" instead of overflowing to a negative/small limit
  private def boundedLimit(bound: Long): Int =
    if (bound >= Int.MaxValue) Int.MaxValue else (bound + 1).toInt

  /** Per-bucket mean vector (the coarse quantizer codebook). Element-wise
    * mean via posexplode + groupBy — one shuffle of (bucket, pos) pairs.
    */
  def centroids(corpus: DataFrame, bucketCol: String): DataFrame =
    corpus
      .select(col(bucketCol).as("bucket"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy(col("bucket"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("bucket"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("bucket"), transform(col("pm"), p => p.getField("m")).as("cvec"))

  /** (qid, qvec, bucket) rows naming the `nprobe` buckets whose centroids
    * are nearest each query. The centroid table is always tiny (nlist
    * rows) and broadcasts; the output scales with |Q| × nprobe.
    */
  def probeBuckets(queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val wq = Window.partitionBy(col("qid"))
      .orderBy(cosine(col("qvec"), col("cvec")).desc, col("bucket").asc)
    queries.crossJoin(broadcast(cents))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("bucket"))
  }

  /** IVF top-k: probe the `nprobe` buckets whose centroids are nearest to
    * the query, brute-force only inside them.
    *
    * `broadcastProbe = true` (the default — right for probe-sized query
    * sets) broadcasts the (qid, qvec, bucket) probe table so the corpus
    * never shuffles; `false` is the large-query-set path: a plain shuffle
    * hash join on the bucket key, both sides partition-parallel, nothing
    * driver-bound. Results are identical — [[ivfTopKAuto]] dispatches by
    * query count.
    */
  def ivfTopK(
      queries: DataFrame, // qid, qvec
      corpus: DataFrame,  // id, vec, bucket
      cents: DataFrame,   // bucket, cvec
      k: Int,
      nprobe: Int,
      broadcastProbe: Boolean = true): DataFrame = {
    // rank buckets per query by centroid cosine (tiny: nlist × queries)
    val probe0 = probeBuckets(queries, cents, nprobe)
    val probed = if (broadcastProbe) broadcast(probe0) else probe0
    // search only the probed buckets
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    corpus.join(probed, "bucket")
      .withColumn("cos", CosineSim(col("qvec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** Size-dispatching IVF front door (see [[topKAuto]] for the rationale):
    * small query sets broadcast the probe table, large ones shuffle-join
    * the corpus on the bucket key.
    */
  def ivfTopKAuto(
      queries: DataFrame,
      corpus: DataFrame,
      cents: DataFrame,
      k: Int,
      nprobe: Int,
      maxBroadcastQueries: Long = 100000): DataFrame =
    ivfTopK(queries, corpus, cents, k, nprobe,
      broadcastProbe = queries.limit(boundedLimit(maxBroadcastQueries)).count()
        <= maxBroadcastQueries)

  /** Persist an IVF index AT REST: the corpus (id, vec, bucket) lands in a
    * [[graft.table.WarehouseTable]] PARTITIONED BY the quantizer bucket, so
    * probes become partition-pruned reads — [[ivfTopKAtRest]] lists and
    * scans ONLY the nprobe probed buckets' files instead of scanning the
    * full corpus and filtering (the residual weakness the in-memory
    * [[ivfTopK]] carries: its bucket join still reads every corpus file).
    * At 100 TB this is the difference between touching nprobe/nlist of the
    * data and touching all of it.
    */
  def ivfIndexAtRest(
      corpus: DataFrame, // id, vec, bucket
      table: graft.table.WarehouseTable,
      compression: String = "snappy"): Unit = {
    // MOR + no stats: an arrival batch's vectors land across many (often
    // all) buckets, so a COW merge rewrites bucket-sized partitions per
    // commit; MOR deltas keep ivfIndexCommit O(batch). Contract: an id's
    // vector is immutable (the quantizer bucket is a function of it), so
    // rows never move partitions while live and the bucket-pruned probe's
    // arbitration is exact. Probes prune by bucket partition only.
    table.create(corpus.schema, partition = Some("bucket"),
      properties = graft.table.WarehouseTable.tableProperties("MOR", compression) +
        ("stats.mode" -> "none"))
    table.append(corpus)
  }

  /** IVF top-k over a bucket-partitioned [[graft.table.WarehouseTable]]:
    * rank buckets per query by centroid cosine exactly as [[ivfTopK]], then
    * read ONLY those buckets' partitions (manifest-level pruning — other
    * partitions' file lists are never parsed, let alone scanned). The
    * driver-side collect is the probed bucket-value set: ≤ nlist values,
    * the same bounded planning step Iceberg does. Scoring and tiebreaks are
    * identical to [[ivfTopK]], so results match bit-for-bit.
    */
  def ivfTopKAtRest(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, // qid, qvec
      table: graft.table.WarehouseTable,
      cents: DataFrame,   // bucket, cvec
      k: Int,
      nprobe: Int,
      broadcastProbe: Boolean = true): DataFrame = {
    // Materialize the probe table ONCE: it feeds both the driver-side
    // bucket collect (which decides the partitions to READ) and the
    // scoring join (which decides the candidates to KEEP). Two separate
    // executions could diverge on a nondeterministic query frame — the
    // join would then probe a bucket the scan never read and silently
    // drop its candidates. The frame is tiny (|Q| × nprobe rows).
    val probe0 = probeBuckets(queries, cents, nprobe).localCheckpoint()
    val probed = if (broadcastProbe) broadcast(probe0) else probe0
    // bounded: at most nlist distinct bucket values reach the driver
    val bucketVals = probe0.select(col("bucket")).distinct()
      .collect().map(_.get(0)).toSeq
    val corpus = table.read(spark, partitions = Some(bucketVals))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    corpus.join(probed, "bucket")
      .withColumn("cos", CosineSim(col("qvec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** Incremental maintenance of the at-rest IVF index — the q66-commit
    * pattern for VECTORS: after a lookup/dedup pass classifies an arrival
    * batch, MERGE the accepted `(id, vec, bucket)` rows into the index so
    * the NEXT batch's probes see everything accepted so far. The bucket
    * must come from the SAME coarse quantizer the index was built under
    * (the caller's contract, identical to [[ivfIndexAtRest]]'s input
    * contract — [[probeBuckets]] with nprobe = 1 is the standard
    * assignment); rows are keyed by `id`, so a checkpoint replay upserts
    * byte-identical rows — idempotent (the q33/streaming replay rule).
    *
    * Scale shape: the COW merge rewrites ONLY the bucket partitions the
    * batch's rows land in (plus the bounded matched-key discovery pass);
    * nothing rescans the existing corpus, and probes stay partition-
    * pruned over the union of corpus + all accepted arrivals.
    */
  def ivfIndexCommit(
      spark: org.apache.spark.sql.SparkSession,
      accepted: DataFrame, // id, vec, bucket (same quantizer as the build)
      table: graft.table.WarehouseTable): Unit = {
    require(table.exists, "ivfIndexCommit needs an existing index table — " +
      "build one with ivfIndexAtRest first")
    table.merge(spark, accepted.select(col("id"), col("vec"), col("bucket")),
      Seq("id"))
  }

  /** Random-projection LSH bucketing for cosine ANN: 2^nPlanes buckets,
    * no training step. Near-dup mining = join within buckets.
    */
  def rpBucketed(corpus: DataFrame, nPlanes: Int, seed: Int = 0): DataFrame =
    corpus.withColumn("bucket", randomProjectionBucket(col("vec"), nPlanes, seed))

  /** Embedding near-dup pairs: candidates from multi-table RP-LSH buckets
    * (OR-amplification: a pair is a candidate if it collides in ANY of the
    * `nTables` independent tables — recall 1-(1-p^nPlanes)^nTables for
    * per-plane agreement p = 1-θ/π), verified by exact cosine ≥ threshold.
    * The candidate join is on (table, bucket), so the compared-pair count
    * stays ~nTables/2^nPlanes of all-pairs — the knob that keeps this
    * sub-quadratic at corpus scale.
    */
  def embeddingNearDupPairs(
      corpus: DataFrame, // id, vec
      nPlanes: Int,
      threshold: Double,
      nTables: Int = 4): DataFrame = {
    val keyed = corpus.select(
      col("id"), col("vec"),
      explode(array((0 until nTables).map { t =>
        struct(lit(t).as("tbl"),
          randomProjectionBucket(col("vec"), nPlanes, seed = t).as("bkt"))
      }: _*)).as("k"))
      .select(col("id"), col("vec"), col("k.tbl").as("tbl"), col("k.bkt").as("bkt"))
    val right = keyed.select(
      col("id").as("id_b"), col("vec").as("vec_b"),
      col("tbl").as("tbl_b"), col("bkt").as("bkt_b"))
    keyed.join(right,
        col("tbl") === col("tbl_b") && col("bkt") === col("bkt_b") &&
          col("id") < col("id_b"))
      .select(col("id"), col("id_b"), col("vec"), col("vec_b"))
      .dropDuplicates("id", "id_b")
      .withColumn("cos", CosineSim(col("vec"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id").as("d1"), col("id_b").as("d2"), col("cos"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    * embedding clusters. Candidate pairs are confined to one coarse-
    * quantizer cell (each vector assigned to its nearest centroid — the
    * same codebook [[ivfTopK]] probes), verified by exact cosine ≥
    * `threshold`, grouped into duplicate sets with
    * [[Dedup.connectedComponents]], and represented by the set minimum.
    *
    * Output: (id, cluster, rep, is_dup) — one row per corpus vector;
    * `rep` is the component-minimum id (a singleton represents itself),
    * `is_dup = id != rep` marks rows SemDeDup would drop.
    *
    * Scale shape: the quadratic work is per-cell — pairs ~ Σ|cell|², the
    * paper's own design point (size nlist so cells stay bounded). The
    * pair join is a plain shuffle equi-join on the cell key (both sides
    * data-scaled — no broadcast), and components converge in O(log n)
    * rounds regardless of duplicate-chain depth.
    */
  def semanticDedup(
      corpus: DataFrame, // id, vec
      cents: DataFrame,  // bucket, cvec
      threshold: Double,
      cellCap: Int = 2048): DataFrame = {
    val assigned = probeBuckets(
      corpus.select(col("id").as("qid"), col("vec").as("qvec")),
      cents, nprobe = 1)
      .select(col("qid").as("id"), col("qvec").as("vec"),
        col("bucket").as("cluster"))
    dedupCells(assigned, threshold, cellCap)
  }

  /** The within-cell half of SemDeDup, shared by the label-means and the
    * learned-codebook variants: per-cell exact-cosine pairs (Σ|cell|² —
    * the paper's design point) → O(log n) components → keep-one reps.
    *
    * SKEW BOUND: a naive cell self-join puts |cell|² work in ONE task
    * the moment one cell runs hot — fatal at corpus scale. Pairs are
    * instead generated by a TRIANGLE BLOCK JOIN: each cell splits into
    * `ceil(|cell| / cellCap)` id-hash blocks and every unordered block
    * pair (lo ≤ hi) meets in its own join group, so no task ever holds
    * more than ~2·cellCap vectors — while the PAIR SET, and therefore
    * the answer, is EXACTLY the naive one (same-block pairs halve by id
    * order; cross-block pairs meet exactly once — the lower block is
    * always the left side — canonicalized by least/greatest). Per-row
    * replication is |cell|/cellCap: the Σ|cell|² comparisons merely
    * spread evenly; nothing is approximated or dropped. Unskewed cells
    * (|cell| ≤ cellCap) degenerate to single-element explodes — the
    * original one-shuffle plan plus a bounded per-cell-count broadcast.
    */
  private def dedupCells(
      assigned: DataFrame, // id, vec, cluster
      threshold: Double,
      cellCap: Int = 2048): DataFrame = {
    // block counts per cell: bounded by the cell count (≤ nlist rows)
    val blocks = assigned.groupBy(col("cluster"))
      .agg(ceil(count(lit(1)).cast("double") / cellCap).cast("int").as("__nb"))
    val rows = assigned.join(broadcast(blocks), Seq("cluster"))
      .withColumn("__b",
        pmod(xxhash64(col("id")), col("__nb").cast("long")).cast("int"))
    val left = rows
      .withColumn("__hi", explode(expr("sequence(__b, __nb - 1)")))
      .select(col("cluster"), col("__b").as("__lo"), col("__hi"),
        col("id"), col("vec"))
    val right = rows
      .withColumn("__lo", explode(expr("sequence(0, __b)")))
      .select(col("cluster"), col("__lo"), col("__b").as("__hi"),
        col("id").as("id_b"), col("vec").as("vec_b"))
    val pairs = left.join(right, Seq("cluster", "__lo", "__hi"))
      .filter(col("__lo") =!= col("__hi") || col("id") < col("id_b"))
      .filter(CosineSim(col("vec"), col("vec_b")) >= lit(threshold))
      .select(least(col("id"), col("id_b")).as("d1"),
        greatest(col("id"), col("id_b")).as("d2"))
    val reps = Dedup.connectedComponents(
      assigned.select(col("id")), pairs.select(col("d1"), col("d2")))
      .select(col("id"), col("cluster").as("rep"))
    assigned.select(col("id"), col("cluster"))
      .join(reps, "id")
      .select(col("id"), col("cluster"), col("rep"),
        (col("id") =!= col("rep")).as("is_dup"))
  }

  /** SemDeDup with a LEARNED coarse quantizer — the full unsupervised
    * pipeline of the paper (Abbas et al. 2023 run k-means first; q51's
    * label-means variant leans on pre-existing labels): [[KMeans.fit]] on
    * the reference corpus, map-side quantized-L2 assignment (exact
    * integer argmin, no join), then the same per-cell exact-cosine pairs
    * and O(log n) components. End-to-end deterministic — trainer,
    * assignment, and verification all replay in the oracle.
    */
  /** Exact top-k under QUANTIZED L2 — the ground truth an ADC/PQ index
    * must be evaluated against (PQ approximates L2 distances; judging it
    * against a cosine ranking conflates quantization loss with plain
    * metric mismatch). Same plan as [[bruteForceTopK]], integer distance.
    */
  def bruteForceTopKL2(
      queries: DataFrame, // qid, qvec
      corpus: DataFrame,  // id, vec
      k: Int,
      scale: Long = 10000L): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("d", graft.functions.LongSqDist(
        KMeans.quantize(col("qvec"), scale), KMeans.quantize(col("vec"), scale)))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d").asc, col("id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("d"), col("rank"))
  }

  /** Recall@k of an approximate top-k against the exact one — the eval
    * harness every deployed ANN index needs (PQ/IVF trade recall for
    * speed; this MEASURES the trade on live data instead of assuming
    * it): per query, the fraction of the exact top-k the approximate
    * result recovered, 1e-4 fixed point. One (qid, id)-keyed join of two
    * k-row-per-query frames — bounded by |Q|·k, never corpus-sized.
    */
  def recallAtK(
      exact: DataFrame, // qid, id, ...
      approx: DataFrame // qid, id, ...
  ): DataFrame = {
    val hits = exact.select(col("qid"), col("id"))
      .join(approx.select(col("qid"), col("id"), lit(1).as("hit")),
        Seq("qid", "id"), "left")
    hits.groupBy(col("qid"))
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(col("qid"), col("n_hits").cast("long").as("n_hits"),
        floor(col("n_hits").cast("double") / col("k").cast("double")
          * 10000.0 + 0.5).cast("long").as("recall_e4"))
  }

  def semanticDedupKMeans(
      corpus: DataFrame,  // id, vec — what gets deduped
      trainOn: DataFrame, // id, vec — what the codebook is fit on
      k: Int,
      iters: Int,
      threshold: Double,
      cellCap: Int = 2048): DataFrame = {
    val cb = KMeans.fit(trainOn, "id", "vec", k, iters)
    val assigned = corpus.select(col("id"), col("vec"),
      KMeans.nearest(KMeans.quantize(col("vec")), cb)
        .getField("cid").as("cluster"))
    dedupCells(assigned, threshold, cellCap)
  }

  /** Embedding-space OUTLIER detection — the quality filter SemDeDup's
    * companion papers run alongside near-dup pruning: a vector far from
    * every learned mode (mis-embedded junk, off-domain content, encoder
    * failures) is flagged by its distance rank WITHIN its own cluster,
    * not by a global cutoff — cluster radii differ wildly, so a global
    * distance threshold either misses tight-cluster outliers or flags an
    * entire diffuse cluster. Input is a [[KMeans.fitAssign]] frame
    * `(id, cluster, dist)`; output adds `pct_e4` (the distance's
    * within-cluster percentile, log-bucket quantized) and
    * `is_outlier = pct_e4 >= pctCut`.
    *
    * Scale shape: the within-cluster CDF would naively be a per-cluster
    * sort — corpus/k rows in ONE task at k=8. Instead the distance first
    * collapses to its [[Percentiles.logBucket]] (squared L2 distances
    * are continuous-grade integers — distinct values ≈ rows, exactly the
    * case the bucketed sketch exists for), so the CDF is over ≤ ~29k
    * buckets per cluster no matter the corpus, with the documented
    * < 2^-7 relative value-error. No global sort, no data-sized window.
    */
  def clusterOutliers(
      assigned: DataFrame,
      idCol: String,
      pctCut: Long = 9000L,
      bits: Int = 8): DataFrame = {
    val b = assigned.withColumn(
      "dist_b", Percentiles.logBucket(col("dist"), bits))
    Percentiles.perKeyPercentile(b, "cluster", "dist_b", idCol)
      .join(assigned.select(col(idCol), col("dist")), Seq(idCol))
      .withColumn("is_outlier", col("pct_e4") >= pctCut)
      .select(col(idCol), col("cluster"), col("dist"),
        col("pct_e4"), col("is_outlier"))
  }
}
