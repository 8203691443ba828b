package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimHash64, TextFunctions}
import graft.operators.{SimilaritySearch, TextDedup}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val sh = TextDedup.shingled(docs, "doc_id", "text", 3).cache()

  private lazy val exactPairs =
    TextDedup.verifyPairs(TextDedup.allPairsByShingle(sh), sh, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  test("minhash LSH recovers every exact near-dup pair (recall 1.0 here)") {
    val got = TextDedup.verifyPairs(TextDedup.minHashCandidates(sh), sh, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exactPairs.nonEmpty) // the corpus has planted near-dups
    assert(got == exactPairs)
  }

  test("simhash block-LSH recovers every exact near-dup pair on this corpus") {
    // shingle-level fingerprints + pigeonhole blocks for radius 17
    // (mirrors q13 — see SparkEntry for the token-vs-shingle rationale)
    val toks = docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("toks"))
    val got = TextDedup.verifyPairs(
      TextDedup.simHashCandidates(toks, maxHamming = 17), sh, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == exactPairs)
  }

  test("simhash128 pigeonhole blocking recovers every exact pair (q13 path)") {
    // radius 30 = 31 blocks of ≥4 bits over the 128-bit fingerprint; the
    // measured signal max is 19/22/25 bits at sf0.001/0.01/0.1 (probe
    // tool; a marginal 28-bit pair appeared on the sf1 scale harness), so
    // pigeonhole guarantees recall with margin — and the plan is an
    // equi-join, not the dense broadcast pair scan
    val toks = docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("toks"))
    val got = TextDedup.verifyPairs(
      TextDedup.simHash128Candidates(toks, maxHamming = 30), sh, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == exactPairs)
  }

  test("dense simhash pair scan equals the block-LSH candidate semantics") {
    val toks = docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("toks"))
    val dense = TextDedup.verifyPairs(
      TextDedup.simHashCandidatesDense(toks, maxHamming = 17), sh, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(dense == exactPairs)
  }

  test("dense simhash scan refuses an oversized corpus (O(n²) guard)") {
    val toks = docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("toks"))
    val e = intercept[IllegalArgumentException] {
      TextDedup.simHashCandidatesDense(toks, maxHamming = 17, maxRows = 10)
    }
    assert(e.getMessage.contains("O(n²)"))
  }

  test("q15 oracle precondition: probe-boundary centroid-cosine margin") {
    // The q15 DuckDB oracle replays the IVF probe ranking with its own FP
    // accumulation order; a near-tie between centroid rank 3 (last probed)
    // and rank 4 (first skipped) could flip the probe set between engines
    // and surface as an intermittent hash mismatch. Assert the fixture
    // keeps a real margin there, so the oracle's determinism claim holds.
    import org.apache.spark.sql.expressions.Window
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").as("bucket"))
    val cents = SimilaritySearch.centroids(corpus, "bucket")
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("c").desc, col("bucket").asc)
    val ranked = qs.crossJoin(cents)
      .select(col("qid"), col("bucket"),
        graft.functions.VectorFunctions.cosine(col("qvec"), col("cvec")).as("c"))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank").isin(3, 4))
      .groupBy("qid")
      .agg((max(when(col("crank") === 3, col("c")))
        - max(when(col("crank") === 4, col("c")))).as("margin"))
    val minMargin = ranked.agg(min(col("margin"))).head().getDouble(0)
    // centroid averages differ between engines by ~1 ulp (~1e-16 relative);
    // require 10 orders of magnitude of headroom
    assert(minMargin > 1e-6, s"probe-boundary margin $minMargin too tight")
  }

  test("winnow matching: clone and containment semantics (MOSS)") {
    // A=original, B=A with one word edited (near-clone), C=unrelated,
    // D=A's first half pasted verbatim (containment ~1.0 despite size gap)
    val words = (1 to 60).map(i => s"w$i")
    val a = words.mkString(" ")
    val b = words.updated(30, "EDIT").mkString(" ")
    val c = (1 to 60).map(i => s"z$i").mkString(" ")
    val d = words.take(30).mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(docs, "doc_id", "text", k = 3, window = 4)
    val got = TextDedup.winnowMatches(fps, threshold = 0.5)
      .select("d1", "d2", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(got((1L, 2L)) > 0.8)  // one edit perturbs only nearby windows
    assert(got((1L, 4L)) >= 0.9) // pasted subset: containment ~1.0
  }

  test("winnow matching: stop-fingerprint rule drops boilerplate pairs") {
    // every doc shares a boilerplate prefix (license-header shape); two
    // docs are additionally real clones. With the df cap, boilerplate
    // fingerprints (df = 4 > cap) vanish from numerator AND denominators,
    // so only the true clone pair survives.
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + (1 to 30).map(i => s"x$i").mkString(" ")),
      (2L, boiler + " " + (1 to 30).map(i => s"x$i").mkString(" ")), // clone of 1
      (3L, boiler + " " + (1 to 30).map(i => s"y$i").mkString(" ")),
      (4L, boiler + " " + (1 to 30).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val fps = TextDedup.winnowFingerprints(docs, "doc_id", "text", k = 3, window = 4)
    val exact = TextDedup.winnowMatches(fps, threshold = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // uncapped: the shared boilerplate inflates EVERY pair's containment
    assert(exact.contains((1L, 2L)) && exact.size > 1)
    val capped = TextDedup.winnowMatches(fps, threshold = 0.5, maxDocFreq = 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)), s"got $capped")
  }

  test("connected components: chains, singletons, multi-round convergence") {
    import graft.operators.Dedup
    // chain 1-2-3 (diameter 2 forces >1 propagation round), pair 5-6,
    // singletons 4 and 7
    val ids = (1L to 7L).toDF("id")
    val pairs = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(ids, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connected components: 1000-node chain converges in O(log n) rounds") {
    import graft.operators.Dedup
    // a versioned-document chain: diameter 999 — the shape that killed the
    // old one-hop-per-round propagation (hard abort at 20 rounds). The
    // star contraction must cluster it correctly in ~log2(n) rounds.
    // The driver fast path is PINNED OFF (threshold 0) so this keeps
    // certifying the distributed contraction's round bound.
    val n = 1000L
    val ids = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("d1", "d2")
    spark.conf.set("spark.graft.cc.localEdgeThreshold", "0")
    try {
      val (labels, rounds) =
        Dedup.connectedComponentsWithRounds(ids, pairs, maxRounds = 50)
      val got = labels.as[(Long, Long)].collect()
      assert(got.length == n)
      assert(got.forall(_._2 == 1L), "every chain node must label to the min id")
      assert(rounds > 0, "threshold 0 must pin the distributed contraction")
      assert(rounds <= 15, s"expected ~log2(1000)+c rounds, got $rounds")
    } finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
  }

  test("connected components: driver fast path ≡ distributed contraction") {
    import graft.operators.Dedup
    // adversarial mix: deep chain (path compression), two components that
    // union through their minima in both attach directions, duplicate and
    // reversed edges, singletons, and edge-only vertices absent from ids
    val ids = (1L to 40L).toDF("id")
    val pairs = ((1L until 20L).map(i => (i + 1, i)) ++ // reversed chain
      Seq((25L, 30L), (30L, 27L), (27L, 25L),           // cycle
        (33L, 31L), (31L, 33L), (33L, 31L),             // dup + both dirs
        (50L, 51L))                                     // ids outside `ids`
      ).toDF("d1", "d2")
    // fast path (default threshold covers this size)
    val (local, lr) = Dedup.connectedComponentsWithRounds(ids, pairs)
    assert(lr == 0, "expected the driver fast path under the threshold")
    val localMap = local.as[(Long, Long)].collect().toMap
    // distributed contraction, pinned
    spark.conf.set("spark.graft.cc.localEdgeThreshold", "0")
    val distMap =
      try Dedup.connectedComponents(ids, pairs).as[(Long, Long)].collect().toMap
      finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
    assert(localMap == distMap, s"local $localMap != distributed $distMap")
    assert(localMap(20L) == 1L && localMap(30L) == 25L && localMap(31L) == 31L)
  }

  test("connected components: interleaved components and duplicate edges") {
    import graft.operators.Dedup
    // two interleaved odd/even chains + duplicate and self edges: the
    // contraction must neither merge the components nor choke on dups
    val ids = (1L to 10L).toDF("id")
    val pairs = ((1L to 8L by 2).map(i => (i, i + 2)) ++   // odds: 1-3-5-7-9
      (2L to 8L by 2).map(i => (i + 2, i)) ++              // evens, reversed
      Seq((3L, 5L), (5L, 3L), (4L, 4L))).toDF("d1", "d2")  // dup + self
    val got = Dedup.connectedComponents(ids, pairs)
      .as[(Long, Long)].collect().toMap
    val expected = (1L to 10L).map(i => i -> (if (i % 2 == 1) 1L else 2L)).toMap
    assert(got == expected)
  }

  test("simhash64 expression: interpreted eval == codegen result, stable") {
    val df = Seq(
      Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("a", "b", "d"), Seq.empty[String]
    ).toDF("toks").select(SimHash64(col("toks")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))          // deterministic
    assert(fps(0) != fps(2))          // sensitive to content
    val ham = java.lang.Long.bitCount(fps(0) ^ fps(2))
    assert(ham > 0 && ham <= 32)      // near, not equal, for a 1-token edit
  }

  test("IVF top-k achieves high recall vs brute force and scans less") {
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").as("bucket"))
    val exact = SimilaritySearch.bruteForceTopK(
      qs, corpus.drop("bucket"), 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val cents = SimilaritySearch.centroids(corpus, "bucket")
    val approx = SimilaritySearch.ivfTopK(qs, corpus, cents, 5, nprobe = 3)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // labels are a weak coarse quantizer on this synthetic corpus (geometry
    // barely correlates with label), so the honest bound is ~nprobe/nlist
    assert(recall >= 0.25, s"IVF recall $recall below scan fraction")
    assert(approx.size == exact.size)
  }

  test("hard negatives: same-label excluded, ranks count only negatives") {
    import graft.operators.SimilaritySearch
    // q's own label is 'a'; vec (1,0) is a PERFECT same-label match and
    // must neither appear nor consume a rank slot
    val qs = Seq((0L, Seq(1f, 0f), "a")).toDF("qid", "qvec", "qlabel")
    val corpus = Seq(
      (10L, Seq(1f, 0f), "a"),   // cos 1.0, same label: excluded
      (11L, Seq(1f, 1f), "b"),   // cos ~0.707: negative rank 1
      (12L, Seq(0f, 1f), "b"),   // cos 0.0:    negative rank 2
      (13L, Seq(-1f, 0f), "c"))  // cos -1.0:   negative rank 3, cut at k=2
      .toDF("id", "vec", "label")
    val out = SimilaritySearch.hardNegatives(qs, corpus, k = 2)
      .select("id", "label", "rank").as[(Long, String, Int)].collect().toList
      .sortBy(_._3)
    assert(out == List((11L, "b", 1), (12L, "b", 2)))
  }

  test("mmr diversify: redundant near-dup demoted below the diverse pick") {
    import graft.operators.SimilaritySearch
    // ids 1/2 are near-parallel (sim ≈ 0.9998) with the two best
    // relevances; id 3 is near-orthogonal with lower relevance. Top-2 by
    // relevance = {1, 2}; MMR must pick {1, 3} and push 2 to rank 3.
    val cand = Seq(
      (1L, Seq(2f, 1f), 894427L),
      (2L, Seq(1.9f, 1f), 884900L),
      (3L, Seq(1f, -2f), 447213L))
      .toDF("id", "vec", "rel_e6")
    val out = SimilaritySearch.mmrDiversify(cand, k = 3)
      .select("id", "mmr_rank").as[(Long, Int)].collect().toList.sortBy(_._2)
    assert(out.map(_._1) == List(1L, 3L, 2L))
    // k beyond the candidate count returns every candidate once
    assert(SimilaritySearch.mmrDiversify(cand, k = 10).count() == 3)
    // exact tie (identical vec + rel): id-asc wins the first pick
    val tied = Seq(
      (7L, Seq(1f, 0f), 1000000L),
      (5L, Seq(1f, 0f), 1000000L))
      .toDF("id", "vec", "rel_e6")
    val first = SimilaritySearch.mmrDiversify(tied, k = 1)
      .select("id").as[Long].collect().toList
    assert(first == List(5L))
  }

  test("mmr diversify: distributed over-bound path replays the driver selection step-for-step") {
    import graft.operators.SimilaritySearch
    // 60 candidates in deliberate tie-heavy clusters (8 distinct
    // directions, repeated relevances) so the id-asc tiebreak is
    // exercised, not dodged
    val cand = (0 until 60).map { i =>
      val ang = (i % 8) * math.Pi / 4
      (i.toLong, Seq(math.cos(ang).toFloat, math.sin(ang).toFloat),
        (1000000L - (i % 5) * 100000L))
    }.toDF("id", "vec", "rel_e6")
    val driver = SimilaritySearch.mmrDiversify(cand, k = 9)
      .select("id", "mmr_rank", "score_q").as[(Long, Int, Long)]
      .collect().toList.sortBy(_._2)
    val dist = SimilaritySearch.mmrDiversify(cand, k = 9,
        maxDriverCandidates = 10) // force the distributed arm
      .select("id", "mmr_rank", "score_q").as[(Long, Int, Long)]
      .collect().toList.sortBy(_._2)
    assert(dist == driver)
  }

  test("large-query-set shuffle paths ≡ broadcast paths (exact equivalence)") {
    // the shuffle variants exist for query sets too big to broadcast; they
    // must return EXACTLY what the broadcast plans return (same tiebreaks)
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").as("bucket"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id", "cos", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    val bcBrute = rows(SimilaritySearch.bruteForceTopK(qs, corpus.drop("bucket"), 5))
    val shBrute = rows(SimilaritySearch.bruteForceTopKShuffle(qs, corpus.drop("bucket"), 5, blocks = 7))
    assert(shBrute == bcBrute)

    val cents = SimilaritySearch.centroids(corpus, "bucket")
    val bcIvf = rows(SimilaritySearch.ivfTopK(qs, corpus, cents, 5, nprobe = 3))
    val shIvf = rows(SimilaritySearch.ivfTopK(qs, corpus, cents, 5, nprobe = 3,
      broadcastProbe = false))
    assert(shIvf == bcIvf)

    // the dispatcher keeps a small probe set on the broadcast plan and
    // routes an oversized one to the shuffle plan — results identical
    assert(rows(SimilaritySearch.topKAuto(qs, corpus.drop("bucket"), 5)) == bcBrute)
    assert(rows(SimilaritySearch.topKAuto(qs, corpus.drop("bucket"), 5,
      maxBroadcastQueries = 1)) == bcBrute)
    assert(rows(SimilaritySearch.ivfTopKAuto(qs, corpus, cents, 5, 3,
      maxBroadcastQueries = 1)) == bcIvf)
  }

  test("IVF at rest: probe reads ONLY probed buckets' files, same results") {
    val qs = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").as("bucket"))
    val cents = SimilaritySearch.centroids(corpus, "bucket")
    val table = graft.table.WarehouseTable(tmpDir("ivfrest") + "/emb")
    SimilaritySearch.ivfIndexAtRest(corpus, table)
    val atRest = SimilaritySearch.ivfTopKAtRest(spark, qs, table, cents, 5, nprobe = 3)
    val inMem = SimilaritySearch.ivfTopK(qs, corpus, cents, 5, nprobe = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id", "cos", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rows(atRest) == rows(inMem))

    // the at-rest scan touches only the probed partitions' files — the
    // point of bucketing at rest (ivfTopK would read every corpus file)
    val probed = SimilaritySearch.probeBuckets(qs, cents, 3)
      .select("bucket").distinct().collect().map(_.get(0).toString).toSet
    val all = corpus.select("bucket").distinct().count()
    assert(probed.size < all) // pruning is non-trivial for this query set
    // inputFiles also lists the probe side's source (embeddings.parquet);
    // the warehouse's own files are the hive-partitioned bucket=<v> dirs
    val files = atRest.inputFiles.filter(_.contains("bucket="))
    assert(files.nonEmpty)
    assert(files.forall(f => probed.exists(b => f.contains(s"bucket=$b"))),
      s"unprobed partition leaked into scan: ${files.filterNot(f => probed.exists(b => f.contains(s"bucket=$b"))).take(3).mkString(",")}")
  }

  test("IVF at rest: incremental commit — probes find committed arrivals; replay no-op") {
    val corpus = emb.filter(col("vec_id") >= 10 && col("vec_id") < 50)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").as("bucket"))
    val cents = SimilaritySearch.centroids(corpus, "bucket")
    val table = graft.table.WarehouseTable(tmpDir("ivfcommit") + "/emb")
    SimilaritySearch.ivfIndexAtRest(corpus, table)
    // batch 1 arrivals: held-out vectors, bucket = nearest centroid
    // (probeBuckets nprobe=1 — the standard index-side assignment)
    val b1 = emb.filter(col("vec_id") >= 50 && col("vec_id") < 55)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val assigned = SimilaritySearch.probeBuckets(b1, cents, 1)
      .select(col("qid").as("id"), col("qvec").as("vec"), col("bucket"))
    SimilaritySearch.ivfIndexCommit(spark, assigned, table)
    val nRows = table.read(spark).count()
    assert(nRows == 45L)
    // batch 2 probe: an arrival's own vector must now hit itself at rank 1
    // (nprobe=1 suffices — the probe ranks buckets exactly as the commit's
    // assignment did, so the top probed bucket IS the committed bucket)
    val q = b1.filter(col("qid") === 52L)
    val top = SimilaritySearch.ivfTopKAtRest(spark, q, table, cents,
        k = 1, nprobe = 1)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(top == Set((52L, 52L, 1)))
    // replay: keyed byte-identical upsert — no extra rows
    SimilaritySearch.ivfIndexCommit(spark, assigned, table)
    assert(table.read(spark).count() == nRows)
    // committing into a never-built table fails loudly
    intercept[IllegalArgumentException] {
      SimilaritySearch.ivfIndexCommit(spark, assigned,
        graft.table.WarehouseTable(tmpDir("ivfnone") + "/t"))
    }
    ()
  }

  test("IVFADC at rest: incremental commit encodes under the frozen codebooks; replay no-op") {
    import graft.operators.ProductQuantizer
    val corpus = emb.filter(col("vec_id") >= 10 && col("vec_id") < 50)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").as("bucket"))
    val cents = SimilaritySearch.centroids(corpus, "bucket")
    val cb = ProductQuantizer.fit(corpus, "id", "vec",
      dim = 64, m = 4, k = 8, iters = 2)
    val table = graft.table.WarehouseTable(tmpDir("ivfpqcommit") + "/emb")
    ProductQuantizer.ivfPqIndexAtRest(corpus, cb, table)
    val b1 = emb.filter(col("vec_id") >= 50 && col("vec_id") < 55)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val assigned = SimilaritySearch.probeBuckets(b1, cents, 1)
      .select(col("qid").as("id"), col("qvec").as("vec"), col("bucket"))
    ProductQuantizer.ivfPqIndexCommit(spark, assigned, cb, table)
    val nRows = table.read(spark).count()
    assert(nRows == 45L)
    // the committed rows carry PQ codes from the SAME codebooks the
    // at-rest rows do: a probe for an arrival's own vector returns it
    // with the identical ADC distance the in-memory encoder computes
    val q = b1.filter(col("qid") === 52L)
    val got = ProductQuantizer.ivfPqTopKAtRest(
        spark, q, table, cents, cb, k = 45, nprobe = 1)
      .filter(col("id") === 52L)
      .select("qid", "id", "adist").as[(Long, Long, Long)].collect().toSet
    val selfDist = ProductQuantizer.adcTopK(
        q, ProductQuantizer.encode(
          assigned.filter(col("id") === 52L), "id", "vec", cb), cb, k = 1)
      .select("qid", "id", "adist").as[(Long, Long, Long)].collect().toSet
    assert(got == selfDist && got.nonEmpty)
    // replay: deterministic encode, keyed upsert — no extra rows
    ProductQuantizer.ivfPqIndexCommit(spark, assigned, cb, table)
    assert(table.read(spark).count() == nRows)
    ()
  }

  test("semanticDedupKMeans: planted copies dedup to their source, learned cells") {
    import graft.operators.SimilaritySearch
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val planted = base.filter(col("id") < 10)
      .select((col("id") + 1000000L).as("id"),
        org.apache.spark.sql.functions.transform(col("vec"),
          x => x * org.apache.spark.sql.functions.lit(2.0f)).as("vec"))
    val out = SimilaritySearch.semanticDedupKMeans(
      base.unionByName(planted), base, k = 4, iters = 2, threshold = 0.95)
      .select("id", "rep", "is_dup")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // every planted 2x copy (cosine 1 with its source) is a dup whose
    // component rep is (at most) its source's id
    (0L until 10L).foreach { i =>
      val copy = out(i + 1000000L)
      assert(copy._3, s"planted $i not flagged as dup")
      assert(copy._2 <= i, s"planted $i rep ${copy._2} above its source")
      assert(out(i)._2 == copy._2, s"source $i in a different component")
    }
  }

  test("IVFADC at rest: probed-partition ADC == in-memory ADC on probed buckets") {
    import graft.operators.ProductQuantizer
    val qs = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").as("bucket"))
    val cents = SimilaritySearch.centroids(corpus, "bucket")
    val cb = ProductQuantizer.fit(corpus, "id", "vec",
      dim = 64, m = 4, k = 8, iters = 2)
    val table = graft.table.WarehouseTable(tmpDir("ivfpq") + "/emb")
    ProductQuantizer.ivfPqIndexAtRest(corpus, cb, table)
    val atRest = ProductQuantizer.ivfPqTopKAtRest(
      spark, qs, table, cents, cb, k = 5, nprobe = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id", "adist", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // in-memory twin: ADC over exactly the probed buckets' codes
    val probed = SimilaritySearch.probeBuckets(qs, cents, 3)
    val probedPairs = probed.select(col("qid").as("pqid"), col("bucket"))
    val codes = ProductQuantizer.encode(corpus, "id", "vec", cb)
      .join(corpus.select(col("id"), col("bucket")), "id")
    val inMem = ProductQuantizer.adcTopK(qs, codes.drop("bucket"), cb, k = 1000)
      .join(probedPairs.join(codes.select("id", "bucket"), "bucket")
          .select(col("pqid").as("qid"), col("id")).distinct(),
        Seq("qid", "id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("adist").asc, col("id").asc)))
      .filter(col("rank") <= 5)
    assert(rows(atRest) == rows(inMem))
    // pruned read: only probed buckets' partition files are scanned
    val probedVals = probed.select("bucket").distinct()
      .collect().map(_.get(0).toString).toSet
    assert(probedVals.size < corpus.select("bucket").distinct().count())
    val files = atRest.inputFiles.filter(_.contains("bucket="))
    assert(files.nonEmpty)
    assert(files.forall(f => probedVals.exists(b => f.contains(s"bucket=$b"))),
      "unprobed partition leaked into the IVFADC scan")
  }

  test("minhash at rest: lookup == exact cross-set jaccard, probe prunes partitions") {
    val table = graft.table.WarehouseTable(tmpDir("mhrest") + "/idx")
    TextDedup.minhashIndexAtRest(docs, "doc_id", "text", table)
    // one near-dup arrival (an edit of doc 0) + one unrelated arrival
    val arrivals = docs.filter(col("doc_id") === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(lit("edited "), col("text")).as("text"))
      .unionByName(Seq((600000L, "zz1 zz2 zz3 zz4 zz5 zz6"))
        .toDF("doc_id", "text"))
    val got = TextDedup.minhashLookupAtRest(
      spark, arrivals, docs, "doc_id", "text", table)
    val rows = got.select("d1", "d2", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // exact twin: brute-force jaccard between arrivals and the corpus
    val ash = TextDedup.shingled(arrivals, "doc_id", "text")
    val cross = ash.select(col("doc_id").as("d1"), col("sh").as("sh1"), col("n_sh").as("n1"))
      .crossJoin(sh.select(col("doc_id").as("d2"), col("sh").as("sh2"), col("n_sh").as("n2")))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        floor(col("inter").cast("double")
          / (col("n1") + col("n2") - col("inter")) * 10000.0 + 0.5) / 10000.0)
      .filter(col("jaccard") >= 0.5)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(cross.nonEmpty && rows == cross)
    assert(rows.exists(r => r._1 == 500000L && r._2 == 0L && r._3 >= 0.9))
    // pruned read: the scan touches only the pb partitions the arrivals'
    // own band hashes name — a strict subset of the index's partitions
    val files = got.inputFiles.filter(_.contains("pb="))
    val allParts = spark.read.parquet(table.root + "/data")
      .select("pb").distinct().count()
    val touched = files.flatMap(f =>
      "pb=(\\d+)".r.findFirstMatchIn(f).map(_.group(1))).toSet
    assert(files.nonEmpty && touched.size < allParts,
      s"no pruning: touched ${touched.size} of $allParts partitions")
  }

  test("minhash at rest: incremental commits index accepted arrivals; batch 2 catches batch 1's docs") {
    val base = tmpDir("mhinc")
    val idxTable = graft.table.WarehouseTable(base + "/idx")
    val corpTable = graft.table.WarehouseTable(base + "/corpus")
    // seed corpus: 30 docs with disjoint vocabularies
    val corpus0 = (0L until 30L).map(i =>
      (i, (1 to 20).map(j => s"c${i}w$j").mkString(" "))).toDF("doc_id", "text")
    // partBuckets=1 → 32 pb partitions: each COW merge rewrites only the
    // partitions it touches, and 256 near-empty dirs × 3 commits is all
    // file-system overhead at this fixture size
    TextDedup.minhashIndexAtRest(corpus0, "doc_id", "text", idxTable,
      partBuckets = 1)
    TextDedup.minhashIndexCommit(spark, corpus0, "doc_id", "text", idxTable, corpTable)
    val snapAfterSeed = idxTable.currentSnapshotId
    def corpusDf = corpTable.read(spark).select(col("doc_id"), col("text"))
    // batch 1: one fresh doc (100), one edit of corpus doc 0 (101 — rejected)
    val fresh100 = (1 to 20).map(j => s"a$j").mkString(" ")
    val b1 = Seq(
      (100L, fresh100),
      (101L, "edited " + (1 to 20).map(j => s"c0w$j").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs1 = TextDedup.minhashLookupAtRest(
      spark, b1, corpusDf, "doc_id", "text", idxTable, partBuckets = 1)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs1.map(_._1) == Set(101L)) // only the edit matches; 100 is new
    val accepted1 = b1.filter(col("doc_id") === 100L)
    TextDedup.minhashIndexCommit(spark, accepted1, "doc_id", "text", idxTable, corpTable)
    assert(idxTable.currentSnapshotId > snapAfterSeed) // snapshot advanced
    // batch 2: an edit of the batch-1-ACCEPTED doc must now be caught
    val b2 = Seq(
      (200L, "edited " + fresh100),
      (201L, (1 to 20).map(j => s"b$j").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs2 = TextDedup.minhashLookupAtRest(
      spark, b2, corpusDf, "doc_id", "text", idxTable, partBuckets = 1)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs2 == Set((200L, 100L))) // near-dup OF AN ACCEPTED ARRIVAL
    // replay: re-committing the same batch upserts identical rows — the
    // index gains a snapshot but no extra rows, corpus likewise
    val idxRows = idxTable.read(spark).count()
    val corpRows = corpTable.read(spark).count()
    TextDedup.minhashIndexCommit(spark, accepted1, "doc_id", "text", idxTable, corpTable)
    assert(idxTable.read(spark).count() == idxRows)
    assert(corpTable.read(spark).count() == corpRows)
    // a non-index table refuses commits
    val bare = graft.table.WarehouseTable(base + "/bare")
    bare.create(corpus0.schema)
    val e = intercept[IllegalArgumentException] {
      TextDedup.minhashIndexCommit(spark, b1, "doc_id", "text", bare, corpTable)
    }
    assert(e.getMessage.contains("minhash"))
  }

  test("minhash at rest: mismatched banding params and weak banding fail loudly") {
    val table = graft.table.WarehouseTable(tmpDir("mhguard") + "/idx")
    TextDedup.minhashIndexAtRest(docs, "doc_id", "text", table)
    val arrivals = docs.limit(1)
    // lookup under a different banding than the index persisted
    val e1 = intercept[IllegalArgumentException] {
      TextDedup.minhashLookupAtRest(
        spark, arrivals, docs, "doc_id", "text", table, bands = 16)
    }
    assert(e1.getMessage.contains("minhash.bands"))
    // banding that cannot honor the recall contract at the requested jaccard
    val e2 = intercept[IllegalArgumentException] {
      TextDedup.minhashLookupAtRest(
        spark, arrivals, docs, "doc_id", "text", table,
        minRecallJaccard = 0.5)
    }
    assert(e2.getMessage.contains("recall"))
  }

  test("q24 LSH path ≡ exact broadcast twin on the augmented corpus") {
    // the gated q24 runs RP-LSH over the corpus augmented with ×2-scaled
    // copies; the exact all-pairs broadcast form is its verification twin —
    // identical output required (recall 1.0 comes from scaled copies
    // sharing every RP bucket: sign(r·2v) ≡ sign(r·v) exactly)
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val planted = base.filter(col("id") < 25)
      .select((col("id") + 1000000L).as("id"),
        transform(col("vec"), x => x * lit(2.0f)).as("vec"))
    val corpus = base.unionByName(planted)
    val lsh = SimilaritySearch.embeddingNearDupPairs(
      corpus, nPlanes = 12, threshold = 0.95, nTables = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val b = corpus.select(col("id").as("id_b"), col("vec").as("vec_b"))
    val exact = corpus.join(broadcast(b), col("id") < col("id_b"))
      .withColumn("cos", graft.functions.CosineSim(col("vec"), col("vec_b")))
      .filter(col("cos") >= 0.95)
      .select(col("id").as("d1"), col("id_b").as("d2"))
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && exact.size == 25) // all planted pairs, nothing else
    assert(lsh == exact)
  }

  test("RP-LSH near-dup mining recovers planted high-cosine pairs") {
    // the driver corpus has no near-dup embeddings (max cos ≈ 0.51), so
    // plant our own: 40 random base vectors + a lightly-jittered copy each
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, vec()))
    val dups = base.map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.03f * rnd.nextGaussian().toFloat))
    }
    val corpus = (base ++ dups).toDF("id", "vec")
    val got = SimilaritySearch.embeddingNearDupPairs(
      corpus, nPlanes = 6, threshold = 0.95, nTables = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val planted = base.map { case (i, _) => (i, i + 1000L) }.toSet
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.8, s"RP-LSH recall $recall too low")
  }

  test("incremental dedup: exact, near and fresh arrivals classified (q47)") {
    val corpus = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta"), // exact
      (103L, "one two three four five six seven eight nine ten zz yy xx"), // near
      (105L, "totally fresh content with no overlap whatsoever here") // keep
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupAgainstCorpus(incoming, corpus, "doc_id", "text")
      .select("doc_id", "exact_dup", "n_near_dups", "keep")
      .as[(Long, Int, Long, Int)].collect().sortBy(_._1)
    // exact dup also clears the near bar (jaccard 1.0) — both flags fire
    assert(out(0) == ((101L, 1, 1L, 0)))
    // 8 shared trigrams of 11 incoming / 8 corpus: 8/11 ≥ 0.5, not exact
    assert(out(1) == ((103L, 0, 1L, 0)))
    assert(out(2) == ((105L, 0, 0L, 1)))
  }

  test("bloom-prefiltered dedup ≡ plain exact arm; bloom admits every true dup (q71)") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 2 === 0)
    val incoming = d.filter(col("doc_id") % 2 === 1)
      .unionAll(corpus.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val bloomed = TextDedup.bloomDedupAgainstCorpus(
      incoming, corpus, "doc_id", "text")
      .select("doc_id", "exact_dup").as[(Long, Int)].collect().toMap
    // the decision must be EXACTLY the plain fingerprint-join decision —
    // the bloom is a prefilter, never an approximation of the output
    val plain = TextDedup.dedupAgainstCorpus(incoming, corpus, "doc_id", "text")
      .select("doc_id", "exact_dup").as[(Long, Int)].collect().toMap
    assert(bloomed == plain)
    // every planted verbatim re-arrival is flagged (no false negatives)
    val planted = corpus.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).as[Long].collect()
    assert(planted.nonEmpty && planted.forall(id => bloomed(id + 1000000L) == 1))
  }

  test("bloom prefilter: filter rejects non-member fingerprints at ~fpp; probe is codegen'd, no UDF") {
    val corpus = (1 to 2000).map(i => s"fp_$i").toDF("fp")
    val bloom = TextDedup.corpusFingerprintBloom(corpus, 2000, 0.01)
    // the filter holds xxhash64 longs (the BloomFilterMightContain form);
    // compute the engine's hashes engine-side and probe with the long API
    def hashes(fps: Seq[String]): Seq[Long] =
      fps.toDF("fp").select(xxhash64(col("fp"))).as[Long].collect().toSeq
    assert(hashes((1 to 2000).map(i => s"fp_$i")).forall(bloom.mightContainLong))
    val fpHits = hashes((1 to 10000).map(i => s"other_$i"))
      .count(bloom.mightContainLong)
    // 1% nominal fpp; generous bound so the test never flakes
    assert(fpHits < 500, s"false-positive rate too high: $fpHits / 10000")
    // the arrival-side probe plan contains no ScalaUDF anywhere
    val d = docs.select(col("doc_id"), col("text"))
    val plan = TextDedup.bloomDedupAgainstCorpus(
      d.filter(col("doc_id") % 2 === 1), d.filter(col("doc_id") % 2 === 0),
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("might_contain"), plan)
  }

  test("segment dedup: first occurrence survives, later copies drop (q44)") {
    // 4-word segments; doc 2 repeats doc 1's first segment, doc 3 is a
    // full copy of doc 1, doc 4 repeats its own first segment in-doc
    val df = Seq(
      (1L, "a b c d e f g h"),          // segs: "a b c d", "e f g h"
      (2L, "a b c d x y z w"),          // first seg is a dup of doc 1's
      (3L, "a b c d e f g h"),          // both segs dup doc 1
      (4L, "p q r s p q r s")           // second seg dups its own first
    ).toDF("doc_id", "text")
    val out = TextDedup.segmentDedup(df, "doc_id", "text", segWords = 4)
      .select("doc_id", "n_segs", "n_dup_segs", "clean_md5")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)

    def m(s: String) = {
      import java.security.MessageDigest
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(out(0) == ((1L, 2L, 0L, m("a b c d e f g h"))))
    assert(out(1) == ((2L, 2L, 1L, m("x y z w"))))
    assert(out(2) == ((3L, 2L, 2L, m("")))) // everything was a duplicate
    assert(out(3) == ((4L, 2L, 1L, m("p q r s"))))
  }

  test("property: segmentDedup matches an in-memory reference implementation") {
    import java.security.MessageDigest
    def m(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // reference: global first-occurrence in (id, pos) order
    def ref(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
      val segs = docs.flatMap { case (id, t) =>
        t.trim.split("\\s+").toSeq.grouped(k).zipWithIndex
          .map { case (g, i) => (id, i, g.mkString(" ")) }
      }.sortBy(s => (s._1, s._2))
      val seen = scala.collection.mutable.Set[String]()
      val marked = segs.map { case (id, pos, seg) =>
        val keep = !seen.contains(seg); seen += seg; (id, pos, seg, keep)
      }
      marked.groupBy(_._1).map { case (id, ss) =>
        id -> ((ss.size.toLong, ss.count(!_._4).toLong,
          m(ss.filter(_._4).sortBy(_._2).map(_._3).mkString(" "))))
      }
    }
    val vocab = Vector("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 3) {
      val fixture = (0L until 20L).map { id =>
        // small vocab + short docs force plenty of cross-doc segment hits
        (id, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = TextDedup.segmentDedup(fixture.toDF("doc_id", "text"), "doc_id", "text", 3)
        .select("doc_id", "n_segs", "n_dup_segs", "clean_md5")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == ref(fixture, 3))
    }
  }

  test("segment dedup: ragged tail segment is its own unit") {
    val df = Seq((1L, "a b c d e"), (2L, "e")).toDF("doc_id", "text")
    val out = TextDedup.segmentDedup(df, "doc_id", "text", segWords = 4)
      .select("doc_id", "n_segs", "n_dup_segs")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc 1: ["a b c d", "e"]; doc 2's "e" duplicates doc 1's tail seg
    assert(out(0) == ((1L, 2L, 0L)))
    assert(out(1) == ((2L, 1L, 1L)))
  }

  test("semanticDedup: within-cell duplicate sets, singletons keep themselves") {
    // two quantizer cells along e1/e2; cluster {1,2,3} is a duplicate
    // chain (2 = 2×1 exactly, 3 within cos 0.95 of both), {11,12} a pair,
    // 21 assigns to cell 0 but is far from the a-chain -> singleton
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)),
      (11L, Array(0f, 1f, 0f, 0f)),
      (12L, Array(0f, 0.95f, 0.05f, 0f)),
      (21L, Array(0.71f, 0.7f, 0f, 0f))
    ).toDF("id", "vec")
    val cents = SimilaritySearch.centroids(
      Seq((0, Array(1f, 0f, 0f, 0f)), (1, Array(0f, 1f, 0f, 0f)))
        .toDF("bucket", "vec"), "bucket")
    val out = SimilaritySearch.semanticDedup(corpus, cents, threshold = 0.95)
      .select("id", "cluster", "rep", "is_dup")
      .as[(Long, Int, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 0, 1L, false), (2L, 0, 1L, true), (3L, 0, 1L, true),
      (11L, 1, 11L, false), (12L, 1, 11L, true),
      (21L, 0, 21L, false)))
  }

  test("semanticDedup on the embedding corpus: planted copies dedup to their source") {
    // the driver corpus has no organic near-dups (max cos ~ 0.51), so the
    // components must be EXACTLY the planted (i, i+1000000) pairs
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("label").as("bucket"))
    val planted = base.filter(col("id") < 25)
      .select((col("id") + 1000000L).as("id"),
        transform(col("vec"), x => x * lit(2.0f)).as("vec"), col("bucket"))
    val cents = SimilaritySearch.centroids(base, "bucket")
    val out = SimilaritySearch.semanticDedup(
      base.unionByName(planted).select(col("id"), col("vec")),
      cents, threshold = 0.95)
    assert(out.count() == emb.count() + 25)
    val dups = out.filter(col("is_dup")).select("id", "rep")
      .as[(Long, Long)].collect().toSet
    assert(dups == (0L until 25L).map(i => (i + 1000000L, i)).toSet)
  }

  test("semanticDedup skew bound: a dominant cell splits into hash blocks, answer identical to the unblocked plan") {
    // ONE cell holds the entire corpus (single-centroid codebook — the
    // hot-cell worst case): 150 orthogonal sources + 150 exact-scaled
    // copies, so every duplicate pair must be found even though the
    // id-hash blocking (cellCap = 16 → 19 blocks of ~16 rows) scatters
    // almost every pair across two different blocks
    val dim = 150
    val sources = (0 until dim).map { i =>
      val v = Array.fill(dim)(0f); v(i) = 1f + i * 0.01f; (i.toLong, v)
    }
    val copies = sources.map { case (i, v) =>
      (i + 1000L, v.map(_ * 2f))
    }
    val corpus = (sources ++ copies).toDF("id", "vec")
    val cents = SimilaritySearch.centroids(
      Seq((0, Array.fill(dim)(1f))).toDF("bucket", "vec"), "bucket")
    def run(cap: Int): Set[(Long, Int, Long, Boolean)] =
      SimilaritySearch.semanticDedup(corpus, cents, threshold = 0.95,
          cellCap = cap)
        .select("id", "cluster", "rep", "is_dup")
        .as[(Long, Int, Long, Boolean)].collect().toSet
    val blocked = run(16)
    // every copy collapses onto its source; sources represent themselves
    assert(blocked == (0 until dim).flatMap { i =>
      Seq((i.toLong, 0, i.toLong, false), (i + 1000L, 0, i.toLong, true))
    }.toSet)
    // the blocked plan IS the naive plan's answer, pair for pair
    assert(blocked == run(1 << 20))
  }

  test("dupSpanCoverage: overlapping shared spans union-counted, short docs zero") {
    val common = (1 to 9).map(i => s"c$i").mkString(" ") // 9 tokens, 2 8-grams
    val docs = Seq(
      (1L, s"$common x1 x2 x3"),            // shared grams at starts 1,2 -> [1,9]
      (2L, s"y1 y2 $common"),               // shared grams at starts 3,4 -> [3,11]
      (3L, "short doc only"),               // < 8 tokens: no candidate span
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8")       // 8 unique tokens, nothing shared
    ).toDF("doc_id", "text")
    val out = TextDedup.dupSpanCoverage(docs, "doc_id", "text")
      .select("id", "n_tokens", "dup_tokens", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 12L, 9L, 0.75)))
    assert(out(1) == ((2L, 11L, 9L, 0.8182)))
    assert(out(2) == ((3L, 3L, 0L, 0.0)))
    assert(out(3) == ((4L, 8L, 0L, 0.0)))
  }

  test("bm25: at-rest lookup == in-memory topK, reads only query-term partitions") {
    import graft.operators.Bm25
    val q = Seq("spark", "dup")
    val model = Bm25.fit(docs, "doc_id", "text")
    val inMem = Bm25.topK(model, q, k = 15)
      .as[(Long, Long, Long)].collect().toSeq
    assert(inMem.nonEmpty)
    // ranking sanity: scores are non-increasing, ties broken by doc_id asc
    assert(inMem.sliding(2).forall {
      case Seq((d1, _, s1), (d2, _, s2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
    // the rare term 'dup' dominates idf: every doc containing it outranks
    // any doc hit only by the ubiquitous 'spark'
    val dupDocs = docs.filter(col("text").contains("dup"))
      .select("doc_id").as[Long].collect().toSet
    val (withDup, without) = inMem.partition(r => dupDocs.contains(r._1))
    assert(withDup.nonEmpty)
    if (without.nonEmpty)
      assert(withDup.map(_._3).min > without.map(_._3).max)

    val table = graft.table.WarehouseTable(tmpDir("bm25rest") + "/idx")
    Bm25.indexAtRest(docs, "doc_id", "text", table)
    val atRest = Bm25.lookupAtRest(spark, table, q, k = 15)
    assert(atRest.as[(Long, Long, Long)].collect().toSeq == inMem)
    // pruned read: only the tb partitions the two terms hash to
    val files = atRest.inputFiles.filter(_.contains("tb="))
    val allParts = spark.read.parquet(table.root + "/data")
      .select("tb").distinct().count()
    val touched = files.flatMap(f =>
      "tb=(\\d+)".r.findFirstMatchIn(f).map(_.group(1))).toSet
    assert(files.nonEmpty && touched.size <= 2 && touched.size < allParts,
      s"no pruning: touched ${touched.size} of $allParts partitions")
    // format validation: a mismatched partBuckets lookup fails loudly
    intercept[IllegalArgumentException] {
      Bm25.lookupAtRest(spark, table, q, k = 15, partBuckets = 8)
    }
  }

  test("bm25 incremental commit: index half + commit half == full in-memory, replay idempotent") {
    import graft.operators.Bm25
    val q = Seq("spark", "dup")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    val table = graft.table.WarehouseTable(tmpDir("bm25inc") + "/idx")
    Bm25.indexAtRest(half1, "doc_id", "text", table)
    Bm25.indexCommit(spark, half2, "doc_id", "text", table)
    val expect = Bm25.topK(Bm25.fit(docs, "doc_id", "text"), q, k = 15)
      .as[(Long, Long, Long)].collect().toSeq
    val got = Bm25.lookupAtRest(spark, table, q, k = 15)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect)
    // checkpoint replay of the same batch changes nothing (keyed merge +
    // recompute-from-state subtotals)
    Bm25.indexCommit(spark, half2, "doc_id", "text", table)
    val replay = Bm25.lookupAtRest(spark, table, q, k = 15)
      .as[(Long, Long, Long)].collect().toSeq
    assert(replay == expect)
  }

  test("removeDupSpans: keep-one rewrite, interval union, full-copy collapse") {
    val docs = Seq(
      (1L, "a b c d e"),       // all grams globally first: untouched
      (2L, "x y a b c d z"),   // "a b c"@3, "b c d"@4 repeat doc 1 -> cut [3,6]
      (3L, "a b c d e"),       // exact re-crawl of doc 1: fully removed
      (4L, "short one"),       // < n tokens: no gram, never cut
      (5L, "p q r s p q r t")  // WITHIN-doc repeat "p q r"@5 -> cut [5,7]
    ).toDF("doc_id", "text")
    val out = TextDedup.removeDupSpans(docs, "doc_id", "text", n = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 0L, "a b c d e"),
      (2L, 7L, 4L, "x y z"),
      (3L, 5L, 5L, ""),
      (4L, 2L, 0L, "short one"),
      (5L, 8L, 3L, "p q r s t")))
  }

  test("lineBoilerplate: df >= maxDf removed everywhere, pair-lines kept, trim/empty handling") {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): String =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "alpha body one\nshared footer line\npair quote"),
      (2L, "beta body two\nshared footer line\npair quote"),
      (3L, "gamma body three\nshared footer line"),
      (4L, "  shared footer line  \n\n"), // trims + drops the empty line
      (5L, "delta body five")
    ).toDF("doc_id", "text")
    val out = TextDedup.lineBoilerplate(docs, "doc_id", "text", maxDf = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    // footer df = 4 -> removed from ALL four docs (no survivor copy);
    // "pair quote" df = 2 < 3 -> kept in both; unique bodies kept
    assert(out == Seq(
      (1L, 3L, 1L, h("alpha body one\npair quote")),
      (2L, 3L, 1L, h("beta body two\npair quote")),
      (3L, 2L, 1L, h("gamma body three")),
      (4L, 1L, 1L, h("")), // all boilerplate: md5 of the empty string
      (5L, 1L, 0L, h("delta body five"))))
  }

  test("crossSplitLeakage: pairs labeled with both splits, leaks only across") {
    val pairs = Seq(
      (1L, 2L, 0.9), (3L, 4L, 0.8), (5L, 6L, 0.7)
    ).toDF("d1", "d2", "jaccard")
    val splits = Seq(
      (1L, "train"), (2L, "train"), (3L, "train"), (4L, "valid"),
      (5L, "test"), (6L, "valid")
    ).toDF("doc_id", "split")
    val out = graft.operators.Dedup
      .crossSplitLeakage(pairs, splits, "doc_id", "split")
      .orderBy("d1")
      .as[(Long, Long, Double, String, String, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 0.9, "train", "train", false),
      (3L, 4L, 0.8, "train", "valid", true),
      (5L, 6L, 0.7, "test", "valid", true)))
  }

  test("components at rest: fold equals full recompute across batches; replay no-op") {
    import graft.operators.Dedup
    val table = graft.table.WarehouseTable(tmpDir("ccrest") + "/cc")
    val hist = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    Dedup.componentsCommit(spark, (1L to 8L).toDF("id"), hist, table)
    assert(table.read(spark).as[(Long, Long)].collect().toSet == Set(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
      (5L, 5L), (6L, 5L), (7L, 7L), (8L, 8L)))
    // batch 2: arrival 9 joins {1,2,3}; edge 6-7 merges two OLD
    // components through the stored star edges; arrival 10 is a singleton
    val fresh = Seq((9L, 3L), (6L, 7L)).toDF("d1", "d2")
    Dedup.componentsCommit(spark, Seq(9L, 10L).toDF("id"), fresh, table)
    val s2 = table.read(spark).as[(Long, Long)].collect().toSet
    val full = Dedup.connectedComponents(
      (1L to 10L).toDF("id"), hist.unionByName(fresh))
      .as[(Long, Long)].collect().toSet
    assert(s2 == full)
    Dedup.componentsCommit(spark, Seq(9L, 10L).toDF("id"), fresh, table)
    assert(table.read(spark).as[(Long, Long)].collect().toSet == s2)
  }

  test("componentsCommit: unseeded edge endpoints persist, so labels stay consistent across batches") {
    import graft.operators.Dedup
    // corpus doc 2 is NEVER seeded as an arrival id — it only ever
    // appears as an edge endpoint. Two later batches each connect a new
    // arrival through it; both must land in ONE component labeled by the
    // true minimum (2), not two independently-minted labels.
    val table = graft.table.WarehouseTable(tmpDir("ccseed") + "/cc")
    Dedup.componentsCommit(spark, Seq(10L).toDF("id"),
      Seq((10L, 2L)).toDF("d1", "d2"), table)
    // the connecting vertex got its own persisted assignment row
    assert(table.read(spark).as[(Long, Long)].collect().toSet ==
      Set((10L, 2L), (2L, 2L)))
    Dedup.componentsCommit(spark, Seq(11L).toDF("id"),
      Seq((11L, 2L)).toDF("d1", "d2"), table)
    assert(table.read(spark).as[(Long, Long)].collect().toSet ==
      Set((10L, 2L), (2L, 2L), (11L, 2L)))
  }

  test("keepOneMaterialize: duplicates merge-delete out; survivors intact; replay no-op") {
    import graft.operators.Dedup
    val table = graft.table.WarehouseTable(tmpDir("keepone") + "/docs")
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "c"),
      (6L, "c")).toDF("doc_id", "text")
    table.create(docs.schema,
      properties = graft.table.WarehouseTable.tableProperties("COW", "snappy"))
    table.append(docs)
    val assignment = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
      (5L, 5L), (6L, 5L)).toDF("id", "cluster")
    Dedup.keepOneMaterialize(spark, table, assignment, "doc_id")
    val surv = table.read(spark).as[(Long, String)].collect().toSet
    assert(surv == Set((1L, "a"), (4L, "b"), (5L, "c")))
    Dedup.keepOneMaterialize(spark, table, assignment, "doc_id")
    assert(table.read(spark).as[(Long, String)].collect().toSet == surv)
  }

  test("clusterOutliers: within-cluster percentile flags the far vector; singleton cluster never flags") {
    // cluster 0: 20 inliers (dist 1..20, exact buckets below 2^8) + one
    // far vector; cluster 1: a singleton (pct 0 by definition)
    val assigned = ((1 to 20).map(i => (i.toLong, 0, i.toLong)) ++
      Seq((99L, 0, 1000000L), (200L, 1, 42L)))
      .toDF("vec_id", "cluster", "dist")
    val out = SimilaritySearch
      .clusterOutliers(assigned, "vec_id", pctCut = 9000L)
      .orderBy("vec_id")
      .as[(Long, Int, Long, Long, Boolean)].collect().toSeq
    val far = out.find(_._1 == 99L).get
    assert(far._4 == 10000L && far._5) // 20/20 strictly below -> p100
    val singleton = out.find(_._1 == 200L).get
    assert(singleton._4 == 0L && !singleton._5)
    // pin the cut boundary: pct = below/(n-1)·10⁴ over n = 21 rows
    val d20 = out.find(_._1 == 20L).get
    assert(d20._4 == 9500L && d20._5) // boundary case: flagged
    val d19 = out.find(_._1 == 19L).get
    assert(d19._4 == 9000L && d19._5) // exactly at the cut: flagged
    val d18 = out.find(_._1 == 18L).get
    assert(d18._4 == 8500L && !d18._5)
  }

  test("containmentAgainst: embedded reference flags at 1e6, partial graded, disjoint absent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ref = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")) // 4 trigrams
      .toDF("doc_id", "text")
    val corpus = Seq(
      // embeds the reference verbatim: all 4 ref trigrams present -> 1e6
      (1L, "intro words here alpha beta gamma delta epsilon zeta outro"),
      // shares exactly 1 of the 4 ref trigrams -> 250000, below tau
      (2L, "alpha beta gamma something else entirely different now"),
      // no shared trigram -> absent from the output
      (3L, "completely unrelated text with no overlap at all")
    ).toDF("doc_id", "text")
    val byId = TextDedup.containmentAgainst(corpus, ref, "doc_id", "text")
      .select("doc_id", "max_cont_e6", "n_refs_hit", "flagged")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(byId(1L) == ((1000000L, 1L, true)))
    assert(byId(2L) == ((250000L, 0L, false)))
    assert(!byId.contains(3L))
  }

  test("PQ trainSample: hashed rule survives structured id spaces; aligned ids fail loudly") {
    import graft.operators.ProductQuantizer
    def corpusOf(ids: Seq[Long]) =
      ids.map(id => (id, Array.tabulate(8)(j => ((id + j) % 13).toFloat)))
        .toDF("id", "vec")

    // all-even ids (snowflake-style): a bare `id % p == 0` with p=10 would
    // keep every id ≡ 0 (mod 10) — here that happens to work, but with
    // ids = 10i + 3 it keeps NOTHING. The hashed rule lands near n/p on both.
    val even = corpusOf((0L until 1000L).map(_ * 2))
    val sEven = ProductQuantizer.trainSample(even, "id", 100)
    val gotEven = sEven.count()
    assert(gotEven >= 25 && gotEven <= 400, s"even-id sample $gotEven")

    // shard-range ids: 4 shards × 250 sequential ids, shard stride 10^9
    val shards = corpusOf(for {
      sh <- 0L until 4L; i <- 0L until 250L
    } yield sh * 1000000000L + i)
    val gotShards = ProductQuantizer.trainSample(shards, "id", 100).count()
    assert(gotShards >= 25 && gotShards <= 400, s"shard-id sample $gotShards")

    // ids ≡ 3 (mod p): the residue class the old systematic rule misses
    // entirely (empty sample → downstream KMeans crash)
    val offset = corpusOf((0L until 1000L).map(_ * 10 + 3))
    val gotOffset = ProductQuantizer.trainSample(offset, "id", 100).count()
    assert(gotOffset >= 25 && gotOffset <= 400, s"offset-id sample $gotOffset")

    // the sampled frame still fits sane codebooks (k centroids per subspace)
    val cb = ProductQuantizer.fit(
      ProductQuantizer.trainSample(even, "id", 100),
      "id", "vec", dim = 8, m = 2, k = 4, iters = 1)
    assert(cb.cents.length == 2 && cb.cents.forall(_.length == 4))

    // adversarial alignment: ids constructed so the two-round hash is
    // NEVER ≡ 0 (mod p) — invert both rounds and plant only
    // non-divisible residues. The realized-count guard must refuse
    // LOUDLY instead of fitting on an empty sample.
    val M = BigInt(2147483647L)
    val inv2 = BigInt(48271L).modPow(M - 3, M) // 48271^(M-3) = (48271²)⁻¹
    val aligned = corpusOf(
      (1L to 1000L).map(h => h * 10 + 3) // residues ≡ 3 (mod 10)
        .map(h => ((BigInt(h) * inv2) % M).toLong))
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.trainSample(aligned, "id", 100).count()
    }
    assert(e.getMessage.contains("correlates with the sampling hash"))
    ()
  }
}
