package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compressed-corpus ANN path: split each
  * d-dim embedding into `m` subvectors, train an independent k-means
  * codebook per subspace ([[KMeans]] — the q72 trainer), store each
  * corpus vector as `m` small codes, and answer queries with Asymmetric
  * Distance Computation (ADC): the query precomputes one `m × k` table of
  * exact subspace distances to every centroid, and each corpus item's
  * approximate distance is just `m` table lookups summed.
  *
  * Why this is the 100 TB shape: the corpus at rest shrinks from
  * `d` floats to `m` bytes per vector (64-dim float → 4 codes here: 64×
  * compression), scans read codes instead of vectors, and the per-pair
  * cost drops from a d-length fused loop to m integer adds. The codebook
  * (`m·k` subvectors) is a bounded model property — broadcastable like an
  * IVF codebook — and encode/ADC are both MAP-SIDE against it; the only
  * shuffle anywhere is the final per-query top-k (`WindowGroupLimit`
  * under AQE, same as q14).
  *
  * Determinism contract (the q72 rules, per subspace): quantized integer
  * geometry end-to-end — init = k smallest-id subvectors, argmin ties to
  * the smaller code, `floor(sum/count)` centroid updates, ADC distances
  * are exact LONG sums — so the DuckDB oracle replays fit, encode, and
  * search bit-for-bit.
  */
object ProductQuantizer {

  /** Frozen PQ model: `cents(s)(c)` = centroid `c` of subspace `s`, in the
    * [[KMeans.quantize]] integer domain.
    */
  final case class Codebooks(
      m: Int,
      dsub: Int,
      k: Int,
      cents: IndexedSeq[IndexedSeq[IndexedSeq[Long]]],
      scale: Long)

  /** TWO-round Lehmer hash of an id column:
    * `h(id) = ((id mod M) · 48271 mod M) · 48271 mod M` with
    * `M = 2^31 − 1` (Park–Miller's prime and multiplier). Two rounds, not
    * one, because one round is LINEAR below the wraparound: for
    * `id · 48271 < M` (ids under ~44k) `h = id · 48271` exactly, and
    * since `48271 ≡ 1 (mod 10)` the low-digit structure of the id passes
    * straight through — `ids ≡ 3 (mod 10)` would still empty the sample.
    * After round one every nonzero value is ≥ 48271, so round two always
    * wraps and genuinely mixes. Every intermediate fits a 64-bit
    * integer for ANY input id — `(M−1) · 48271 < 2^47` — so the SQL
    * oracle replays the identical arithmetic with plain BIGINT `%`/`*`
    * and no overflow (a 2^32-domain Knuth hash would overflow BIGINT on
    * snowflake-scale ids).
    */
  private val LehmerM = 2147483647L // 2^31 − 1, prime
  private val LehmerA = 48271L
  def idHash(idCol: Column): Column =
    (idCol.cast("long") % LehmerM) * LehmerA % LehmerM * LehmerA % LehmerM

  /** Deterministic bounded TRAINING SAMPLE for codebook fitting — the
    * classical PQ practice (Jégou et al. train on a learning set, not
    * the corpus): codebook quality is sample-stable once each centroid
    * sees a few dozen vectors, while fitting on the corpus makes the
    * index BUILD super-linear (every Lloyd iteration scans everything —
    * measured 23× per 10× data before this). The rule is a pure integer
    * function of the corpus count: keep ids with `hash(id) % p == 0`
    * where `p = ceil(n / cap)` and `hash` is the Lehmer hash above —
    * replayable by the SQL oracle from the same integers, and the whole
    * corpus when `n <= cap`. Hashing first matters: a bare `id % p == 0`
    * is a clean systematic sample only on dense sequential ids, while
    * structured id spaces (all-even snowflake ids, per-shard ranges,
    * ids ≡ c mod p) silently BIAS the codebook or empty the sample; the
    * multiplicative hash scatters any such lattice across residues.
    *
    * Defense in depth: the realized sample size is counted (one more
    * column-pruned scan, noise next to the `iters` training scans) and
    * required within 4× of its expectation — a pathological id set that
    * still aligns with the hash fails LOUDLY here instead of training a
    * biased codebook. The fit that follows is O(cap · iters), not
    * O(n · iters).
    */
  def trainSample(corpus: DataFrame, idCol: String, cap: Long): DataFrame = {
    require(cap >= 1, s"sample cap must be positive, got $cap")
    val n = corpus.count()
    val p = (n + cap - 1) / cap
    if (p <= 1) corpus
    else {
      val sample = corpus.filter(idHash(col(idCol)) % p === 0)
      val got = sample.count()
      // expectation is n/p ∈ (cap/2, cap]; 4× slack on either side is
      // unreachable by chance at cap ≥ 64 under a uniform hash (Chernoff),
      // so tripping this means the id space correlates with the hash —
      // resample with a different cap or pre-scramble the ids.
      val expect = n / p
      require(got >= expect / 4 && got <= expect * 4,
        s"PQ training sample realized $got rows vs ~$expect expected " +
          s"(n=$n, p=$p) — id space correlates with the sampling hash")
      sample
    }
  }

  /** Train one codebook per subspace over the corpus (m independent
    * [[KMeans.fit]] runs on sliced vectors — each is one scan + one
    * bounded shuffle per iteration). `dim` must be `m · dsub`. Pass a
    * [[trainSample]] of the corpus, not the corpus itself, when the
    * corpus is large — the codebook is a bounded model, its fit should
    * be too.
    */
  def fit(
      corpus: DataFrame, // idCol, vecCol
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      scale: Long = 10000L): Codebooks = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    // fail loudly on a dim/data mismatch: slices past the true length
    // would silently compare empty prefixes (distance 0 to everything)
    // and every vector would encode to code 0 in the short subspaces.
    // Aggregate min/max over the whole corpus — a ragged row anywhere
    // (not just row 1) trips it; one extra scan is noise next to the
    // `iters` training scans that follow, and the result is 2 ints.
    corpus.agg(min(size(col(vecCol))).as("lo"), max(size(col(vecCol))).as("hi"))
      .head(1).foreach { r =>
        require(!r.isNullAt(0) && r.getInt(0) == dim && r.getInt(1) == dim,
          s"corpus vector lengths span [${r.get(0)}, ${r.get(1)}] " +
            s"but dim=$dim was passed — ragged or mis-sized vectors")
      }
    val dsub = dim / m
    val cents = (0 until m).map { s =>
      KMeans.fit(
        corpus.select(col(idCol),
          slice(col(vecCol), s * dsub + 1, dsub).as(vecCol)),
        idCol, vecCol, k, iters, scale)
    }
    Codebooks(m, dsub, k, cents.toIndexedSeq, scale)
  }

  /** The m-code array for a vector column — nearest subspace centroid per
    * subspace, ties to the smaller id. A pure map-side expression (the
    * codebook rides as literals).
    */
  def codeExpr(vecCol: Column, cb: Codebooks): Column = {
    val qv = KMeans.quantize(vecCol, cb.scale)
    array((0 until cb.m).map { s =>
      KMeans.nearest(slice(qv, s * cb.dsub + 1, cb.dsub), cb.cents(s))
        .getField("cid")
    }: _*)
  }

  /** Encode the corpus: `(idCol, code)`. */
  def encode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks): DataFrame =
    corpus.select(col(idCol), codeExpr(col(vecCol), cb).as("code"))

  /** The query-side ADC distance table — `dtab(s·k + c)` = exact squared
    * L2 from the query's subvector `s` to centroid `c` of subspace `s`.
    * Map-side (m·k fixed-size array per query row).
    */
  private def dtabExpr(qvecCol: Column, cb: Codebooks): Column = {
    val qv = KMeans.quantize(qvecCol, cb.scale)
    array((0 until cb.m).flatMap { s =>
      val sub = slice(qv, s * cb.dsub + 1, cb.dsub)
      (0 until cb.k).map { c =>
        KMeans.sqDist(sub, typedLit(cb.cents(s)(c)))
      }
    }: _*)
  }

  /** `Σ_s dtab[s·k + code_s]` — the ADC lookup sum over a `code` column. */
  private def adistExpr(cb: Codebooks): Column =
    (0 until cb.m)
      .map { s =>
        element_at(col("dtab"),
          lit(s * cb.k + 1) + element_at(col("code"), s + 1))
      }
      .reduce(_ + _)

  /** ADC top-k: for each query, the k corpus codes with the smallest
    * approximate distance `Σ_s ‖q_s − cent(s, code_s)‖²` (exact integer
    * arithmetic; ties to the smaller corpus id).
    *
    * The query side precomputes its full `m·k` distance table map-side
    * (`dtab`), so scoring a corpus row is m `element_at` lookups — no
    * vector arithmetic touches the (compressed) corpus. Queries broadcast
    * (bounded probe set, the q14 convention); the per-query top-k plans
    * as `WindowGroupLimit`.
    */
  def adcTopK(
      queries: DataFrame, // qid, qvec
      codes: DataFrame,   // id, code
      cb: Codebooks,
      k: Int): DataFrame = {
    val q = queries.select(col("qid"), dtabExpr(col("qvec"), cb).as("dtab"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id").asc)
    codes.crossJoin(broadcast(q))
      .withColumn("adist", adistExpr(cb))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("adist"), col("rank"))
  }

  /** Persist the classic IVFADC layout (Jégou et al. §V) AT REST: the
    * corpus lands as `(id, bucket, code)` — coarse-quantizer bucket for
    * partition pruning, PQ codes instead of vectors — in a warehouse
    * table PARTITIONED BY bucket. A probe then reads ONLY the probed
    * buckets' partitions (q34's pruning) AND scans m-byte codes instead
    * of d-float vectors (q75's compression): the two at-rest savings
    * compose multiplicatively — nprobe/nlist of the files, at 1/64th the
    * bytes per row.
    */
  def ivfPqIndexAtRest(
      corpus: DataFrame, // id, vec, bucket
      cb: Codebooks,
      table: graft.table.WarehouseTable,
      compression: String = "snappy"): Unit = {
    val encoded = corpus.select(col("id"), col("bucket"),
      codeExpr(col("vec"), cb).as("code"))
    // MOR + no stats — same reasoning and immutable-vector contract as
    // [[SimilaritySearch.ivfIndexAtRest]]: batch-bound commits, exact
    // bucket-pruned arbitration, probes never consult min/max stats.
    table.create(encoded.schema, partition = Some("bucket"),
      properties = graft.table.WarehouseTable.tableProperties("MOR", compression) +
        ("stats.mode" -> "none"))
    table.append(encoded)
  }

  /** Incremental maintenance of the at-rest IVFADC index: PQ-encode the
    * accepted arrivals under the SAME frozen codebooks the index was
    * built with (the caller holds them — they are the model, exactly as
    * [[ivfPqIndexAtRest]] received them) and MERGE the `(id, bucket,
    * code)` rows keyed by `id`. Replay-idempotent (deterministic encode ⇒
    * byte-identical rows); the COW merge rewrites only the touched bucket
    * partitions. Nothing re-encodes or rescans the existing corpus.
    */
  def ivfPqIndexCommit(
      spark: org.apache.spark.sql.SparkSession,
      accepted: DataFrame, // id, vec, bucket (same coarse quantizer)
      cb: Codebooks,
      table: graft.table.WarehouseTable): Unit = {
    require(table.exists, "ivfPqIndexCommit needs an existing index table — " +
      "build one with ivfPqIndexAtRest first")
    table.merge(spark,
      accepted.select(col("id"), col("bucket"), codeExpr(col("vec"), cb).as("code")),
      Seq("id"))
  }

  /** IVFADC top-k over the at-rest index: coarse-probe ranking exactly as
    * [[SimilaritySearch.ivfTopKAtRest]] (centroid cosine, (cos DESC,
    * bucket ASC) ties), then ADC-score only the probed partitions' codes.
    * The driver collect is the probed bucket-value set (≤ nlist, the
    * bounded planning step); the query ships its m·k distance table, not
    * its vector, into the scoring join.
    */
  def ivfPqTopKAtRest(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, // qid, qvec
      table: graft.table.WarehouseTable,
      cents: DataFrame,   // bucket, cvec (coarse)
      cb: Codebooks,
      k: Int,
      nprobe: Int): DataFrame = {
    // one materialization feeds both the partition decision and the join
    // (the q34 rule: two executions of a nondeterministic frame could
    // probe a bucket the scan never read)
    val probe0 = SimilaritySearch.probeBuckets(queries, cents, nprobe)
      .localCheckpoint()
    val bucketVals = probe0.select(col("bucket")).distinct()
      .collect().map(_.get(0)).toSeq // bounded: ≤ nlist values
    val codes = table.read(spark, partitions = Some(bucketVals))
    // the m·k distance table is computed ONCE PER QUERY and joined to the
    // probe pairs — building it on probe0 directly would evaluate (and
    // broadcast) it nprobe times per query
    val dtabs = queries.select(col("qid"), dtabExpr(col("qvec"), cb).as("dtab"))
    val q = probe0.select(col("qid"), col("bucket"))
      .join(dtabs, Seq("qid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id").asc)
    codes.join(broadcast(q), "bucket")
      .withColumn("adist", adistExpr(cb))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("adist"), col("rank"))
  }
}
