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

  /** Train one codebook per subspace over the corpus (m independent
    * [[KMeans.fit]] runs on sliced vectors — each is one scan + one
    * bounded shuffle per iteration). `dim` must be `m · dsub`.
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
    val dsub = dim / m
    val cents = (0 until m).map { s =>
      KMeans.fit(
        corpus.select(col(idCol),
          slice(col(vecCol), s * dsub + 1, dsub).as(vecCol)),
        idCol, vecCol, k, iters, scale)
    }
    Codebooks(m, dsub, k, cents.toIndexedSeq, scale)
  }

  /** Encode the corpus: `(idCol, code)` where `code(s)` = the id of the
    * nearest subspace-s centroid (ties to the smaller id). Entirely
    * map-side — the codebook rides as literal expressions.
    */
  def encode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks): DataFrame = {
    val qv = KMeans.quantize(col(vecCol), cb.scale)
    val codes = array((0 until cb.m).map { s =>
      KMeans.nearest(slice(qv, s * cb.dsub + 1, cb.dsub), cb.cents(s))
        .getField("cid")
    }: _*)
    corpus.select(col(idCol), codes.as("code"))
  }

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
    val qv = KMeans.quantize(col("qvec"), cb.scale)
    // dtab(s·k + c) = exact squared L2 from the query's subvector s to
    // centroid c of subspace s
    val dtab = array((0 until cb.m).flatMap { s =>
      val sub = slice(qv, s * cb.dsub + 1, cb.dsub)
      (0 until cb.k).map { c =>
        KMeans.sqDist(sub, typedLit(cb.cents(s)(c)))
      }
    }: _*)
    val q = queries.select(col("qid"), dtab.as("dtab"))
    val adist = (0 until cb.m)
      .map { s =>
        element_at(col("dtab"),
          lit(s * cb.k + 1) + element_at(col("code"), s + 1))
      }
      .reduce(_ + _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id").asc)
    codes.crossJoin(broadcast(q))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("adist"), col("rank"))
  }
}
