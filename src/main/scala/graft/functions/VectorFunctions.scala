package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns using Spark's
  * higher-order functions (`zip_with` + `aggregate`) — fully codegen'd,
  * no UDF, and order-deterministic (elements are combined left-to-right,
  * which keeps results bit-identical across runs for the oracle compare).
  */
object VectorFunctions {

  /** Dot product of two equal-length numeric arrays, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), _ + _)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either norm is zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** L2 distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), _ + _))

  /** L2-normalized copy of the vector (unit length), or the zero vector
    * unchanged. Pre-normalizing turns cosine top-k into dot-product top-k,
    * which halves the per-pair work in brute-force scans.
    */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** SimHash-style sign bit vector of the embedding against `nPlanes`
    * deterministic pseudo-random hyperplanes derived from the element index
    * and plane id (no RNG — reproducible across runs and engines). Returns
    * an int in [0, 2^nPlanes) usable as an LSH bucket id for cosine ANN.
    *
    * plane(p)·v = sum_i sign(hash(p, i)) * v_i with sign from a cheap
    * integer mix — a random-projection LSH family (Charikar 2002).
    */
  def randomProjectionBucket(a: Column, nPlanes: Int, seed: Int = 0): Column =
    // native codegen expression — one fused loop per row; bit-for-bit the
    // buckets of the original HOF formulation (same chained xxhash64 parity
    // per (seed, plane, index), same in-order double fold, same `>= 0`
    // sign test), ~50× less per-row work than the interpreted lambdas
    RpBucket(a, nPlanes, seed)
}
