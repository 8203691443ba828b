package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an `array<float>` embedding column —
  * the TRAIN side of the coarse quantizers this engine probes everywhere
  * ([[SimilaritySearch.ivfTopK]], SemDeDup cells, the at-rest IVF index):
  * today their codebooks come from pre-existing labels; this learns one
  * from the vectors alone.
  *
  * Determinism contract (the DuckDB oracle replays every step exactly):
  *  - vectors are quantized up front to `floor(x · scale)` LONGs, so every
  *    distance and every centroid-update sum is exact integer arithmetic —
  *    no partition-order-dependent float accumulation anywhere (the
  *    q53/q60 fixed-point rule applied to geometry);
  *  - init is the k smallest-id vectors (cid = rank in id order);
  *  - assignment is argmin of squared L2 with ties to the smaller cid;
  *  - the centroid update is `floor(sum / count)` per component (exact:
  *    the LONG sum is < 2^53, so the double division is IEEE-identical in
  *    any engine), and a cluster that loses every member keeps its
  *    previous centroid.
  *
  * Scale shape: assignment is MAP-SIDE ONLY — the k quantized centroids
  * travel as a literal array expression (no join, no broadcast exchange,
  * no shuffle), and each row folds over them with exact long arithmetic.
  * The update is one posexplode + groupBy(cluster, pos) per iteration:
  * partial aggregation reduces every map partition to ≤ k·dim rows before
  * the shuffle, and the driver collects exactly k·dim (sum, count) cells —
  * the same bounded planning step MLlib's k-means pays. Total cost per
  * iteration: one corpus scan, one tiny shuffle. Nothing is quadratic in
  * corpus size and no vector ever crosses the wire.
  */
object KMeans {

  /** `floor(x · scale)` per component, as exact LONGs. */
  def quantize(vec: Column, scale: Long = 10000L): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Exact squared L2 between two quantized (LONG) vectors — the native
    * fused-loop expression (the HOF `aggregate(zip_with(...))` chain it
    * replaced evaluated interpreted: k·dim lambda-tree walks per row made
    * assignment the q72 trainer's dominant cost — 22 s at sf0.1 in
    * BENCH_r7's mid-round run, the suite's slowest query by 3×).
    */
  private[operators] def sqDist(a: Column, b: Column): Column =
    graft.functions.LongSqDist(a, b)

  /** (d, cid) of the nearest centroid — one fused k·dim loop per row via
    * the native [[graft.functions.NearestCentroid]]; ties to the smaller
    * cid (identical total order to the (dist ASC, cid ASC) array_min
    * formulation it replaced).
    */
  private[operators] def nearest(qv: Column, cents: Seq[Seq[Long]]): Column =
    graft.functions.NearestCentroid(qv, cents)

  /** Fixed-iteration Lloyd fit. Returns the final quantized codebook
    * (k vectors, cid = index). Each iteration: map-side assignment, one
    * (cluster, pos)-keyed aggregation, a k·dim driver collect.
    */
  def fit(
      corpus: DataFrame, // idCol, vecCol
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scale: Long = 10000L): IndexedSeq[IndexedSeq[Long]] = {
    require(k >= 1 && iters >= 0, "k must be >= 1 and iters >= 0 (iters = 0 returns the smallest-id init codebook unchanged)")
    val q = corpus.select(col(idCol).as("id"), quantize(col(vecCol), scale).as("qv"))
    var cents: IndexedSeq[IndexedSeq[Long]] = q.orderBy(col("id").asc).limit(k)
      .select(col("qv")).collect()
      .map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
    require(cents.size == k, s"corpus has fewer than k=$k vectors")
    for (_ <- 1 to iters) {
      val cells = q.select(
          nearest(col("qv"), cents).getField("cid").as("cluster"),
          posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect() // bounded: ≤ k·dim rows
      val byCluster = cells.groupBy(_.getAs[Int]("cluster"))
      cents = (0 until k).map { cid =>
        byCluster.get(cid) match {
          case Some(rows) => rows.sortBy(_.getAs[Int]("pos")).map { r =>
            math.floor(r.getAs[Long]("s").toDouble / r.getAs[Long]("n")).toLong
          }.toIndexedSeq
          case None => cents(cid) // an emptied cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** Nearest-centroid assignment under a frozen codebook: (idCol, cluster,
    * dist) — dist is the exact quantized squared L2. Map-side only.
    */
  def assign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[Seq[Long]],
      scale: Long = 10000L): DataFrame =
    corpus
      .select(col(idCol), quantize(col(vecCol), scale).as("qv"))
      .withColumn("nn", nearest(col("qv"), cents))
      .select(col(idCol), col("nn.cid").as("cluster"), col("nn.d").as("dist"))

  /** fit + assign in one call — the q72 shape. */
  def fitAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scale: Long = 10000L): DataFrame =
    assign(corpus, idCol, vecCol, fit(corpus, idCol, vecCol, k, iters, scale), scale)
}
