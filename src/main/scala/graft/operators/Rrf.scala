package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009) — the
  * standard way to combine SPARSE (BM25, q91) and DENSE (ANN cosine,
  * q14/q34/q77) retrieval into one hybrid ranking, and the fusion rule
  * most RAG/retrieval stacks ship because it needs NO score calibration:
  * each input list contributes `1/(k0 + rank)` per document, so wildly
  * different score scales (BM25 logs vs cosine) never have to be
  * normalized against each other. The reference engine
  * (`/root/reference/spark-job/read.py`) has no retrieval at all; this
  * composes the engine's own retrieval family.
  *
  * Cross-engine determinism (the q53 rule): the contribution is computed
  * as INTEGER division `1000000 div (k0 + rank)` — no floating point
  * anywhere — so the fused score is an exact BIGINT sum and the final
  * ordering (score desc, id asc) is a total order both engines agree on
  * bit-for-bit.
  *
  * Scale shape: the inputs are top-k lists — each is BOUNDED by its k
  * (the expensive work happened upstream in the retrieval operators,
  * which carry their own 100 TB designs: term-pruned postings reads for
  * BM25, partition-pruned IVF probes for ANN). Fusion itself is a union
  * of ≤ Σk rows, one hash aggregation on the id, and a window over the
  * fused set — all bounded by the lists, never by the corpus.
  */
object Rrf {

  /** Fuse ranked lists into `(id, n_lists, rrf_e6, rank)` — `n_lists` =
    * how many input lists ranked the document, `rrf_e6` = the exact
    * integer-quantized RRF score `Σ 1000000 div (k0 + rank_i)`, `rank` =
    * the fused position (score desc, id asc — total order).
    *
    * Caller contract: each input carries `(idCol, rankCol)` with
    * 1-based ranks and at most one row per id (what any top-k retrieval
    * emits).
    */
  def fuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k0: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 0, "k0 must be non-negative")
    require(topK >= 1, "topK must be positive")
    val contribs = rankings
      .map(_.select(col(idCol),
        expr(s"CAST(1000000 AS BIGINT) div " +
          s"(CAST($k0 AS BIGINT) + CAST($rankCol AS BIGINT))").as("c")))
      .reduce(_.unionByName(_))
    // the final window is global but BOUNDED: its input is the fused
    // union of top-k lists (≤ Σk rows by construction), never the corpus
    val w = Window.orderBy(col("rrf_e6").desc, col(idCol).asc)
    contribs
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("c")).as("rrf_e6"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("n_lists"), col("rrf_e6"), col("rank"))
  }
}
