package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation: PageRank as a quality /
  * sampling-weight signal over a document link graph (the web-graph
  * weighting move large-scale corpus builders use to prefer central,
  * referenced pages over orphans).
  *
  * Exact FIXED-POINT arithmetic, deliberately: ranks are `BIGINT`
  * multiples of `1/scale`, every update is `base + Σ (r·damping) div
  * (100·outdeg)` in integer ops, so two engines (and two cluster runs
  * with different partitioning) produce IDENTICAL bits — a float
  * PageRank drifts ulps with reduction order and can't be oracle-gated.
  * The simplification is the classic one: dangling mass is dropped, not
  * redistributed (a sink node keeps receiving its base term), and ranks
  * are per-node absolute values (init = `scale`), not normalized to sum
  * to 1 — both choices spelled identically in the oracle.
  *
  * Scale shape: per iteration ONE src-keyed join (rank is node-sized,
  * edges carry their precomputed outdegree) and ONE dst-keyed partial
  * aggregation — both map-side-combinable shuffles; the rank frame is
  * `localCheckpoint`ed each round to cut the iterative lineage (the
  * connected-components pattern, `Dedup.connectedComponents`). `scale`
  * bounds the integers: `r·damping ≤ n_nodes·scale·100` must fit in a
  * long, so pick `scale ≈ 9e18 / (100·n_nodes)` or smaller at large n.
  */
object GraphRank {

  /** @param edges     (srcCol, dstCol) rows; parallel edges are honored
    *                  (each contributes separately, and each counts in
    *                  the outdegree)
    * @param nodes     one row per node (ranks are emitted for every node,
    *                  edge-less nodes included); every edge endpoint must
    *                  appear here
    * @param iters     fixed iteration count (the oracle unrolls the same)
    * @param dampingPct damping factor as an integer percentage
    * @param scale     fixed-point denominator; init rank = scale
    * @return (node, rank) with rank in units of 1/scale
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes: DataFrame,
      nodeCol: String,
      iters: Int,
      dampingPct: Int = 85,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0 && iters <= 1000, s"iters=$iters out of range")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    require(scale >= 1, "scale must be positive")
    val base = scale * (100 - dampingPct) / 100
    val n = nodes.select(col(nodeCol).as("node"))
    // outdegree rides with the edges once — not re-joined per iteration
    val outd = edges.groupBy(col(srcCol)).agg(count(lit(1)).as("od"))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(outd.select(col(srcCol).as("src"), col("od")), "src")
      .localCheckpoint()
    var rank = n.withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      val contribs = e.join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr(s"(r * $dampingPct) div (100 * od)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      rank = n
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("c"), lit(0L))).as("r"))
        .localCheckpoint()
    }
    rank
  }

  /** Semi-supervised LABEL PROPAGATION with clamped seeds — spread a
    * labeled subset's labels (topic, quality tier, language) through a
    * graph onto the unlabeled mass: `iters` SYNCHRONOUS rounds where
    * every non-seed node adopts the majority label of its in-neighbors
    * (vote = edge count, so parallel edges weigh double — deliberate),
    * ties to the LEXICOGRAPHICALLY SMALLEST label; nodes with no labeled
    * in-neighbor stay unlabeled this round; SEEDS NEVER CHANGE (the
    * clamped/semi-supervised variant — free-running LPA oscillates on
    * bipartite structures, clamping plus a fixed iteration count keeps
    * the fixpoint engine-replayable). All-integer/string ops — two
    * engines cannot disagree.
    *
    * Scale shape per round: one src-keyed join (label frame is
    * node-sized), one (dst, label)-keyed count (map-side combinable),
    * one dst-keyed argmax via `min(struct(-votes, label))` — never a
    * window sort; label frame `localCheckpoint`ed per round (the same
    * lineage discipline as [[pageRank]]).
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame, // (node, label) — label non-null
      nodes: DataFrame,
      nodeCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0 && iters <= 1000, s"iters=$iters out of range")
    val n = nodes.select(col(nodeCol).as("node"))
    val seed = seeds.select(col(nodeCol).as("node"), col("label"))
      .filter(col("label").isNotNull)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    var labels = n.join(seed, Seq("node"), "left")
    for (_ <- 1 to iters) {
      val votes = e
        .join(labels.filter(col("label").isNotNull)
          .withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
      val picked = votes
        .groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("negc"), col("label"))).as("w"))
        .select(col("dst").as("node"), col("w.label").as("vote"))
      labels = n
        .join(seed, Seq("node"), "left")
        .join(picked, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("label"), col("vote")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
