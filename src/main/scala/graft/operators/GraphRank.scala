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
  /** TRIANGLE COUNTS per node — the graph-clustering signal (closed-wedge
    * density) corpus curators use to find tightly cross-linked content
    * farms vs organically referenced pages. Exact integers; oracle-gated.
    *
    * The algorithm is the DEGREE-ORDERED NODE-ITERATOR (the MapReduce
    * classic): orient every undirected edge from its (degree, id)-smaller
    * endpoint to the larger, enumerate wedges only around each edge's
    * LOW endpoint, and close them against the edge set. Orientation is
    * what makes this the 100 TB form: a node's oriented out-degree is
    * O(√m) regardless of its raw degree (a celebrity node with 10⁸
    * followers enumerates no wedge pairs at all unless both endpoints
    * out-rank it), so total wedge volume is bounded by m^1.5 instead of
    * Σ deg² — the naive form dies on the first power-law hub. Every
    * triangle materializes exactly once (center = its (degree,id)-min
    * vertex; the other two ordered by id).
    *
    * Plan shape: two node-keyed joins to attach degrees, ONE self-join on
    * the low endpoint (the wedge fan-out), one equi-join against the
    * canonical edge set (closure), one explode + count. No windows, no
    * driver-side anything; the oriented edge list is `localCheckpoint`ed
    * once since three operators reuse it.
    */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes: DataFrame,
      nodeCol: String): DataFrame = {
    // canonical simple undirected edges: self-loops dropped, endpoints
    // ordered by id, parallel edges collapsed (a triangle is a property
    // of the simple graph)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // orient low (degree, id) -> high: total order, so exactly one
    // direction per edge and out-degree is O(sqrt m)
    val lowIsU = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowIsU, col("u")).otherwise(col("v")).as("a"),
        when(lowIsU, col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint()
    // wedges around each center a, leg pair ordered by id so the closure
    // probe matches the canonical (u < v) edge key exactly once
    val wedges = oriented.select(col("a"), col("b").as("x"))
      .join(oriented.select(col("a"), col("b").as("y")), "a")
      .filter(col("x") < col("y"))
    val tri = wedges.join(und,
      wedges("x") === und("u") && wedges("y") === und("v"))
      .select(col("a"), col("x"), col("y"))
    // each triangle credits all three corners
    val members = tri.select(explode(array(col("a"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("c"))
    nodes.select(col(nodeCol).as("node"))
      .join(members, Seq("node"), "left")
      .select(col("node"), coalesce(col("c"), lit(0L)).as("n_triangles"))
  }

  /** EDGE EMBEDDEDNESS — per-edge common-neighbor and Jaccard scores,
    * the graph-sparsification signal (keep edges whose endpoints share
    * neighborhood, drop incidental ones) and the standard strong-tie
    * detector. For an edge (u,v): `common` = |N(u)∩N(v)| = the number of
    * triangles THROUGH the edge, `union_size` = |N(u)∪N(v)\{u,v}| =
    * deg(u)+deg(v)−2−common, `jaccard_e4` = common·10⁴ div union_size
    * (0 when the union is empty) — integers end to end.
    *
    * Same m^1.5 machinery as [[triangleCounts]]: common-neighbor counts
    * for ALL pairs would be Σdeg² (hub-explosive and output-explosive),
    * but restricted to pairs that ARE edges, every common neighbor shows
    * up in exactly one degree-ordered triangle, so the wedge bound
    * carries over unchanged.
    */
  def edgeJaccard(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val lowIsU = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowIsU, col("u")).otherwise(col("v")).as("a"),
        when(lowIsU, col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint()
    val tri = oriented.select(col("a"), col("b").as("x"))
      .join(oriented.select(col("a"), col("b").as("y")), "a")
      .filter(col("x") < col("y"))
      .join(und, col("x") === col("u") && col("y") === col("v"))
      .select(col("a"), col("x"), col("y"))
    // each triangle credits its three edges, re-canonicalized by id
    // (the center ordering is by (degree, id), not id)
    val credits = tri.select(explode(array(
        struct(least(col("a"), col("x")).as("u"), greatest(col("a"), col("x")).as("v")),
        struct(least(col("a"), col("y")).as("u"), greatest(col("a"), col("y")).as("v")),
        struct(col("x").as("u"), col("y").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("common"))
    und
      .join(credits, Seq("u", "v"), "left")
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"),
        coalesce(col("common"), lit(0L)).as("common"),
        (col("du") + col("dv") - lit(2) - coalesce(col("common"), lit(0L)))
          .as("union_size"))
      .withColumn("jaccard_e4",
        when(col("union_size") > 0,
          expr("(common * 10000) div union_size")).otherwise(lit(0L)))
  }

  /** K-CORE membership after `rounds` SYNCHRONOUS peel rounds — the
    * density filter graph curators run before trusting link signals
    * (a k-core survivor has ≥ k neighbors that themselves survive:
    * spam farms pointing at a page from throwaway nodes peel away).
    * Each round drops every node whose degree WITHIN the surviving
    * subgraph is < k; the fixed round count makes the fixpoint
    * engine-replayable (the oracle unrolls the same rounds), exactly
    * the [[pageRank]] discipline — on graphs where peeling converges
    * within `rounds` this IS the k-core; otherwise it is the documented
    * R-round peel, a superset of the core.
    *
    * Scale shape per round: two node-keyed LEFT SEMI joins (the alive
    * set is node-sized) + one map-side-combinable degree count — no
    * windows, no driver state; the alive frame is `localCheckpoint`ed
    * per round to cut the iterative lineage.
    */
  def kCorePeel(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes: DataFrame,
      nodeCol: String,
      k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k=$k out of range")
    require(rounds >= 1 && rounds <= 100, s"rounds=$rounds out of range")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // both directions once: degree(v) = rows with x = v
    val sym = und.select(col("u").as("x"), col("v").as("y"))
      .unionAll(und.select(col("v").as("x"), col("u").as("y")))
      .localCheckpoint()
    var alive = nodes.select(col(nodeCol).as("node"))
    for (_ <- 1 to rounds) {
      alive = sym
        .join(alive.withColumnRenamed("node", "x"), Seq("x"), "left_semi")
        .join(alive.withColumnRenamed("node", "y"), Seq("y"), "left_semi")
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("x").as("node"))
        .localCheckpoint()
    }
    // final degree within the surviving subgraph (0 for peeled nodes)
    val finalDeg = sym
      .join(alive.withColumnRenamed("node", "x"), Seq("x"), "left_semi")
      .join(alive.withColumnRenamed("node", "y"), Seq("y"), "left_semi")
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    nodes.select(col(nodeCol).as("node"))
      .join(alive.withColumn("in_core", lit(true)), Seq("node"), "left")
      .join(finalDeg.withColumnRenamed("x", "node"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("in_core"), lit(false)).as("in_core"),
        coalesce(col("d"), lit(0L)).as("core_deg"))
  }

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
