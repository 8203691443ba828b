package graft

import graft.operators.GraphRank

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // scale
  private val B = 150000000L  // base = S*15/100

  private def ranks(
      edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int): Map[Long, Long] =
    GraphRank.pageRank(
      edges.toDF("src", "dst"), "src", "dst",
      nodes.toDF("node"), "node", iters, dampingPct = 85, scale = S)
      .as[(Long, Long)].collect().toMap

  test("hand-checked chain: source decays to base, sink accumulates; iter 0 = init") {
    val edges = Seq((1L, 2L))
    val nodes = Seq(1L, 2L, 3L)
    assert(ranks(edges, nodes, 0) == Map(1L -> S, 2L -> S, 3L -> S))
    // iter 1: node1 = base (no in-edges); node2 = base + (S*85)//100;
    // node3 isolated = base
    val r1 = ranks(edges, nodes, 1)
    assert(r1 == Map(1L -> B, 2L -> (B + S * 85 / 100), 3L -> B))
    // iter 2: node2's inflow now comes from node1's DECAYED rank
    val r2 = ranks(edges, nodes, 2)
    assert(r2 == Map(1L -> B, 2L -> (B + B * 85 / 100), 3L -> B))
  }

  test("parallel edges each count in the outdegree and each contribute") {
    // 1 -> 2 twice: od=2, each edge ships (r*85)//(100*2); total inflow
    // equals the single-edge case up to the integer-div remainder
    val r = ranks(Seq((1L, 2L), (1L, 2L)), Seq(1L, 2L), 1)
    assert(r(2L) == B + 2 * (S * 85 / (100 * 2)))
    // fan-out 1->2, 1->3 splits: each target gets half the mass
    val f = ranks(Seq((1L, 2L), (1L, 3L)), Seq(1L, 2L, 3L), 1)
    assert(f(2L) == B + S * 85 / 200 && f(3L) == B + S * 85 / 200)
  }

  test("cycle conserves mass under exact arithmetic") {
    // 1->2->1: symmetric two-cycle; both nodes keep rank = base +
    // (prev*85)//100 and stay equal every iteration
    val r = ranks(Seq((1L, 2L), (2L, 1L)), Seq(1L, 2L), 4)
    assert(r(1L) == r(2L))
    // closed under the recurrence x' = B + (x*85)/100 from x=S
    var x = S
    for (_ <- 1 to 4) x = B + x * 85 / 100
    assert(r(1L) == x)
  }
}
