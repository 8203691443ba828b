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

  test("labelPropagation: clamped seeds, majority vote, lexicographic ties, hop-limited reach") {
    import org.apache.spark.sql.functions.col
    def lp(edges: Seq[(Long, Long)], seeds: Seq[(Long, String)],
        nodes: Seq[Long], iters: Int): Map[Long, Option[String]] =
      GraphRank.labelPropagation(
        edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("doc_id", "label"), nodes.toDF("doc_id"), "doc_id", iters)
        .select(col("node"), col("label"))
        .as[(Long, Option[String])].collect().toMap
    // chain 1->2->3->4: label reaches exactly `iters` hops
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val n = Seq(1L, 2L, 3L, 4L)
    val s = Seq((1L, "en"))
    assert(lp(chain, s, n, 1) ==
      Map(1L -> Some("en"), 2L -> Some("en"), 3L -> None, 4L -> None))
    assert(lp(chain, s, n, 3)(4L).contains("en"))
    // majority: node 9 hears de,de,fr -> de; tie en/de -> de (lexicographic)
    val maj = Seq((1L, 9L), (2L, 9L), (3L, 9L))
    assert(lp(maj, Seq((1L, "de"), (2L, "de"), (3L, "fr")),
      Seq(1L, 2L, 3L, 9L), 1)(9L).contains("de"))
    assert(lp(maj.take(2), Seq((1L, "en"), (2L, "de")),
      Seq(1L, 2L, 9L), 1)(9L).contains("de"))
    // a seed surrounded by the other label NEVER flips (clamped)
    val clamp = Seq((1L, 3L), (2L, 3L))
    assert(lp(clamp, Seq((1L, "fr"), (2L, "fr"), (3L, "en")),
      Seq(1L, 2L, 3L), 2)(3L).contains("en"))
    // iters = 0 returns the seeds as-is
    assert(lp(chain, s, n, 0) ==
      Map(1L -> Some("en"), 2L -> None, 3L -> None, 4L -> None))
  }

  test("triangleCounts: hand-checked, once per triangle, hub-safe orientation, parallel/self edges ignored") {
    def tc(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
      GraphRank.triangleCounts(
        edges.toDF("src", "dst"), "src", "dst", nodes.toDF("node"), "node")
        .as[(Long, Long)].collect().toMap
    // K3 plus a pendant: each triangle corner counts 1, pendant 0
    val k3 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(tc(k3, Seq(1L, 2L, 3L, 4L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    // K4 has 4 triangles; every vertex sits in 3 of them
    val k4 = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    assert(tc(k4, (1L to 4L).toSeq) == (1L to 4L).map(_ -> 3L).toMap)
    // direction, duplication, and self-loops don't change the simple graph
    val noisy = k3 ++ k3.map(_.swap) ++ Seq((2L, 2L), (1L, 2L))
    assert(tc(noisy, Seq(1L, 2L, 3L, 4L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    // star = zero triangles regardless of hub degree (and the hub's
    // oriented out-degree is 0 by the (degree, id) order — no wedge blowup)
    val star = (2L to 30L).map(i => (1L, i))
    assert(tc(star, (1L to 30L).toSeq).values.sum == 0L)
    // star + one rim edge = exactly one triangle through the hub
    val rim = tc(star :+ (2L, 3L), (1L to 30L).toSeq)
    assert(rim(1L) == 1L && rim(2L) == 1L && rim(3L) == 1L && rim(4L) == 0L)
  }

  test("edgeJaccard: hand-checked common/union/jaccard per edge") {
    // K3 {1,2,3} + pendant 3-4: deg = (2,2,3,1)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val r = GraphRank.edgeJaccard(g.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(r((1L, 2L)) == ((1L, 1L, 10000L))) // N∩={3}, N∪={3}
    assert(r((2L, 3L)) == ((1L, 2L, 5000L)))  // N∩={1}, N∪={1,4}
    assert(r((1L, 3L)) == ((1L, 2L, 5000L)))
    assert(r((3L, 4L)) == ((0L, 2L, 0L)))     // pendant: nothing shared
    assert(r.size == 4)
  }

  test("kCorePeel: cascade peels hand-checked; core survives; rounds bound the cascade depth") {
    def kc(edges: Seq[(Long, Long)], nodes: Seq[Long], k: Int, rounds: Int) =
      GraphRank.kCorePeel(
        edges.toDF("src", "dst"), "src", "dst", nodes.toDF("node"), "node",
        k, rounds)
        .as[(Long, Boolean, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
    // triangle {1,2,3} + chain 3-4-5: the chain peels in CASCADE (5 falls
    // round 1, 4 only after 5 is gone), the triangle is the 2-core
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val n = (1L to 5L).toSeq
    val full = kc(g, n, 2, 3)
    assert(full(1L) == ((true, 2L)) && full(2L) == ((true, 2L)))
    assert(full(3L) == ((true, 2L))) // degree WITHIN the core: 4 is gone
    assert(full(4L) == ((false, 0L)) && full(5L) == ((false, 0L)))
    // bounded rounds: after ONE round only 5 has peeled, 4 still stands
    // (synchronous semantics — 4 counted 3 and 5 as neighbors that round)
    val one = kc(g, n, 2, 1)
    assert(one(5L)._1 == false && one(4L)._1 == true)
    // k=1 drops only isolated nodes
    val k1 = kc(g, n :+ 9L, 1, 2)
    assert(k1(9L) == ((false, 0L)) && k1(5L)._1 == true)
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
