package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD

import graft.tools.ExecutedPlans

/** Plan-regression gate: freezes the round-7-certified plan state across
  * EVERY `SparkEntry.queries` entry, by execution (post-AQE plans — a
  * pre-execution explain shows speculative join strategies).
  *
  * Three rules, violated = the build fails:
  *  1. No `CartesianProduct`, anywhere, ever.
  *  2. `BroadcastNestedLoopJoin` only in the allowlisted queries — the
  *     documented bounded `crossJoin(broadcast(...))` sites (a 1-row
  *     totals frame, a probe/query set, or a model table join each plan
  *     as BNLJ by construction; anything NEW planning one is a
  *     regression — most likely a join whose equi-condition was lost).
  *  3. Outside those same allowlisted queries, any join side carrying an
  *     EXPLICIT broadcast hint must be cardinality-bounded in the logical
  *     plan itself: its subtree contains an Aggregate, a Limit, a local
  *     relation, or a checkpointed (already-materialized, bounded at
  *     creation) frame. A `broadcast()` slapped on a raw corpus scan —
  *     the classic "works at sf0.1, OOMs the executors at 100 TB" edit —
  *     has none of these and fails here even though AQE would happily
  *     execute it on test data. (In the allowlisted queries the hinted
  *     probe frames are filters over a corpus scan — bounded by their
  *     predicate, which no structural check can see; the per-query
  *     allowlist is the documented audit of exactly those sites.)
  *
  * This is a tripwire, not a proof: rule 3's boundedness is an exists-
  * check (a join of bounded × unbounded passes), but every regression
  * class the round audits actually caught — lost equi-keys, data-scaled
  * broadcast hints — lands on one of the three rules.
  */
class PlanAuditSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose executed plans legitimately contain BNLJ — each one a
    * documented bounded-side cross/broadcast join (see the entry's own
    * comment in SparkEntry). Membership is exact: a new query planning a
    * BNLJ must either get an equi-key or be documented and added here.
    */
  private val bnljAllowed = Set(
    "q14_cosine_topk",      // broadcast query set × corpus (brute-force ANN)
    "q15_ivf_topk",         // broadcast probe set × bucketed corpus
    "q34_ivf_at_rest",      // broadcast probe set × pruned partitions
    "q38_tfidf_topterms",   // 1-row doc-count totals
    "q51_semantic_dedup",   // broadcast centroid table (≤ k rows)
    "q53_bigram_loglik",    // 1-row vocab totals
    "q60_temperature_mix",  // 1-row mixture-normalizer totals
    "q62_length_buckets",   // 1-row corpus totals
    "q67_vocabulary",       // 1-row totals for coverage shares
    "q70_nb_classifier",    // broadcast class-prior table (≤ |classes|)
    "q74_dsir_weights",     // 1-row hashed-model totals
    "q75_pq_adc_topk",      // broadcast query distance tables (probe set)
    "q77_ivfpq_at_rest",    // broadcast probe set × pruned partitions
    "q79_vocab_encode",     // 1-row OOV-audit totals
    "q88_ann_recall",       // probe set × exact/approx twin joins
    "q89_ivf_nprobe_sweep", // probe set, swept nprobe
    "q91_bm25_topk",        // 1-row corpus-globals (N, avgdl)
    "q95_ccnet_buckets",    // 1-row LM totals (q53 inside)
    "q98_rrf_fusion",       // broadcast query vector × corpus (q14 inside)
    "q99_hard_negatives",   // broadcast query set × corpus (q14's plan)
    "q101_mmr_select",      // 1-row query vector + limit-bounded N² sims
    "q153_containment_decon", // broadcast reference shingles (eval-suite-
                              // sized by contract; filter over corpus scan)
    "q164_salted_join")       // saltedBroadcastJoin's dim side is
                              // broadcast-sized BY THE OPERATOR'S CONTRACT
                              // (a small dimension replicated ×salt); the
                              // fact side never shuffles — that asymmetry
                              // is the operator

  /** Rule-3 boundedness: does this logical subtree force bounded
    * cardinality on its own? (Aggregates are bounded by their grouping
    * domain, limits by construction, local relations by being literal,
    * LogicalRDD by having been materialized — every `localCheckpoint` in
    * the codebase is a documented bounded frame.)
    */
  private def bounded(p: LogicalPlan): Boolean = fixedDimOnly(p) || p.exists {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
    case _: LocalRelation | _: OneRowRelation => true
    case _: LogicalRDD => true
    case _ => false
  }

  /** `nation` (25 rows) and `region` (5 rows) are FIXED cardinality at
    * every scale factor — broadcasting them raw is the textbook-correct
    * dimension broadcast, not a data-scaled one.
    */
  private def fixedDimOnly(p: LogicalPlan): Boolean = {
    val leaves = p.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.forall(rp =>
              rp.toString.endsWith("nation.parquet")
                || rp.toString.endsWith("region.parquet"))
          case _ => false
        }
      case _ => false
    }
  }

  private def hintedUnbounded(p: LogicalPlan): Seq[String] =
    p.collect {
      case j @ Join(l, _, _, _, JoinHint(Some(lh), _))
          if lh.strategy.contains(BROADCAST) && !bounded(l) =>
        s"left-broadcast-hint on unbounded side: ${j.simpleString(3)}"
      case j @ Join(_, r, _, _, JoinHint(_, Some(rh)))
          if rh.strategy.contains(BROADCAST) && !bounded(r) =>
        s"right-broadcast-hint on unbounded side: ${j.simpleString(3)}"
    }

  test("no cartesian products, allowlisted BNLJ only, no unbounded broadcast hints") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val qes = ExecutedPlans.captureQE(spark) {
        // noop write, not count(): under count() Catalyst prunes every
        // operator that can't change cardinality and the audit would
        // inspect a reduced plan (the ExplainAudit lesson)
        fn(spark, sf).write.format("noop").mode("overwrite").save()
      }
      if (qes.isEmpty) failures += s"$name: nothing captured"
      val physical = qes.map(_.executedPlan.toString)
      if (physical.exists(_.contains("CartesianProduct")))
        failures += s"$name: CartesianProduct in executed plan"
      if (!bnljAllowed.contains(name)
          && physical.exists(_.contains("BroadcastNestedLoopJoin")))
        failures += s"$name: BroadcastNestedLoopJoin outside the allowlist"
      if (!bnljAllowed.contains(name))
        qes.flatMap(qe => hintedUnbounded(qe.optimizedPlan))
          .foreach(msg => failures += s"$name: $msg")
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
