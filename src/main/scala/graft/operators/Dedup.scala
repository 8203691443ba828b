package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record-per-key dedup — the reference's one relational query
  * (`/root/reference/spark-job/mergeSQL.sql:14-21`: `ROW_NUMBER() OVER
  * (PARTITION BY invoiceid, itemid ORDER BY replicadmstimestamp DESC)`
  * + `WHERE row_num = 1`), generalized to any key/order columns.
  *
  * Scale notes:
  *  - The `rn = 1` filter over a ranking window is rewritten by Catalyst's
  *    `InferWindowGroupLimit` into `WindowGroupLimitExec` (top-1 per group
  *    with partial + final stages), so the shuffle carries at most one row
  *    per key per map partition — this is the map-side-combine shape you
  *    want at 100 TB, not a full sort of every group.
  *  - The reference's ordering is non-deterministic on timestamp ties
  *    (SURVEY.md §2.2); we always append deterministic tiebreak columns so
  *    reruns and the DuckDB oracle agree bit-for-bit.
  */
object Dedup {

  /** Keep the single latest row per key.
    *
    * @param keys      partition keys (the business key)
    * @param orderDesc column ranked descending (event time); ties broken by
    *                  `tiebreakDesc` columns, also descending.
    */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      orderDesc: String,
      tiebreakDesc: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = (orderDesc +: tiebreakDesc).map(c => col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate removal by a set of columns: keeps the row with the
    * smallest `keepMin` value within each duplicate group (deterministic,
    * unlike `dropDuplicates` which keeps an arbitrary row).
    */
  def exactByColumns(df: DataFrame, cols: Seq[String], keepMin: String): DataFrame = {
    val w = Window.partitionBy(cols.map(col): _*).orderBy(col(keepMin).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Connected components over a near-dup pair set — the DECISION step of
    * a dedup pipeline: pair detection (q11/q12/q13/q24/q35) says "a ~ b";
    * this groups the transitive closure into clusters so exactly one
    * canonical document per cluster survives. Returns (id, cluster) for
    * EVERY id in `ids`, where cluster = the minimum id reachable through
    * the pair graph (singletons map to themselves) — the deterministic
    * "keep the oldest" policy.
    *
    * Algorithm: min-label propagation to fixpoint. Each round joins the
    * current labels to the (symmetrized) edge list, takes the min of own
    * and neighbors' labels, and stops when no label changed — O(cluster
    * diameter) rounds, each one shuffle join + aggregation. Near-dup
    * clusters are overwhelmingly tiny (pairs/cliques), so the diameter —
    * and the round count — is small in practice; each round's frame is
    * checkpointed so lineage (and recomputation) doesn't grow with
    * rounds. The driver sees only the converged-or-not count, never data.
    *
    * This is the plain-DataFrame form of the classic iterative CC (the
    * alternating large/small-star optimization exists for adversarially
    * deep graphs; dedup graphs don't need it — documented trade).
    *
    * Storage note: each round's checkpoint pins one labels-sized frame
    * (16 bytes/row) in executor storage until the superseded frame becomes
    * unreachable and the ContextCleaner reclaims its blocks — worst case
    * `maxRounds × |ids|` transiently. The Dataset API exposes no handle to
    * free a localCheckpoint eagerly; `maxRounds` is the bound.
    */
  def connectedComponents(
      ids: DataFrame,   // id
      pairs: DataFrame, // d1, d2 (undirected)
      maxRounds: Int = 20): DataFrame = {
    val np = ids.sparkSession.sparkContext.defaultParallelism
    // symmetrize once; explicit partitioning on the join key (AQE-exempt —
    // edge frames are tiny by bytes, the per-round join must stay parallel)
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .repartition(np, col("src"))
      .localCheckpoint()
    var labels = ids.select(col("id"), col("id").as("cluster"))
      .repartition(np, col("id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // min over own label and every neighbor's label
      val neighborMin = edges
        .join(labels.select(col("id").as("src"), col("cluster").as("nc")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("nc")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .repartition(np, col("id"))
        .localCheckpoint()
      val changed = next.join(
          labels.select(col("id"), col("cluster").as("old")), "id")
        .filter(col("cluster") =!= col("old"))
        .count()
      labels = next
      converged = changed == 0
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }
}
