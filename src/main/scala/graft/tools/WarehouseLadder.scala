package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-horizon warehouse evidence (SCALING §10p): the round-12 gates
  * proved the aggregate view and snapshot diff correct on 4–7-commit
  * fixtures; this harness measures their COST SHAPE where it could
  * actually degrade — history length and posdel density.
  *
  *   runMain graft.tools.WarehouseLadder <sfDir> [commits] [deleteWaves]
  *
  * 1. AGG-VIEW TRIGGER LADDER: a COW source takes `commits` small merge
  *    commits after its base load; `startAggView` drains them one commit
  *    per trigger and the per-trigger durations come straight from the
  *    stream's own progress log. Change-bound means FLAT: the trigger
  *    folding commit ~N must not cost more than the one folding commit
  *    ~10, no matter how long the table's history has grown.
  * 2. POSDEL-HEAVY SNAPSHOT DIFF: `deleteWaves` position-delete commits
  *    land between two tags, then `diffSnapshots` runs on the pair —
  *    the diff must price at the erasure sidecars it reads, not at the
  *    corpus or the wave count.
  *
  * Both verify exact results before printing, so a timing is only ever
  * reported for a correct outcome.
  */
object WarehouseLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val commits = if (args.length > 1) args(1).toInt else 100
    val deleteWaves = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep every trigger's progress entry (default retention is 100)
      .config("spark.sql.streaming.numRecentProgressUpdates", (commits + 16).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("whladder").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))

    // ---- 1. agg-view per-trigger cost over a long commit history ----
    val src = graft.table.WarehouseTable(s"$root/src")
    src.create(docs.schema, Some("lang"),
      graft.table.WarehouseTable.tableProperties("COW", "snappy"))
    src.ensureMergeKeys(Seq("doc_id"))
    src.append(docs)
    // `commits` small update commits: wave i bumps ~1/commits of the
    // corpus — each COW merge rewrites only the touched partitions, so
    // every window's gross feed is small and roughly equal-sized
    (0 until commits).foreach { i =>
      src.merge(spark,
        docs.filter(pmod(col("doc_id"), lit(commits)) === i)
          .withColumn("n_chars", col("n_chars") + i + 1),
        Seq("doc_id"))
    }
    val view = graft.table.WarehouseTable(s"$root/view")
    val q = graft.streaming.StreamingIngest.startAggView(
      spark, src, view, Seq("lang"), Seq("n_chars"), s"$root/ckpt")
    q.awaitTermination(1800000)
    // exactness first: the maintained view ≡ a fresh relational rollup
    val expect = src.read(spark).groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars").cast("long")).as("sum_n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = graft.streaming.StreamingIngest.readAggView(spark, view)
      .select(col("lang"), col("n"), col("sum_n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    require(got == expect, s"view diverged: got $got expect $expect")
    val durs = q.recentProgress.toIndexedSeq
      .filter(_.numInputRows > 0)
      .map(p => p.durationMs.get("triggerExecution").toLong)
    def mean(xs: Seq[Long]): Double =
      if (xs.isEmpty) 0.0 else xs.sum.toDouble / xs.size
    val firstK = durs.slice(1, 11) // drop trigger 0: base-load fold + table create
    val lastK = durs.takeRight(10)
    println(s"""{"harness":"agg_view_ladder","commits":$commits,""" +
      s""""triggers":${durs.size},""" +
      s""""first10_mean_ms":${f"${mean(firstK)}%.0f"},""" +
      s""""last10_mean_ms":${f"${mean(lastK)}%.0f"},""" +
      s""""ratio":${f"${mean(lastK) / math.max(1.0, mean(firstK))}%.2f"},""" +
      s""""all_ms":[${durs.mkString(",")}]}""")

    // ---- 2. snapshot diff across a posdel-heavy window ----
    val rel = graft.table.WarehouseTable(s"$root/rel")
    rel.create(docs.schema, None,
      graft.table.WarehouseTable.tableProperties("MOR", "snappy") +
        ("compact.delta.threshold" -> "0"))
    rel.ensureMergeKeys(Seq("doc_id"))
    rel.append(docs)
    rel.tagSnapshot("v1")
    // `deleteWaves` separate posdel commits, each erasing a disjoint slice
    (0 until deleteWaves).foreach { i =>
      rel.deleteWhereMor(spark,
        pmod(col("doc_id"), lit(deleteWaves * 3)) === i)
    }
    rel.tagSnapshot("v2")
    val t0 = System.nanoTime()
    val diff = rel.diffSnapshots(spark, rel.tags("v1"), rel.tags("v2"), Seq("doc_id"))
      .groupBy("diff_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val diffSec = (System.nanoTime() - t0) / 1e9
    val nDocs = docs.count()
    val expectRemoved = docs
      .filter(pmod(col("doc_id"), lit(deleteWaves * 3)) < deleteWaves).count()
    require(diff.getOrElse("removed", 0L) == expectRemoved &&
      diff.getOrElse("added", 0L) == 0L && diff.getOrElse("changed", 0L) == 0L,
      s"diff $diff, expected removed=$expectRemoved only")
    println(s"""{"harness":"posdel_diff","rows":$nDocs,""" +
      s""""delete_waves":$deleteWaves,"removed":$expectRemoved,""" +
      s""""diff_sec":${f"$diffSec%.2f"}}""")
    spark.stop()
  }
}
