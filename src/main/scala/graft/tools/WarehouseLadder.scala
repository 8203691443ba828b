package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-horizon warehouse evidence (SCALING §10p): the round-12 gates
  * proved the aggregate view and snapshot diff correct on 4–7-commit
  * fixtures; this harness measures their COST SHAPE where it could
  * actually degrade — history length and posdel density.
  *
  *   runMain graft.tools.WarehouseLadder <sfDir> [commits] [deleteWaves]
  *   runMain graft.tools.WarehouseLadder <sfDir> unpart [waves]
  *   runMain graft.tools.WarehouseLadder <sfDir> rename [waves]
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
  * 3. `unpart` (SCALING §10t): the q181 shape — agg view over an
  *    UNPARTITIONED MOR source whose gross-feed −old recovery cannot
  *    partition-prune. Runs the SAME narrow-wave history twice, against
  *    a key-CLUSTERED source (the stats prune bounds each subtraction
  *    by key locality) and an UNCLUSTERED control (every dir spans the
  *    full key range — the honest fallback), and reports both drains:
  *    the gap IS the prune's measured win, and the clustered drain's
  *    sf1→sf10 ratio is the ladder entry.
  * 4. `rename` (SCALING §10u): the q180 shape — agg view whose summed
  *    column was RENAMED mid-history. Same history against a no-rename
  *    control; equal drains prove the prior-name coalesce is metadata
  *    cost only.
  * 5. `meta` (SCALING §10v): metadata-table footer harvest at high file
  *    count — builds a table of `waves`×32-file commits, then times the
  *    driver-side walk vs the distributed job over the same files: the
  *    measured crossover behind TableStats.DistributeThreshold.
  *
  * All verify exact results before printing, so a timing is only ever
  * reported for a correct outcome.
  */
object WarehouseLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = if (args.length > 1 && !args(1).forall(_.isDigit)) args(1) else "history"
    val commits = if (mode == "history" && args.length > 1) args(1).toInt else 100
    val deleteWaves = if (args.length > 2 && mode == "history") args(2).toInt else 20
    val waves = if (args.length > 2 && mode != "history") args(2).toInt else 8
    // optional corpus inflation (unpart/rename modes): replicate the
    // documents k× with disjoint doc_id ranges so the scan term is
    // visible past the fixed per-trigger overhead without generating a
    // full sf100 directory
    val inflate = if (args.length > 3 && mode != "history") args(3).toInt else 1
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
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val docs =
      if (inflate <= 1) docs0
      else {
        val stride = docs0.agg(max(col("doc_id"))).head.getLong(0) + 1
        (0 until inflate).map(i =>
          docs0.withColumn("doc_id", col("doc_id") + lit(i * stride)))
          .reduce(_ unionByName _)
      }

    /** Build a doc-keyed MOR source at `dir`, apply `prep` (cluster or
      * rename), land `waves` narrow key-local update commits plus one
      * equality-delete wave, then drain an agg view over it and return
      * (drainSec, perTriggerMs). Exactness is asserted against a fresh
      * relational rollup of the source's final resolved state.
      */
    def aggDrain(
        dir: String,
        partition: Option[String],
        mor: Boolean,
        prep: graft.table.WarehouseTable => Unit,
        sumCol: String): (Double, Seq[Long]) = {
      val props =
        graft.table.WarehouseTable.tableProperties(
          if (mor) "MOR" else "COW", "snappy") ++
          (if (mor) Map("compact.delta.threshold" -> "0") else Map.empty)
      val src = graft.table.WarehouseTable(s"$root/$dir")
      src.create(docs.schema, partition, props)
      src.merge(spark, docs, Seq("doc_id"))
      prep(src)
      val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
      val span = maxId / (waves * 10) + 1 // each wave touches ~1/(10·waves)
      (0 until waves).foreach { i =>
        src.merge(spark,
          docs.filter(col("doc_id") >= i * span && col("doc_id") < (i + 1) * span)
            .select(col("doc_id"), col("lang"),
              (col("n_chars") + i + 1).as(sumCol)),
          Seq("doc_id"))
      }
      val delCond = col("doc_id") >= waves.toLong * span &&
        col("doc_id") < waves.toLong * span + span
      if (mor) src.deleteWhereMor(spark, delCond)
      else src.deleteRows(spark, delCond)
      val view = graft.table.WarehouseTable(s"$root/${dir}_view")
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingIngest.startAggView(
        spark, src, view, Seq("lang"), Seq(sumCol), s"$root/${dir}_ckpt")
      q.awaitTermination(1800000)
      val sec = (System.nanoTime() - t0) / 1e9
      val expect = src.read(spark).groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col(sumCol).cast("long")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val got = graft.streaming.StreamingIngest.readAggView(spark, view)
        .select(col("lang"), col("n"), col(s"sum_$sumCol"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      require(got == expect, s"$dir view diverged: got $got expect $expect")
      val durs = q.recentProgress.toIndexedSeq.filter(_.numInputRows > 0)
        .map(_.durationMs.get("triggerExecution").toLong)
      (sec, durs)
    }

    if (mode == "meta") {
      // many-commit table: each append lands one dir of ~32 files. The
      // commits are SYNTHETIC one-row files — the harvest bill is per
      // FOOTER, so tiny files scale the population to 20k+ (640 waves)
      // without corpus-sized writes; at small SFs a corpus slice would
      // collapse to 2–3 non-empty files per commit and never reach the
      // regime the DistributeThreshold crossover claim is about.
      val t = graft.table.WarehouseTable(s"$root/meta")
      t.create(docs.schema, None,
        graft.table.WarehouseTable.tableProperties("COW", "snappy"))
      val nCommits = math.max(waves, 32)
      (0 until nCommits).foreach { i =>
        t.append(spark.range(i * 32L, i * 32L + 32L)
          .select(col("id").as("doc_id"),
            lit("xx").cast(docs.schema("lang").dataType).as("lang"),
            lit(1L).cast(docs.schema("n_chars").dataType).as("n_chars"))
          .repartitionByRange(32, col("doc_id")))
      }
      val dirs = {
        import scala.jdk.CollectionConverters._
        val l = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/meta/data"))
        try l.iterator().asScala.map(p => s"data/${p.getFileName}").toList
        finally l.close()
      }
      // force fs cache warm over every dir (explicit paths — a `data/*`
      // glob resolves inconsistently across launch modes)
      spark.read.parquet(dirs.map(d => s"$root/meta/$d"): _*).count()
      def time[T](f: => T): (Double, T) = {
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      // interleave 3 rounds of each so neither side owns the warm cache
      val driverTimes = Seq.newBuilder[Double]
      val sparkTimes = Seq.newBuilder[Double]
      var nFiles = 0
      (1 to 3).foreach { _ =>
        val (d, rows) = time(graft.table.TableStats.fileFootprint(s"$root/meta", dirs))
        val (s, rows2) = time(graft.table.TableStats.fileFootprintSpark(
          spark, s"$root/meta", dirs))
        require(rows.toSet == rows2.toSet, "driver vs distributed harvest diverged")
        nFiles = rows.size
        driverTimes += d; sparkTimes += s
      }
      println(s"""{"harness":"meta_harvest","commits":$nCommits,""" +
        s""""files":$nFiles,""" +
        s""""driver_sec":[${driverTimes.result().map(d => f"$d%.2f").mkString(",")}],""" +
        s""""distributed_sec":[${sparkTimes.result().map(d => f"$d%.2f").mkString(",")}]}""")
      spark.stop(); return
    }

    if (mode == "feed") {
      // ISOLATED measurement of the gross feed's −old recovery on an
      // unpartitioned MOR source: one narrow update wave, then time
      // changesSince(netRemovals = false) materialized to noop, best of
      // 3 — no streaming machinery, no view merges, no cluster-rewrite
      // GC debt inside the measured window. Clustered vs unclustered
      // is exactly prune-fires vs honest-fallback.
      def build(dir: String, cluster: Boolean): (graft.table.WarehouseTable, Long) = {
        val src = graft.table.WarehouseTable(s"$root/$dir")
        src.create(docs.schema, None,
          graft.table.WarehouseTable.tableProperties("MOR", "snappy") +
            ("compact.delta.threshold" -> "0"))
        src.merge(spark, docs, Seq("doc_id"))
        if (cluster) src.clusterBase(spark, "doc_id", 32) else src.compact(spark)
        val since = src.currentSnapshotId
        val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
        val span = maxId / 100 + 1 // the wave touches ~1% of the keys
        src.merge(spark,
          docs.filter(col("doc_id") < span)
            .withColumn("n_chars", col("n_chars") + 1), Seq("doc_id"))
        (src, since)
      }
      def timeFeed(src: graft.table.WarehouseTable, since: Long): Seq[Double] =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          src.changesSince(spark, since, netRemovals = false)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
      val (cl, clSince) = build("f_clustered", cluster = true)
      val (un, unSince) = build("f_control", cluster = false)
      val clT = timeFeed(cl, clSince)
      val unT = timeFeed(un, unSince)
      // the structural number: how many files the −old read PLANS. At
      // test scale the scan is bandwidth-trivial either way; at 100 TB
      // planned bytes IS the cost, and this is what the prune changes.
      def planned(src: graft.table.WarehouseTable, since: Long): (Int, Int) = {
        val baseFiles = src.read(spark, asOf = Some(since)).inputFiles.toSet
        val feedFiles = src.changesSince(spark, since, netRemovals = false)
          .inputFiles.toSet
        (feedFiles.intersect(baseFiles).size, baseFiles.size)
      }
      val (clPl, clAll) = planned(cl, clSince)
      val (unPl, unAll) = planned(un, unSince)
      // exactness: both feeds carry identical change sets
      val key = Seq("doc_id", "n_chars", "_change_type")
      val a = cl.changesSince(spark, clSince, netRemovals = false)
        .select(key.map(col): _*).collect().map(_.toString).sorted.toSeq
      val b = un.changesSince(spark, unSince, netRemovals = false)
        .select(key.map(col): _*).collect().map(_.toString).sorted.toSeq
      require(a == b, "clustered vs control feeds diverged")
      println(s"""{"harness":"gross_feed_prune","rows":${docs.count()},""" +
        s""""clustered_sec":[${clT.map(d => f"$d%.2f").mkString(",")}],""" +
        s""""unclustered_sec":[${unT.map(d => f"$d%.2f").mkString(",")}],""" +
        s""""clustered_planned_base_files":$clPl,"clustered_base_files":$clAll,""" +
        s""""unclustered_planned_base_files":$unPl,"unclustered_base_files":$unAll}""")
      spark.stop(); return
    }

    if (mode == "unpart") {
      // clustered: the stats prune bounds each −old read by key locality
      val (clSec, clDurs) = aggDrain("u_clustered", None, mor = true,
        _.clusterBase(spark, "doc_id", 32), "n_chars")
      // control: unclustered — every base dir spans the full key range,
      // so nothing prunes and each commit pays the resolved-scan price
      val (unSec, unDurs) = aggDrain("u_control", None, mor = true,
        _ => (), "n_chars")
      println(s"""{"harness":"unpart_agg_view","waves":$waves,""" +
        s""""clustered_drain_sec":${f"$clSec%.2f"},""" +
        s""""unclustered_drain_sec":${f"$unSec%.2f"},""" +
        s""""clustered_trigger_ms":[${clDurs.mkString(",")}],""" +
        s""""unclustered_trigger_ms":[${unDurs.mkString(",")}]}""")
      spark.stop(); return
    }
    if (mode == "rename") {
      // JIT/codegen warmup drain, discarded — the first drain of a cold
      // JVM reads ~1.5× the steady state, which would masquerade as
      // rename cost for whichever flavor runs first
      aggDrain("r_warmup", Some("lang"), mor = false, _ => (), "n_chars")
      // renamed: the summed column changes name mid-history — the fold
      // reads pre-rename commits through the prior-name coalesce
      val (rnSec, rnDurs) = aggDrain("r_renamed", Some("lang"), mor = false,
        _.renameColumn("n_chars", "length"), "length")
      // control: identical history, no rename
      val (plSec, plDurs) = aggDrain("r_plain", Some("lang"), mor = false,
        _ => (), "n_chars")
      println(s"""{"harness":"rename_agg_view","waves":$waves,""" +
        s""""renamed_drain_sec":${f"$rnSec%.2f"},""" +
        s""""plain_drain_sec":${f"$plSec%.2f"},""" +
        s""""renamed_trigger_ms":[${rnDurs.mkString(",")}],""" +
        s""""plain_trigger_ms":[${plDurs.mkString(",")}]}""")
      spark.stop(); return
    }

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
