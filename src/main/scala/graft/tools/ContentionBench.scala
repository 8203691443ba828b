package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

/** Measured contention evidence for the optimistic multi-writer rebase
  * (SCALING §10o): race `writers` concurrent appends of disjoint corpus
  * slices into one table and report the full commit-attempt histogram —
  * the "jittered backoff prevents starvation" claim as data, not prose.
  *
  *   runMain graft.tools.ContentionBench <sfDir> [writers] [mode]
  *
  * mode = append (default) races `append`; mode = merge races MOR
  * upserts of disjoint key slices (the delta-commit rebase path). Both
  * verify convergence (row count ≡ corpus) before reporting, so a
  * histogram is only ever printed for a CORRECT outcome.
  *
  * Worst-case attempts for W lockstep racers is W (each round exactly one
  * writer lands) — the measurement here is what sets the engine's retry
  * budget (`commit.retry.max-attempts`, default 64).
  */
object ContentionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val writers = if (args.length > 1) args(1).toInt else 32
    val mode = if (args.length > 2) args(2) else "append"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val nDocs = docs.count()

    val root = java.nio.file.Files.createTempDirectory("contention").toString
    val table = graft.table.WarehouseTable(s"$root/docs")
    val props =
      if (mode == "merge")
        graft.table.WarehouseTable.tableProperties("MOR", "snappy")
      else graft.table.WarehouseTable.tableProperties("COW", "snappy")
    table.create(docs.schema, properties = props)

    graft.table.WarehouseTable.rebaseRecording(true)
    // one thread per writer: the race is between COMMITS, and each
    // writer's data job parallelizes internally on the shared local[32].
    // Daemon threads so the JVM exits when main does.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val t0 = System.nanoTime()
    Await.result(Future.sequence((0 until writers).map { i =>
      Future {
        val slice = docs.filter(pmod(col("doc_id"), lit(writers)) === i)
        if (mode == "merge") table.merge(spark, slice, Seq("doc_id"))
        else table.append(slice)
      }
    }), 1800.seconds)
    val wallSec = (System.nanoTime() - t0) / 1e9
    val attempts = graft.table.WarehouseTable.drainRebaseAttempts()
    graft.table.WarehouseTable.rebaseRecording(false)

    val got = table.read(spark).count()
    require(got == nDocs, s"converged to $got rows, expected $nDocs")

    val hist = attempts.groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy(_._1)
    println(s"""{"mode":"$mode","writers":$writers,"rows":$nDocs,""" +
      s""""wall_sec":${f"$wallSec%.1f"},"commits":${attempts.size},""" +
      s""""max_attempts":${attempts.max},""" +
      s""""mean_attempts":${f"${attempts.sum.toDouble / attempts.size}%.2f"},""" +
      s""""histogram":{${hist.map { case (a, n) => s""""$a":$n""" }.mkString(",")}}}""")
    spark.stop()
    pool.shutdown()
  }
}
