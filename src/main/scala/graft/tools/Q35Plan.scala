package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan dump for q35 (investigating the totals-join strategy).
  * runMain graft.tools.Q35Plan [sfDir]
  */
object Q35Plan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q35_winnow_match")(spark, sfDir)
    df.explain("formatted")
  }
}
