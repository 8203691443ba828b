package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: literal MERGE INTO SQL through GraftMergeStrategy. */
object MergeSqlProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftSparkSessionExtensions")
      .config("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE TABLE graft.db.t (k INT, v STRING, op STRING) PARTITIONED BY (op)")
    spark.sql("INSERT INTO graft.db.t VALUES (1, 'a', 'x'), (2, 'b', 'x'), (3, 'c', 'y')")
    spark.sql(
      """SELECT * FROM VALUES (2, 'B', 'U'), (3, NULL, 'D'), (4, 'd', 'I')
        |AS src(sk, sv, sop)""".stripMargin).createOrReplaceTempView("src")
    spark.sql(
      """MERGE INTO graft.db.t AS t USING src AS s ON t.k = s.sk
        |WHEN MATCHED AND s.sop = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.v = upper(s.sv)
        |WHEN NOT MATCHED AND s.sop != 'D' THEN INSERT (k, v, op) VALUES (s.sk, s.sv, s.sop)""".stripMargin)
    println("PROBE RESULT:")
    spark.sql("SELECT * FROM graft.db.t ORDER BY k").collect().foreach(r => println(s"  $r"))
    // expect: (1,a,x) kept; (2,B,x) updated in place; 3 deleted; (4,d,I) inserted
    spark.stop()
  }
}
