package graft

/** SQL-level fidelity through the DSv2 catalog: CREATE / INSERT / SELECT /
  * INSERT OVERWRITE / DROP against warehouse tables, plus interop with the
  * engine-native WarehouseTable API on the same paths.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse = {
    // catalogs instantiate lazily on first reference, so runtime conf on
    // the shared session is enough — no session rebuild needed
    val dir = java.nio.file.Files.createTempDirectory("sqlwh").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", dir)
    dir
  }

  test("CREATE / INSERT / SELECT / OVERWRITE / DROP through plain SQL") {
    val wh = warehouse // force catalog registration
    spark.sql(
      """CREATE TABLE graft.db.orders (
        |  id INT, category STRING, state STRING
        |) PARTITIONED BY (state)""".stripMargin)

    spark.sql(
      "INSERT INTO graft.db.orders VALUES (1, 'books', 'CA'), (2, 'toys', 'NY')")
    assert(spark.sql("SELECT count(*) FROM graft.db.orders").head().getLong(0) == 2)

    spark.sql("INSERT INTO graft.db.orders VALUES (3, 'games', 'CA')")
    val cats = spark.sql(
      "SELECT category FROM graft.db.orders WHERE state = 'CA' ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(cats == Seq("books", "games"))

    // engine-native API sees the same table (shared layout + snapshots)
    val wt = graft.table.WarehouseTable(s"$wh/db/orders")
    assert(wt.exists && wt.partitionColumn.contains("state"))
    assert(wt.read(spark).count() == 3)

    spark.sql("INSERT OVERWRITE graft.db.orders VALUES (9, 'reset', 'TX')")
    assert(spark.sql("SELECT id FROM graft.db.orders").collect()
      .map(_.getInt(0)).toSeq == Seq(9))

    assert(spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).contains("orders"))

    spark.sql("DROP TABLE graft.db.orders")
    assert(!graft.table.WarehouseTable(s"$wh/db/orders").exists)
  }

  test("SQL reads see snapshots committed by the native merge path") {
    import spark.implicits._
    val wh = warehouse // force catalog registration
    spark.sql(
      "CREATE TABLE graft.db.kv (k INT, v STRING, state STRING) PARTITIONED BY (state)")
    val wt = graft.table.WarehouseTable(s"$wh/db/kv")
    wt.append(Seq((1, "a", "CA"), (2, "b", "NY")).toDF("k", "v", "state"))
    wt.merge(spark, Seq((2, "B", "NY"), (3, "c", "TX")).toDF("k", "v", "state"), Seq("k"))
    val out = spark.sql("SELECT k, v FROM graft.db.kv ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "a"), (2, "B"), (3, "c")))
  }
}
