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

  test("scan reports manifest-derived statistics: small catalog tables auto-broadcast, large ones don't") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.dim_s (k INT, name STRING)")
    spark.sql("INSERT INTO graft.db.dim_s VALUES (1, 'a'), (2, 'b')")
    spark.range(0, 50000)
      .selectExpr("CAST(id AS INT) AS fk", "CAST(id % 7 AS INT) AS grp")
      .createOrReplaceTempView("facts")
    val joined = spark.sql(
      """SELECT f.grp, count(*) AS n FROM facts f
        |JOIN graft.db.dim_s d ON f.fk % 2 = d.k % 2 AND f.fk % 100 = d.k
        |GROUP BY f.grp""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(joined.collect().map(_.getLong(1)).sum == 1000)
    // a table pushed past the broadcast threshold must NOT broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
    try {
      spark.sql("CREATE TABLE graft.db.dim_l (k INT, pad STRING)")
      spark.range(0, 20000)
        .selectExpr("CAST(id AS INT) AS k", "repeat(uuid(), 4) AS pad")
        .createOrReplaceTempView("dim_l_src")
      spark.sql("INSERT INTO graft.db.dim_l SELECT * FROM dim_l_src")
      val big = spark.sql(
        """SELECT count(*) FROM facts f JOIN graft.db.dim_l d ON f.fk = d.k""")
      val bigPlan = big.queryExecution.executedPlan.toString
      assert(!bigPlan.contains("BroadcastHashJoin"), bigPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft.db.dim_l")
    }
    spark.sql("DROP TABLE graft.db.dim_s")
  }

  test("literal MERGE INTO SQL: conditional update, delete, and insert") {
    val wh = warehouse
    graft.plans.GraftMergeStrategy.register(spark)
    spark.sql(
      "CREATE TABLE graft.db.m (k INT, v STRING, state STRING) PARTITIONED BY (state)")
    spark.sql(
      "INSERT INTO graft.db.m VALUES (1, 'a', 'CA'), (2, 'b', 'CA'), (3, 'c', 'NY')")
    spark.sql(
      """SELECT * FROM VALUES (2, 'B', 'u'), (3, NULL, 'd'), (4, 'dd', 'i'), (5, 'x', 'd')
        |AS s(sk, sv, sop)""".stripMargin).createOrReplaceTempView("m_src")
    spark.sql(
      """MERGE INTO graft.db.m AS t USING m_src AS s ON t.k = s.sk
        |WHEN MATCHED AND s.sop = 'd' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.v = upper(s.sv)
        |WHEN NOT MATCHED AND s.sop != 'd' THEN INSERT (k, v, state) VALUES (s.sk, s.sv, 'TX')""".stripMargin)
    val out = spark.sql("SELECT k, v, state FROM graft.db.m ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    // 1 untouched; 2 updated in place (state kept); 3 deleted; 4 inserted
    // into TX; delete-op 5 matched nothing and is NOT inserted
    assert(out == Seq((1, "a", "CA"), (2, "B", "CA"), (4, "dd", "TX")))
    spark.sql("DROP TABLE graft.db.m")
  }

  test("MERGE INTO condition can compare target and source sides") {
    val wh = warehouse
    graft.plans.GraftMergeStrategy.register(spark)
    spark.sql("CREATE TABLE graft.db.lww (k INT, v STRING, ver INT)")
    spark.sql("INSERT INTO graft.db.lww VALUES (1, 'old', 5), (2, 'old', 5)")
    spark.sql(
      """SELECT * FROM VALUES (1, 'new', 9), (2, 'stale', 3)
        |AS s(k, v, ver)""".stripMargin).createOrReplaceTempView("lww_src")
    spark.sql(
      """MERGE INTO graft.db.lww AS t USING lww_src AS s ON t.k = s.k
        |WHEN MATCHED AND s.ver > t.ver THEN UPDATE SET t.v = s.v, t.ver = s.ver
        |WHEN NOT MATCHED THEN INSERT (k, v, ver) VALUES (s.k, s.v, s.ver)""".stripMargin)
    val out = spark.sql("SELECT k, v, ver FROM graft.db.lww ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    // key 1 upgraded (9 > 5); key 2 kept (3 < 5) — last-writer-wins gate
    assert(out == Seq((1, "new", 9), (2, "old", 5)))
    spark.sql("DROP TABLE graft.db.lww")
  }

  test("MERGE INTO supports WHEN NOT MATCHED BY SOURCE update and delete") {
    val wh = warehouse
    graft.plans.GraftMergeStrategy.register(spark)
    spark.sql("CREATE TABLE graft.db.nbs (k INT, v STRING, stale INT)")
    spark.sql(
      "INSERT INTO graft.db.nbs VALUES (1, 'a', 0), (2, 'b', 0), (3, 'c', 9)")
    spark.sql("SELECT * FROM VALUES (1, 'A') AS s(k, v)")
      .createOrReplaceTempView("nbs_src")
    spark.sql(
      """MERGE INTO graft.db.nbs AS t USING nbs_src AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v, stale) VALUES (s.k, s.v, 0)
        |WHEN NOT MATCHED BY SOURCE AND t.stale >= 9 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.stale = t.stale + 1""".stripMargin)
    val out = spark.sql("SELECT k, v, stale FROM graft.db.nbs ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    // 1 matched→updated; 2 unmatched-by-source→stale bumped; 3 stale→deleted
    assert(out == Seq((1, "A", 0), (2, "b", 1)))
    spark.sql("DROP TABLE graft.db.nbs")
  }

  test("MERGE INTO rejects unsupported shapes loudly") {
    val wh = warehouse
    graft.plans.GraftMergeStrategy.register(spark)
    spark.sql("CREATE TABLE graft.db.rej (k INT, v STRING)")
    spark.range(1).selectExpr("1 AS k", "'x' AS v").createOrReplaceTempView("rej_src")
    // non-equi ON condition
    val e1 = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft.db.rej AS t USING rej_src AS s ON t.k > s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    }
    assert(e1.getMessage.contains("equi-key"))
    spark.sql("DROP TABLE graft.db.rej")
  }

  test("SQL reads prune partitions from the manifest and prune columns") {
    val wh = warehouse
    spark.sql(
      "CREATE TABLE graft.db.pr (id INT, v STRING, state STRING) PARTITIONED BY (state)")
    spark.sql(
      "INSERT INTO graft.db.pr VALUES (1, 'a', 'CA'), (2, 'b', 'NY'), (3, 'c', 'CA')")
    // physically destroy the NY partition's data files: a query filtered
    // to CA must still succeed, proving the NY files were never listed or
    // read (manifest-level pruning, not post-scan filtering)
    import scala.jdk.CollectionConverters._
    val dataDir = java.nio.file.Paths.get(s"$wh/db/pr/data")
    val walk = java.nio.file.Files.walk(dataDir)
    try walk.iterator().asScala.toSeq.reverse
      .filter(_.toString.contains("state=NY"))
      .foreach(java.nio.file.Files.delete)
    finally walk.close()
    val out = spark.sql("SELECT v FROM graft.db.pr WHERE state = 'CA' ORDER BY v")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "c"))
    // IN-list pruning on a single surviving partition also works
    val out2 = spark.sql(
      "SELECT id FROM graft.db.pr WHERE state IN ('CA') AND id > 1")
      .collect().map(_.getInt(0)).toSeq
    assert(out2 == Seq(3))
    spark.sql("DROP TABLE graft.db.pr")
  }

  test("file min/max stats prune data dirs for range filters") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.st (id BIGINT, v STRING)")
    // two appends → two data dirs with disjoint id ranges
    spark.sql("INSERT INTO graft.db.st VALUES (1, 'lo'), (10, 'lo')")
    spark.sql("INSERT INTO graft.db.st VALUES (100, 'hi'), (110, 'hi')")
    // destroy the hi-range dir's files: a query bounded to id < 50 must
    // still succeed — its dir was skipped from footer stats, never read
    import scala.jdk.CollectionConverters._
    val wt = graft.table.WarehouseTable(s"$wh/db/st")
    val dataDir = java.nio.file.Paths.get(s"$wh/db/st/data")
    val hiDirs = {
      val l = java.nio.file.Files.list(dataDir)
      try l.iterator().asScala.toList finally l.close()
    }.filter { d =>
      val files = java.nio.file.Files.list(d)
      val names = try files.iterator().asScala.map(_.toString).toList finally files.close()
      // identify the hi dir by reading footers through the stats helper
      val rel = s"data/${d.getFileName}"
      val st = graft.table.TableStats.collect(s"$wh/db/st", Seq(rel))
      st.get(rel).exists(_.get("id").exists { case (mn, _) =>
        mn.values.toString.toLong >= 100
      })
    }
    assert(hiDirs.size == 1)
    val walk = java.nio.file.Files.walk(hiDirs.head)
    try walk.iterator().asScala.toSeq.reverse
      .filter(_.toString.endsWith(".parquet")).foreach(java.nio.file.Files.delete)
    finally walk.close()
    val out = spark.sql("SELECT id FROM graft.db.st WHERE id < 50 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 10L))
    spark.sql("DROP TABLE graft.db.st")
  }

  test("ALTER TABLE ADD COLUMN: old rows surface NULL, new writes carry it") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.evo (k INT, v STRING)")
    spark.sql("INSERT INTO graft.db.evo VALUES (1, 'a')")
    spark.sql("ALTER TABLE graft.db.evo ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO graft.db.evo VALUES (2, 'b', 0.5)")
    val out = spark.sql("SELECT k, v, score FROM graft.db.evo ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(out == Seq((1, "a", None), (2, "b", Some(0.5))))
    spark.sql("ALTER TABLE graft.db.evo SET TBLPROPERTIES ('compact.delta.threshold' = '4')")
    assert(graft.table.WarehouseTable(s"$wh/db/evo")
      .properties("compact.delta.threshold") == "4")
    spark.sql("DROP TABLE graft.db.evo")
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns during analysis") {
    val wh = warehouse
    graft.plans.GraftMergeStrategy.register(spark)
    spark.sql(
      "CREATE TABLE graft.db.mevo (k INT, v STRING, state STRING) PARTITIONED BY (state)")
    spark.sql(
      "INSERT INTO graft.db.mevo VALUES (1, 'a', 'CA'), (2, 'b', 'NY')")
    spark.sql(
      """SELECT * FROM VALUES (2, 'B', 'NY', 20), (3, 'c', 'CA', 30)
        |AS s(k, v, state, score)""".stripMargin)
      .createOrReplaceTempView("mevo_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.db.mevo AS t
        |USING mevo_src AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // the catalog evolved the declared schema (metadata-only)...
    assert(graft.table.WarehouseTable(s"$wh/db/mevo")
      .schema.fieldNames.toSeq == Seq("k", "v", "state", "score"))
    // ...and pre-evolution rows surface NULL for the new column
    val out = spark.sql("SELECT k, v, score FROM graft.db.mevo ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(out == Seq((1, "a", None), (2, "B", Some(20)), (3, "c", Some(30))))
    spark.sql("DROP TABLE graft.db.mevo")
  }

  test("ALTER COLUMN TYPE widens metadata-only; old files read promoted") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.widen (k INT, v FLOAT, state STRING) PARTITIONED BY (state)")
    spark.sql("INSERT INTO graft.db.widen VALUES (1, CAST(1.5 AS FLOAT), 'CA')")
    spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN v TYPE DOUBLE")
    // post-widening writes use the wide types; pre-widening files promote
    spark.sql("INSERT INTO graft.db.widen VALUES (4000000000, 2.25, 'NY')")
    val out = spark.sql("SELECT k, v FROM graft.db.widen ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 1.5), (4000000000L, 2.25)))
    // narrowing rejected loudly
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("widening") || e.getMessage.contains("NOT_SUPPORTED_CHANGE"))
    spark.sql("DROP TABLE graft.db.widen")
  }

  test("ALTER TABLE RENAME/DROP COLUMN: metadata-only, both epochs read, guards surface") {
    spark.sql("CREATE TABLE graft.db.rdc (k INT, v STRING, state STRING) PARTITIONED BY (state)")
    spark.sql("INSERT INTO graft.db.rdc VALUES (1, 'a', 'CA'), (2, 'b', 'NY')")
    spark.sql("ALTER TABLE graft.db.rdc RENAME COLUMN v TO val")
    spark.sql("INSERT INTO graft.db.rdc VALUES (3, 'c', 'CA')")
    // old-epoch 'v' files and new-epoch 'val' files read as one column
    val out = spark.sql("SELECT k, val FROM graft.db.rdc ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "a"), (2, "b"), (3, "c")))
    spark.sql("ALTER TABLE graft.db.rdc DROP COLUMN val")
    assert(spark.table("graft.db.rdc").schema.fieldNames.toSeq == Seq("k", "state"))
    assert(spark.sql("SELECT k FROM graft.db.rdc").count() == 3)
    // identity guard flows through the catalog
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.rdc RENAME COLUMN state TO st")
    }
    spark.sql("DROP TABLE graft.db.rdc")
  }

  test("DELETE FROM and UPDATE SQL run as dir-level rewrites") {
    val wh = warehouse
    graft.plans.GraftMergeStrategy.register(spark)
    spark.sql(
      "CREATE TABLE graft.db.dml (k INT, v STRING, state STRING) PARTITIONED BY (state)")
    spark.sql(
      """INSERT INTO graft.db.dml VALUES
        |(1, 'a', 'CA'), (2, 'b', 'CA'), (3, 'c', 'NY'), (4, 'd', 'TX')""".stripMargin)
    // partition-predicate delete: only the NY dirs are touched. Destroy
    // TX's files first to PROVE the delete never read or rewrote them.
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(
      java.nio.file.Paths.get(s"$wh/db/dml/data"))
    try walk.iterator().asScala.toSeq.reverse
      .filter(p => p.toString.contains("state=TX") && p.toString.endsWith(".parquet"))
      .foreach(java.nio.file.Files.delete)
    finally walk.close()
    spark.sql("DELETE FROM graft.db.dml WHERE state = 'NY'")
    // arbitrary-predicate update on the surviving CA partition
    spark.sql("UPDATE graft.db.dml SET v = concat(v, '!') WHERE k >= 2 AND state = 'CA'")
    val out = spark.sql("SELECT k, v FROM graft.db.dml WHERE state = 'CA' ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "a"), (2, "b!")))
    assert(spark.sql("SELECT count(*) FROM graft.db.dml WHERE state = 'NY'")
      .head().getLong(0) == 0)
    spark.sql("DROP TABLE graft.db.dml")
  }

  test("DELETE FROM a merge-on-read table writes position deletes — no data rewrite") {
    val wh = warehouse
    graft.plans.GraftMergeStrategy.register(spark)
    spark.sql(
      """CREATE TABLE graft.db.pdel (k INT, v STRING)
        |TBLPROPERTIES ('write.merge.mode'='merge-on-read',
        |  'write.delete.mode'='merge-on-read',
        |  'write.update.mode'='merge-on-read',
        |  'compact.delta.threshold'='0')""".stripMargin)
    spark.sql(
      "INSERT INTO graft.db.pdel VALUES (1,'keep'),(2,'drop'),(3,'keep'),(4,'drop')")
    import scala.jdk.CollectionConverters._
    def dataFiles: Set[String] = {
      val walk = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$wh/db/pdel/data"))
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
      finally walk.close()
    }
    val before = dataFiles
    spark.sql("DELETE FROM graft.db.pdel WHERE v = 'drop'")
    assert(spark.sql("SELECT k FROM graft.db.pdel ORDER BY k")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 3))
    // the delete wrote a sidecar, not a rewrite: data files are untouched
    assert(dataFiles == before)
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$wh/db/pdel/posdel")))
    spark.sql("DROP TABLE graft.db.pdel")
  }

  test("VERSION AS OF time-travels to an older snapshot; expiry removes it") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.tt (k INT, v STRING)")
    spark.sql("INSERT INTO graft.db.tt VALUES (1, 'first')")   // snapshot 1
    spark.sql("INSERT OVERWRITE graft.db.tt VALUES (2, 'second')") // snapshot 2
    val now = spark.sql("SELECT k, v FROM graft.db.tt").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(now == Set((2, "second")))
    val old = spark.sql("SELECT k, v FROM graft.db.tt VERSION AS OF 1").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(old == Set((1, "first")))

    // TIMESTAMP AS OF resolves to the newest snapshot at/before the time
    Thread.sleep(5)
    val mid = java.time.Instant.now().toString.replace("T", " ").stripSuffix("Z")
    Thread.sleep(5)
    spark.sql("INSERT OVERWRITE graft.db.tt VALUES (3, 'third')") // snapshot 3
    val asOfMid = spark.sql(
      s"SELECT k, v FROM graft.db.tt TIMESTAMP AS OF '$mid'").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(asOfMid == Set((2, "second")))
    spark.sql("INSERT OVERWRITE graft.db.tt VALUES (2, 'second')") // back to state

    // expiry keeps only the current snapshot; the overwritten data dir and
    // snapshot 1's metadata are physically deleted, so time travel fails
    val wt = graft.table.WarehouseTable(s"$wh/db/tt")
    wt.expireSnapshots(keepLast = 1)
    assert(spark.sql("SELECT k, v FROM graft.db.tt").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == now)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.tt VERSION AS OF 1").collect()
    }
    assert(e.getMessage.contains("snapshot") || e.getMessage.contains("exist"))
    // snapshot 1's data dir is gone from disk (one uuid dir remains)
    import scala.jdk.CollectionConverters._
    val l = java.nio.file.Files.list(java.nio.file.Paths.get(s"$wh/db/tt/data"))
    val nDirs = try l.iterator().asScala.size finally l.close()
    assert(nDirs == 1)
    spark.sql("DROP TABLE graft.db.tt")
  }

  test("ALTER TABLE RENAME moves the table; contents and history survive") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.rn1 (k INT, v STRING)")
    spark.sql("INSERT INTO graft.db.rn1 VALUES (1, 'a')")
    spark.sql("ALTER TABLE graft.db.rn1 RENAME TO db.rn2")
    assert(spark.sql("SELECT v FROM graft.db.rn2").head().getString(0) == "a")
    assert(!graft.table.WarehouseTable(s"$wh/db/rn1").exists)
    // snapshots are table-relative: time travel still works post-rename
    assert(spark.sql("SELECT count(*) FROM graft.db.rn2 VERSION AS OF 0")
      .head().getLong(0) == 0)
    spark.sql("DROP TABLE graft.db.rn2")
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

  test("CALL graft.system.*: rollback, compact, expiry, orphan GC and WAP publish from plain SQL") {
    import spark.implicits._
    val wh = warehouse // force catalog registration
    spark.sql(
      """CREATE TABLE graft.db.mnt (k INT, v STRING, state STRING)
        |TBLPROPERTIES ('write.merge.mode'='merge-on-read',
        |  'write.delete.mode'='merge-on-read',
        |  'write.update.mode'='merge-on-read',
        |  'compact.delta.threshold'='0')""".stripMargin)
    val wt = graft.table.WarehouseTable(s"$wh/db/mnt")
    spark.sql("INSERT INTO graft.db.mnt VALUES (1, 'a', 'CA'), (2, 'b', 'NY')")
    val snap1 = wt.currentSnapshotId
    // an abandoned half, rolled back from SQL
    spark.sql("INSERT INTO graft.db.mnt VALUES (3, 'junk', 'TX')")
    val r = spark.sql(s"CALL graft.system.rollback('db.mnt', $snap1)").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(snap1))
    assert(spark.sql("SELECT k FROM graft.db.mnt").collect()
      .map(_.getInt(0)).toSet == Set(1, 2))
    // MOR delete -> posdel sidecar; compact folds it; expiry + GC reclaim
    wt.merge(spark, Seq((2, "B2", "NY")).toDF("k", "v", "state"), Seq("k"))
    assert(wt.deleteWhereMor(spark, org.apache.spark.sql.functions.col("k") === 1) == 1)
    spark.sql("CALL graft.system.compact('db.mnt')")
    spark.sql("CALL graft.system.expire_snapshots('db.mnt', 1)")
    val removed = spark.sql(
      "CALL graft.system.remove_orphan_files('db.mnt', 0)").head().getLong(0)
    assert(removed >= 0) // rollback debris, if any, reclaimed
    assert(spark.sql("SELECT k, v FROM graft.db.mnt").collect()
      .map(r2 => (r2.getInt(0), r2.getString(1))).toSet == Set((2, "B2")))
    // WAP: stage via the API, publish via SQL
    val staged = wt.stageAppend(Seq((7, "g", "WA")).toDF("k", "v", "state"))
    assert(spark.sql("SELECT count(*) FROM graft.db.mnt").head().getLong(0) == 1)
    spark.sql(s"CALL graft.system.publish_staged('db.mnt', $staged)")
    assert(spark.sql("SELECT k FROM graft.db.mnt").collect()
      .map(_.getInt(0)).toSet == Set(2, 7))
    // the procedures are discoverable
    assert(spark.sql("SHOW PROCEDURES IN graft.system").collect()
      .exists(_.toString.contains("rollback")))
    spark.sql("DROP TABLE graft.db.mnt")
  }

  test("WAP from plain SQL: conf-staged INSERT, staged_changes audit, publish/discard by WAP id") {
    val wh = warehouse // force catalog registration
    spark.sql("CREATE TABLE graft.db.wap (k INT, v STRING)")
    val wt = graft.table.WarehouseTable(s"$wh/db/wap")
    spark.sql("INSERT INTO graft.db.wap VALUES (1, 'a')")
    // conf set -> INSERT stages; main readers see nothing
    spark.conf.set(graft.plans.GraftCatalog.WapIdConf, "batch-7")
    try spark.sql("INSERT INTO graft.db.wap VALUES (2, 'b'), (3, 'c')")
    finally spark.conf.unset(graft.plans.GraftCatalog.WapIdConf)
    assert(spark.sql("SELECT count(*) FROM graft.db.wap").head().getLong(0) == 1)
    // the audit finds ITS stage by the WAP id and time-travels to it
    val sid = spark.sql("CALL graft.system.staged_changes('db.wap', 'batch-7')")
      .head().getLong(0)
    assert(wt.stagedSnapshots.contains(sid))
    assert(spark.sql(s"SELECT count(*) FROM graft.db.wap VERSION AS OF $sid")
      .head().getLong(0) == 3)
    spark.sql("CALL graft.system.publish_changes('db.wap', 'batch-7')")
    assert(spark.sql("SELECT k FROM graft.db.wap").collect()
      .map(_.getInt(0)).toSet == Set(1, 2, 3))
    // published id is gone from the staged set; resolving it refuses loudly
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.publish_changes('db.wap', 'batch-7')").collect()
    }
    assert(e.getMessage.contains("batch-7"))
    // a rejected batch discards by WAP id without ever being readable
    spark.conf.set(graft.plans.GraftCatalog.WapIdConf, "batch-8")
    try spark.sql("INSERT INTO graft.db.wap VALUES (99, 'CORRUPT')")
    finally spark.conf.unset(graft.plans.GraftCatalog.WapIdConf)
    assert(spark.sql("SELECT count(*) FROM graft.db.wap WHERE v = 'CORRUPT'")
      .head().getLong(0) == 0)
    spark.sql("CALL graft.system.discard_changes('db.wap', 'batch-8')")
    assert(wt.stagedSnapshots.isEmpty)
    // INSERT OVERWRITE under a WAP id refuses: staging is append-shaped
    spark.conf.set(graft.plans.GraftCatalog.WapIdConf, "batch-9")
    try {
      val ow = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft.db.wap VALUES (0, 'x')")
      }
      assert(ow.getMessage.contains("append-shaped") ||
        Option(ow.getCause).exists(_.getMessage.contains("append-shaped")))
    } finally spark.conf.unset(graft.plans.GraftCatalog.WapIdConf)
    // DML under a WAP id refuses: DELETE/UPDATE/MERGE cannot stage and
    // must not silently publish inside an audit session
    graft.plans.GraftMergeStrategy.register(spark)
    spark.conf.set(graft.plans.GraftCatalog.WapIdConf, "batch-dml")
    try {
      val del = intercept[Exception] {
        spark.sql("DELETE FROM graft.db.wap WHERE k = 1")
      }
      assert(del.getMessage.contains("publish immediately") ||
        Option(del.getCause).exists(_.getMessage.contains("publish immediately")))
      val mrg = intercept[Exception] {
        spark.sql(
          """MERGE INTO graft.db.wap t USING (SELECT 1 AS k, 'z' AS v) s
            |ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      }
      assert(mrg.getMessage.contains("publish immediately") ||
        Option(mrg.getCause).exists(_.getMessage.contains("publish immediately")))
    } finally spark.conf.unset(graft.plans.GraftCatalog.WapIdConf)
    assert(spark.sql("SELECT count(*) FROM graft.db.wap WHERE k = 1")
      .head().getLong(0) == 1, "refused DML must not have touched the table")
    // a DEAD stage (commit claimed its id) still discards BY WAP ID from
    // SQL — the session holds only the string, and db.t.staged lists it
    spark.conf.set(graft.plans.GraftCatalog.WapIdConf, "batch-dead")
    try spark.sql("INSERT INTO graft.db.wap VALUES (50, 'dead')")
    finally spark.conf.unset(graft.plans.GraftCatalog.WapIdConf)
    spark.sql("INSERT INTO graft.db.wap VALUES (51, 'racer')") // claims the id
    assert(spark.sql("SELECT wap_id FROM graft.db.wap.staged WHERE NOT live")
      .collect().map(_.getString(0)).toSeq == Seq("batch-dead"))
    // the post-mortem names the WHY: this stage died because a regular
    // commit claimed its id, and .staged says so in SQL
    assert(spark.sql(
        "SELECT dead_reason FROM graft.db.wap.staged WHERE NOT live")
      .collect().map(_.getString(0)).toSeq == Seq("shadowed"))
    assert(spark.sql(
        "SELECT dead_reason FROM graft.db.wap.staged WHERE live")
      .collect().forall(_.isNullAt(0)),
      "live stages carry no dead_reason")
    spark.sql("CALL graft.system.discard_changes('db.wap', 'batch-dead')")
    assert(spark.sql("SELECT count(*) FROM graft.db.wap.staged")
      .head().getLong(0) == 0)
    // only ONE live stage per table state: a second staged INSERT refuses
    // loudly (before writing any data) instead of colliding on the id
    spark.conf.set(graft.plans.GraftCatalog.WapIdConf, "batch-10")
    try {
      spark.sql("INSERT INTO graft.db.wap VALUES (10, 'x')")
      val dup = intercept[Exception] {
        spark.sql("INSERT INTO graft.db.wap VALUES (11, 'y')")
      }
      assert(dup.getMessage.contains("publish or discard") ||
        Option(dup.getCause).exists(_.getMessage.contains("publish or discard")))
    } finally spark.conf.unset(graft.plans.GraftCatalog.WapIdConf)
    spark.sql("CALL graft.system.publish_changes('db.wap', 'batch-10')")
    assert(spark.sql("SELECT k FROM graft.db.wap").collect()
      .map(_.getInt(0)).toSet == Set(1, 2, 3, 10, 51)) // 51 = the racer; 50 died staged
    spark.sql("DROP TABLE graft.db.wap")
  }

  test("metadata tables from SQL: snapshots/files/partitions/tags/staged; real tables shadow the suffix") {
    val wh = warehouse // force catalog registration
    spark.sql(
      "CREATE TABLE graft.db.mt (k INT, v STRING, state STRING) PARTITIONED BY (state)")
    spark.sql("INSERT INTO graft.db.mt VALUES (1, 'a', 'CA'), (2, 'b', 'NY')")
    spark.sql("INSERT INTO graft.db.mt VALUES (3, 'c', 'CA')")
    val wt = graft.table.WarehouseTable(s"$wh/db/mt")
    wt.tagSnapshot("rel1")
    // snapshots: create + 2 inserts, all 'data'; is_current on the pointer
    val snaps = spark.sql(
      "SELECT snapshot_id, kind, is_current FROM graft.db.mt.snapshots ORDER BY snapshot_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(snaps.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(snaps.forall(_._2 == "data") && snaps.count(_._3) == 1 &&
      snaps.last._3)
    // partitions + files agree with the data
    assert(spark.sql(
      "SELECT partition, n_rows FROM graft.db.mt.partitions ORDER BY partition")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("CA", 2L), ("NY", 1L)))
    assert(spark.sql(
      "SELECT sum(n_rows) FROM graft.db.mt.files WHERE content = 'data'")
      .head().getLong(0) == 3L)
    // tags + staged
    assert(spark.sql("SELECT tag, snapshot_id FROM graft.db.mt.tags")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("rel1", 2L)))
    val sid = wt.stageAppend(
      { import spark.implicits._
        Seq((9, "z", "TX")).toDF("k", "v", "state") }, Some("wap-z"))
    assert(spark.sql("SELECT snapshot_id, wap_id FROM graft.db.mt.staged WHERE live")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((sid, "wap-z")))
    wt.discardStaged(sid)
    // stats: the manifest's per-dir ranges are SQL-visible and envelope
    // the data exactly — the layout audit that decides re-clustering
    val kRange = spark.sql(
      """SELECT min(CAST(min_value AS BIGINT)), max(CAST(max_value AS BIGINT))
        |FROM graft.db.mt.stats
        |WHERE column_name = 'k' AND content = 'data'""".stripMargin).head()
    assert((kRange.getLong(0), kRange.getLong(1)) == (1L, 3L))
    assert(spark.sql(
        "SELECT count(*) FROM graft.db.mt.stats WHERE partition IS NULL")
      .head().getLong(0) == 0L, "every dir of a partitioned table is keyed")
    // the suffixes are RESERVED under an existing table: CREATE at that
    // name refuses (Spark sees the metadata relation as already-existing)
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.db.mt.partitions (x INT)")
    }
    // ...but when the parent is NOT a table, the same name is an ordinary
    // table path — no metadata routing without a table to describe
    spark.sql("CREATE TABLE graft.db.plain.partitions (x INT)")
    spark.sql("INSERT INTO graft.db.plain.partitions VALUES (42)")
    assert(spark.sql("SELECT x FROM graft.db.plain.partitions").head().getInt(0) == 42)
    spark.sql("DROP TABLE graft.db.plain.partitions")
    // suffix on a nonexistent parent still errors as a missing table
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.nope.partitions").collect()
    }
    spark.sql("DROP TABLE graft.db.mt")
  }

  test("CALL cluster / cluster_zorder: layout maintenance from SQL; contents unchanged, stats prune") {
    val wh = warehouse // force catalog registration
    spark.sql("CREATE TABLE graft.db.cl (id INT, x INT, y INT)")
    // x/y independent permutations: z-order is the only layout that can
    // serve range predicates on both
    val rows = (1 to 2000).map(i =>
      s"($i, ${(i * 7919) % 2000 + 1}, ${(i * 104729) % 2000 + 1})")
    rows.grouped(500).foreach(chunk =>
      spark.sql(s"INSERT INTO graft.db.cl VALUES ${chunk.mkString(",")}"))
    val before = spark.sql("SELECT id FROM graft.db.cl")
      .collect().map(_.getInt(0)).sorted.toSeq
    spark.sql("CALL graft.system.cluster_zorder('db.cl', 'x,y', 16)")
    assert(spark.sql("SELECT id FROM graft.db.cl")
      .collect().map(_.getInt(0)).sorted.toSeq == before)
    val wt = graft.table.WarehouseTable(s"$wh/db/cl")
    val all = wt.read(spark).inputFiles.length
    val fx = Seq(org.apache.spark.sql.sources.GreaterThan("x", 1800))
    val fy = Seq(org.apache.spark.sql.sources.GreaterThan("y", 1800))
    assert(wt.read(spark, dataFilters = fx).inputFiles.length < all)
    assert(wt.read(spark, dataFilters = fy).inputFiles.length < all)
    // single-column variant composes on the same table
    spark.sql("CALL graft.system.cluster('db.cl', 'id', 4)")
    assert(spark.sql("SELECT id FROM graft.db.cl")
      .collect().map(_.getInt(0)).sorted.toSeq == before)
    spark.sql("DROP TABLE graft.db.cl")
  }

  test("CALL cluster on a STRING column: SQL-clustered string layout prunes range reads") {
    val wh = warehouse
    spark.sql("CREATE TABLE graft.db.sct (id BIGINT, skey STRING)")
    spark.sql(
      """INSERT INTO graft.db.sct
        |SELECT id, concat('dom-', lpad(cast(id AS string), 4, '0'))
        |FROM range(1, 401)""".stripMargin)
    val before = spark.sql("SELECT id FROM graft.db.sct")
      .collect().map(_.getLong(0)).sorted.toSeq
    spark.sql("CALL graft.system.cluster('db.sct', 'skey', 4)")
    assert(spark.sql("SELECT id FROM graft.db.sct")
      .collect().map(_.getLong(0)).sorted.toSeq == before)
    val wt = graft.table.WarehouseTable(s"$wh/db/sct")
    val all = wt.read(spark).inputFiles.length
    val f = Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("skey", "dom-0001"),
      org.apache.spark.sql.sources.LessThanOrEqual("skey", "dom-0050"))
    assert(wt.read(spark, dataFilters = f).inputFiles.length < all,
      "SQL-clustered string layout did not prune")
    // and through the SQL read path (pushed BETWEEN)
    val out = spark.sql(
      """SELECT id FROM graft.db.sct
        |WHERE skey BETWEEN 'dom-0001' AND 'dom-0050'
        |ORDER BY id""".stripMargin).collect().map(_.getLong(0)).toSeq
    assert(out == (1L to 50L).toSeq)
    spark.sql("DROP TABLE graft.db.sct")
  }

  test("CALL evolve_partition + rewrite_to_current_spec: SQL spec evolution with pay-once migration") {
    val wh = warehouse // force catalog registration
    spark.sql("CREATE TABLE graft.db.evo (k INT, state STRING)")
    spark.sql(
      "INSERT INTO graft.db.evo VALUES (1, 'CA'), (2, 'NY'), (3, 'CA')")
    val wt = graft.table.WarehouseTable(s"$wh/db/evo")
    assert(wt.partitionColumn.isEmpty)
    spark.sql("CALL graft.system.evolve_partition('db.evo', 'state')")
    assert(wt.partitionColumn.contains("state"))
    // reads stay correct across the mixed-spec interval
    assert(spark.sql("SELECT k FROM graft.db.evo WHERE state = 'CA'")
      .collect().map(_.getInt(0)).toSet == Set(1, 3))
    spark.sql("CALL graft.system.rewrite_to_current_spec('db.evo')")
    // post-migration: same rows, and new data lands under the new spec
    spark.sql("INSERT INTO graft.db.evo VALUES (4, 'NY')")
    assert(spark.sql("SELECT k FROM graft.db.evo WHERE state = 'NY'")
      .collect().map(_.getInt(0)).toSet == Set(2, 4))
    assert(spark.sql("SELECT count(*) FROM graft.db.evo").head().getLong(0) == 4)
    spark.sql("DROP TABLE graft.db.evo")
  }
}
