package graft

import org.apache.spark.sql.functions._

import graft.io.TableIO
import graft.tables.Tables

/** SURVEY.md §7 risk 5 (mergeSchema across drifted files) and §2 S7
  * (catalog introspection surface).
  */
class SchemaCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions drifted schemas across files (added column; explicit schema for widening)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_").toString
    // month 1: (id int, amount double); month 2 adds a column
    Seq((1, 10.0), (2, 20.0)).toDF("id", "amount")
      .write.parquet(s"$dir/m1.parquet")
    Seq((3, 30.0, "x"), (4, 40.0, "y")).toDF("id", "amount", "note")
      .write.parquet(s"$dir/m2.parquet")

    val all = spark.read.option("mergeSchema", "true").parquet(s"$dir/m1.parquet", s"$dir/m2.parquet")
    assert(all.columns.contains("note"), "new column must appear")
    assert(all.count() == 4)
    // rows from the old file read null for the new column
    assert(all.filter($"note".isNull).count() == 2)

    // type WIDENING (int->long) is NOT merged by mergeSchema — Spark
    // throws CANNOT_MERGE_SCHEMAS. The supported path for the taxi-style
    // int->long month drift is an explicit reader schema:
    Seq((5L, 50.0)).toDF("id", "amount").write.parquet(s"$dir/m3.parquet")
    intercept[org.apache.spark.SparkException] {
      spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/m1.parquet", s"$dir/m3.parquet").schema
    }
    val widened = spark.read
      .schema("id LONG, amount DOUBLE")
      .parquet(s"$dir/m1.parquet", s"$dir/m3.parquet")
    assert(widened.schema("id").dataType.typeName == "long")
    assert(widened.select(sum($"id")).head().getLong(0) == 8L)
  }

  test("catalog introspection: SHOW TABLES and DESCRIBE over registered snapshot views") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cat_").toString
    val io = TableIO(spark, wh)
    io.overwrite(Seq((1, "a")).toDF("id", "s"), "default.demo_tbl")
    io.registerView("default.demo_tbl", "demo_tbl")

    val shown = spark.sql("SHOW TABLES").collect().map(_.getAs[String]("tableName"))
    assert(shown.contains("demo_tbl"))

    val desc = spark.sql("DESCRIBE demo_tbl").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("id") == "int" && desc("s") == "string")

    assert(io.catalog.listTables() == Seq("default.demo_tbl"))
    spark.catalog.dropTempView("demo_tbl")
  }

  test("DSv2 catalog: SQL name resolution, partition pruning, VERSION AS OF") {
    val wh = java.nio.file.Files.createTempDirectory("graft_v2cat_").toString
    val io = TableIO(spark, wh)
    io.append(Seq((1, "a", 2020), (2, "b", 2021)).toDF("id", "s", "yr"), "default.sales", Seq("yr"))
    io.append(Seq((3, "c", 2021)).toDF("id", "s", "yr"), "default.sales", Seq("yr"))

    spark.conf.set("spark.sql.catalog.gtest", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)
    try {
      assert(spark.sql("SELECT count(*) c FROM gtest.default.sales").head().getLong(0) == 3L)
      // snapshot SQL — the reference's Iceberg VERSION AS OF surface
      assert(spark.sql("SELECT count(*) c FROM gtest.default.sales VERSION AS OF 1")
        .head().getLong(0) == 2L)
      // partition column survives the manifest read and prunes — at
      // the MANIFEST level since r20: the dir-arithmetic exact-prune
      // proof drops non-matching files (and the Filter) before the
      // scan, so the file index carries ONLY yr=2021 paths
      val pruned = spark.sql("SELECT id FROM gtest.default.sales WHERE yr = 2021")
      assert(pruned.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
      val prunedPlan = pruned.queryExecution.executedPlan.toString
      assert(prunedPlan.contains("yr=2021") && !prunedPlan.contains("yr=2020"),
        s"scan must plan only the matching partition's files:\n$prunedPlan")
      // catalog listing through SQL
      val listed = spark.sql("SHOW TABLES IN gtest.default").collect().map(_.getString(1))
      assert(listed.contains("sales"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gtest")
      spark.conf.unset("spark.sql.catalog.gtest.warehouse")
    }
  }

  test("TIMESTAMP AS OF resolves by commit instant; .staged metadata table lists WAP stages") {
    val wh = java.nio.file.Files.createTempDirectory("graft_tsx_").toString
    val io = TableIO(spark, wh)
    val t = "default.ts_t"
    io.append(Seq((1, "a")).toDF("id", "s"), t) // v1
    val ts1 = java.nio.file.Files.getLastModifiedTime(
      io.catalog.metaPath(t).resolve("v1.json")).toMillis
    while (System.currentTimeMillis() <= ts1 + 1) Thread.sleep(1)
    io.append(Seq((2, "b")).toDF("id", "s"), t) // v2, strictly later ms

    // programmatic surface
    assert(io.catalog.versionAsOf(t, ts1).contains(1))
    assert(io.readAsOf(t, ts1).count() == 1)
    assert(io.readAsOf(t, System.currentTimeMillis()).count() == 2)
    val e = intercept[IllegalArgumentException](io.readAsOf(t, ts1 - 100000))
    assert(e.getMessage.contains("no snapshot"), e.getMessage)

    val sid = io.appendStaged(Seq((3, "c")).toDF("id", "s"), t)
    spark.conf.set("spark.sql.catalog.gts", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gts.warehouse", wh)
    try {
      // SQL TIMESTAMP AS OF (session tz is UTC; format the v1 instant)
      val lit = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ts1), java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(spark.sql(s"SELECT count(*) c FROM gts.default.ts_t TIMESTAMP AS OF '$lit'")
        .head().getLong(0) == 1L)
      // .staged metadata table: one row per unpublished stage
      val staged = spark.sql("SELECT stage_id, n_files FROM gts.default.ts_t.staged").collect()
      assert(staged.map(_.getString(0)).toSeq == Seq(sid))
      assert(staged.head.getInt(1) >= 1)
      // the staged rows are still invisible to the plain SQL read
      assert(spark.sql("SELECT count(*) c FROM gts.default.ts_t").head().getLong(0) == 2L)
      io.publishStaged(t, sid)
      assert(spark.sql("SELECT count(*) c FROM gts.default.ts_t.staged").head().getLong(0) == 0L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gts")
      spark.conf.unset("spark.sql.catalog.gts.warehouse")
    }
  }

  test("renameTable keeps every snapshot readable (manifest paths are relative)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ren_").toString
    val io = TableIO(spark, wh)
    io.append(Seq((1, "a", 2020)).toDF("id", "s", "yr"), "default.src", Seq("yr"))
    io.append(Seq((2, "b", 2021)).toDF("id", "s", "yr"), "default.src", Seq("yr"))

    spark.conf.set("spark.sql.catalog.gr", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gr.warehouse", wh)
    try {
      spark.sql("ALTER TABLE gr.default.src RENAME TO gr.default.dst")
      assert(!io.tableExists("default.src"))
      // current read, programmatic time travel, and SQL time travel all
      // work on the new name — this is exactly what absolute manifest
      // paths used to corrupt
      assert(io.read("default.dst").count() == 2)
      assert(io.readVersion("default.dst", 1).as[(Int, String, Int)].collect().toSet ==
        Set((1, "a", 2020)))
      assert(spark.sql("SELECT id FROM gr.default.dst VERSION AS OF 1")
        .as[Int].collect().toSeq == Seq(1))
      assert(spark.sql("SELECT count(*) c FROM gr.default.dst").head().getLong(0) == 2L)
      // and the renamed table still accepts commits
      io.append(Seq((3, "c", 2021)).toDF("id", "s", "yr"), "default.dst", Seq("yr"))
      assert(io.read("default.dst").count() == 3)
    } finally {
      spark.conf.unset("spark.sql.catalog.gr")
      spark.conf.unset("spark.sql.catalog.gr.warehouse")
    }
  }

  test("ALTER TABLE ADD/DROP COLUMN evolves the declared schema without rewriting data") {
    val wh = java.nio.file.Files.createTempDirectory("graft_alter_").toString
    spark.conf.set("spark.sql.catalog.ga", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ga.warehouse", wh)
    try {
      spark.sql(
        """CREATE TABLE ga.default.fares PARTITIONED BY (yr)
          |AS SELECT * FROM VALUES (1, 10.0, 2020), (2, 20.0, 2021) AS t(id, fare, yr)""".stripMargin)
      spark.sql("ALTER TABLE ga.default.fares ADD COLUMN tip double")

      // old rows null-fill the new column; inserts can now carry it
      spark.sql("INSERT INTO ga.default.fares SELECT 3, 30.0, 1.5, 2021")
      val rows = spark.sql("SELECT id, tip FROM ga.default.fares")
        .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
      assert(rows == Map(1 -> None, 2 -> None, 3 -> Some(1.5)))

      // DROP narrows the projection (bytes stay in old files)
      spark.sql("ALTER TABLE ga.default.fares DROP COLUMN fare")
      assert(!spark.table("ga.default.fares").columns.contains("fare"))
      assert(spark.sql("SELECT count(*) c FROM ga.default.fares").head().getLong(0) == 3L)

      // rename is metadata-only and preserves existing values (the
      // dedicated RENAME COLUMN test covers the full surface)
      spark.sql("ALTER TABLE ga.default.fares RENAME COLUMN tip TO gratuity")
      assert(spark.sql("SELECT gratuity FROM ga.default.fares WHERE id = 3")
        .head().getDouble(0) == 1.5)
      // dropping a partition column is rejected
      intercept[Exception] {
        spark.sql("ALTER TABLE ga.default.fares DROP COLUMN yr")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS ga.default.fares")
      spark.conf.unset("spark.sql.catalog.ga")
      spark.conf.unset("spark.sql.catalog.ga.warehouse")
    }
  }

  test("namespace DDL: CREATE/SHOW/DROP NAMESPACE and CTAS into a new namespace") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ns_").toString
    spark.conf.set("spark.sql.catalog.gn", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gn.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE gn.lake")
      val shown = spark.sql("SHOW NAMESPACES IN gn").collect().map(_.getString(0))
      assert(shown.contains("lake"))

      spark.sql("CREATE TABLE gn.lake.t AS SELECT 1 AS id")
      assert(spark.sql("SELECT id FROM gn.lake.t").as[Int].head() == 1)
      assert(spark.sql("SHOW TABLES IN gn.lake").collect().map(_.getString(1)).contains("t"))

      // non-empty namespace refuses a plain drop, cascades on request
      intercept[Exception] { spark.sql("DROP NAMESPACE gn.lake") }
      spark.sql("DROP NAMESPACE gn.lake CASCADE")
      assert(!spark.sql("SHOW NAMESPACES IN gn").collect().map(_.getString(0)).contains("lake"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gn")
      spark.conf.unset("spark.sql.catalog.gn.warehouse")
    }
  }

  test("DSv2 catalog SQL writes: CTAS, INSERT INTO, INSERT OVERWRITE commit snapshots") {
    val wh = java.nio.file.Files.createTempDirectory("graft_v2w_").toString
    spark.conf.set("spark.sql.catalog.gw", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gw.warehouse", wh)
    try {
      // CTAS with partitioning: v1 = empty create, v2 = the SELECT's rows
      spark.sql(
        """CREATE TABLE gw.default.sales PARTITIONED BY (yr)
          |AS SELECT * FROM VALUES (1, 'a', 2020), (2, 'b', 2021) AS t(id, s, yr)""".stripMargin)
      assert(spark.sql("SELECT id FROM gw.default.sales").as[Int].collect().toSet == Set(1, 2))

      // INSERT INTO appends a snapshot
      spark.sql("INSERT INTO gw.default.sales SELECT 3, 'c', 2021")
      assert(spark.sql("SELECT count(*) c FROM gw.default.sales").head().getLong(0) == 3L)

      // partition pruning works on SQL-written data (manifest-level
      // dir-arithmetic prune since r20 — only yr=2021 files plan)
      val pruned = spark.sql("SELECT id FROM gw.default.sales WHERE yr = 2021")
      assert(pruned.as[Int].collect().toSet == Set(2, 3))
      val prunedPlan = pruned.queryExecution.executedPlan.toString
      assert(prunedPlan.contains("yr=2021") && !prunedPlan.contains("yr=2020"),
        s"scan must plan only the matching partition's files:\n$prunedPlan")

      // INSERT OVERWRITE is a logical replace; prior snapshots stay readable
      spark.sql("INSERT OVERWRITE gw.default.sales SELECT 9, 'z', 2022")
      assert(spark.sql("SELECT id FROM gw.default.sales").as[Int].collect().toSet == Set(9))
      val io = TableIO(spark, wh)
      assert(io.versions("default.sales") == Seq(1, 2, 3, 4))
      assert(spark.sql("SELECT count(*) c FROM gw.default.sales VERSION AS OF 3")
        .head().getLong(0) == 3L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gw.default.sales")
      spark.conf.unset("spark.sql.catalog.gw")
      spark.conf.unset("spark.sql.catalog.gw.warehouse")
    }
  }

  test("DELETE FROM is copy-on-write: current read excludes, prior snapshots include") {
    val wh = java.nio.file.Files.createTempDirectory("graft_del_").toString
    spark.conf.set("spark.sql.catalog.gd", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gd.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gd.default.t (k INT, s STRING)")
      spark.sql("INSERT INTO gd.default.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      spark.sql("DELETE FROM gd.default.t WHERE k = 1")
      assert(spark.sql("SELECT k FROM gd.default.t").as[Int].collect().toSet == Set(2, 3))
      // the delete commit is a new snapshot; the pre-delete version still has the row
      val io = TableIO(spark, wh)
      val preDelete = io.versions("default.t").dropRight(1).last
      assert(spark.sql(s"SELECT k FROM gd.default.t VERSION AS OF $preDelete")
        .as[Int].collect().toSet == Set(1, 2, 3))
      // compound predicate + IN-list
      spark.sql("DELETE FROM gd.default.t WHERE k IN (2, 99) AND s = 'b'")
      assert(spark.sql("SELECT k FROM gd.default.t").as[Int].collect().toSet == Set(3))
      // DELETE is file-scoped too: files whose stats exclude the key carry over
      spark.sql("INSERT INTO gd.default.t VALUES (500, 'z'), (501, 'w')")
      val preDel = io.catalog.manifest("default.t", io.versions("default.t").last).toSet
      val conf = spark.sessionState.newHadoopConf()
      val untouchable = preDel.filter { f =>
        !graft.io.FileStats.mightMatch(graft.io.FileStats.read(f, conf),
          Seq(org.apache.spark.sql.sources.EqualTo("k", 500)))
      }
      assert(untouchable.nonEmpty)
      spark.sql("DELETE FROM gd.default.t WHERE k = 500")
      val postDel = io.catalog.manifest("default.t", io.versions("default.t").last).toSet
      assert(untouchable.subsetOf(postDel), "non-candidate files must carry over verbatim")
      assert(spark.sql("SELECT k FROM gd.default.t").as[Int].collect().toSet == Set(3, 501))
    } finally {
      spark.sql("DROP TABLE IF EXISTS gd.default.t")
      spark.conf.unset("spark.sql.catalog.gd")
      spark.conf.unset("spark.sql.catalog.gd.warehouse")
    }
  }

  test("ALTER TABLE RENAME COLUMN is metadata-only: old data under the new name, writes still land") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ren_").toString
    spark.conf.set("spark.sql.catalog.gc", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gc.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gc.default.t (k INT, v STRING)")
      spark.sql("INSERT INTO gc.default.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("ALTER TABLE gc.default.t RENAME COLUMN v TO label")
      // old data appears under the new name (physical files untouched)
      assert(spark.sql("SELECT label FROM gc.default.t WHERE k = 1").as[String].head() == "a")
      assert(!spark.table("gc.default.t").columns.contains("v"))
      // post-rename inserts write the PHYSICAL name so files stay uniform
      spark.sql("INSERT INTO gc.default.t VALUES (3, 'c')")
      assert(spark.sql("SELECT label FROM gc.default.t ORDER BY k").as[String].collect().toSeq
        == Seq("a", "b", "c"))
      // the programmatic read path aliases too
      val io = TableIO(spark, wh)
      assert(io.read("default.t").columns.toSeq.sorted == Seq("k", "label"))
      // row-level UPDATE through the renamed column: the predicate and
      // assignment use the LOGICAL name while footer stats and data
      // files carry the physical one
      spark.sql("UPDATE gc.default.t SET label = 'Z' WHERE label = 'b'")
      assert(spark.sql("SELECT label FROM gc.default.t ORDER BY k").as[String].collect().toSeq
        == Seq("a", "Z", "c"))
      // rename back to the birth name clears the mapping
      spark.sql("ALTER TABLE gc.default.t RENAME COLUMN label TO v")
      assert(io.catalog.renames("default.t").isEmpty)
      assert(spark.sql("SELECT v FROM gc.default.t WHERE k = 3").as[String].head() == "c")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gc.default.t")
      spark.conf.unset("spark.sql.catalog.gc")
      spark.conf.unset("spark.sql.catalog.gc.warehouse")
    }
  }

  test("ALTER TABLE rejects re-adding a dropped column name (stale-byte resurrection guard)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_readd_").toString
    spark.conf.set("spark.sql.catalog.gx", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gx.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gx.default.t (k INT, x STRING)")
      spark.sql("INSERT INTO gx.default.t VALUES (1, 'stale')")
      spark.sql("ALTER TABLE gx.default.t DROP COLUMN x")
      // re-adding x would read 'stale' from the live file instead of null
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE gx.default.t ADD COLUMN x STRING")
      }
      assert(e.getMessage.contains("resurrect"), e.getMessage)
      // a fresh name is fine and null-fills
      spark.sql("ALTER TABLE gx.default.t ADD COLUMN y STRING")
      assert(spark.sql("SELECT y FROM gx.default.t").head().isNullAt(0))
      // the on-disk name of a renamed column is equally protected
      spark.sql("ALTER TABLE gx.default.t RENAME COLUMN y TO z")
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE gx.default.t ADD COLUMN y STRING")
      }
      assert(e2.getMessage.contains("resurrect"), e2.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gx.default.t")
      spark.conf.unset("spark.sql.catalog.gx")
      spark.conf.unset("spark.sql.catalog.gx.warehouse")
    }
  }

  test("SQL UPDATE and MERGE INTO are copy-on-write row-level operations") {
    val wh = java.nio.file.Files.createTempDirectory("graft_rlo_").toString
    spark.conf.set("spark.sql.catalog.gu", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gu.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gu.default.t (k INT, v DOUBLE, s STRING)")
      spark.sql("INSERT INTO gu.default.t VALUES (1, 10.0, 'a'), (2, 20.0, 'b'), (3, 30.0, 'c')")

      spark.sql("UPDATE gu.default.t SET v = v * 10, s = 'X' WHERE k = 2")
      val afterUpdate = spark.sql("SELECT k, v, s FROM gu.default.t").collect()
        .map(r => r.getInt(0) -> ((r.getDouble(1), r.getString(2)))).toMap
      assert(afterUpdate ==
        Map(1 -> ((10.0, "a")), 2 -> ((200.0, "X")), 3 -> ((30.0, "c"))))

      Seq((2, 999.0, "m"), (4, 40.0, "d")).toDF("k", "v", "s")
        .createOrReplaceTempView("merge_src")
      spark.sql(
        """MERGE INTO gu.default.t t USING merge_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val afterMerge = spark.sql("SELECT k, v FROM gu.default.t").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(afterMerge == Map(1 -> 10.0, 2 -> 999.0, 3 -> 30.0, 4 -> 40.0))

      // both mutations committed snapshots; pre-UPDATE version intact
      val io = TableIO(spark, wh)
      assert(io.versions("default.t").size >= 4)
      assert(spark.sql("SELECT v FROM gu.default.t VERSION AS OF 2 WHERE k = 2")
        .head().getDouble(0) == 20.0)
      spark.catalog.dropTempView("merge_src")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gu.default.t")
      spark.conf.unset("spark.sql.catalog.gu")
      spark.conf.unset("spark.sql.catalog.gu.warehouse")
    }
  }

  test("SELECT skips files whose footer stats exclude the predicate") {
    val wh = java.nio.file.Files.createTempDirectory("graft_skip_").toString
    spark.conf.set("spark.sql.catalog.gk", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gk.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gk.default.t (k INT, s STRING)")
      spark.sql("INSERT INTO gk.default.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO gk.default.t VALUES (100, 'x'), (200, 'y')")
      val io = TableIO(spark, wh)
      val total = io.catalog.manifest("default.t", io.versions("default.t").last).size
      assert(total >= 2)

      def pathsIn(sql: String): Int = {
        val df = spark.sql(sql)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        "InMemoryFileIndex\\((\\d+) paths\\)".r.findFirstMatchIn(p).map(_.group(1).toInt)
          .getOrElse(fail(s"no file index in plan:\n$p"))
      }
      // unfiltered: every manifest file is in the scan
      assert(pathsIn("SELECT * FROM gk.default.t") == total)
      // filtered: files whose k-range excludes 100 are skipped at plan time
      val pruned = pathsIn("SELECT * FROM gk.default.t WHERE k = 100")
      assert(pruned < total, s"expected stats skip, scanned $pruned/$total")
      // and the results are right
      assert(spark.sql("SELECT s FROM gk.default.t WHERE k = 100").as[String].head() == "x")
      assert(spark.sql("SELECT count(*) c FROM gk.default.t").head().getLong(0) == 4L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gk.default.t")
      spark.conf.unset("spark.sql.catalog.gk")
      spark.conf.unset("spark.sql.catalog.gk.warehouse")
    }
  }

  test("UPDATE is file-scoped: files the predicate cannot touch carry over verbatim") {
    val wh = java.nio.file.Files.createTempDirectory("graft_scoped_").toString
    spark.conf.set("spark.sql.catalog.gf", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gf.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gf.default.t (k INT, s STRING)")
      spark.sql("INSERT INTO gf.default.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")   // k in [1,3]
      spark.sql("INSERT INTO gf.default.t VALUES (100, 'x'), (101, 'y')")         // k in [100,101]
      val io = TableIO(spark, wh)
      val preVersion = io.versions("default.t").last
      val preManifest = io.catalog.manifest("default.t", preVersion).toSet
      val lowFiles = preManifest.filter { f =>
        // footer stats: the files whose k-range excludes 100
        val st = graft.io.FileStats.read(f, spark.sessionState.newHadoopConf())
        !graft.io.FileStats.mightMatch(st,
          Seq(org.apache.spark.sql.sources.EqualTo("k", 100)))
      }
      assert(lowFiles.nonEmpty && lowFiles != preManifest,
        s"fixture needs both prunable and matching files, got ${lowFiles.size}/${preManifest.size}")

      spark.sql("UPDATE gf.default.t SET s = 'XX' WHERE k = 100")
      val rows = spark.sql("SELECT k, s FROM gf.default.t").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(rows == Map(1 -> "a", 2 -> "b", 3 -> "c", 100 -> "XX", 101 -> "y"))

      val postManifest = io.catalog.manifest("default.t",
        io.versions("default.t").last).toSet
      // every k<100 file carried over by PATH (not rewritten) ...
      assert(lowFiles.subsetOf(postManifest),
        s"prunable files must carry over: ${lowFiles -- postManifest}")
      // ... and every file that might hold k=100 was replaced
      assert((preManifest -- lowFiles).intersect(postManifest).isEmpty,
        "matching files must be rewritten")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gf.default.t")
      spark.conf.unset("spark.sql.catalog.gf")
      spark.conf.unset("spark.sql.catalog.gf.warehouse")
    }
  }

  test("concurrent snapshot commits: one writer wins, the loser fails fast") {
    val wh = java.nio.file.Files.createTempDirectory("graft_race_").toString
    val io = TableIO(spark, wh)
    io.append(Seq((1, "a")).toDF("id", "s"), "default.r")
    // both writers read version 1 and race to commit version 2
    val v = io.catalog.currentVersion("default.r").get + 1
    io.catalog.commitSnapshotAt("default.r", Seq.empty, v)
    intercept[graft.io.ConcurrentCommitException] {
      io.catalog.commitSnapshotAt("default.r", Seq.empty, v)
    }
    assert(io.versions("default.r") == Seq(1, 2))
  }

  test("metadata tables: <table>.snapshots / .files / .history") {
    val wh = java.nio.file.Files.createTempDirectory("graft_meta_").toString
    spark.conf.set("spark.sql.catalog.gmd", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmd.warehouse", wh)
    try {
      val io = TableIO(spark, wh)
      io.append(Seq((1, "a")).toDF("k", "s"), "default.mt")
      io.append(Seq((2, "b")).toDF("k", "s"), "default.mt")
      val snaps = spark.sql("SELECT * FROM gmd.default.mt.snapshots ORDER BY version").collect()
      assert(snaps.map(_.getInt(0)).toSeq == Seq(1, 2))
      assert(snaps.last.getInt(2) > snaps.head.getInt(2), "append grows the file count")
      assert(snaps.forall(r => r.getLong(3) > 0L), "total_bytes populated")
      assert(snaps.forall(r => r.getTimestamp(1) != null))
      val files = spark.sql("SELECT file_path, size_bytes FROM gmd.default.mt.files").collect()
      assert(files.length == snaps.last.getInt(2))
      assert(files.forall(r => r.getString(0).endsWith(".parquet") && r.getLong(1) > 0))
      assert(spark.sql("SELECT count(*) c FROM gmd.default.mt.history").head().getLong(0) == 2L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gmd")
      spark.conf.unset("spark.sql.catalog.gmd.warehouse")
    }
  }

  test("CALL system procedures: expire_snapshots, remove_orphan_files, compact") {
    val wh = java.nio.file.Files.createTempDirectory("graft_proc_").toString
    spark.conf.set("spark.sql.catalog.gp", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gp.warehouse", wh)
    try {
      val io = TableIO(spark, wh)
      io.append(Seq((1, "a")).toDF("k", "s"), "default.m")
      io.overwrite(Seq((2, "b")).toDF("k", "s"), "default.m")
      io.overwrite(Seq((3, "c")).toDF("k", "s"), "default.m")
      assert(io.versions("default.m") == Seq(1, 2, 3))

      val expired = spark.sql("CALL gp.system.expire_snapshots('default.m', 1)")
        .collect().map(_.getInt(0)).toSeq
      assert(expired == Seq(1, 2))
      assert(io.versions("default.m") == Seq(3))

      // default age guard keeps just-written orphans (commit-in-flight
      // protection); older_than_ms=0 reclaims them immediately
      assert(spark.sql("CALL gp.system.remove_orphan_files('default.m')").collect().isEmpty)
      val deleted = spark.sql("CALL gp.system.remove_orphan_files('default.m', -1000)")
        .collect().map(_.getString(0))
      assert(deleted.nonEmpty, "files of expired snapshots must be reclaimed")
      assert(io.read("default.m").collect().map(_.getInt(0)).toSeq == Seq(3))

      // many small appends, then compact to one file
      (10 to 15).foreach(i => io.append(Seq((i, "x")).toDF("k", "s"), "default.m"))
      val res = spark.sql("CALL gp.system.compact('default.m')").head()
      assert(res.getLong(0) > res.getLong(1), s"compact must shrink file count: $res")
      assert(res.getLong(1) == 1L)
      assert(io.read("default.m").count() == 7)
    } finally {
      spark.conf.unset("spark.sql.catalog.gp")
      spark.conf.unset("spark.sql.catalog.gp.warehouse")
    }
  }

  test("multi-level namespaces: create, CTAS, list, drop cascade") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mlns_").toString
    spark.conf.set("spark.sql.catalog.gm", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gm.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE gm.teamx.raw")
      spark.sql("CREATE TABLE gm.teamx.raw.t AS SELECT 1 AS k, 'a' AS s")
      assert(spark.sql("SELECT k FROM gm.teamx.raw.t").as[Int].head() == 1)
      val nss = spark.sql("SHOW NAMESPACES IN gm.teamx").collect().map(_.getString(0))
      assert(nss.contains("teamx.raw"), nss.mkString(","))
      val tbls = spark.sql("SHOW TABLES IN gm.teamx.raw").collect().map(_.getString(1))
      assert(tbls.contains("t"), tbls.mkString(","))
      // the nested table is a table, not a namespace
      assert(!spark.sql("SHOW NAMESPACES IN gm.teamx.raw").collect()
        .map(_.getString(0)).contains("teamx.raw.t"))
      spark.sql("DROP NAMESPACE gm.teamx CASCADE")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "teamx")))
    } finally {
      spark.conf.unset("spark.sql.catalog.gm")
      spark.conf.unset("spark.sql.catalog.gm.warehouse")
    }
  }

  test("DROP NAMESPACE: stray non-table files fail cleanly without cascade, sweep with it") {
    val wh = java.nio.file.Files.createTempDirectory("graft_nsdrop_").toString
    spark.conf.set("spark.sql.catalog.gs", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gs.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE gs.scratch")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(wh, "scratch", "stray.txt"), "not a table")
      // surfaces as SCHEMA_NOT_EMPTY (NonEmptyNamespaceException), not
      // a raw DirectoryNotEmptyException
      val e = intercept[Exception] { spark.sql("DROP NAMESPACE gs.scratch") }
      assert(e.getMessage.contains("SCHEMA_NOT_EMPTY"), e.getMessage)
      spark.sql("DROP NAMESPACE gs.scratch CASCADE")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(wh, "scratch")))
    } finally {
      spark.conf.unset("spark.sql.catalog.gs")
      spark.conf.unset("spark.sql.catalog.gs.warehouse")
    }
  }

  test("ALTER COLUMN TYPE widens losslessly and metadata-only; lossy retypes refuse naming the rule") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wide_").toString
    spark.conf.set("spark.sql.catalog.gwid", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwid.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gwid.default.w1 (k INT, x FLOAT, amt DECIMAL(5,2))")
      spark.sql("INSERT INTO gwid.default.w1 VALUES (1, CAST(1.5 AS FLOAT), 12.34), " +
        "(2147483647, CAST(2.5 AS FLOAT), 99.99)")
      val io = TableIO(spark, wh)
      val before = io.catalog.manifest("default.w1",
        io.catalog.currentVersion("default.w1").get)
      spark.sql("ALTER TABLE gwid.default.w1 ALTER COLUMN k TYPE BIGINT")
      spark.sql("ALTER TABLE gwid.default.w1 ALTER COLUMN x TYPE DOUBLE")
      spark.sql("ALTER TABLE gwid.default.w1 ALTER COLUMN amt TYPE DECIMAL(12,2)")
      // metadata-only: no rewrite; old narrow files read under the
      // wide schema (Spark 4 parquet readers widen at scan time)
      assert(io.catalog.manifest("default.w1",
        io.catalog.currentVersion("default.w1").get) === before)
      spark.sql("INSERT INTO gwid.default.w1 VALUES (9999999999, 3.25, 12345678.90)")
      val got = spark.table("gwid.default.w1").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDecimal(2).toString))
      assert(got.toSeq === Seq((1L, 1.5, "12.34"),
        (2147483647L, 2.5, "99.99"), (9999999999L, 3.25, "12345678.90")))
      // point predicate across MIXED stat boxes (Integer footer stats
      // in old files, Long in the new one) stays exact
      assert(spark.sql("SELECT count(*) FROM gwid.default.w1 WHERE k = 9999999999")
        .collect().head.getLong(0) === 1L)
      // lossy retypes refuse: plain narrowing dies in Spark's own
      // analyzer (NOT_SUPPORTED_CHANGE_COLUMN); the shapes Spark's
      // looser up-cast lattice lets through (long->double loses above
      // 2^53, decimal SCALE changes re-render every value) die on our
      // lossless rule by name
      Seq("ALTER COLUMN k TYPE INT", "ALTER COLUMN x TYPE FLOAT",
        "ALTER COLUMN k TYPE DOUBLE", "ALTER COLUMN amt TYPE DECIMAL(12,4)")
        .foreach { ddl =>
          val e = intercept[Exception](spark.sql(s"ALTER TABLE gwid.default.w1 $ddl"))
          assert(e.getMessage.contains("lossless") ||
            e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), s"$ddl: ${e.getMessage}")
        }
      // layout-bearing columns refuse: their directory arithmetic
      // depends on the source type
      spark.sql("CREATE TABLE gwid.default.w2 (d DATE, v INT) PARTITIONED BY (days(d))")
      val e2 = intercept[Exception](
        spark.sql("ALTER TABLE gwid.default.w2 ALTER COLUMN d TYPE TIMESTAMP"))
      assert(e2.getMessage.contains("partition-spec source") ||
        e2.getMessage.contains("lossless"), e2.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.gwid")
      spark.conf.unset("spark.sql.catalog.gwid.warehouse")
    }
  }

  test("CHECK constraints: add validates existing rows, writes enforce in-pass, NULL passes, DROP clears") {
    val wh = java.nio.file.Files.createTempDirectory("graft_chk_").toString
    spark.conf.set("spark.sql.catalog.gchk", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gchk.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gchk.default.c1 (id BIGINT, qty INT)")
      spark.sql("INSERT INTO gchk.default.c1 VALUES (1, 5)")
      spark.sql("ALTER TABLE gchk.default.c1 ADD CONSTRAINT qty_pos CHECK (qty > 0)")
      // SQL inserts enforce through the reported constraint (Spark's
      // own CHECK_CONSTRAINT_VIOLATION path)
      val e1 = intercept[Exception](
        spark.sql("INSERT INTO gchk.default.c1 VALUES (2, -3)"))
      assert(e1.getMessage.contains("qty_pos"), e1.getMessage)
      // programmatic writes enforce in the SAME pass that writes
      // (TableIO.applyChecks assert_true guard) — nothing commits
      val io = TableIO(spark, wh)
      val v0 = io.catalog.currentVersion("default.c1").get
      val e2 = intercept[Exception](
        io.append(Seq((3L, -9)).toDF("id", "qty").coalesce(1), "default.c1"))
      def chain(x: Throwable): String = {
        def walk(c: Throwable): Seq[String] =
          if (c == null) Seq.empty else Option(c.getMessage).toSeq ++ walk(c.getCause)
        walk(x).mkString(" | ")
      }
      assert(chain(e2).contains("qty_pos"), chain(e2))
      assert(io.catalog.currentVersion("default.c1").get === v0,
        "a refused write must not commit a snapshot")
      // NULL passes (SQL CHECK semantics: only FALSE violates)
      spark.sql("INSERT INTO gchk.default.c1 VALUES (4, NULL)")
      assert(spark.table("gchk.default.c1").count() === 2L)
      // adding a constraint the data violates refuses up front
      val e3 = intercept[Exception](
        spark.sql("ALTER TABLE gchk.default.c1 ADD CONSTRAINT id_small CHECK (id < 2)"))
      assert(e3.getMessage.toLowerCase.contains("violat"), e3.getMessage)
      // constraints persist in meta and survive a fresh catalog read
      assert(io.catalog.readMeta("default.c1").checks === Map("qty_pos" -> "qty > 0"))
      // DROP/RENAME of a check-referenced column refuse by name — a
      // stale reference would break every future write's validation
      val e4 = intercept[Exception](
        spark.sql("ALTER TABLE gchk.default.c1 DROP COLUMN qty"))
      assert(e4.getMessage.contains("qty_pos"), e4.getMessage)
      val e5 = intercept[Exception](
        spark.sql("ALTER TABLE gchk.default.c1 RENAME COLUMN qty TO amount"))
      assert(e5.getMessage.contains("qty_pos"), e5.getMessage)
      // DROP CONSTRAINT clears enforcement
      spark.sql("ALTER TABLE gchk.default.c1 DROP CONSTRAINT qty_pos")
      spark.sql("INSERT INTO gchk.default.c1 VALUES (5, -1)")
      assert(spark.table("gchk.default.c1").count() === 3L)
      assert(io.catalog.readMeta("default.c1").checks.isEmpty)
    } finally {
      spark.conf.unset("spark.sql.catalog.gchk")
      spark.conf.unset("spark.sql.catalog.gchk.warehouse")
    }
  }

  test("column DEFAULT values: CREATE/ALTER defaults, INSERT omission, old files fill the default") {
    val wh = java.nio.file.Files.createTempDirectory("graft_dflt_").toString
    spark.conf.set("spark.sql.catalog.gdfl", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdfl.warehouse", wh)
    try {
      // CREATE TABLE with a declared default: omitted column, explicit
      // DEFAULT keyword, and explicit value all resolve
      spark.sql("CREATE TABLE gdfl.default.d1 (id BIGINT, tier STRING DEFAULT 'std')")
      spark.sql("INSERT INTO gdfl.default.d1 VALUES (1, 'gold')")
      spark.sql("INSERT INTO gdfl.default.d1 (id) VALUES (2)")
      spark.sql("INSERT INTO gdfl.default.d1 VALUES (3, DEFAULT)")
      assert(spark.table("gdfl.default.d1").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "gold"), (2L, "std"), (3L, "std")))

      // ALTER TABLE ADD COLUMN ... DEFAULT (Iceberg v3 initial
      // default): rows in files written BEFORE the column existed
      // serve the default, not null — no rewrite, metadata-only
      spark.sql("CREATE TABLE gdfl.default.d2 (id BIGINT)")
      spark.sql("INSERT INTO gdfl.default.d2 VALUES (10)")
      val io = TableIO(spark, wh)
      val filesBefore = io.catalog.manifest("default.d2",
        io.catalog.currentVersion("default.d2").get)
      spark.sql("ALTER TABLE gdfl.default.d2 ADD COLUMN score INT DEFAULT 7")
      assert(io.catalog.manifest("default.d2",
        io.catalog.currentVersion("default.d2").get) === filesBefore,
        "ADD COLUMN DEFAULT must be metadata-only")
      spark.sql("INSERT INTO gdfl.default.d2 (id) VALUES (11)") // current default
      spark.sql("INSERT INTO gdfl.default.d2 VALUES (12, 99)")
      assert(spark.table("gdfl.default.d2").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
        Seq((10L, 7), (11L, 7), (12L, 99)))
      // both defaults persist in the schema JSON (survive restarts)
      val json = io.catalog.readMeta("default.d2").schemaJson.get
      assert(json.contains("EXISTS_DEFAULT") && json.contains("CURRENT_DEFAULT"))
      // time travel reads under the CURRENT declared schema (the
      // documented Delta-style semantics here): the pre-ALTER snapshot
      // serves the default for the added column, not null
      val preAlterV = io.catalog.currentVersion("default.d2").get - 2 // before the two post-ALTER inserts
      val tt = spark.sql(s"SELECT id, score FROM gdfl.default.d2 VERSION AS OF $preAlterV")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(tt.toSeq === Seq((10L, 7)))
      // aggregates over the default-filled column stay value-correct
      // (old files carry no stats for it -> metadata path refuses)
      val agg = spark.sql(
        "SELECT count(score) AS c, min(score) AS mn FROM gdfl.default.d2").collect().head
      assert((agg.getLong(0), agg.getInt(1)) === ((3L, 7)))
    } finally {
      spark.conf.unset("spark.sql.catalog.gdfl")
      spark.conf.unset("spark.sql.catalog.gdfl.warehouse")
    }
  }
}
