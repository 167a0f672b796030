package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Materialized views: CREATE/REFRESH/DROP DDL, incremental refresh
  * off the base table's changelog (maintained state == full recompute
  * after appends, COW deletes, MOR deletes), staleness metadata,
  * hidden-count group liveness, the streaming maintenance twin, the
  * maintainability refusals, and the r19-advice view guards (write
  * targets, schema drift, MV-vs-plain-view DDL routing).
  */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_mvwh_").toString
  private lazy val io: TableIO = {
    spark.conf.set(s"spark.sql.catalog.gmv", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.gmv.warehouse", wh)
    TableIO(spark, wh)
  }

  private def freshBase(t: String, n: Int = 40): Unit = {
    io.catalog.dropTable(t)
    io.overwrite((1 to n).map(i =>
      (i.toLong, s"g${i % 4}", (i * 10).toDouble, i % 3)).toDF("id", "grp", "amt", "m"), t)
  }

  private def mvContent(mv: String): Seq[(String, Long, Double)] =
    spark.table(s"gmv.default.$mv").orderBy("grp")
      .select(col("grp"), col("n"), col("total"))
      .as[(String, Long, Double)].collect().toSeq

  private def recompute(t: String): Seq[(String, Long, Double)] =
    io.read(s"default.$t").groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(30,2)")).cast("double").as("total"))
      .orderBy("grp").as[(String, Long, Double)].collect().toSeq

  private def refreshedVersion(mv: String): Int =
    ViewStore.load(wh, s"default.$mv").get
      .properties(MaterializedViews.PropRefreshedVersion).toInt

  test("create computes the summary; reads serve it; staleness marker pins the base version") {
    freshBase("default.mvb1")
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv1 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb1 GROUP BY grp")
    assert(mvContent("mv1") == recompute("mvb1"))
    assert(refreshedVersion("mv1") == io.catalog.currentVersion("default.mvb1").get)
    // the read plan scans the BACKING table, not the base — pure
    // summary-table read, the O(groups)-not-O(base) serving shape
    val plan = spark.table("gmv.default.mv1").queryExecution.optimizedPlan.toString
    assert(plan.contains("__mv_mv1") && !plan.toLowerCase.contains("mvb1"),
      s"MV read must hit the backing table only:\n$plan")
  }

  test("refresh applies append + COW delete + MOR delete incrementally; matches recompute exactly") {
    freshBase("default.mvb2")
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv2 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb2 GROUP BY grp")
    val v0 = refreshedVersion("mv2")
    io.append(Seq((100L, "g9", 5.5, 0), (101L, "g0", 6.5, 1))
      .toDF("id", "grp", "amt", "m"), "default.mvb2")
    io.deleteWhere("default.mvb2", col("id") % 5 === 0) // COW
    io.deleteWhereMOR("default.mvb2", col("id") === 3L) // MOR position delete
    // stale until refreshed
    assert(mvContent("mv2") != recompute("mvb2"))
    val r = spark.sql("CALL gmv.system.refresh_mv('default.mv2')").head()
    assert(r.getInt(0) == v0)
    assert(r.getInt(1) == io.catalog.currentVersion("default.mvb2").get)
    assert(r.getLong(2) > 0L)
    assert(mvContent("mv2") == recompute("mvb2"))
    assert(refreshedVersion("mv2") == r.getInt(1))
    // idempotent: nothing new => no-op, marker unchanged
    val r2 = spark.sql("CALL gmv.system.refresh_mv('default.mv2')").head()
    assert(r2.getLong(2) == 0L && r2.getInt(0) == r2.getInt(1))
  }

  test("REFRESH MATERIALIZED VIEW sugar routes to the procedure") {
    freshBase("default.mvb3", n = 12)
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv3 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb3 GROUP BY grp")
    io.append(Seq((200L, "g1", 1.0, 0)).toDF("id", "grp", "amt", "m"), "default.mvb3")
    val out = spark.sql("REFRESH MATERIALIZED VIEW gmv.default.mv3").head()
    assert(out.getLong(2) == 1L)
    assert(mvContent("mv3") == recompute("mvb3"))
  }

  test("WHERE predicate filters both the initial compute and every delta") {
    freshBase("default.mvb4")
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv4 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb4 " +
      "WHERE m <> 1 GROUP BY grp")
    io.append(Seq((300L, "g2", 9.0, 1), (301L, "g2", 4.0, 0))
      .toDF("id", "grp", "amt", "m"), "default.mvb4") // only id=301 passes the pred
    spark.sql("CALL gmv.system.refresh_mv('default.mv4')")
    val expect = io.read("default.mvb4").filter(col("m") =!= 1)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(30,2)")).cast("double").as("total"))
      .orderBy("grp").as[(String, Long, Double)].collect().toSeq
    assert(mvContent("mv4") == expect)
  }

  test("hidden count: an MV without count(*) still drops groups whose count reaches zero") {
    io.catalog.dropTable("default.mvb5")
    io.overwrite(Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("id", "grp", "amt"), "default.mvb5")
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv5 AS " +
      "SELECT grp, sum(amt) AS total FROM gmv.default.mvb5 GROUP BY grp")
    assert(spark.table("gmv.default.mv5").columns.toSeq == Seq("grp", "total"))
    io.deleteWhere("default.mvb5", col("grp") === "b") // group b dies
    spark.sql("CALL gmv.system.refresh_mv('default.mv5')")
    val got = spark.table("gmv.default.mv5").orderBy("grp")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 30.0)))
  }

  test("integral and decimal sums keep their original result types") {
    io.catalog.dropTable("default.mvb6")
    io.overwrite(Seq((1L, "a", 10, BigDecimal("1.25")), (2L, "a", 20, BigDecimal("2.50")))
      .toDF("id", "grp", "qty", "dec"), "default.mvb6")
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv6 AS " +
      "SELECT grp, count(*) AS n, sum(qty) AS sq, sum(dec) AS sd " +
      "FROM gmv.default.mvb6 GROUP BY grp")
    val df = spark.table("gmv.default.mv6")
    val byName = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(byName("sq") == "bigint", byName.toString)
    assert(byName("sd").startsWith("decimal"), byName.toString)
    val row = df.head()
    assert(row.getAs[Long]("sq") == 30L)
    assert(row.getAs[java.math.BigDecimal]("sd").doubleValue() == 3.75)
  }

  test("streaming twin maintains the MV per changelog micro-batch and advances the marker") {
    freshBase("default.mvb7", n = 20)
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv7 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb7 GROUP BY grp")
    io.append(Seq((400L, "g3", 7.0, 0)).toDF("id", "grp", "amt", "m"), "default.mvb7")
    io.deleteWhere("default.mvb7", col("id") <= 2)
    val g = spark.sessionState.catalogManager.catalog("gmv").asInstanceOf[GraftCatalog]
    val q = MaterializedViews.maintainStream(spark, g, "default.mv7",
      java.nio.file.Files.createTempDirectory("graft_mvck_").toString)
    q.awaitTermination()
    assert(mvContent("mv7") == recompute("mvb7"))
    assert(refreshedVersion("mv7") == io.catalog.currentVersion("default.mvb7").get)
  }

  test("refusals: every non-self-maintainable shape dies loudly at CREATE") {
    freshBase("default.mvb8", n = 8)
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(needle), s"$sql =>\n${e.getMessage}")
    }
    refuses("CREATE MATERIALIZED VIEW gmv.default.bad1 AS " +
      "SELECT grp, max(amt) AS mx FROM gmv.default.mvb8 GROUP BY grp",
      "not self-maintainable")
    refuses("CREATE MATERIALIZED VIEW gmv.default.bad2 AS " +
      "SELECT grp, count(DISTINCT id) AS d FROM gmv.default.mvb8 GROUP BY grp",
      "not self-maintainable")
    refuses("CREATE MATERIALIZED VIEW gmv.default.bad3 AS " +
      "SELECT grp, avg(amt) AS a FROM gmv.default.mvb8 GROUP BY grp",
      "not self-maintainable")
    refuses("CREATE MATERIALIZED VIEW gmv.default.bad4 AS " +
      "SELECT a.grp, count(*) AS n FROM gmv.default.mvb8 a " +
      "JOIN gmv.default.mvb8 b ON a.id = b.id GROUP BY a.grp",
      "one graft catalog table")
    refuses("CREATE MATERIALIZED VIEW gmv.default.bad5 AS " +
      "SELECT upper(grp) AS g, count(*) AS n FROM gmv.default.mvb8 GROUP BY upper(grp)",
      "bare base columns")
    refuses("CREATE MATERIALIZED VIEW gmv.default.bad6 AS " +
      "SELECT id FROM gmv.default.mvb8",
      "GROUP BY aggregate")
    refuses("CREATE MATERIALIZED VIEW gmv.default.bad7 AS " +
      "SELECT grp AS renamed, count(*) AS n FROM gmv.default.mvb8 GROUP BY grp",
      "may not be re-aliased")
  }

  test("DDL routing: DROP VIEW refuses an MV, ALTER VIEW AS refuses an MV, DROP MATERIALIZED VIEW removes view + backing") {
    freshBase("default.mvb9", n = 8)
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv9 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb9 GROUP BY grp")
    val e1 = intercept[Exception](spark.sql("DROP VIEW gmv.default.mv9"))
    assert(e1.getMessage.contains("DROP MATERIALIZED VIEW"))
    val e2 = intercept[Exception](spark.sql(
      "ALTER VIEW gmv.default.mv9 AS SELECT grp, count(*) AS n FROM gmv.default.mvb9 GROUP BY grp"))
    assert(e2.getMessage.contains("CREATE OR REPLACE MATERIALIZED VIEW"))
    // plain views refuse the MV statement symmetrically
    spark.sql("CREATE VIEW gmv.default.pv9 AS SELECT grp FROM gmv.default.mvb9")
    val e3 = intercept[Exception](spark.sql("DROP MATERIALIZED VIEW gmv.default.pv9"))
    assert(e3.getMessage.contains("use DROP VIEW"))
    spark.sql("DROP VIEW gmv.default.pv9")
    assert(io.tableExists("default.__mv_mv9"))
    spark.sql("DROP MATERIALIZED VIEW gmv.default.mv9")
    assert(!io.tableExists("default.__mv_mv9"))
    assert(!ViewStore.exists(wh, "default.mv9"))
    // IF EXISTS tolerates absence; bare form refuses
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS gmv.default.mv9")
    val e4 = intercept[Exception](spark.sql("DROP MATERIALIZED VIEW gmv.default.mv9"))
    assert(e4.getMessage.contains("not found"))
  }

  test("CREATE OR REPLACE recomputes; plain CREATE refuses an existing MV") {
    freshBase("default.mvb10", n = 10)
    spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv10 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb10 GROUP BY grp")
    val e = intercept[Exception](spark.sql("CREATE MATERIALIZED VIEW gmv.default.mv10 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb10 GROUP BY grp"))
    assert(e.getMessage.contains("already exists"))
    io.append(Seq((500L, "g0", 2.0, 0)).toDF("id", "grp", "amt", "m"), "default.mvb10")
    // IF NOT EXISTS: no-op against the live MV (stale content stays)
    spark.sql("CREATE MATERIALIZED VIEW IF NOT EXISTS gmv.default.mv10 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb10 GROUP BY grp")
    assert(mvContent("mv10") != recompute("mvb10"), "IF NOT EXISTS must not recompute")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmv.default.mv10 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.mvb10 GROUP BY grp")
    assert(mvContent("mv10") == recompute("mvb10"))
  }

  test("write-target guard: INSERT/UPDATE/DELETE/MERGE into any stored view refuse cleanly") {
    freshBase("default.mvb11", n = 6)
    spark.sql("CREATE OR REPLACE VIEW gmv.default.wv AS SELECT id, grp FROM gmv.default.mvb11")
    def expectViewError(sql: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql))
      assert(e.getCondition != null && e.getCondition.startsWith("EXPECT_TABLE_NOT_VIEW"),
        s"$sql =>\n${e.getMessage}")
    }
    expectViewError("INSERT INTO gmv.default.wv VALUES (99, 'x')")
    expectViewError("DELETE FROM gmv.default.wv WHERE id = 1")
    expectViewError("UPDATE gmv.default.wv SET grp = 'x' WHERE id = 1")
    expectViewError("MERGE INTO gmv.default.wv t USING gmv.default.mvb11 s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET grp = s.grp")
  }

  test("schema drift: a column added under SELECT * fails the view read with the standard error") {
    io.catalog.dropTable("default.drift")
    io.overwrite(Seq((1L, "a")).toDF("id", "s"), "default.drift")
    spark.sql("CREATE OR REPLACE VIEW gmv.default.dv AS SELECT * FROM gmv.default.drift")
    assert(spark.table("gmv.default.dv").columns.toSeq == Seq("id", "s"))
    spark.sql("ALTER TABLE gmv.default.drift ADD COLUMN extra INT")
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.table("gmv.default.dv").collect())
    assert(e.getCondition == "INCOMPATIBLE_VIEW_SCHEMA_CHANGE", e.getMessage)
    // re-creating the view clears it (the error's own suggestion)
    spark.sql("CREATE OR REPLACE VIEW gmv.default.dv AS SELECT * FROM gmv.default.drift")
    assert(spark.table("gmv.default.dv").columns.toSeq == Seq("id", "s", "extra"))
  }

  test("SET NOT NULL on a non-graft table keeps its native error path (no procedure hijack)") {
    spark.sql("DROP TABLE IF EXISTS spark_catalog.default.plain_t")
    spark.sql("CREATE TABLE spark_catalog.default.plain_t (id INT) USING parquet")
    try {
      val e = intercept[Exception](
        spark.sql("ALTER TABLE spark_catalog.default.plain_t ALTER COLUMN id SET NOT NULL"))
      assert(!e.getMessage.contains("procedure not found"),
        s"session-catalog ALTER must not be rewritten to a graft CALL:\n${e.getMessage}")
    } finally spark.sql("DROP TABLE IF EXISTS spark_catalog.default.plain_t")
  }

  test("refresh cost is O(delta): a 10x-larger base with the same delta reads ~the same bytes") {
    // task-level input-bytes listener: the public metrics surface
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    def bytesForRefresh(t: String, mv: String, baseRows: Int): Long = {
      io.catalog.dropTable(s"default.$t")
      io.overwrite((1 to baseRows).map(i =>
        (i.toLong, s"g${i % 4}", (i * 10).toDouble, i % 3)).toDF("id", "grp", "amt", "m"),
        s"default.$t")
      spark.sql(s"CREATE OR REPLACE MATERIALIZED VIEW gmv.default.$mv AS " +
        s"SELECT grp, count(*) AS n, sum(amt) AS total FROM gmv.default.$t GROUP BY grp")
      io.append(Seq((baseRows + 1L, "g0", 1.0, 0)).toDF("id", "grp", "amt", "m"),
        s"default.$t")
      bytes.set(0)
      spark.sparkContext.addSparkListener(listener)
      try {
        spark.sql(s"CALL gmv.system.refresh_mv('default.$mv')").collect()
        Thread.sleep(800) // listener events drain asynchronously
      } finally spark.sparkContext.removeSparkListener(listener)
      bytes.get()
    }
    val small = bytesForRefresh("probe_s", "mvp_s", 1000)
    val large = bytesForRefresh("probe_l", "mvp_l", 10000)
    // the delta (1 row) and the summary (4 groups) are identical; the
    // only growth driver would be a base rescan — refuse > 3x drift
    assert(large < 3 * math.max(small, 1L),
      s"refresh read $small bytes at 1k rows but $large at 10k — base-proportional")
  }
}
