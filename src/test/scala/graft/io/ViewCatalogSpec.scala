package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.TableIO

/** Persisted catalog VIEWs (DSv2 ViewCatalog + extension rules):
  * CREATE / OR REPLACE / IF NOT EXISTS, read-back through a fresh
  * catalog instance over the same warehouse, captured-context
  * resolution of bare table names, aliases, DROP / RENAME / SHOW
  * VIEWS / ALTER VIEW AS, view-on-view, CTE bodies, recursion and
  * collision refusals, temp-view precedence.
  */
class ViewCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_vwh_").toString
  private def registerCatalog(cname: String): TableIO = {
    spark.conf.set(s"spark.sql.catalog.$cname", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cname.warehouse", wh)
    TableIO(spark, wh)
  }
  private lazy val io: TableIO = {
    val io = registerCatalog("gvw")
    io.overwrite(Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("id", "s", "amt"), "default.vt")
    io
  }

  test("CREATE VIEW + SELECT + spark.table round-trip") {
    io
    spark.sql("CREATE VIEW gvw.default.v1 AS SELECT id, amt * 2 AS amt2 FROM gvw.default.vt WHERE id <= 2")
    val rows = spark.sql("SELECT * FROM gvw.default.v1 ORDER BY id").collect()
    assert(rows.map(r => (r.getInt(0), r.getDouble(1))).toSeq == Seq((1, 20.0), (2, 40.0)))
    assert(spark.table("gvw.default.v1").count() == 2)
    // qualified column reference through the view alias
    assert(spark.sql("SELECT v1.amt2 FROM gvw.default.v1 WHERE v1.id = 1").head().getDouble(0) == 20.0)
  }

  test("view persists: fresh catalog instance over the same warehouse resolves it") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vpersist AS SELECT count(*) AS n FROM gvw.default.vt")
    // a NEW catalog name = a brand-new GraftCatalog instance reading
    // the same warehouse root — nothing session-cached can answer this
    registerCatalog("gvw2")
    assert(spark.sql("SELECT n FROM gvw2.default.vpersist").head().getLong(0) == 3L)
  }

  test("CREATE OR REPLACE swaps the body; IF NOT EXISTS is a no-op; duplicate CREATE refuses") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.v2 AS SELECT 1 AS x")
    assert(spark.sql("SELECT x FROM gvw.default.v2").head().getInt(0) == 1)
    spark.sql("CREATE OR REPLACE VIEW gvw.default.v2 AS SELECT 42 AS x")
    assert(spark.sql("SELECT x FROM gvw.default.v2").head().getInt(0) == 42)
    spark.sql("CREATE VIEW IF NOT EXISTS gvw.default.v2 AS SELECT 7 AS x")
    assert(spark.sql("SELECT x FROM gvw.default.v2").head().getInt(0) == 42,
      "IF NOT EXISTS must not replace")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("CREATE VIEW gvw.default.v2 AS SELECT 8 AS x")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
  }

  test("column alias list renames the view's output") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.v3 (doc COMMENT 'the id', total) AS " +
      "SELECT id, amt FROM gvw.default.vt")
    val df = spark.table("gvw.default.v3")
    assert(df.columns.toSeq == Seq("doc", "total"))
    assert(df.agg(sum("total")).head().getDouble(0) == 60.0)
  }

  test("captured context: bare table names resolve under the CREATING session's catalog+namespace") {
    io
    val prevCat = spark.catalog.currentCatalog()
    spark.catalog.setCurrentCatalog("gvw")
    try {
      spark.sql("USE `default`")
      spark.sql("CREATE OR REPLACE VIEW vctx AS SELECT id, s FROM vt WHERE id = 3")
    } finally spark.catalog.setCurrentCatalog(prevCat)
    // reading session is back on the session catalog — the bare `vt`
    // inside the body must still mean gvw.default.vt
    val r = spark.sql("SELECT id, s FROM gvw.default.vctx").head()
    assert((r.getInt(0), r.getString(1)) == ((3, "c")))
  }

  test("view over view, and a CTE inside the body") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vbase AS " +
      "WITH big AS (SELECT * FROM gvw.default.vt WHERE amt >= 20.0) SELECT id, amt FROM big")
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vtop AS " +
      "SELECT sum(amt) AS total, count(*) AS n FROM gvw.default.vbase")
    val r = spark.sql("SELECT total, n FROM gvw.default.vtop").head()
    assert((r.getDouble(0), r.getLong(1)) == ((50.0, 2L)))
  }

  test("SHOW VIEWS lists stored views; pattern filters") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.swv_one AS SELECT 1 AS a")
    spark.sql("CREATE OR REPLACE VIEW gvw.default.swv_two AS SELECT 2 AS a")
    val all = spark.sql("SHOW VIEWS IN gvw.default").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(all.exists(_._2 == "swv_one") && all.exists(_._2 == "swv_two"))
    assert(all.forall(!_._3), "stored views are not temporary")
    val some = spark.sql("SHOW VIEWS IN gvw.default LIKE 'swv_*'").collect().map(_.getString(1))
    assert(some.toSet == Set("swv_one", "swv_two"))
  }

  test("ALTER VIEW ... AS replaces the query; missing view refuses") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.valter AS SELECT 1 AS a")
    spark.sql("ALTER VIEW gvw.default.valter AS SELECT max(id) AS a FROM gvw.default.vt")
    assert(spark.sql("SELECT a FROM gvw.default.valter").head().getInt(0) == 3)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("ALTER VIEW gvw.default.no_such_view AS SELECT 1 AS a")
    }
  }

  test("ALTER VIEW ... RENAME TO moves the view; old name gone; clobber refused") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vren_a AS SELECT 5 AS a")
    spark.sql("DROP VIEW IF EXISTS gvw.default.vren_b")
    spark.sql("ALTER VIEW gvw.default.vren_a RENAME TO gvw.default.vren_b")
    assert(spark.sql("SELECT a FROM gvw.default.vren_b").head().getInt(0) == 5)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT a FROM gvw.default.vren_a").collect()
    }
    // renaming onto an existing view refuses
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vren_c AS SELECT 6 AS a")
    val e = intercept[Exception] {
      spark.sql("ALTER VIEW gvw.default.vren_c RENAME TO gvw.default.vren_b")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
  }

  test("DROP VIEW removes; IF EXISTS tolerates absence; bare DROP refuses absence") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vdrop AS SELECT 1 AS a")
    spark.sql("DROP VIEW gvw.default.vdrop")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gvw.default.vdrop").collect()
    }
    spark.sql("DROP VIEW IF EXISTS gvw.default.vdrop") // no-op, no error
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DROP VIEW gvw.default.vdrop")
    }
  }

  test("recursion refused: a view whose body names itself fails the READ loudly") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vrec AS SELECT id FROM gvw.default.vt")
    // ALTER analyzes the OLD definition of vrec inside the new body —
    // legal at alter time; the self-reference bites on the next read
    spark.sql("ALTER VIEW gvw.default.vrec AS SELECT id FROM gvw.default.vrec")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gvw.default.vrec").collect()
    }
    info(s"exception: ${e.getClass.getName}: ${e.getMessage}")
    assert(e.getMessage.toLowerCase.contains("recursive"), e.getMessage)
  }

  test("name collisions: view may not shadow a table, table may not shadow a view") {
    io
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("CREATE VIEW gvw.default.vt AS SELECT 1 AS a")
    }
    assert(e1.getMessage.toLowerCase.contains("already exists"), e1.getMessage)
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vshadow AS SELECT 1 AS a")
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gvw.default.vshadow (x INT)")
    }
    assert(e2.getMessage.toLowerCase.contains("already exists"), e2.getMessage)
  }

  test("SHOW CREATE TABLE and DESCRIBE work on stored views; tables keep native paths") {
    io
    spark.sql("CREATE OR REPLACE VIEW gvw.default.vintro (total COMMENT 'sum') AS " +
      "SELECT sum(amt) FROM gvw.default.vt")
    val stmt = spark.sql("SHOW CREATE TABLE gvw.default.vintro").head().getString(0)
    assert(stmt.startsWith("CREATE VIEW gvw.default.vintro (total COMMENT 'sum')"), stmt)
    assert(stmt.contains("AS SELECT sum(amt) FROM gvw.default.vt"), stmt)
    val desc = spark.sql("DESCRIBE gvw.default.vintro").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(desc.toSeq == Seq(("total", "double")), desc.mkString(","))
    val ext = spark.sql("DESCRIBE EXTENDED gvw.default.vintro").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext.get("View Text").contains("SELECT sum(amt) FROM gvw.default.vt"))
    assert(ext.get("Catalog").contains("gvw"))
    // a TABLE still takes Spark's native v2 describe path
    val tdesc = spark.sql("DESCRIBE gvw.default.vt").collect().map(_.getString(0))
    assert(tdesc.contains("id") && tdesc.contains("amt"))
  }

  test("temp views keep precedence for short names; stored views don't leak into the session catalog") {
    io
    Seq((99, "tmp")).toDF("id", "s").createOrReplaceTempView("vprec")
    val prevCat = spark.catalog.currentCatalog()
    spark.catalog.setCurrentCatalog("gvw")
    try {
      spark.sql("USE `default`")
      spark.sql("CREATE OR REPLACE VIEW vprec_stored AS SELECT id FROM vt")
      // a short name that is a TEMP view resolves to the temp view,
      // not to catalog state — Spark precedence preserved
      assert(spark.sql("SELECT id FROM vprec").head().getInt(0) == 99)
      // DROP VIEW of the temp name drops the TEMP view
      spark.sql("DROP VIEW vprec")
      assert(!spark.catalog.tableExists("vprec"))
    } finally spark.catalog.setCurrentCatalog(prevCat)
    // the stored view is NOT visible as a session-catalog object
    assert(spark.sql("SHOW VIEWS").collect().forall(_.getString(1) != "vprec_stored"))
  }
}
