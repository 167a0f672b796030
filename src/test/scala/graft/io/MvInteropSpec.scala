package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-feature interop for materialized views: refresh across an
  * expired changelog window (loud failure + documented remedy),
  * a Hive-partitioned base (changelog over dir layouts), and a base
  * that schema-evolved under the MV (new column invisible to the
  * recipe, delta math unaffected).
  */
class MvInteropSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_mviwh_").toString
  private lazy val io: TableIO = {
    spark.conf.set(s"spark.sql.catalog.gmvi", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.gmvi.warehouse", wh)
    TableIO(spark, wh)
  }

  private def recompute(t: String): Seq[(String, Long, Double)] =
    io.read(s"default.$t").groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(30,2)")).cast("double").as("total"))
      .orderBy("grp").as[(String, Long, Double)].collect().toSeq

  private def mvContent(mv: String): Seq[(String, Long, Double)] =
    spark.table(s"gmvi.default.$mv").orderBy("grp")
      .select(col("grp"), col("n"), col("total"))
      .as[(String, Long, Double)].collect().toSeq

  test("refresh across an EXPIRED changelog window fails loudly; OR REPLACE is the remedy") {
    io.catalog.dropTable("default.mib1")
    io.overwrite(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "amt"),
      "default.mib1") // v1
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmvi.default.miv1 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmvi.default.mib1 GROUP BY grp")
    // several base commits, then expire history PAST the MV's marker:
    // the delta the refresh needs can no longer be diffed
    io.append(Seq((3L, "a", 5.0)).toDF("id", "grp", "amt"), "default.mib1") // v2
    io.append(Seq((4L, "b", 7.0)).toDF("id", "grp", "amt"), "default.mib1") // v3
    io.catalog.expireSnapshots("default.mib1", keepLast = 1)
    val e = intercept[Exception](
      spark.sql("CALL gmvi.system.refresh_mv('default.miv1')"))
    assert(e.getMessage.contains("expired"), e.getMessage)
    // the stale MV still SERVES its last refreshed state (availability
    // over freshness — same as Iceberg MV staleness semantics)
    assert(mvContent("miv1") == Seq(("a", 1L, 10.0), ("b", 1L, 20.0)))
    // remedy: OR REPLACE recomputes from the current snapshot and
    // re-pins the marker there
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmvi.default.miv1 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmvi.default.mib1 GROUP BY grp")
    assert(mvContent("miv1") == recompute("mib1"))
    // and incremental refresh works again from the new marker
    io.append(Seq((5L, "a", 1.0)).toDF("id", "grp", "amt"), "default.mib1")
    spark.sql("CALL gmvi.system.refresh_mv('default.miv1')")
    assert(mvContent("miv1") == recompute("mib1"))
  }

  test("MV over a Hive-partitioned base: changelog refresh through the dir layout") {
    io.catalog.dropTable("default.mib2")
    io.overwrite((1 to 30).map(i => (i.toLong, s"g${i % 3}", i * 1.0, i % 4))
      .toDF("id", "grp", "amt", "p"), "default.mib2", partitionCols = Seq("p"))
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmvi.default.miv2 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmvi.default.mib2 GROUP BY grp")
    io.append(Seq((100L, "g0", 9.0, 1), (101L, "g1", 8.0, 2))
      .toDF("id", "grp", "amt", "p"), "default.mib2", partitionCols = Seq("p"))
    io.deleteWhere("default.mib2", col("p") === 3) // partition-aligned COW delete
    val r = spark.sql("CALL gmvi.system.refresh_mv('default.miv2')").head()
    assert(r.getLong(2) > 0L)
    assert(mvContent("miv2") == recompute("mib2"))
  }

  test("MV survives base schema evolution: a new column is invisible to the recipe") {
    io.catalog.dropTable("default.mib3")
    io.overwrite(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "amt"),
      "default.mib3")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmvi.default.miv3 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmvi.default.mib3 GROUP BY grp")
    // evolve the base THROUGH a MERGE the MV never sees
    Seq((3L, "a", 7.0, "tagged")).toDF("id", "grp", "amt", "note")
      .createOrReplaceTempView("mi3_src")
    try spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gmvi.default.mib3 t USING mi3_src s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    finally spark.catalog.dropTempView("mi3_src")
    spark.sql("CALL gmvi.system.refresh_mv('default.miv3')")
    assert(mvContent("miv3") == recompute("mib3"))
    // the MV's served schema is unchanged (its recipe's columns only)
    assert(spark.table("gmvi.default.miv3").columns.toSeq == Seq("grp", "n", "total"))
  }
}
