package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transparent MV query rewrite: a matching GROUP BY aggregate over a
  * base table is served from its FRESH materialized view's backing
  * table (plan-asserted O(groups) scan, no base table, no shuffle),
  * gated hard on freshness and exact shape — every mismatch case must
  * leave the plan untouched and every rewritten answer must equal the
  * direct computation.
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_mrwwh_").toString
  private lazy val io: TableIO = {
    spark.conf.set(s"spark.sql.catalog.gmrw", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.gmrw.warehouse", wh)
    TableIO(spark, wh)
  }

  // amt is DECIMAL: the rewrite REFUSES to serve floating-point sums
  // (the backing store quantizes double measures — "can miss, never
  // lie"), so the rewrite-eligible fixture measure is exact-typed
  private def fresh(t: String, n: Int = 60): Unit = {
    io.catalog.dropTable(t)
    io.overwrite((1 to n).map(i => (i.toLong, s"g${i % 4}", (i * 10).toDouble, i % 3))
      .toDF("id", "grp", "amt", "m")
      .withColumn("amt", col("amt").cast("decimal(12,2)")), t)
  }

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.optimizedPlan.toString

  test("exact-match aggregate serves from the backing table; values equal direct compute") {
    fresh("default.rwb1")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw1 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmrw.default.rwb1 GROUP BY grp")
    val q = "SELECT grp, count(*) AS c, sum(amt) AS s FROM gmrw.default.rwb1 GROUP BY grp"
    val plan = planOf(q)
    assert(plan.contains("__mv_rw1") && !plan.contains("rwb1"),
      s"fresh MV must answer the aggregate:\n$plan")
    assert(!plan.contains("Aggregate"), s"no aggregation left to run:\n$plan")
    val got = spark.sql(q).orderBy("grp")
      .selectExpr("grp", "c", "CAST(s AS DOUBLE) AS s")
      .as[(String, Long, Double)].collect().toSeq
    val direct = io.read("default.rwb1").groupBy(col("grp"))
      .agg(count(lit(1)).as("c"),
        sum(col("amt").cast("decimal(30,2)")).cast("double").as("s"))
      .orderBy("grp").as[(String, Long, Double)].collect().toSeq
    assert(got == direct)
  }

  test("a SUBSET of the MV's aggregates under different aliases still rewrites") {
    fresh("default.rwb2")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw2 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmrw.default.rwb2 GROUP BY grp")
    val plan = planOf("SELECT grp, sum(amt) AS just_total FROM gmrw.default.rwb2 GROUP BY grp")
    assert(plan.contains("__mv_rw2") && !plan.contains("rwb2"), plan)
  }

  test("STALE MV never answers: base moved past the marker -> plan keeps the base aggregate") {
    fresh("default.rwb3")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw3 AS " +
      "SELECT grp, count(*) AS n FROM gmrw.default.rwb3 GROUP BY grp")
    io.append(Seq((999L, "g0", 1.0, 0)).toDF("id", "grp", "amt", "m")
      .withColumn("amt", col("amt").cast("decimal(12,2)")), "default.rwb3")
    val q = "SELECT grp, count(*) AS c FROM gmrw.default.rwb3 GROUP BY grp"
    val plan = planOf(q)
    assert(plan.contains("rwb3") && !plan.contains("__mv_rw3"),
      s"a stale MV must not serve:\n$plan")
    // the fresh answer includes the new row the MV hasn't seen
    assert(spark.sql(q).filter(col("grp") === "g0").head().getLong(1) == 16L)
    // refresh restores the rewrite
    spark.sql("CALL gmrw.system.refresh_mv('default.rw3')")
    assert(planOf(q).contains("__mv_rw3"))
  }

  test("time travel rewrites only at the exact version the MV covers") {
    fresh("default.rwb4")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw4 AS " +
      "SELECT grp, count(*) AS n FROM gmrw.default.rwb4 GROUP BY grp") // marker = v1
    io.append(Seq((999L, "g0", 1.0, 0)).toDF("id", "grp", "amt", "m")
      .withColumn("amt", col("amt").cast("decimal(12,2)")), "default.rwb4") // v2
    val atV1 = planOf(
      "SELECT grp, count(*) AS c FROM gmrw.default.rwb4 VERSION AS OF 1 GROUP BY grp")
    assert(atV1.contains("__mv_rw4"), s"v1 is exactly what the MV covers:\n$atV1")
    val atV2 = planOf(
      "SELECT grp, count(*) AS c FROM gmrw.default.rwb4 VERSION AS OF 2 GROUP BY grp")
    assert(!atV2.contains("__mv_rw4"), s"v2 is past the marker:\n$atV2")
  }

  test("mismatches never rewrite: different predicate, different keys, unsupported aggregate") {
    fresh("default.rwb5")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw5 AS " +
      "SELECT grp, count(*) AS n FROM gmrw.default.rwb5 WHERE m <> 1 GROUP BY grp")
    // same shape + same predicate DOES rewrite (the control)
    assert(planOf("SELECT grp, count(*) AS c FROM gmrw.default.rwb5 WHERE m <> 1 GROUP BY grp")
      .contains("__mv_rw5"))
    // different predicate
    assert(!planOf("SELECT grp, count(*) AS c FROM gmrw.default.rwb5 WHERE m <> 2 GROUP BY grp")
      .contains("__mv_rw5"))
    // no predicate
    assert(!planOf("SELECT grp, count(*) AS c FROM gmrw.default.rwb5 GROUP BY grp")
      .contains("__mv_rw5"))
    // different keys
    assert(!planOf("SELECT m, count(*) AS c FROM gmrw.default.rwb5 WHERE m <> 1 GROUP BY m")
      .contains("__mv_rw5"))
    // aggregate the MV doesn't store
    assert(!planOf("SELECT grp, max(amt) AS mx FROM gmrw.default.rwb5 WHERE m <> 1 GROUP BY grp")
      .contains("__mv_rw5"))
    // sum over a column the MV doesn't cover
    assert(!planOf("SELECT grp, sum(id) AS si FROM gmrw.default.rwb5 WHERE m <> 1 GROUP BY grp")
      .contains("__mv_rw5"))
  }

  test("conf kill-switch disables the rewrite") {
    fresh("default.rwb6")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw6 AS " +
      "SELECT grp, count(*) AS n FROM gmrw.default.rwb6 GROUP BY grp")
    val q = "SELECT grp, count(*) AS c FROM gmrw.default.rwb6 GROUP BY grp"
    assert(planOf(q).contains("__mv_rw6"))
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(!planOf(q).contains("__mv_rw6"))
    finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
  }

  test("CREATE OR REPLACE still recomputes (its own definition must not self-match)") {
    fresh("default.rwb7")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw7 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmrw.default.rwb7 GROUP BY grp")
    io.append(Seq((500L, "g1", 3.0, 0)).toDF("id", "grp", "amt", "m")
      .withColumn("amt", col("amt").cast("decimal(12,2)")), "default.rwb7")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw7 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmrw.default.rwb7 GROUP BY grp")
    val got = spark.table("gmrw.default.rw7").orderBy("grp")
      .select(col("grp"), col("n"), col("total").cast("double").as("total"))
      .as[(String, Long, Double)].collect().toSeq
    val direct = io.read("default.rwb7").groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(30,2)")).cast("double").as("total"))
      .orderBy("grp").as[(String, Long, Double)].collect().toSeq
    assert(got == direct, "the replacement must cover the new row")
  }

  test("a plain view whose body matches the recipe is accelerated through expansion") {
    fresh("default.rwb8")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw8 AS " +
      "SELECT grp, count(*) AS n FROM gmrw.default.rwb8 GROUP BY grp")
    spark.sql("CREATE OR REPLACE VIEW gmrw.default.pv8 AS " +
      "SELECT grp, count(*) AS n FROM gmrw.default.rwb8 GROUP BY grp")
    val plan = planOf("SELECT * FROM gmrw.default.pv8")
    assert(plan.contains("__mv_rw8") && !plan.contains("rwb8"),
      s"view expansion should hit the MV rewrite:\n$plan")
  }

  test("a floating-point sum NEVER rewrites (quantized backing sum must not serve a plain sum(double))") {
    io.catalog.dropTable("default.rwb9")
    io.overwrite((1 to 40).map(i => (i.toLong, s"g${i % 4}", i * 10.0))
      .toDF("id", "grp", "amt"), "default.rwb9")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw9 AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total FROM gmrw.default.rwb9 GROUP BY grp")
    // count-only still serves (the MV itself is fine) ...
    assert(planOf("SELECT grp, count(*) AS c FROM gmrw.default.rwb9 GROUP BY grp")
      .contains("__mv_rw9"))
    // ... but the double-typed sum must MISS, never serve the
    // DECIMAL(30,2)-quantized stored sum in place of a direct sum
    val plan = planOf("SELECT grp, sum(amt) AS s FROM gmrw.default.rwb9 GROUP BY grp")
    assert(!plan.contains("__mv_rw9"), s"double sum must not rewrite:\n$plan")
  }

  test("no-MV fast path: analysis of an aggregate performs ZERO view-store listings") {
    io.catalog.dropTable("default.rwb10")
    io.overwrite((1 to 40).map(i => (i.toLong, s"g${i % 4}"))
      .toDF("id", "grp"), "default.rwb10")
    val q = "SELECT grp, count(*) AS c FROM gmrw.default.rwb10 GROUP BY grp"
    spark.sql(q).collect() // prime the mtime-validated cache
    val before = ViewStore.listCalls.sum()
    (1 to 5).foreach(_ => spark.sql(q).queryExecution.optimizedPlan)
    assert(ViewStore.listCalls.sum() == before,
      "analysis over an unchanged warehouse must not relist the view store")
    // a fresh CREATE in the same session invalidates (dir mtime moved)
    // and the rewrite serves immediately
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw10 AS " +
      "SELECT grp, count(*) AS n FROM gmrw.default.rwb10 GROUP BY grp")
    assert(planOf(q).contains("__mv_rw10"),
      "a CREATE after cached analyses must be picked up via mtime invalidation")
  }

  test("refresh is idempotent across the overwrite->marker crash window (no double-apply)") {
    io.catalog.dropTable("default.rwb11")
    io.overwrite((1 to 40).map(i => (i.toLong, s"g${i % 4}"))
      .toDF("id", "grp"), "default.rwb11")
    spark.sql("CREATE OR REPLACE MATERIALIZED VIEW gmrw.default.rw11 AS " +
      "SELECT grp, count(*) AS n FROM gmrw.default.rwb11 GROUP BY grp")
    io.append(Seq((100L, "g1"), (101L, "g2")).toDF("id", "grp"), "default.rwb11")
    // complete refresh, then REWIND the marker to simulate a crash
    // after the backing overwrite but before the marker replace
    spark.sql("CALL gmrw.system.refresh_mv('default.rw11')")
    val rec = ViewStore.load(wh, "default.rw11").get
    val rolledBack = rec.copy(properties =
      rec.properties + (MaterializedViews.PropRefreshedVersion -> "1"))
    ViewStore.replace(wh, "default.rw11", rolledBack)
    // the replayed refresh must detect the backing table's applied
    // stamp and only advance the marker — counts stay exact
    spark.sql("CALL gmrw.system.refresh_mv('default.rw11')")
    val got = spark.table("gmrw.default.rw11").orderBy("grp")
      .as[(String, Long)].collect().toSeq
    val direct = io.read("default.rwb11").groupBy(col("grp"))
      .agg(count(lit(1)).as("n")).orderBy("grp").as[(String, Long)].collect().toSeq
    assert(got == direct, s"replayed refresh must not double-apply: $got vs $direct")
  }
}
