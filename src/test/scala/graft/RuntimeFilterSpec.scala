package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.io.{GraftCatalog, TableIO}

/** DSv2 runtime filtering (dynamic partition pruning) on graft scans:
  * a join against a filtered dimension injects the build side's key
  * set at execution time, and the fact scan drops whole files via the
  * same metadata the plan-time skip uses — hidden-transform path
  * arithmetic and bloom indexes. The star join scans only the files
  * that can hold the surviving keys.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withCat(cat: String)(body: TableIO => Unit): Unit = {
    val wh = Files.createTempDirectory("graft_rf_").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(TableIO(spark, wh)) finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  private def runtimeSkipOf(df: DataFrame): Option[(Int, Int)] = {
    df.collect() // execute: runtime filters fire during execution
    // per-scan probe from THIS query's executed plan (no JVM global)
    graft.io.RuntimeSkipProbe.ofExecuted(df).headOption
  }

  /** These fixtures are too small for the broadcast-reuse heuristic:
    * under AQE the DPP planner only keeps the filter when it can reuse
    * the join's broadcast stage, and on these toy plans it degenerates
    * to `dynamicpruningexpression(true)`. Let DPP build its own
    * subquery instead — the SCAN-side mechanics under test are
    * identical either way.
    */
  private def withOwnSideDpp[A](body: => A): A = {
    val key = "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("a filtered dim join runtime-prunes hidden-layout fact files by path arithmetic") {
    withCat("gxrf") { io => withOwnSideDpp {
      val t = "default.fact_days"
      spark.sql(s"CREATE TABLE gxrf.$t (d DATE, v BIGINT) PARTITIONED BY (days(d))")
      val facts = (0 until 20).map(i =>
        (java.sql.Date.valueOf(s"2024-01-${1 + i % 10}"), i.toLong))
        .toDF("d", "v")
      io.append(facts, t)
      val nFiles = io.catalog.manifest(t, io.catalog.currentVersion(t).get).size
      assert(nFiles >= 10, s"expect one file per day-dir, got $nFiles")

      // the dim must be FILE-backed: a LocalRelation's filter constant-
      // folds away (ConvertToLocalRelation) and DPP then sees no
      // selective build-side predicate to justify the injection
      io.append(Seq((java.sql.Date.valueOf("2024-01-03"), "x"),
        (java.sql.Date.valueOf("2024-01-07"), "x"),
        (java.sql.Date.valueOf("2024-01-05"), "y"))
        .toDF("dd", "tag"), "default.dim_days")
      val joined = spark.table("gxrf.default.fact_days")
        .join(spark.table("gxrf.default.dim_days").filter(col("tag") === "x"),
          col("d") === col("dd"))
      val skip = runtimeSkipOf(joined)
      assert(skip.isDefined, "the fact scan must receive a runtime filter:\n" +
        joined.queryExecution.executedPlan.toString)
      val (kept, total) = skip.get
      assert(kept < total, s"runtime filter kept $kept of $total files")
      // correctness: same rows as the statically-filtered equivalent
      val expect = facts.filter(col("d").isin("2024-01-03", "2024-01-07"))
        .select("v").as[Long].collect().sorted.toSeq
      assert(joined.select("v").as[Long].collect().sorted.toSeq === expect)
    } }
  }

  test("a bloom-indexed key join runtime-prunes files that range stats cannot") {
    withCat("gxrb") { io => withOwnSideDpp {
      val t = "default.fact_bloom"
      // scattered keys: every file spans the full id range, so min/max
      // skip nothing — only the bloom can drop files
      (0 until 8).foreach { shard =>
        io.append((0 until 50).map(i => (i.toLong * 8 + shard, s"r${shard}_$i"))
          .toDF("id", "s").coalesce(1), t)
      }
      io.addBloomIndex(t, "id")
      io.append(Seq((16L, "x"), (24L, "x"), (33L, "y")).toDF("did", "tag"),
        "default.dim_keys")
      val joined = spark.table("gxrb.default.fact_bloom")
        .join(spark.table("gxrb.default.dim_keys").filter(col("tag") === "x"),
          col("id") === col("did"))
      val skip = runtimeSkipOf(joined)
      assert(skip.isDefined, "the fact scan must receive a runtime filter:\n" +
        joined.queryExecution.executedPlan.toString)
      val (kept, total) = skip.get
      assert(total === 8 && kept <= 2, s"bloom runtime skip kept $kept of $total")
      assert(joined.select("s").as[String].collect().toSet === Set("r0_2", "r0_3"))
    } }
  }
}
