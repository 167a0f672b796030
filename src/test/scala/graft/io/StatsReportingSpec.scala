package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planner statistics from the catalog scan (r19 verdict item 5): the
  * batch scan reports manifest-exact row counts and file-derived
  * sizes through `SupportsReportStatistics`, so the broadcast-join
  * threshold fires on a small catalog dimension WITHOUT a hint at
  * default thresholds — before AQE ever sees runtime sizes.
  */
class StatsReportingSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_stwh_").toString
  private lazy val io: TableIO = {
    spark.conf.set(s"spark.sql.catalog.gstat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.gstat.warehouse", wh)
    TableIO(spark, wh)
  }

  private def fresh(): Unit = {
    io.catalog.dropTable("default.dim_small")
    io.catalog.dropTable("default.fact_big")
    io.overwrite((1 to 50).map(i => (i.toLong, s"seg_${i % 5}"))
      .toDF("dim_id", "seg"), "default.dim_small")
    io.overwrite((1 to 20000).map(i => (i.toLong, (i % 50 + 1).toLong, i * 1.0))
      .toDF("row_id", "dim_id", "v").repartition(4), "default.fact_big")
  }

  test("scan relation reports manifest-exact row counts to the optimizer") {
    fresh()
    val df = spark.table("gstat.default.dim_small")
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(50)),
      s"expected exact rowCount 50 from the manifest, got ${stats.rowCount}")
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 1000000L,
      s"a 50-row dim must report a small finite size, got ${stats.sizeInBytes}")
  }

  test("small catalog dim broadcasts WITHOUT a hint at the default threshold") {
    fresh()
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
    val joined = spark.table("gstat.default.fact_big")
      .join(spark.table("gstat.default.dim_small"), "dim_id")
      .groupBy("seg").agg(sum(col("v")).as("sv"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the 50-row dim must broadcast with no hint:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(joined.count() == 5)
  }

  test("a filter-pruned scan reports the SURVIVING files' rows, not the table's") {
    io.catalog.dropTable("default.parted")
    io.overwrite((1 to 1000).map(i => (i.toLong, i % 4, i * 2.0))
      .toDF("id", "p", "v"), "default.parted", partitionCols = Seq("p"))
    val pruned = spark.table("gstat.default.parted").filter(col("p") === 1)
    val stats = pruned.queryExecution.optimizedPlan.collectLeaves().head.stats
    assert(stats.rowCount.exists(_ <= BigInt(250)),
      s"partition-pruned scan must report the pruned row count, got ${stats.rowCount}")
  }
}
