package graft

import java.nio.file.Files

import graft.io.TableIO
import graft.jobs._

/** The five-job operational pipeline (reference: README.md:78-105):
  * run order, guard semantics (a missing prerequisite throws naming
  * the job to run — the mains translate that to exit(1)), and the
  * produced tables' shapes.
  */
class JobsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("jobs run in order against one warehouse; guards name the missing prerequisite") {
    val io = TableIO(spark, Files.createTempDirectory("graft_jobs_").toString)

    // out-of-order runs refuse, naming the job to run first
    val eF = intercept[IllegalStateException](FactJob.run(spark, dir, io))
    assert(eF.getMessage.contains("IngestionJob"), eF.getMessage)
    val eA = intercept[IllegalStateException](AggregationJob.run(spark, dir, io))
    assert(eA.getMessage.contains("FactJob"), eA.getMessage)
    val eQ = intercept[IllegalStateException](DataQualityJob.run(spark, dir, io))
    assert(eQ.getMessage.contains("FactJob"), eQ.getMessage)

    IngestionJob.run(spark, dir, io)
    assert(io.tableExists(IngestionJob.Target))
    val nClean = io.read(IngestionJob.Target).count()
    assert(nClean > 0)

    // FactJob still guards on the dimension job
    val eF2 = intercept[IllegalStateException](FactJob.run(spark, dir, io))
    assert(eF2.getMessage.contains("DimensionJob"), eF2.getMessage)

    DimensionJob.run(spark, dir, io)
    assert(io.read(DimensionJob.LocationTarget).count() > 0)
    assert(io.read(DimensionJob.DateTarget).count() > 0)

    FactJob.run(spark, dir, io)
    // left-outer fact build preserves every clean lineitem row
    assert(io.read(FactJob.Target).count() === nClean)

    AggregationJob.run(spark, dir, io)
    assert(io.read(AggregationJob.PairTarget).count() > 0)
    assert(io.read(AggregationJob.TimeTarget).count() > 0)
    assert(io.read(AggregationJob.TopTarget).count() > 0)

    // the quality gate reads clean on the built fact
    val q = DataQualityJob.run(spark, dir, io).collect().head
    assert(q.getAs[Long]("total_rows") === nClean)
    assert(q.getAs[Long]("invalid_quantity") === 0L)
    assert(q.getAs[Long]("negative_revenue") === 0L)
  }

  test("a second ingestion run APPENDS (snapshot history), dimensions overwrite idempotently") {
    val io = TableIO(spark, Files.createTempDirectory("graft_jobs2_").toString)
    IngestionJob.run(spark, dir, io)
    val n1 = io.read(IngestionJob.Target).count()
    IngestionJob.run(spark, dir, io)
    assert(io.read(IngestionJob.Target).count() === 2 * n1,
      "ingestion is an append job: a rerun adds a snapshot, never silently overwrites")
    DimensionJob.run(spark, dir, io)
    val nd = io.read(DimensionJob.DateTarget).count()
    DimensionJob.run(spark, dir, io)
    assert(io.read(DimensionJob.DateTarget).count() === nd,
      "dimension builds overwrite: reruns converge instead of duplicating")
  }
}
