package graft

import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation

import graft.operators.Scatter

/** The kernel-scatter gate's r22 size bound: width derives from scan
  * bytes, never a flat defaultParallelism (r21 verdict item 1 — the
  * 32-way fan-out over a KB-scale corpus cost more than the kernel
  * saved). All assertions are LOGICAL-plan-only: under AQE, physical
  * inspection (df.rdd) executes upstream stages.
  */
class ScatterSpec extends SparkSpec {
  import spark.implicits._

  private def writeOne(rows: Int, payload: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scatter").toString
    (1 to rows).map(i => (i.toLong, "x" * payload)).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def scatterWidth(df: org.apache.spark.sql.DataFrame): Option[Int] =
    df.queryExecution.logical.collectFirst { case r: RepartitionOperation => r.numPartitions }

  test("width is ceil(scanBytes / targetPartitionBytes), capped at defaultParallelism") {
    val dir = writeOne(rows = 2000, payload = 400) // ~100s of KB on disk
    val df = spark.read.parquet(dir)
    val bytes = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet")).mapToLong(java.nio.file.Files.size).sum()
    val default = spark.sparkContext.defaultParallelism
    try {
      spark.conf.set(Scatter.TargetBytesKey, "4096")
      val expect = math.min(default.toLong, math.max(1L, (bytes + 4095) / 4096)).toInt
      val out = Scatter.cpu(df)
      if (expect <= 1) assert(scatterWidth(out).isEmpty)
      else assert(scatterWidth(out).contains(expect),
        s"expected width $expect for $bytes bytes at 4096 B/part, got ${scatterWidth(out)}")
      // a huge per-partition target keeps a tiny corpus at its scan layout
      spark.conf.set(Scatter.TargetBytesKey, (1L << 40).toString)
      assert(scatterWidth(Scatter.cpu(df)).isEmpty,
        "a corpus below one target partition of bytes must not repartition")
    } finally spark.conf.unset(Scatter.TargetBytesKey)
  }

  test("already-scattered frames and many-file scans pass through untouched") {
    val dir = writeOne(rows = 500, payload = 2000)
    val df = spark.read.parquet(dir)
    spark.conf.set(Scatter.TargetBytesKey, "4096")
    try {
      // a frame whose narrow top chain already carries a repartition
      // keeps that layout (no second exchange of the payload)
      val pre = df.repartition(3)
      assert(Scatter.cpu(pre).queryExecution.logical
        .collect { case r: RepartitionOperation => r }.size == 1)
      // a non-file frame (no scan files) scatters conservatively wide
      val mem = (1 to 100).map(i => (i, "y")).toDF("id", "text")
      val w = scatterWidth(Scatter.cpu(mem))
      assert(w.contains(spark.sparkContext.defaultParallelism))
    } finally spark.conf.unset(Scatter.TargetBytesKey)
  }
}
