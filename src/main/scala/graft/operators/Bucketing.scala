package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the shuffle-ELIMINATION strategy, where
  * `Joins.saltedJoin` is the shuffle-REDISTRIBUTION one.
  *
  * A fact-to-fact equi-join (lineitem x orders on orderkey — reference:
  * FactJob.scala:39-55's largest join input) shuffles BOTH sides at
  * query time, every time the join runs. At 100 TB that repeated
  * all-to-all exchange dominates the query; bucketing moves it to
  * write time, ONCE: both tables are hash-clustered into the same
  * number of buckets on the join key, so every join/aggregation on
  * that key afterwards reads co-located buckets and the physical plan
  * carries NO Exchange on either side (pinned by BucketingSpec and
  * PLANS.md q69). This is Spark's native declared-layout path — the
  * scan reports `HashPartitioning(key, n)` and `EnsureRequirements`
  * sees the join's distribution requirement already satisfied.
  *
  * Write-side discipline: callers repartition by the bucket key with
  * `numBuckets` tasks before the bucketed write, so each task holds
  * exactly one bucket's rows and each bucket lands in ONE file. That
  * keeps file count O(buckets), not O(tasks x buckets) — the
  * small-files explosion that unpartitioned bucketed writes hit at
  * 1000 executors — and lets the sorted-bucket metadata stand in for
  * a runtime sort when `sortBy` matches the join key.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted session-catalog table at
    * `location`, clustered `numBuckets` ways on `bucketCol`.
    * Drop-and-recreate: idempotent under re-runs.
    */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      location: String
  ): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(numBuckets, df(bucketCol))
      .write
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", location)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. `hint("merge")`
    * pins sort-merge so the co-location is what eliminates the
    * exchanges (a broadcast join would mask it at test scale and
    * be impossible at fact-x-fact scale).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String
  ): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }
}
