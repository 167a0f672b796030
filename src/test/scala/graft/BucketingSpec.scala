package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing
import graft.tables.Tables

/** Bucketed co-location: the join must carry ZERO exchanges (that is
  * the entire point of paying the write-time clustering), and the
  * rows must equal the plain unbucketed join bit-for-bit.
  */
class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withBucketedPair[A](f: => A): A = {
    val loc = java.nio.file.Files.createTempDirectory("graft_bktspec_").toString
    Bucketing.writeBucketed(spark,
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_returnflag")),
      "spec_li_bkt", "l_orderkey", 4, s"$loc/li")
    Bucketing.writeBucketed(spark,
      Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderpriority")),
      "spec_ord_bkt", "o_orderkey", 4, s"$loc/ord")
    try f
    finally {
      spark.sql("DROP TABLE IF EXISTS spec_li_bkt")
      spark.sql("DROP TABLE IF EXISTS spec_ord_bkt")
    }
  }

  test("bucketed sort-merge join runs with no Exchange on either side") {
    withBucketedPair {
      val joined = Bucketing.bucketedJoin(
        spark, "spec_li_bkt", "spec_ord_bkt", "l_orderkey", "o_orderkey")
      joined.collect() // force AQE final plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"scan should be bucket-aware:\n$p")
    }
  }

  test("bucketed join rows equal the unbucketed join") {
    withBucketedPair {
      val bucketed = Bucketing.bucketedJoin(
          spark, "spec_li_bkt", "spec_ord_bkt", "l_orderkey", "o_orderkey")
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_returnflag"), col("o_orderpriority"))
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_returnflag"))
      val ord = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_returnflag"), col("o_orderpriority"))
      assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty,
        "bucketing changed join content")
    }
  }

  test("one file per bucket under aligned repartitioning") {
    withBucketedPair {
      // 4 buckets, repartition(4, key) before the write -> exactly one
      // file per bucket (no small-files explosion at scale)
      val files = spark.table("spec_li_bkt").inputFiles
      assert(files.length == 4, s"expected 4 bucket files, got ${files.length}")
    }
  }
}
