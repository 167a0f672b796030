package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.io.TableIO

/** Storage-partitioned joins over `bucket(n, key)` hidden layouts: the
  * catalog scan reports `KeyGroupedPartitioning`, GraftCatalog resolves
  * the `bucket` transform as a V2 function, and a SQL join of two
  * co-bucketed tables plans with ZERO shuffle exchange — the Iceberg
  * SPJ behavior (reference: the Iceberg catalog its jobs sit on). At
  * 100 TB this is the difference between a shuffle-free fact-fact join
  * and two full exchanges.
  */
class StoragePartitionedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def withCatalog(cat: String, wh: String)(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  private def withSpjConfs(body: => Unit): Unit = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // keep the join un-broadcast so the exchange question is real
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(sql: String): (String, Array[org.apache.spark.sql.Row]) = {
    val df = spark.sql(sql)
    val rows = df.collect()
    (df.queryExecution.executedPlan.toString, rows)
  }

  test("join of two bucket-co-partitioned tables runs with zero shuffle exchange; answer matches the shuffled plan") {
    val wh = tmp("graft_spj_")
    val io = TableIO(spark, wh)
    io.setPartitionSpec("default.facts", Seq("bucket(4, id)"))
    io.setPartitionSpec("default.dims", Seq("bucket(4, id)"))
    io.append((0L until 200L).map(i => (i, i * 3)).toDF("id", "x"), "default.facts")
    io.append((0L until 200L by 2).map(i => (i, s"d$i")).toDF("id", "y"), "default.dims")
    withCatalog("gspj", wh) {
      val q =
        """SELECT f.id, f.x, d.y FROM gspj.default.facts f
          |JOIN gspj.default.dims d ON f.id = d.id""".stripMargin
      withSpjConfs {
        val (plan, rows) = finalPlan(q)
        assert(!plan.contains("Exchange"),
          s"expected a zero-exchange storage-partitioned join, got:\n$plan")
        assert(rows.length === 100)
        assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet ===
          (0L until 200L by 2).map(i => (i, i * 3, s"d$i")).toSet)
      }
      // same query with SPJ disabled: the exchanges come back and the
      // answer is identical — the partitioning report changed the
      // PLAN, not the semantics
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val (plan, rows) = finalPlan(q)
        assert(plan.contains("Exchange"), s"control plan should shuffle:\n$plan")
        assert(rows.length === 100)
      } finally {
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("mismatched bucket counts do not co-partition (correct, just shuffled); aggregation over one table exploits the grouping") {
    val wh = tmp("graft_spj2_")
    val io = TableIO(spark, wh)
    io.setPartitionSpec("default.b4", Seq("bucket(4, id)"))
    io.setPartitionSpec("default.b8", Seq("bucket(8, id)"))
    io.append((0L until 100L).map(i => (i, i)).toDF("id", "v"), "default.b4")
    io.append((0L until 100L).map(i => (i, i * 2)).toDF("id", "v"), "default.b8")
    withCatalog("gspj2", wh) {
      withSpjConfs {
        val (plan, rows) = finalPlan(
          """SELECT a.id, a.v, b.v AS v2 FROM gspj2.default.b4 a
            |JOIN gspj2.default.b8 b ON a.id = b.id""".stripMargin)
        assert(plan.contains("Exchange"),
          s"bucket(4) vs bucket(8) must not be treated as co-partitioned:\n$plan")
        assert(rows.length === 100)
      }
    }
  }

  test("a pre-spec file (no bucket dir) makes the layout unprovable: scan falls back, join still correct") {
    val wh = tmp("graft_spj3_")
    val io = TableIO(spark, wh)
    // first commit WITHOUT a spec → flat file; then evolve via respec
    // is rewrite-only, so instead: spec'd table + a flat sibling
    io.append((0L until 50L).map(i => (i, i)).toDF("id", "v"), "default.flat")
    io.setPartitionSpec("default.bkt", Seq("bucket(4, id)"))
    io.append((0L until 50L).map(i => (i, i * 5)).toDF("id", "v"), "default.bkt")
    withCatalog("gspj3", wh) {
      withSpjConfs {
        val (plan, rows) = finalPlan(
          """SELECT a.id, b.v AS v2 FROM gspj3.default.flat a
            |JOIN gspj3.default.bkt b ON a.id = b.id""".stripMargin)
        // one side unkeyed → normal shuffled join, correct rows
        assert(rows.length === 50)
        assert(plan.contains("Exchange"))
        assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ===
          (0L until 50L).map(i => (i, i * 5)).toSet)
      }
    }
  }

  test("composite [days(ts), bucket(4, id)] layout: full-tuple join and subset join (conf-gated) are exchange-free") {
    val wh = tmp("graft_spjc_")
    val io = TableIO(spark, wh)
    io.setPartitionSpec("default.fa", Seq("days(ts)", "bucket(4, id)"))
    io.setPartitionSpec("default.fb", Seq("days(ts)", "bucket(4, id)"))
    def rows(mult: Long) = (0L until 120L).map { i =>
      (java.sql.Timestamp.valueOf(s"2024-03-${10 + (i % 3)} 0${i % 9}:00:00"),
        i % 40, i * mult)
    }
    io.append(rows(3).toDF("ts", "id", "v"), "default.fa")
    io.append(rows(7).toDF("ts", "id", "v"), "default.fb")
    withCatalog("gspjc", wh) {
      withSpjConfs {
        // join keys COVER the layout (ts finer than days, id the
        // bucket source): co-partitioned directly
        val (plan, rows1) = finalPlan(
          """SELECT a.id, a.v, b.v AS v2 FROM gspjc.default.fa a
            |JOIN gspjc.default.fb b ON a.ts = b.ts AND a.id = b.id""".stripMargin)
        assert(!plan.contains("Exchange"),
          s"full-tuple join over the composite layout should not shuffle:\n$plan")
        assert(rows1.length === 120)

        // subset join (id alone) needs the subset conf on top
        val k = "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled"
        spark.conf.set(k, "true")
        try {
          val (plan2, rows2) = finalPlan(
            """SELECT a.id, a.v, b.v AS v2 FROM gspjc.default.fa a
              |JOIN gspjc.default.fb b ON a.id = b.id""".stripMargin)
          assert(rows2.length === 360) // 3 rows per id per side
          assert(!plan2.contains("ShuffleExchange"),
            s"subset join with the conf should not shuffle:\n$plan2")
        } finally spark.conf.unset(k)
      }
    }
  }

  test("aggregation on the bucket key is exchange-free too: KeyGroupedPartitioning satisfies the grouping") {
    val wh = tmp("graft_spjagg_")
    val io = TableIO(spark, wh)
    io.setPartitionSpec("default.agg", Seq("bucket(4, id)"))
    io.append((0L until 100L).map(i => (i % 20, i)).toDF("id", "v"), "default.agg")
    withCatalog("gspja", wh) {
      withSpjConfs {
        val (plan, rows) = finalPlan(
          "SELECT id, sum(v) AS s FROM gspja.default.agg GROUP BY id")
        assert(!plan.contains("Exchange"),
          s"groupBy on the bucket key should need no shuffle:\n$plan")
        assert(rows.length === 20)
        val got = rows.map(r => (r.getLong(0), r.getLong(1))).toMap
        val want = (0L until 100L).groupBy(_ % 20).map { case (k, is) => k -> is.sum }
        assert(got === want)
      }
    }
  }

  test("SPJ x MOR: a dirty bucketed table falls back to the merged bridge (shuffled, correct); applyDeletes restores the zero-exchange join") {
    val wh = tmp("graft_spjm_")
    val io = TableIO(spark, wh)
    io.setPartitionSpec("default.ma", Seq("bucket(4, id)"))
    io.setPartitionSpec("default.mb", Seq("bucket(4, id)"))
    io.append((0L until 60L).map(i => (i, i * 2)).toDF("id", "v"), "default.ma")
    io.append((0L until 60L).map(i => (i, i * 5)).toDF("id", "v"), "default.mb")
    io.deleteWhereMOR("default.ma", col("id") === 7L)
    withCatalog("gspjm", wh) {
      withSpjConfs {
        val q =
          """SELECT a.id, a.v, b.v AS v2 FROM gspjm.default.ma a
            |JOIN gspjm.default.mb b ON a.id = b.id""".stripMargin
        // dirty side: reads route through the merged V1 bridge — no
        // keyed partitioning to exploit, so the join shuffles, and the
        // MOR-deleted row is gone from the result
        val (_, rows1) = finalPlan(q)
        assert(rows1.length === 59)
        assert(!rows1.exists(_.getLong(0) == 7L))
        io.applyDeletes("default.ma")
        // clean again: the pure-scan table reports its keys and the
        // join drops every exchange
        val (plan2, rows2) = finalPlan(q)
        assert(!plan2.contains("Exchange"),
          s"post-apply the storage-partitioned join should return:\n$plan2")
        assert(rows2.length === 59)
      }
    }
  }

  test("bucket V2 function evaluates the exact write-side layout hash") {
    val b = graft.io.GraftBucketFunction.bind(
      org.apache.spark.sql.types.StructType.fromDDL("n INT, k BIGINT"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    val t = graft.io.PartitionTransforms.parse("bucket(16, k)")
    (-3L to 40L).foreach { k =>
      val viaFn = b.produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](16, k)))
      val viaLiteral = t.literal(k, org.apache.spark.sql.types.LongType).get
      assert(viaFn.toLong === viaLiteral.asInstanceOf[Long],
        s"k=$k: function $viaFn vs write-side literal $viaLiteral")
    }
    // type matters: INT and LONG keys must NOT share a canonical name
    val bi = graft.io.GraftBucketFunction.bind(
      org.apache.spark.sql.types.StructType.fromDDL("n INT, k INT"))
    assert(bi.canonicalName() !== b.canonicalName())
  }
}
