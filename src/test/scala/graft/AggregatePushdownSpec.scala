package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.io.{GraftCatalog, TableIO}

/** Metadata-only aggregates (Iceberg/Delta's "count(*) from the
  * manifest"): unfiltered global COUNT/COUNT(col)/MIN/MAX answer from
  * manifest-persisted per-file stats as a driver-side LocalScan —
  * LocalTableScanExec in the plan, zero data tasks. Everything outside
  * the exactness envelope falls back to the real scan with identical
  * results.
  */
class AggregatePushdownSpec extends SparkSpec {

  private def withCat(cat: String)(body: TableIO => Unit): Unit = {
    val wh = Files.createTempDirectory("graft_agg_").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(TableIO(spark, wh)) finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  private def isMetadataOnly(sql: String): Boolean = {
    val p = planOf(sql)
    p.contains("LocalTableScan") && !p.contains("BatchScan") && !p.contains("FileScan")
  }

  test("unfiltered COUNT/COUNT(col)/MIN/MAX answer from the manifest as a LocalScan") {
    withCat("gxagg") { io =>
      import spark.implicits._
      val t = "default.stats_t"
      val df1 = Seq((1L, 10, Option(2.5), "a"), (2L, 20, None, "b"))
        .toDF("id", "n", "x", "s")
      val df2 = Seq((3L, 5, Option(9.5), "c"), (4L, 40, Option(-1.0), "d"))
        .toDF("id", "n", "x", "s")
      io.append(df1.coalesce(1), t)
      io.append(df2.coalesce(1), t)

      val q = "SELECT count(*) AS c, count(x) AS cx, min(n) AS mn, max(n) AS mx, " +
        "min(x) AS mnx, max(x) AS mxx FROM gxagg.default.stats_t"
      assert(isMetadataOnly(q), planOf(q))
      val r = spark.sql(q).collect().head
      assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5)) === ((4L, 3L, 5, 40, -1.0, 9.5)))

      // time travel: the older snapshot's metadata answers for ITS files
      val q0 = "SELECT count(*) FROM gxagg.default.stats_t VERSION AS OF 1"
      assert(isMetadataOnly(q0), planOf(q0))
      assert(spark.sql(q0).collect().head.getLong(0) === 2L)
    }
  }

  test("the exactness envelope: WHERE, GROUP BY, DISTINCT, strings, and missing stats all fall back to the scan") {
    withCat("gxfb") { io =>
      import spark.implicits._
      val t = "default.fb_t"
      io.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t)
      io.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)

      val filtered = "SELECT count(*) FROM gxfb.default.fb_t WHERE id > 1"
      assert(!isMetadataOnly(filtered), planOf(filtered))
      assert(spark.sql(filtered).collect().head.getLong(0) === 2L)

      val grouped = "SELECT s, count(*) FROM gxfb.default.fb_t GROUP BY s"
      assert(!isMetadataOnly(grouped))
      assert(spark.sql(grouped).collect().length === 3)

      val distinct = "SELECT count(DISTINCT id) FROM gxfb.default.fb_t"
      assert(!isMetadataOnly(distinct))
      assert(spark.sql(distinct).collect().head.getLong(0) === 3L)

      // string min/max: parquet writers may truncate binary stats —
      // refuse, never risk a wrong value
      val strMin = "SELECT min(s) FROM gxfb.default.fb_t"
      assert(!isMetadataOnly(strMin), planOf(strMin))
      assert(spark.sql(strMin).collect().head.getString(0) === "a")

      // ADD COLUMN: pre-ALTER files have no stats for the new column —
      // min(new) falls back and still answers correctly (nulls ignored)
      spark.sql("ALTER TABLE gxfb.default.fb_t ADD COLUMN extra INT")
      spark.sql("INSERT INTO gxfb.default.fb_t SELECT 9, 'z', 7")
      val mNew = "SELECT min(extra) FROM gxfb.default.fb_t"
      assert(!isMetadataOnly(mNew), planOf(mNew))
      assert(spark.sql(mNew).collect().head.getInt(0) === 7)
      // count(*) stays metadata-only through schema evolution
      val cAll = "SELECT count(*) FROM gxfb.default.fb_t"
      assert(isMetadataOnly(cAll), planOf(cAll))
      assert(spark.sql(cAll).collect().head.getLong(0) === 4L)
    }
  }

  test("nulls and decimals: SQL MIN/MAX semantics hold on the metadata path") {
    withCat("gxnd") { io =>
      import spark.implicits._
      val t = "default.nd_t"
      val d1 = Seq((1L, Option(BigDecimal("12.34"))), (2L, None))
        .toDF("id", "amt").select(col("id"), col("amt").cast("decimal(10,2)").as("amt"))
      val d2 = Seq((3L, Option(BigDecimal("-0.50"))), (4L, Option(BigDecimal("99.99"))))
        .toDF("id", "amt").select(col("id"), col("amt").cast("decimal(10,2)").as("amt"))
      io.append(d1.coalesce(1), t)
      io.append(d2.coalesce(1), t)
      val q = "SELECT count(amt) AS c, min(amt) AS mn, max(amt) AS mx FROM gxnd.default.nd_t"
      assert(isMetadataOnly(q), planOf(q))
      val r = spark.sql(q).collect().head
      assert(r.getLong(0) === 3L)
      assert(r.getDecimal(1) === new java.math.BigDecimal("-0.50"))
      assert(r.getDecimal(2) === new java.math.BigDecimal("99.99"))

      // an all-null column yields NULL min/max (not a crash, not 0)
      val tn = "default.nd_null"
      io.append(Seq((1L, Option.empty[java.lang.Double]), (2L, None))
        .toDF("id", "v").coalesce(1), tn)
      val qn = "SELECT min(v) AS mn, count(v) AS c FROM gxnd.default.nd_null"
      assert(isMetadataOnly(qn), planOf(qn))
      val rn = spark.sql(qn).collect().head
      assert(rn.isNullAt(0) && rn.getLong(1) === 0L)
    }
  }

  test("filtered metadata aggregates: a day-aligned WHERE over a days() layout stays a LocalScan") {
    withCat("gxfagg") { io =>
      import spark.implicits._
      val t = "default.ing_days"
      spark.sql(s"CREATE TABLE gxfagg.$t (ts TIMESTAMP, v BIGINT) PARTITIONED BY (days(ts))")
      val rows = Seq(
        ("2024-03-01 00:00:00", 10L), ("2024-03-01 23:59:59", 11L),
        ("2024-03-02 08:00:00", 20L), ("2024-03-02 09:30:00", 21L),
        ("2024-03-03 12:00:00", 30L))
        .map { case (s, v) => (java.sql.Timestamp.valueOf(s), v) }
        .toDF("ts", "v")
      io.append(rows, t)
      // "how many rows did 2024-03-02 ingest?" — the predicate is
      // day-aligned, every surviving file is fully covered by path
      // arithmetic: COUNT/MIN/MAX answer from the manifest
      val q = "SELECT count(*) AS c, min(v) AS mn, max(v) AS mx FROM gxfagg.default.ing_days " +
        "WHERE ts >= TIMESTAMP'2024-03-02 00:00:00' AND ts < TIMESTAMP'2024-03-03 00:00:00'"
      assert(isMetadataOnly(q), planOf(q))
      val r = spark.sql(q).collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 20L, 21L)))

      // two full days: still metadata-only
      val q2 = "SELECT count(*) AS c FROM gxfagg.default.ing_days " +
        "WHERE ts >= TIMESTAMP'2024-03-01 00:00:00' AND ts < TIMESTAMP'2024-03-03 00:00:00'"
      assert(isMetadataOnly(q2), planOf(q2))
      assert(spark.sql(q2).collect().head.getLong(0) === 4L)

      // BOUNDARY predicate (mid-day cut): the 03-02 file is only
      // partially covered — refuse, fall back, stay correct
      val qb = "SELECT count(*) AS c FROM gxfagg.default.ing_days " +
        "WHERE ts >= TIMESTAMP'2024-03-02 09:00:00'"
      assert(!isMetadataOnly(qb), planOf(qb))
      assert(spark.sql(qb).collect().head.getLong(0) === 2L)

      // day-aligned >= without an upper bound: files at the boundary
      // day and after are all fully covered
      val qa = "SELECT count(*) AS c FROM gxfagg.default.ing_days " +
        "WHERE ts >= TIMESTAMP'2024-03-02 00:00:00'"
      assert(isMetadataOnly(qa), planOf(qa))
      assert(spark.sql(qa).collect().head.getLong(0) === 3L)
    }
  }

  test("filtered metadata aggregates: footer-stats full coverage, null fallback, non-aggregate scans") {
    withCat("gxfst") { io =>
      import spark.implicits._
      val t = "default.cov_t"
      // file 1: ids 1-2, file 2: ids 3-4 — footer min/max tile the key
      io.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x").coalesce(1), t)
      io.append(Seq((3L, 3.0), (4L, 4.0)).toDF("id", "x").coalesce(1), t)
      // id <= 2 exactly covers file 1 and excludes file 2 via stats
      val q = "SELECT count(*) AS c, max(x) AS mx FROM gxfst.default.cov_t WHERE id <= 2"
      assert(isMetadataOnly(q), planOf(q))
      val r = spark.sql(q).collect().head
      assert((r.getLong(0), r.getDouble(1)) === ((2L, 2.0)))

      // a NULL in the predicate column breaks the full-coverage proof
      // (a null row fails the predicate): fall back, stay correct
      val tn = "default.cov_null"
      io.append(Seq(Option(1L), Option(2L), None).toDF("id").coalesce(1), tn)
      val qn = "SELECT count(*) AS c FROM gxfst.default.cov_null WHERE id >= 1"
      assert(!isMetadataOnly(qn), planOf(qn))
      assert(spark.sql(qn).collect().head.getLong(0) === 2L)

      // exact-prune also drops the Filter node on PLAIN scans: rows
      // come back identical to the unpruned evaluation
      val rows = spark.sql("SELECT id, x FROM gxfst.default.cov_t WHERE id <= 2 ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq === Seq((1L, 1.0), (2L, 2.0)))
    }
  }

  test("NaN-plus-null stats shape refuses MIN/MAX: fallback scan, never a wrong extremum") {
    withCat("gxnan") { io =>
      import spark.implicits._
      val t = "default.nan_t"
      // one file holding a real value, a NaN and a null: parquet-mr
      // clears min/max on NaN while numNulls stays set, so the footer
      // reads (min=null, max=null, nullCount=1, rowCount=3) — the
      // all-null shape with values hiding behind it. Metadata MIN/MAX
      // must refuse (treating it as all-null would skip 1.0 and NaN).
      io.append(Seq(Option(1.0), Option(Double.NaN), Option.empty[Double])
        .toDF("v").coalesce(1), t)
      io.append(Seq(Option(5.0)).toDF("v").coalesce(1), t)
      val q = "SELECT min(v) AS mn, max(v) AS mx FROM gxnan.default.nan_t"
      assert(!isMetadataOnly(q), planOf(q))
      val r = spark.sql(q).collect().head
      assert(r.getDouble(0) === 1.0)
      assert(r.getDouble(1).isNaN)
      // COUNT only needs rowCount/nullCount — still metadata-only
      val qc = "SELECT count(v) AS c FROM gxnan.default.nan_t"
      assert(isMetadataOnly(qc), planOf(qc))
      assert(spark.sql(qc).collect().head.getLong(0) === 3L)
    }
  }

  test("scans report EXACT row counts from manifest stats to the planner") {
    withCat("gxst") { io =>
      import spark.implicits._
      val t = "default.stats_rows"
      io.append((1L to 700L).map(i => (i, s"v$i")).toDF("id", "s").coalesce(2), t)
      io.append((701L to 1000L).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1), t)
      val rc = spark.table("gxst.default.stats_rows")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(1000)),
        s"planner must see the exact manifest row count, got $rc")
    }
  }

  test("dirty MOR snapshots never use the metadata path: counts reflect pending deletes") {
    withCat("gxmor") { io =>
      import spark.implicits._
      val t = "default.mor_t"
      io.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1), t)
      io.deleteWhereMOR(t, col("id") <= 3L)
      val q = "SELECT count(*) FROM gxmor.default.mor_t"
      assert(!isMetadataOnly(q), planOf(q))
      assert(spark.sql(q).collect().head.getLong(0) === 7L)
      // after materializing the deletes the table is clean again:
      // metadata path resumes with the correct count
      io.applyDeletes(t)
      assert(isMetadataOnly(q), planOf(q))
      assert(spark.sql(q).collect().head.getLong(0) === 7L)
    }
  }
}
