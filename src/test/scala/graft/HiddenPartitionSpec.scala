package graft

import org.apache.spark.sql.functions._
import graft.io.{PartitionTransforms, TableIO}

/** Hidden partition transforms (`TableIO.setPartitionSpec` +
  * `PartitionTransforms`): layout columns derive from the spec and
  * never reach a logical schema, source-column predicates prune files
  * at plan time through the catalog scan (including the bucket case
  * range stats can NEVER serve), and the driver-side literal
  * transforms are bit-identical to the write-side columns — the
  * equality the pruning's correctness rests on.
  */
class HiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  /** Files the catalog scan actually planned (post partition/stats skip). */
  private def pathsIn(sql: String): Int = {
    val df = spark.sql(sql)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    "InMemoryFileIndex\\((\\d+) paths\\)".r.findFirstMatchIn(p).map(_.group(1).toInt)
      .getOrElse(fail(s"no file index in plan:\n$p"))
  }

  private def withCatalog(cat: String, wh: String)(body: => Unit): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("days(ts): layout derives and hides; ts-range SQL prunes files; results exact") {
    val wh = tmp("graft_hp_days_")
    val io = TableIO(spark, wh)
    val t = "default.ev"
    io.setPartitionSpec(t, Seq("days(ts)"))
    // 10 UTC days x 20 events, shuffled so insertion order proves nothing
    val rows = new scala.util.Random(7).shuffle(
      (for (d <- 0 until 10; i <- 0 until 20) yield
        (d * 20L + i, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-03-01T00:00:00Z")
            .plusSeconds(d * 86400L + i * 977L)))).toVector)
      .toDF("event_id", "ts")
    io.append(rows, t)

    // logical schema: no layout column, values round-trip
    val back = io.read(t)
    assert(back.columns.toSet === Set("event_id", "ts"))
    assert(back.count() === 200)

    withCatalog("ghp1", wh) {
      val total = io.catalog.manifest(t, io.versions(t).last).size
      assert(total >= 10, s"one file per day-dir expected, got $total")
      assert(spark.sql(s"SELECT * FROM ghp1.$t").columns.toSet === Set("event_id", "ts"))
      // a 2-day range must plan <= 3 of the 10 day-dirs' files: the
      // non-strict monotonic mapping keeps the upper BOUNDARY day
      // (`ts < midnight` maps to `days <= that day`), never more
      val q = s"SELECT count(*) AS n FROM ghp1.$t " +
        "WHERE ts >= TIMESTAMP '2024-03-03 00:00:00' AND ts < TIMESTAMP '2024-03-05 00:00:00'"
      // the day-aligned count is now METADATA-ONLY (exact-prune proof
      // + manifest stats): no file index at all, and still exact
      assert(spark.sql(q).queryExecution.executedPlan.toString.contains("LocalTableScan"))
      assert(spark.sql(q).as[Long].head() === 40L)
      // the row-returning form still prunes to <= 3 of the 10 day-dirs
      val qrows = s"SELECT event_id FROM ghp1.$t " +
        "WHERE ts >= TIMESTAMP '2024-03-03 00:00:00' AND ts < TIMESTAMP '2024-03-05 00:00:00'"
      assert(pathsIn(qrows) <= 3 * (total / 10), s"expected <= ${3 * (total / 10)} of $total files")
      // exactness against the unpruned in-memory filter, boundary included
      val got = spark.sql(qrows).as[Long].collect().toSet
      val want = rows.filter(col("ts") >= lit("2024-03-03 00:00:00") &&
          col("ts") < lit("2024-03-05 00:00:00"))
        .select("event_id").as[Long].collect().toSet
      assert(got === want && want.size === 40)
    }
  }

  test("bucket(8, k): point/IN lookups prune where range stats cannot; ranges stay conservative") {
    val wh = tmp("graft_hp_bucket_")
    val io = TableIO(spark, wh)
    val t = "default.kv"
    io.setPartitionSpec(t, Seq("bucket(8, k)"))
    // dense keys split even/odd across input tasks: EVERY file's
    // (min, max) spans ~the whole domain, so footer stats can never
    // prune — any skip below is the bucket directory's doing
    io.append((0 until 2000).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .repartition(2, pmod(col("k"), lit(2))), t)

    withCatalog("ghp2", wh) {
      val total = io.catalog.manifest(t, io.versions(t).last).size
      assert(total >= 8)
      val hit = pathsIn(s"SELECT * FROM ghp2.$t WHERE k = 274")
      assert(hit <= total / 4, s"bucket prune expected: $hit of $total files")
      assert(spark.sql(s"SELECT v FROM ghp2.$t WHERE k = 274").as[String].head() === "v274")
      // IN-list unions per-value buckets
      val in3 = pathsIn(s"SELECT * FROM ghp2.$t WHERE k IN (1, 2, 3)")
      assert(in3 <= 3 * (total / 8).max(1), s"IN should plan <= 3 buckets' files, got $in3")
      assert(spark.sql(s"SELECT count(*) FROM ghp2.$t WHERE k IN (1, 2, 3)").as[Long].head() === 3L)
      // a range cannot prune through a hash — conservative keep-all
      assert(pathsIn(s"SELECT * FROM ghp2.$t WHERE k < 100") === total)
      assert(spark.sql(s"SELECT count(*) FROM ghp2.$t WHERE k < 100").as[Long].head() === 100L)
    }
  }

  test("truncate(4, code): equality and prefix predicates prune; read hides the layout") {
    val wh = tmp("graft_hp_trunc_")
    val io = TableIO(spark, wh)
    val t = "default.codes"
    io.setPartitionSpec(t, Seq("truncate(4, code)"))
    val prefixes = Seq("alfa", "brav", "char", "delt", "echo")
    io.append((for (p <- prefixes; i <- 0 until 30) yield (s"$p$i", i.toLong))
      .toDF("code", "n"), t)
    assert(io.read(t).columns.toSet === Set("code", "n"))

    withCatalog("ghp3", wh) {
      val total = io.catalog.manifest(t, io.versions(t).last).size
      assert(total >= prefixes.size)
      val eq = pathsIn(s"SELECT * FROM ghp3.$t WHERE code = 'char7'")
      assert(eq <= total / 4, s"equality should reach one prefix dir, got $eq of $total")
      assert(spark.sql(s"SELECT n FROM ghp3.$t WHERE code = 'char7'").as[Long].head() === 7L)
      // prefix at least as long as the width pins the directory
      val pre = pathsIn(s"SELECT * FROM ghp3.$t WHERE code LIKE 'echo%'")
      assert(pre <= total / 4, s"startsWith should reach one prefix dir, got $pre")
      assert(spark.sql(s"SELECT count(*) FROM ghp3.$t WHERE code LIKE 'echo%'")
        .as[Long].head() === 30L)
      // lexicographic range prunes through the (monotonic) truncation
      val rng = pathsIn(s"SELECT * FROM ghp3.$t WHERE code >= 'delt'")
      assert(rng <= 2 * (total / prefixes.size), s"range should keep delt+echo dirs, got $rng")
      assert(spark.sql(s"SELECT count(*) FROM ghp3.$t WHERE code >= 'delt'")
        .as[Long].head() === 60L)
    }
  }

  test("literal-side transforms are bit-identical to the write-side columns") {
    val rnd = new scala.util.Random(19)
    val ts = (0 until 300).map(_ => java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(rnd.between(-2L * 365 * 86400, 4L * 365 * 86400 * 20),
        rnd.between(0, 1000000000L))))
    val longs = (0 until 300).map(_ => rnd.nextLong() % 100000L)
    // mix in supplementary characters (2 UTF-16 units each): Spark's
    // substring counts CODE POINTS, so the literal side must too
    val emo = Array("😀", "🚀", "𝒳")
    val strs = (0 until 300).map { i =>
      val base = rnd.alphanumeric.take(rnd.between(0, 12)).mkString
      if (i % 3 == 0) emo(rnd.nextInt(emo.length)) + base + emo(rnd.nextInt(emo.length))
      else base
    }
    val df = ts.zip(longs).zip(strs).map { case ((a, b), c) => (a, b, c) }
      .toDF("t", "l", "s")

    val specs = Seq("days(t)", "hours(t)", "months(t)", "years(t)",
      "bucket(16, l)", "truncate(7, l)", "bucket(16, s)", "truncate(3, s)")
      .map(PartitionTransforms.parse)
    for (tr <- specs) {
      val srcType = df.schema(tr.src).dataType
      val pairs = df.select(col(tr.src), tr.column(col(tr.src), srcType).as("d"))
        .collect()
      pairs.foreach { r =>
        val lit = tr.literal(r.get(0), srcType)
          .getOrElse(fail(s"${tr.spec}: literal() refused ${r.get(0)}"))
        assert(lit === r.get(1), s"${tr.spec} diverges on ${r.get(0)}")
      }
    }
  }

  test("null sources land in the null partition; point lookups skip it, IS NULL finds it") {
    val wh = tmp("graft_hp_null_")
    val io = TableIO(spark, wh)
    val t = "default.nulls"
    io.setPartitionSpec(t, Seq("days(ts)"))
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-05-01 12:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-05-02 12:00:00")),
      (3L, null.asInstanceOf[java.sql.Timestamp]))
    io.append(rows.toDF("id", "ts"), t)
    assert(io.read(t).count() === 3)
    withCatalog("ghp4", wh) {
      assert(spark.sql(s"SELECT id FROM ghp4.$t WHERE ts IS NULL").as[Long].head() === 3L)
      assert(spark.sql(
        s"SELECT id FROM ghp4.$t WHERE ts = TIMESTAMP '2024-05-02 12:00:00'")
        .as[Long].head() === 2L)
      val total = io.catalog.manifest(t, io.versions(t).last).size
      assert(pathsIn(
        s"SELECT * FROM ghp4.$t WHERE ts = TIMESTAMP '2024-05-02 12:00:00'") < total,
        "the null partition (and other days) must be skipped for an equality")
    }
  }

  test("pruning edge parity: '+' survives unescape, '' shares the null dir unlost, emoji truncates by code points") {
    val wh = tmp("graft_hp_esc_")
    val io = TableIO(spark, wh)
    val t = "default.esc"
    io.setPartitionSpec(t, Seq("truncate(3, s)"))
    val rows = Seq(
      ("a+b", 1L), ("a b", 2L), ("", 3L), (null.asInstanceOf[String], 4L),
      ("😀😀tail", 5L), ("plain", 6L))
    io.append(rows.toDF("s", "n"), t)
    withCatalog("ghp9", wh) {
      def one(pred: String): Long =
        spark.sql(s"SELECT n FROM ghp9.$t WHERE $pred").as[Long].collect().toList match {
          case x :: Nil => x
          case other => fail(s"'$pred' matched $other, expected exactly one row")
        }
      // escapePathName does not escape '+': URL-decoding the dir would
      // read 'a b', fail the equality, and silently lose the row
      assert(one("s = 'a+b'") === 1L)
      assert(one("s = 'a b'") === 2L)
      // '' maps to the __HIVE_DEFAULT_PARTITION__ dir next to null:
      // equality on '' (and IS NOT NULL) must keep that file
      assert(one("s = ''") === 3L)
      assert(one("s IS NULL") === 4L)
      // the literal-side truncation must count code points like
      // Spark's substring: two emoji are 2 code points, 4 UTF-16 units
      assert(one("s = '😀😀tail'") === 5L)
      assert(spark.sql(s"SELECT count(*) FROM ghp9.$t WHERE s IS NOT NULL")
        .as[Long].head() === 5L)
      assert(spark.sql(s"SELECT count(*) FROM ghp9.$t WHERE s <= 'b'")
        .as[Long].head() === 3L)
      // pruning still happens for predicates that exclude both null
      // and '': the null dir and non-matching prefix dirs are skipped
      val total = io.catalog.manifest(t, io.versions(t).last).size
      assert(pathsIn(s"SELECT * FROM ghp9.$t WHERE s = 'plain'") < total)
    }
  }

  test("SQL DDL PARTITIONED BY (days(ts)) creates a hidden-spec table; INSERT derives, SELECT prunes") {
    val wh = tmp("graft_hp_ddl_")
    withCatalog("ghp5", wh) {
      spark.sql("CREATE TABLE ghp5.default.ddlev (id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
      // visible schema: the declared columns only
      assert(spark.table("ghp5.default.ddlev").columns.toSet === Set("id", "ts"))
      spark.sql("INSERT INTO ghp5.default.ddlev SELECT id, " +
        "TIMESTAMP '2024-06-01 00:00:00' + make_interval(0, 0, 0, 0, CAST(id * 7 AS INT)) " +
        "FROM range(0, 40)")
      val io = TableIO(spark, wh)
      val t = "default.ddlev"
      assert(io.catalog.readMeta(t).partitionSpec === Seq("days(ts)"))
      val total = io.catalog.manifest(t, io.versions(t).last).size
      assert(total >= 10, s"40 rows x 7h apart span ~12 days, got $total files")
      val q = "SELECT count(*) FROM ghp5.default.ddlev " +
        "WHERE ts >= TIMESTAMP '2024-06-05 00:00:00' AND ts < TIMESTAMP '2024-06-07 00:00:00'"
      // day-aligned count: metadata-only via the exact-prune proof
      assert(spark.sql(q).queryExecution.executedPlan.toString.contains("LocalTableScan"))
      // the row-returning form still prunes to 2 in-range day-dirs
      assert(pathsIn("SELECT id FROM ghp5.default.ddlev " +
        "WHERE ts >= TIMESTAMP '2024-06-05 00:00:00' AND ts < TIMESTAMP '2024-06-07 00:00:00'")
        <= total / 2, s"expected <= ${total / 2} of $total files")
      // 2-day window at 7h cadence: exactness vs direct arithmetic
      val want = (0 until 40).count { id =>
        val h = id * 7L
        h >= 4L * 24 && h < 6L * 24
      }
      assert(spark.sql(q).as[Long].head() === want.toLong && want > 0)
      // bucket DDL flavor parses too (either literal position)
      spark.sql("CREATE TABLE ghp5.default.ddlb (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
      assert(io.catalog.readMeta("default.ddlb").partitionSpec === Seq("bucket(4, k)"))
      // plain identity DDL keeps the classic layout, no spec
      spark.sql("CREATE TABLE ghp5.default.ddli (k BIGINT, dt STRING) " +
        "PARTITIONED BY (dt)")
      assert(io.catalog.readMeta("default.ddli").partitionSpec === Seq.empty)
      assert(io.catalog.readMeta("default.ddli").partitionCols === Some(Seq("dt")))
    }
  }

  test("readWhere prunes files through the path API (layout + stats) and loses no rows") {
    val wh = tmp("graft_hp_rw_")
    val io = TableIO(spark, wh)
    val t = "default.rw"
    io.setPartitionSpec(t, Seq("bucket(8, k)"))
    io.append((0 until 2000).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .repartition(2, pmod(col("k"), lit(2))), t)
    val total = io.catalog.manifest(t, io.versions(t).last).size

    def planned(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      "InMemoryFileIndex\\((\\d+) paths\\)".r.findFirstMatchIn(p).map(_.group(1).toInt)
        .getOrElse(fail(s"no file index in plan:\n$p"))
    }
    // bucket point lookup: ~1/8 of the files, exact rows
    val hit = io.readWhere(t, col("k") === 274L)
    assert(planned(hit) <= total / 4, s"of $total")
    assert(hit.select("v").as[String].collect().toSeq === Seq("v274"))
    // untranslatable predicate: no pruning, still correct
    val odd = io.readWhere(t, pmod(col("k"), lit(997)) === 1L)
    assert(odd.count() === 3) // 1, 998, 1995
    // stats pruning rides along on a non-spec sorted table
    val t2 = "default.rws"
    io.append((0 until 2000).map(k => (k.toLong, k.toString)).toDF("k", "v"), t2)
    io.compactSorted(t2, Seq("k"), targetFiles = 8)
    val t2total = io.catalog.manifest(t2, io.versions(t2).last).size
    val rng = io.readWhere(t2, col("k") >= 1900L)
    assert(planned(rng) < t2total, "sorted layout must stats-prune the range")
    assert(rng.count() === 100)
  }

  test("compact preserves a hidden layout; spec changes and partition swaps refuse loudly") {
    val wh = tmp("graft_hp_guard_")
    val io = TableIO(spark, wh)
    val t = "default.g"
    io.setPartitionSpec(t, Seq("bucket(4, k)"))
    // several appends -> several files per bucket dir
    (0 until 3).foreach(i =>
      io.append((0 until 40).map(k => ((i * 40 + k).toLong, s"r$k")).toDF("k", "v"), t))
    val before = io.catalog.manifest(t, io.versions(t).last).size
    io.compact(t)
    val after = io.catalog.manifest(t, io.versions(t).last).size
    assert(after < before, s"compact must shrink file count ($before -> $after)")
    assert(after >= 4, "compacted table must keep its bucket dirs")
    assert(io.read(t).count() === 120)
    assert(io.read(t).columns.toSet === Set("k", "v"))

    val e1 = intercept[IllegalArgumentException](io.setPartitionSpec(t, Seq("days(k)")))
    assert(e1.getMessage.contains("before the first commit"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      io.overwritePartition(Seq((1L, "x")).toDF("k", "v"), t, Seq("k")))
    assert(e2.getMessage.contains("hidden partition spec"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      io.setPartitionSpec("default.fresh", Seq("fortnights(ts)")))
    assert(e3.getMessage.contains("unknown partition transform"), e3.getMessage)
  }

  test("respecTable evolves the layout by explicit rewrite; time travel keeps the old one") {
    val wh = tmp("graft_hp_respec_")
    val io = TableIO(spark, wh)
    val t = "default.ev2"
    io.setPartitionSpec(t, Seq("bucket(4, event_id)"))
    val rows = (0 until 200).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-07-01T00:00:00Z").plusSeconds(i * 4321L)))
    }.toDF("event_id", "ts")
    io.append(rows, t)
    val vOld = io.catalog.currentVersion(t).get

    io.respecTable(t, Seq("days(ts)"))
    assert(io.catalog.readMeta(t).partitionSpec === Seq("days(ts)"))
    // new layout on disk: current manifest's files live under day dirs
    val cur = io.catalog.manifest(t, io.versions(t).last)
    assert(cur.forall(_.contains("gp_days_ts=")), cur.take(3).mkString(","))
    // logical content identical, layout columns of BOTH specs hidden
    assert(io.read(t).columns.toSet === Set("event_id", "ts"))
    assert(io.read(t).count() === 200)
    // the PRE-respec version still reads (old bucket layout, same rows)
    val old = io.readVersion(t, vOld)
    assert(old.columns.toSet === Set("event_id", "ts") && old.count() === 200)
    // pruning follows the NEW spec
    withCatalog("ghp7", wh) {
      val total = cur.size
      val q = s"SELECT count(*) FROM ghp7.$t " +
        "WHERE ts >= TIMESTAMP '2024-07-03 00:00:00' AND ts < TIMESTAMP '2024-07-05 00:00:00'"
      // day-aligned count over the NEW layout: metadata-only
      assert(spark.sql(q).queryExecution.executedPlan.toString.contains("LocalTableScan"))
      assert(pathsIn(s"SELECT event_id FROM ghp7.$t " +
        "WHERE ts >= TIMESTAMP '2024-07-03 00:00:00' AND ts < TIMESTAMP '2024-07-05 00:00:00'")
        < total, "day-range must prune the re-specced layout")
      val want = rows.filter(col("ts") >= lit("2024-07-03 00:00:00") &&
        col("ts") < lit("2024-07-05 00:00:00")).count()
      assert(spark.sql(q).as[Long].head() === want && want > 0)
    }
    // the SQL procedure spelling drives the same rewrite
    withCatalog("ghp8", wh) {
      val r = spark.sql(
        s"CALL ghp8.system.rewrite_partition_spec('$t', 'bucket(8, event_id)')").collect()
      assert(r.head.getString(1) === "bucket(8, event_id)")
      assert(io.read(t).count() === 200)
      assert(io.catalog.manifest(t, io.versions(t).last)
        .forall(_.contains("gp_bucket8_event_id=")))
    }
  }

  test("ALTER TABLE cannot drop or rename a spec source column (layout embeds its name)") {
    val wh = tmp("graft_hp_alter_")
    withCatalog("ghp6", wh) {
      spark.sql("CREATE TABLE ghp6.default.al (id BIGINT, ts TIMESTAMP, note STRING) " +
        "PARTITIONED BY (days(ts))")
      val drop = intercept[Exception](
        spark.sql("ALTER TABLE ghp6.default.al DROP COLUMN ts"))
      assert(drop.getMessage.contains("partition-spec source"), drop.getMessage)
      val ren = intercept[Exception](
        spark.sql("ALTER TABLE ghp6.default.al RENAME COLUMN ts TO event_ts"))
      assert(ren.getMessage.contains("partition-spec source"), ren.getMessage)
      // non-source columns still evolve freely
      spark.sql("ALTER TABLE ghp6.default.al RENAME COLUMN note TO comment")
      spark.sql("ALTER TABLE ghp6.default.al ADD COLUMN score DOUBLE")
      assert(spark.table("ghp6.default.al").columns.toSet ===
        Set("id", "ts", "comment", "score"))
    }
  }
}
