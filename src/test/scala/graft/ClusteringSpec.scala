package graft

import org.apache.spark.sql.functions._

/** Pins the clustered-compaction layer: Morton values are exactly the
  * interleaved-bit reference, and sort-/z-order rewrites actually buy
  * plan-time file skipping (the reason they exist at 100 TB).
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference Morton implementation (bit-by-bit). */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("ZOrder.zvalue equals the bit-by-bit Morton reference") {
    val grid = for (a <- 0L to 40L; b <- 0L to 40L) yield (a, b)
    val got = grid.toDF("a", "b")
      .select($"a", $"b", graft.functions.ZOrder.zvalue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b), s"zvalue($a, $b)")
    }
    // and a couple of wide values exercising the high bits
    val wide = Seq((0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x12345678L, 0x0FEDCBA9L))
    val gotWide = wide.toDF("a", "b")
      .select(graft.functions.ZOrder.zvalue($"a", $"b")).as[Long].collect()
    wide.zip(gotWide).foreach { case ((a, b), z) =>
      assert(z == mortonRef(a, b), s"zvalue($a, $b) wide")
    }
  }

  /** Files the catalog scan actually planned (post stats-skip). */
  private def pathsIn(sql: String): Int = {
    val df = spark.sql(sql)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    "InMemoryFileIndex\\((\\d+) paths\\)".r.findFirstMatchIn(p).map(_.group(1).toInt)
      .getOrElse(fail(s"no file index in plan:\n$p"))
  }

  test("compactSorted turns key predicates into file-skipping scans") {
    val wh = java.nio.file.Files.createTempDirectory("graft_csort_").toString
    val io = graft.io.TableIO(spark, wh)
    val rnd = new scala.util.Random(42)
    // keys scattered uniformly across 8 files: every file's (min, max)
    // spans the whole domain, so nothing can prune pre-compaction
    val rows = rnd.shuffle((0 until 2000).toVector).map(k => (k, s"s$k"))
    io.append(rows.toDF("k", "s").repartition(8), "default.t")

    spark.conf.set("spark.sql.catalog.gcs", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcs.warehouse", wh)
    try {
      val before = io.catalog.manifest("default.t", io.versions("default.t").last).size
      assert(before >= 8)
      assert(pathsIn("SELECT * FROM gcs.default.t WHERE k BETWEEN 100 AND 140") == before,
        "scattered layout must not prune (fixture invariant)")

      io.compactSorted("default.t", Seq("k"), targetFiles = 8)

      val total = io.catalog.manifest("default.t", io.versions("default.t").last).size
      val pruned = pathsIn("SELECT * FROM gcs.default.t WHERE k BETWEEN 100 AND 140")
      assert(pruned < total, s"expected file skip after sort, scanned $pruned/$total")
      assert(pruned <= 2, s"a 2% key range should hit ~1 of $total range-tiled files, got $pruned")
      // rows survive the rewrite byte-for-value
      assert(spark.sql("SELECT count(*) c FROM gcs.default.t").head().getLong(0) == 2000L)
      assert(spark.sql("SELECT s FROM gcs.default.t WHERE k = 137").as[String].head() == "s137")
    } finally {
      spark.conf.unset("spark.sql.catalog.gcs")
      spark.conf.unset("spark.sql.catalog.gcs.warehouse")
    }
  }

  test("compactZOrder prunes on BOTH dimensions; lexicographic sort only on the leading one") {
    val wh = java.nio.file.Files.createTempDirectory("graft_zord_").toString
    val io = graft.io.TableIO(spark, wh)
    val rnd = new scala.util.Random(7)
    // a 64x64 grid, scattered
    val rows = rnd.shuffle((for (a <- 0 until 64; b <- 0 until 64) yield (a, b, a * 64 + b)).toVector)
    io.append(rows.toDF("a", "b", "v").repartition(8), "default.g")

    spark.conf.set("spark.sql.catalog.gcz", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcz.warehouse", wh)
    try {
      // lexicographic sort first: leading column prunes, trailing doesn't
      io.compactSorted("default.g", Seq("a", "b"), targetFiles = 8)
      val totalSorted = io.catalog.manifest("default.g", io.versions("default.g").last).size
      val aSorted = pathsIn("SELECT * FROM gcz.default.g WHERE a BETWEEN 0 AND 7")
      val bSorted = pathsIn("SELECT * FROM gcz.default.g WHERE b BETWEEN 0 AND 7")
      assert(aSorted < totalSorted, s"sort must prune on the leading column: $aSorted/$totalSorted")
      assert(bSorted == totalSorted,
        s"fixture invariant: lexicographic files span the full b-range ($bSorted/$totalSorted)")

      // z-order via the SQL procedure surface: each file becomes a
      // square tile -> BOTH dimensions prune
      val out = spark.sql("CALL gcz.system.compact_zorder('default.g', 'a', 'b', 8)").head()
      assert(out.getLong(0) >= 8 && out.getLong(1) <= 9,
        s"rewrite should consolidate files: ${out.getLong(0)} -> ${out.getLong(1)}")
      val total = io.catalog.manifest("default.g", io.versions("default.g").last).size
      val aZ = pathsIn("SELECT * FROM gcz.default.g WHERE a BETWEEN 0 AND 7")
      val bZ = pathsIn("SELECT * FROM gcz.default.g WHERE b BETWEEN 0 AND 7")
      assert(aZ < total, s"z-order must prune on a: $aZ/$total")
      assert(bZ < total, s"z-order must prune on b: $bZ/$total")
      // rows intact
      assert(spark.sql("SELECT count(*) c FROM gcz.default.g").head().getLong(0) == 4096L)
      assert(spark.sql("SELECT v FROM gcz.default.g WHERE a = 3 AND b = 5").as[Int].head() == 3 * 64 + 5)
    } finally {
      spark.conf.unset("spark.sql.catalog.gcz")
      spark.conf.unset("spark.sql.catalog.gcz.warehouse")
    }
  }

  test("clustered rewrites preserve Hive partition layout — overwritePartition still replaces") {
    val wh = java.nio.file.Files.createTempDirectory("graft_zpart_").toString
    val io = graft.io.TableIO(spark, wh)
    val rows = (for (yr <- 2020 to 2021; i <- 0 until 50) yield (i, i % 7, s"r$i", yr)).toVector
    io.append(rows.toDF("a", "b", "s", "yr").repartition(4), "default.p", Seq("yr"))

    io.compactZOrder("default.p", "a", "b", targetFiles = 4, partitionCols = Seq("yr"))
    // every rewritten file still lives under a yr=... directory
    val files = io.catalog.manifest("default.p", io.versions("default.p").last)
    assert(files.nonEmpty && files.forall(_.contains("yr=")),
      s"z-order rewrite flattened the partition layout:\n${files.mkString("\n")}")

    // the regression this guards: a later partition-level overwrite
    // must REPLACE 2020's rows, not duplicate them next to flat files
    io.overwritePartition(
      Seq((999, 0, "new", 2020)).toDF("a", "b", "s", "yr"), "default.p", Seq("yr"))
    val back = io.read("default.p")
    assert(back.filter(col("yr") === 2020).count() == 1L)
    assert(back.filter(col("yr") === 2021).count() == 50L)
  }

  test("write sort order: appends land range-sorted so point queries skip files; drift-safe; ALTER carries it") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wso_").toString
    val io = graft.io.TableIO(spark, wh)
    val t = "default.wso_t"
    // un-ordered baseline: shuffled keys, every file spans the domain
    val shuffled = new scala.util.Random(7).shuffle((0L until 4000L).toVector)
    io.append(shuffled.take(2000).map(i => (i, s"v$i")).toDF("id", "s").repartition(4), t)
    io.setWriteSortOrder(t, Seq("id"))
    // at fixture scale AQE coalesces the range shuffle to one
    // partition (desirable at real scale — fewer small files); pin it
    // off so the tiling claim is observable across several files
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try io.append(shuffled.drop(2000).map(i => (i, s"v$i")).toDF("id", "s").repartition(4), t)
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    assert(io.catalog.readMeta(t).sortOrder === Seq("id"))

    // the sorted commit's files tile the key space: a point read scans
    // at most ONE of them (+ every pre-order file, which can't prune)
    val conf = spark.sessionState.newHadoopConf()
    val v = io.catalog.currentVersion(t).get
    val sortedFiles = io.catalog.manifest(t, v).toSet.diff(io.catalog.manifest(t, v - 1).toSet)
    assert(sortedFiles.size >= 2, s"range distribution should yield several files: ${sortedFiles.size}")
    val probe = 1234L
    val canHold = sortedFiles.count { f =>
      graft.io.FileStats.mightMatch(graft.io.FileStats.cached(f, conf),
        Seq(org.apache.spark.sql.sources.EqualTo("id", probe)))
    }
    assert(canHold === 1, s"a point key must live in exactly one sorted file, matched $canHold")
    // content intact, order is layout-only
    assert(io.read(t).count() === 4000L)

    // a drifted batch MISSING the sort column writes unsorted, never fails
    io.setWriteSortOrder(t, Seq("nope"))
    io.append(Seq((9999L, "x")).toDF("id", "s").coalesce(1), t)
    assert(io.read(t).count() === 4001L)

    // ALTER carries sortOrder (and the rest of meta) instead of stripping it
    io.setWriteSortOrder(t, Seq("id"))
    spark.conf.set("spark.sql.catalog.gxws", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gxws.warehouse", wh)
    try {
      spark.sql(s"ALTER TABLE gxws.$t ADD COLUMN extra INT")
      assert(io.catalog.readMeta(t).sortOrder === Seq("id"),
        "ALTER must carry the write sort order, not strip it")
      // SQL surface: clear it
      spark.sql(s"CALL gxws.system.set_write_order('$t', '')")
      assert(io.catalog.readMeta(t).sortOrder === Seq.empty)
      // DDL sugar (r18): WRITE ORDERED BY / WRITE UNORDERED route
      // through the same procedure — one code path
      spark.sql(s"ALTER TABLE gxws.$t WRITE ORDERED BY (id, s)")
      assert(io.catalog.readMeta(t).sortOrder === Seq("id", "s"))
      spark.sql(s"ALTER TABLE gxws.$t WRITE UNORDERED")
      assert(io.catalog.readMeta(t).sortOrder === Seq.empty)
      // every other ALTER still parses through the delegate
      spark.sql(s"ALTER TABLE gxws.$t ADD COLUMN extra2 INT")
      assert(spark.table(s"gxws.$t").columns.contains("extra2"))
      // the sort order FOLLOWS a rename and sheds a dropped column —
      // a stale name would silently stop clustering future writes
      spark.sql(s"ALTER TABLE gxws.$t WRITE ORDERED BY (id, extra2)")
      spark.sql(s"ALTER TABLE gxws.$t RENAME COLUMN extra2 TO extra3")
      assert(io.catalog.readMeta(t).sortOrder === Seq("id", "extra3"))
      spark.sql(s"ALTER TABLE gxws.$t DROP COLUMN extra3")
      assert(io.catalog.readMeta(t).sortOrder === Seq("id"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gxws")
      spark.conf.unset("spark.sql.catalog.gxws.warehouse")
    }
  }

  test("write distribution 'hash': one file per partition value per commit; mode persists and clears") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wd_").toString
    val io = graft.io.TableIO(spark, wh)
    val t = "default.wd_t"
    io.setPartitionSpec(t, Seq("days(ts)"))
    def batch(off: Int) = (0 until 120).map { i =>
      (off + i.toLong, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-05-01T06:00:00Z").plusSeconds((i % 3) * 86400L + i)))
    }.toDF("id", "ts")
    def newFiles(prevV: Int): Seq[String] = {
      val v = io.catalog.currentVersion(t).get
      io.catalog.manifest(t, v).diff(
        if (prevV == 0) Seq.empty else io.catalog.manifest(t, prevV))
    }
    def perDay(files: Seq[String]): Map[String, Int] =
      files.groupBy(f => f.split("gp_days_ts=")(1).split('/')(0)).view.mapValues(_.size).toMap
    // default mode: every task writes every day it holds -> several
    // files per day-dir
    io.append(batch(0).repartition(8), t)
    val v1 = io.catalog.currentVersion(t).get
    assert(perDay(newFiles(0)).values.max > 1,
      s"fixture must produce multi-file days without the mode: ${perDay(newFiles(0))}")
    // hash mode: each day lands in ONE task -> exactly one file per day
    io.setWriteDistribution(t, "hash")
    io.append(batch(1000).repartition(8), t)
    val v2 = io.catalog.currentVersion(t).get
    assert(perDay(newFiles(v1)).values.toSet === Set(1),
      s"hash mode must write one file per day: ${perDay(newFiles(v1))}")
    // content is layout-only
    assert(io.read(t).count() === 240L)
    // clearing restores the default behavior
    io.setWriteDistribution(t, "none")
    io.append(batch(2000).repartition(8), t)
    assert(perDay(newFiles(v2)).values.max > 1)
    assert(io.catalog.readMeta(t).distribution.isEmpty)
    // SQL surface + invalid mode refusal
    spark.conf.set("spark.sql.catalog.gxwd", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gxwd.warehouse", wh)
    try {
      spark.sql(s"CALL gxwd.system.set_write_distribution('$t', 'hash')")
      assert(io.catalog.readMeta(t).distribution === Some("hash"))
      val e = intercept[Exception](
        spark.sql(s"CALL gxwd.system.set_write_distribution('$t', 'range')"))
      assert(e.getMessage.contains("hash"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.gxwd")
      spark.conf.unset("spark.sql.catalog.gxwd.warehouse")
    }
  }

  test("ALTER on a hidden-layout table keeps the partition spec (regression: fresh meta stripped pspec)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_psc_").toString
    spark.conf.set("spark.sql.catalog.gxps", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gxps.warehouse", wh)
    try {
      val io = graft.io.TableIO(spark, wh)
      spark.sql("CREATE TABLE gxps.default.psc_t (k BIGINT, s STRING) PARTITIONED BY (bucket(4, k))")
      io.append((0L until 200L).map(i => (i, s"v$i")).toDF("k", "s"), "default.psc_t")
      val specBefore = io.catalog.readMeta("default.psc_t").partitionSpec
      assert(specBefore.nonEmpty)
      spark.sql("ALTER TABLE gxps.default.psc_t ADD COLUMN extra INT")
      assert(io.catalog.readMeta("default.psc_t").partitionSpec === specBefore,
        "ALTER must carry the hidden partition spec")
      // the layout still works: writes derive dirs, reads prune
      spark.sql("INSERT INTO gxps.default.psc_t SELECT 1000, 'z', 5")
      assert(spark.sql("SELECT count(*) FROM gxps.default.psc_t WHERE k = 1000")
        .head().getLong(0) === 1L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gxps")
      spark.conf.unset("spark.sql.catalog.gxps.warehouse")
    }
  }

  test("compactWhere rewrites only predicate-scoped files; out-of-scope files carry verbatim") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cw_").toString
    val io = graft.io.TableIO(spark, wh)
    val t = "default.cw_t"
    // four small files in the "hot" id range, one in the "cold" range
    (0 until 4).foreach { k =>
      io.append((0L until 25L).map(i => (k * 25L + i, s"h$k$i")).toDF("id", "s").coalesce(1), t)
    }
    io.append((1000L to 1010L).map(i => (i, s"c$i")).toDF("id", "s").coalesce(1), t)
    val v0 = io.catalog.currentVersion(t).get
    val before = io.catalog.manifest(t, v0)
    val contentBefore = io.read(t).as[(Long, String)].collect().toSet

    val n = io.compactWhere(t, col("id") < 100L)
    assert(n === 4, s"exactly the four hot files rewrite, got $n")
    val v1 = io.catalog.currentVersion(t).get
    assert(v1 === v0 + 1)
    val after = io.catalog.manifest(t, v1)
    val carried = after.toSet.intersect(before.toSet)
    assert(carried.size === 1, s"the cold file carries verbatim: $carried")
    assert(after.size === 2, s"hot files merge to one: ${after.size}")
    assert(io.read(t).as[(Long, String)].collect().toSet === contentBefore,
      "compaction preserves content exactly")
    // the rewrite stamp: maintenance-tolerant streams ride through it
    assert(io.catalog.manifestProps(t, v1).get(graft.io.TableCatalog.OpProp)
      .contains(graft.io.TableCatalog.OpRewrite))

    // nothing in scope: no-op, no new snapshot
    assert(io.compactWhere(t, col("id") > 5000L) === 0)
    assert(io.catalog.currentVersion(t).get === v1)

    // pending MOR deletes refuse naming the recovery
    io.deleteWhereMOR(t, col("id") === 3L)
    val e = intercept[IllegalArgumentException](io.compactWhere(t, col("id") < 100L))
    assert(e.getMessage.contains("applyDeletes"), e.getMessage)

    // SQL surface (fresh table in a registered catalog)
    spark.conf.set("spark.sql.catalog.gxcw", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gxcw.warehouse", wh)
    try {
      val t2 = "default.cw_sql"
      io.append((0L until 10L).map(i => (i, s"a$i")).toDF("id", "s").coalesce(1), t2)
      io.append((10L until 20L).map(i => (i, s"b$i")).toDF("id", "s").coalesce(1), t2)
      val res = spark.sql("CALL gxcw.system.compact_where('default.cw_sql', 'id < 100')")
        .collect()
      assert(res.head.getLong(0) === 2L)
      assert(io.read(t2).count() === 20L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gxcw")
      spark.conf.unset("spark.sql.catalog.gxcw.warehouse")
    }
  }
}
