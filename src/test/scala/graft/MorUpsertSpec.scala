package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.io.TableIO

/** MOR UPDATE (position-delete + replacement rows in one commit) and
  * the equality-delete UPSERT (Iceberg's zero-read CDC write): the
  * batch's rows append and its key tuples commit as an equality
  * delete scoped to the files that might hold them — O(batch) at any
  * table size. Readers resolve last-write-wins through the entry
  * chain; applyDeletes materializes.
  */
class MorUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def newIO(prefix: String): TableIO =
    TableIO(spark, Files.createTempDirectory(prefix).toString)

  test("updateWhereMOR: one commit, data files kept, matched rows replaced; applyDeletes materializes") {
    val io = newIO("graft_moru_")
    val t = "default.upd"
    io.append(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v").coalesce(1), t)
    val v0 = io.catalog.currentVersion(t).get
    val files0 = io.catalog.manifest(t, v0).toSet

    val (v1, n) = io.updateWhereMOR(t, col("id") <= 2, Map("v" -> (col("v") + 1)))
    assert(v1 === v0 + 1 && n === 2L)
    // ONE commit: original files all kept, update rows appended
    val files1 = io.catalog.manifest(t, v1).toSet
    assert(files0.subsetOf(files1) && files1.size > files0.size)
    assert(io.read(t).as[(Long, Long)].collect().toSet ===
      Set(1L -> 11L, 2L -> 21L, 3L -> 30L))
    assert(io.rowCount(t) === 3L) // position entries: exact metadata count
    assert(io.readVersion(t, v0).as[(Long, Long)].collect().toSet ===
      Set(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // a no-match update commits nothing
    assert(io.updateWhereMOR(t, col("id") > 99, Map("v" -> lit(0L)))._2 === 0L)

    val (v2, _) = io.applyDeletes(t)
    assert(io.catalog.pendingDeletes(t, v2).isEmpty)
    assert(io.read(t).as[(Long, Long)].collect().toSet ===
      Set(1L -> 11L, 2L -> 21L, 3L -> 30L))
  }

  test("upsertMOR: zero-read batches, last-write-wins across stacked batches, applyDeletes agrees") {
    val io = newIO("graft_morq_")
    val t = "default.cdc"
    io.append(Seq((1L, "a0"), (2L, "b0"), (3L, "c0")).toDF("id", "s").coalesce(1), t)
    val v0 = io.catalog.currentVersion(t).get

    // batch 1: update id=2, insert id=4
    val (v1, n1) = io.upsertMOR(t, Seq((2L, "b1"), (4L, "d1")).toDF("id", "s"), Seq("id"))
    assert(v1 === v0 + 1 && n1 === 2L)
    // every pre-existing data file survives the commit (nothing read, nothing rewritten)
    assert(io.catalog.manifest(t, v0).toSet.subsetOf(io.catalog.manifest(t, v1).toSet))
    assert(io.read(t).as[(Long, String)].collect().toSet ===
      Set(1L -> "a0", 2L -> "b1", 3L -> "c0", 4L -> "d1"))

    // batch 2 overrides batch 1's own row: the later equality entry
    // must kill the EARLIER BATCH's file too (it is in its dirty list)
    val (_, n2) = io.upsertMOR(t, Seq((4L, "d2"), (1L, "a2")).toDF("id", "s"), Seq("id"))
    assert(n2 === 2L)
    val expected = Set(1L -> "a2", 2L -> "b1", 3L -> "c0", 4L -> "d2")
    assert(io.read(t).as[(Long, String)].collect().toSet === expected)
    // equality entries pending: rowCount falls back to an honest count
    assert(io.rowCount(t) === 4L)

    val (va, _) = io.applyDeletes(t)
    assert(io.catalog.pendingDeletes(t, va).isEmpty)
    assert(io.read(t).as[(Long, String)].collect().toSet === expected)
    assert(io.rowCount(t) === 4L)
  }

  test("upsertMOR scoping: keys provably absent from every file commit a pure append, no entry") {
    val io = newIO("graft_mors_")
    val t = "default.scope"
    io.append(Seq((1L, "x"), (2L, "y")).toDF("id", "s").coalesce(1), t)
    val (v1, _) = io.upsertMOR(t, Seq((100L, "new")).toDF("id", "s"), Seq("id"))
    // manifest min/max on id proves no existing file can hold key 100
    assert(io.catalog.pendingDeletes(t, v1).isEmpty)
    assert(io.read(t).count() === 3L)
  }

  test("equality keys are rename-proof: ALTER RENAME after the entry still resolves") {
    val wh = Files.createTempDirectory("graft_morr_").toString
    val io = TableIO(spark, wh)
    spark.conf.set("spark.sql.catalog.gmr", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmr.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gmr.default.renamed (id BIGINT, s STRING)")
      spark.sql("INSERT INTO gmr.default.renamed VALUES (1, 'a'), (2, 'b')")
      io.upsertMOR("default.renamed", Seq((2L, "b9")).toDF("id", "s"), Seq("id"))
      // rename the key column AFTER the equality entry committed: the
      // entry stores the PHYSICAL name, so the anti-join still lands
      spark.sql("ALTER TABLE gmr.default.renamed RENAME COLUMN id TO ident")
      assert(io.read("default.renamed").select("ident", "s")
        .as[(Long, String)].collect().toSet === Set(1L -> "a", 2L -> "b9"))
      val (va, _) = io.applyDeletes("default.renamed")
      assert(io.catalog.pendingDeletes("default.renamed", va).isEmpty)
      assert(io.read("default.renamed").select("ident", "s")
        .as[(Long, String)].collect().toSet === Set(1L -> "a", 2L -> "b9"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gmr")
      spark.conf.unset("spark.sql.catalog.gmr.warehouse")
    }
  }

  test("mixing kinds: deleteWhereMOR over pending equality entries sees the merged state") {
    val io = newIO("graft_morm_")
    val t = "default.mixed"
    io.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1), t)
    io.upsertMOR(t, Seq((2L, 21L)).toDF("id", "v"), Seq("id"))
    // the MOR delete scans the LIVE frame: it must kill the upserted
    // row (v=21), and the dead original (v=20) must not resurrect
    val (_, n) = io.deleteWhereMOR(t, col("v") === 21L)
    assert(n === 1L)
    assert(io.read(t).as[(Long, Long)].collect().toSet === Set(1L -> 10L))
    val (va, _) = io.applyDeletes(t)
    assert(io.read(t).as[(Long, Long)].collect().toSet === Set(1L -> 10L))
    assert(io.catalog.pendingDeletes(t, va).isEmpty)
  }

  test("streaming MOR sink: replayed micro-batch refused, stacked batches resolve last-write-wins") {
    import graft.streaming.TableSink
    val io = newIO("graft_morsk_")
    val t = "default.cdc_stream"
    io.append(Seq((1L, "a0", 0L)).toDF("id", "s", "ts").coalesce(1), t)

    // batch 0: two rows for one key — within-batch winner by ts desc
    assert(TableSink.commitUpsertMORBatch(io, t, 0L,
      Seq((1L, "a1", 5L), (1L, "a1-late", 3L), (2L, "b1", 1L)).toDF("id", "s", "ts"),
      Seq("id"), Seq("ts")))
    assert(io.read(t).as[(Long, String, Long)].collect().toSet ===
      Set((1L, "a1", 5L), (2L, "b1", 1L)))

    // at-least-once REPLAY of batch 0: refused by the mark
    assert(!TableSink.commitUpsertMORBatch(io, t, 0L,
      Seq((1L, "a1", 5L)).toDF("id", "s", "ts"), Seq("id"), Seq("ts")))

    // batch 1 overrides batch 0's row through the entry chain
    assert(TableSink.commitUpsertMORBatch(io, t, 1L,
      Seq((2L, "b2", 9L)).toDF("id", "s", "ts"), Seq("id"), Seq("ts")))
    val expected = Set((1L, "a1", 5L), (2L, "b2", 9L))
    assert(io.read(t).as[(Long, String, Long)].collect().toSet === expected)
    // materializing agrees
    io.applyDeletes(t)
    assert(io.read(t).as[(Long, String, Long)].collect().toSet === expected)
  }

  test("cdcApplyMOR: upserts + deletes in ONE zero-read commit; pure-delete batch; absent-key delete no-op") {
    val io = newIO("graft_cdc_")
    val t = "default.cdcfull"
    io.append(Seq((1L, "a0"), (2L, "b0"), (3L, "c0")).toDF("id", "s").coalesce(1), t)
    val v0 = io.catalog.currentVersion(t).get

    val batch = Seq((2L, "b1", "U"), (3L, "x", "D"), (4L, "d1", "I"), (9L, "x", "D"))
      .toDF("id", "s", "op")
    val (v1, n) = io.cdcApplyMOR(t, batch, Seq("id"), "op")
    assert(v1 === v0 + 1 && n === 4L)
    // zero-read: every pre-batch file survives the single commit
    assert(io.catalog.manifest(t, v0).toSet.subsetOf(io.catalog.manifest(t, v1).toSet))
    assert(io.read(t).as[(Long, String)].collect().toSet ===
      Set(1L -> "a0", 2L -> "b1", 4L -> "d1")) // 3 deleted, 9 absent = no-op

    // pure-delete batch: appends nothing, kills the key
    val (v2, n2) = io.cdcApplyMOR(t, Seq((1L, "x", "D")).toDF("id", "s", "op"), Seq("id"), "op")
    assert(n2 === 1L)
    assert(io.catalog.manifest(t, v2).size === io.catalog.manifest(t, v1).size)
    assert(io.read(t).as[(Long, String)].collect().toSet === Set(2L -> "b1", 4L -> "d1"))

    val (va, _) = io.applyDeletes(t)
    assert(io.catalog.pendingDeletes(t, va).isEmpty)
    assert(io.read(t).as[(Long, String)].collect().toSet === Set(2L -> "b1", 4L -> "d1"))
    assert(io.rowCount(t) === 2L)
  }

  test("streaming CDC sink: latest op per key wins within a batch; delete replay-safe across batches") {
    import graft.streaming.TableSink
    val io = newIO("graft_cdcsk_")
    val t = "default.cdcfeed"
    io.append(Seq((1L, "a0", 0L)).toDF("id", "s", "ts").coalesce(1), t)

    // within-batch CDC order: key 5 updated then DELETED (delete wins),
    // key 6 deleted then UPDATED (update wins), key 1 plain update
    assert(TableSink.commitCdcMORBatch(io, t, 0L,
      Seq((5L, "e1", 1L, "U"), (5L, "x", 2L, "D"),
        (6L, "x", 1L, "D"), (6L, "f2", 2L, "U"),
        (1L, "a1", 3L, "U")).toDF("id", "s", "ts", "op"),
      Seq("id"), Seq("ts"), "op"))
    assert(io.read(t).select("id", "s").as[(Long, String)].collect().toSet ===
      Set(1L -> "a1", 6L -> "f2"))

    // replay of batch 0 refused
    assert(!TableSink.commitCdcMORBatch(io, t, 0L,
      Seq((1L, "a1", 3L, "U")).toDF("id", "s", "ts", "op"), Seq("id"), Seq("ts"), "op"))

    // batch 1 deletes a key batch 0 created
    assert(TableSink.commitCdcMORBatch(io, t, 1L,
      Seq((6L, "x", 9L, "D")).toDF("id", "s", "ts", "op"), Seq("id"), Seq("ts"), "op"))
    assert(io.read(t).select("id", "s").as[(Long, String)].collect().toSet ===
      Set(1L -> "a1"))
    io.applyDeletes(t)
    assert(io.read(t).select("id", "s").as[(Long, String)].collect().toSet ===
      Set(1L -> "a1"))
  }

  test("ALTER DROP of a pending equality-key column refuses (RENAME stays fine); applyDeletes unblocks the drop") {
    val io = newIO("graft_morad_")
    val t = "default.altguard"
    io.append(Seq((1L, "a", 5L)).toDF("id", "s", "extra").coalesce(1), t)
    io.upsertMOR(t, Seq((1L, "a1", 6L)).toDF("id", "s", "extra"), Seq("id"))
    val wh = io.catalog.warehouse
    spark.conf.set("spark.sql.catalog.gmad", classOf[graft.io.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmad.warehouse", wh)
    try {
      val e = intercept[Exception](
        spark.sql(s"ALTER TABLE gmad.$t DROP COLUMN id"))
      def msg(x: Throwable): String =
        Option(x.getMessage).getOrElse("") +
          Option(x.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
      assert(msg(e).contains("equality-delete"), msg(e))
      // unrelated columns drop fine while dirty; key columns RENAME fine
      spark.sql(s"ALTER TABLE gmad.$t DROP COLUMN extra")
      spark.sql(s"ALTER TABLE gmad.$t RENAME COLUMN id TO uid")
      assert(spark.table(s"gmad.$t").as[(Long, String)].collect().toSet ===
        Set(1L -> "a1"))
      // materializing clears the guard
      io.applyDeletes(t)
      spark.sql(s"ALTER TABLE gmad.$t DROP COLUMN uid")
      assert(spark.table(s"gmad.$t").as[String].collect().toSeq === Seq("a1"))
    } finally {
      spark.conf.unset("spark.sql.catalog.gmad")
      spark.conf.unset("spark.sql.catalog.gmad.warehouse")
    }
  }

  test("upsertMOR idle batch with a stream mark commits metadata-only and carries entries") {
    val io = newIO("graft_mori_")
    val t = "default.idle"
    io.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    io.upsertMOR(t, Seq((1L, "a1")).toDF("id", "s"), Seq("id"))
    val vDirty = io.catalog.currentVersion(t).get
    val (vMark, n) = io.upsertMOR(t, Seq.empty[(Long, String)].toDF("id", "s"),
      Seq("id"), props = Map("streamBatchId" -> "7"))
    assert(vMark === vDirty + 1 && n === 0L)
    assert(io.catalog.manifest(t, vMark) === io.catalog.manifest(t, vDirty))
    assert(io.catalog.pendingDeletes(t, vMark).nonEmpty) // entries carried
    assert(io.read(t).as[(Long, String)].collect().toSet === Set(1L -> "a1"))
  }
}
