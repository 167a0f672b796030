package graft

import org.apache.spark.sql.functions._

import graft.io.TableIO
import graft.streaming.TableSink

/** `TableIO.upsert` (stats/bloom-scoped key replacement) and the
  * streaming upsert sink's exactly-once + last-write-wins semantics.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces exactly the affected keys and rewrites only the files that can hold them") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ups_").toString
    val io = TableIO(spark, wh)
    io.append((0L until 400L).map(k => (k, s"v$k")).toDF("k", "s"), "default.t")
    io.compactSorted("default.t", Seq("k"), targetFiles = 4) // range-tiled files
    val before = io.catalog.manifest("default.t", io.versions("default.t").last)
    assert(before.size >= 4)

    io.upsert("default.t", Seq((7L, "NEW7"), (9L, "NEW9")).toDF("k", "s"), Seq("k"))

    val after = io.catalog.manifest("default.t", io.versions("default.t").last)
    // keys 7 and 9 live in ONE range tile: every other file carries over
    assert(before.toSet.intersect(after.toSet).size == before.size - 1,
      s"expected 1 rewritten file, before=${before.size} carried=${before.toSet.intersect(after.toSet).size}")
    val got = io.read("default.t").as[(Long, String)].collect().toMap
    assert(got.size == 400 && got(7L) == "NEW7" && got(9L) == "NEW9" && got(8L) == "v8")
  }

  test("upsert inserts unseen keys and creates the table when absent") {
    val wh = java.nio.file.Files.createTempDirectory("graft_upsi_").toString
    val io = TableIO(spark, wh)
    io.upsert("default.n", Seq((1L, "a")).toDF("k", "s"), Seq("k")) // create
    io.upsert("default.n", Seq((2L, "b")).toDF("k", "s"), Seq("k")) // pure insert
    io.upsert("default.n", Seq((1L, "A2"), (3L, "c")).toDF("k", "s"), Seq("k")) // mixed
    assert(io.read("default.n").as[(Long, String)].collect().toMap ==
      Map(1L -> "A2", 2L -> "b", 3L -> "c"))
  }

  test("commitUpsertBatch: within-batch last-write-wins and replayed batch ids are no-ops") {
    val wh = java.nio.file.Files.createTempDirectory("graft_upsb_").toString
    val io = TableIO(spark, wh)
    val t = "default.state"
    val b0 = Seq((1L, 10L, "old"), (1L, 20L, "new"), (2L, 5L, "two"))
      .toDF("k", "ord", "s")
    assert(TableSink.commitUpsertBatch(io, t, 0L, b0, Seq("k"), Seq("ord")))
    assert(io.read(t).as[(Long, Long, String)].collect().toSet ==
      Set((1L, 20L, "new"), (2L, 5L, "two")))
    // replay of batch 0 (same sink lineage) must not double-apply
    val replay = Seq((1L, 99L, "ghost")).toDF("k", "ord", "s")
    assert(!TableSink.commitUpsertBatch(io, t, 0L, replay, Seq("k"), Seq("ord")))
    assert(io.read(t).filter($"s" === "ghost").isEmpty)
    val versions = io.versions(t).size
    // batch 1 applies; CROSS-batch semantics are CDC order: the later
    // batch replaces key 1 even though its ord is LOWER
    assert(TableSink.commitUpsertBatch(io, t, 1L, Seq((1L, 1L, "later")).toDF("k", "ord", "s"),
      Seq("k"), Seq("ord")))
    assert(io.read(t).as[(Long, Long, String)].collect().toSet ==
      Set((1L, 1L, "later"), (2L, 5L, "two")))
    assert(io.versions(t).size == versions + 1)
  }

  test("empty batch touches no files; NULL keys are rejected loudly") {
    val wh = java.nio.file.Files.createTempDirectory("graft_upse_").toString
    val io = TableIO(spark, wh)
    io.append((0L until 100L).map(k => (k, s"v$k")).toDF("k", "s").repartition(4), "default.e")
    val before = io.catalog.manifest("default.e", io.versions("default.e").last)
    // empty batch: In(key, []) must NOT read as match-everything
    io.upsert("default.e", Seq.empty[(Long, String)].toDF("k", "s"), Seq("k"),
      props = Map("mark" -> "1"))
    val after = io.catalog.manifest("default.e", io.versions("default.e").last)
    assert(after.toSet == before.toSet,
      s"empty batch must be METADATA-ONLY (no junk empty data file per idle micro-batch), " +
        s"files ${before.size} -> ${after.size}")
    assert(io.read("default.e").count() == 100L)
    // the mark still rode the commit
    assert(io.catalog.manifestProps("default.e", io.versions("default.e").last)("mark") == "1")
    // an empty batch with NO props is a pure no-op: no snapshot at all
    val vNow = io.versions("default.e").size
    io.upsert("default.e", Seq.empty[(Long, String)].toDF("k", "s"), Seq("k"))
    assert(io.versions("default.e").size == vNow, "markless empty batch must not commit")
    // NULL keys duplicate-instead-of-replace under anti-join equality -> reject
    val e = intercept[IllegalArgumentException] {
      io.upsert("default.e", Seq[(java.lang.Long, String)]((null, "x")).toDF("k", "s"), Seq("k"))
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("upsert fuzz: 15 random CDC batches always equal the model map") {
    val wh = java.nio.file.Files.createTempDirectory("graft_upsf_").toString
    val io = TableIO(spark, wh)
    val rnd = new scala.util.Random(77)
    var model = Map.empty[Long, String]
    for (step <- 1 to 15) {
      val batch = (0 until (rnd.nextInt(6) + 1)).map { _ =>
        val k = rnd.nextInt(30).toLong // small key space forces overlap
        (k, s"v${step}_$k")
      }.distinct
      // last occurrence per key wins within the batch by contract;
      // .distinct + unique values per step make batches key-unique here
      val byKey = batch.groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }.toSeq
      io.upsert("default.f", byKey.toDF("k", "s"), Seq("k"))
      model = model ++ byKey
      val got = io.read("default.f").as[(Long, String)].collect().toMap
      assert(got == model, s"diverged at step $step: got=${got.size} model=${model.size}")
    }
    // history stayed navigable: every snapshot is still readable
    assert(io.versions("default.f").size == 15)
    assert(io.readVersion("default.f", 1).count() >= 1)
  }

  test("upsertStream restart: same checkpoint continues incrementally, fresh checkpoint re-applies") {
    val wh = java.nio.file.Files.createTempDirectory("graft_upsr_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_upsrc2_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upck2_").toString
    val io = TableIO(spark, wh)
    def drain(checkpoint: String): Unit = {
      val schema = spark.read.parquet(src).schema
      TableSink.upsertStream(
        spark.readStream.schema(schema).parquet(src), io, "default.rs", checkpoint,
        keyCols = Seq("k"), orderCols = Seq("ord"), availableNow = true).awaitTermination()
    }
    Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "ord", "s")
      .coalesce(1).write.mode("append").parquet(src)
    drain(ckpt)
    assert(io.read("default.rs").count() == 2L)
    val versionsAfterFirst = io.versions("default.rs").size
    // same checkpoint, nothing new: the drain commits no snapshot
    drain(ckpt)
    assert(io.versions("default.rs").size == versionsAfterFirst,
      "an empty catch-up drain must not commit")
    // new source file: only it is processed, replacing key 1
    Seq((1L, 20L, "a2")).toDF("k", "ord", "s").coalesce(1).write.mode("append").parquet(src)
    drain(ckpt)
    assert(io.read("default.rs").as[(Long, Long, String)].collect().toSet ==
      Set((1L, 20L, "a2"), (2L, 10L, "b")))
    // FRESH checkpoint: batch ids restart at 0 — the lineage-keyed
    // mark must let the re-drain APPLY (re-upserting the same rows is
    // idempotent on the keys), not silently skip everything
    drain(java.nio.file.Files.createTempDirectory("graft_upck3_").toString)
    assert(io.read("default.rs").as[(Long, Long, String)].collect().toSet ==
      Set((1L, 20L, "a2"), (2L, 10L, "b")))
  }

  test("upsertStream over a file source drains availableNow into latest-state-per-key") {
    val wh = java.nio.file.Files.createTempDirectory("graft_upst_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_upsrc_").toString
    val io = TableIO(spark, wh)
    Seq((1L, 100L, "a"), (2L, 100L, "b"), (1L, 200L, "a2"))
      .toDF("k", "ord", "s").coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = TableSink.upsertStream(
      spark.readStream.schema(schema).parquet(src), io, "default.st",
      java.nio.file.Files.createTempDirectory("graft_upck_").toString,
      keyCols = Seq("k"), orderCols = Seq("ord", "s"), availableNow = true)
    q.awaitTermination()
    assert(io.read("default.st").as[(Long, Long, String)].collect().toSet ==
      Set((1L, 200L, "a2"), (2L, 100L, "b")))
  }
}
