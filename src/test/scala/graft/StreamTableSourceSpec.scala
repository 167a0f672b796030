package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.io.{GraftCatalog, TableIO}

/** The graft table as a streaming SOURCE (`spark.readStream.table`):
  * micro-batches follow the snapshot chain (offset = version), serving
  * exactly the files each commit appended — the Iceberg/Delta
  * table-as-stream capability. Append-only history streams; rewrites,
  * pending MOR deletes, and expired manifests refuse loudly.
  */
class StreamTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private def withCat(cat: String)(body: String => Unit): Unit = {
    val wh = Files.createTempDirectory("graft_sts_").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(wh) finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  private def drain(tableRef: String, checkpoint: String,
                    opts: Map[String, String] = Map.empty): Seq[(Long, String)] = {
    val buf = mutable.ArrayBuffer.empty[(Long, String)]
    val reader = opts.foldLeft(spark.readStream) { case (r, (k, v)) => r.option(k, v) }
    val q = reader.table(tableRef).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized { buf ++= batch.select("id", "s").as[(Long, String)].collect() }
        ()
      }
      .start()
    q.awaitTermination()
    buf.toSeq
  }

  test("micro-batches follow the snapshot chain; a checkpointed restart serves only new commits") {
    withCat("gsts") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.src"
      io.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t)
      io.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)
      val ckpt = Files.createTempDirectory("graft_stsc_").toString

      // first drain: full history (startingVersion default 0)
      assert(drain(s"gsts.$t", ckpt).toSet === Set(1L -> "a", 2L -> "b", 3L -> "c"))
      // nothing new: empty drain
      assert(drain(s"gsts.$t", ckpt).isEmpty)
      // new commits only after restart from the same checkpoint
      io.append(Seq((4L, "d")).toDF("id", "s").coalesce(1), t)
      io.append(Seq((5L, "e")).toDF("id", "s").coalesce(1), t)
      assert(drain(s"gsts.$t", ckpt).toSet === Set(4L -> "d", 5L -> "e"))

      // startingVersion = current head: a fresh stream sees only the future
      val head = io.catalog.currentVersion(t).get
      val ckpt2 = Files.createTempDirectory("graft_stsc2_").toString
      assert(drain(s"gsts.$t", ckpt2,
        Map("startingVersion" -> head.toString)).isEmpty)
      io.append(Seq((6L, "f")).toDF("id", "s").coalesce(1), t)
      assert(drain(s"gsts.$t", ckpt2,
        Map("startingVersion" -> head.toString)).toSet === Set(6L -> "f"))
    }
  }

  test("a hidden-layout (bucketed) table streams with the layout dirs pruned; column pruning holds") {
    withCat("gstsb") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.bsrc"
      io.setPartitionSpec(t, Seq("bucket(4, id)"))
      io.append((0L until 20L).map(i => (i, s"v$i")).toDF("id", "s"), t)
      val ckpt = Files.createTempDirectory("graft_stsb_").toString
      val got = drain(s"gstsb.$t", ckpt)
      assert(got.toSet === (0L until 20L).map(i => i -> s"v$i").toSet)
    }
  }

  test("rewrites and pending MOR deletes refuse loudly; Hive-dir-partitioned tables are batch-only") {
    withCat("gstsr") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.rsrc"
      io.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
      val ckpt = Files.createTempDirectory("graft_stsr_").toString
      assert(drain(s"gstsr.$t", ckpt).toSet === Set(1L -> "a"))

      // a compaction rewrote history: the next drain must fail loudly
      io.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
      io.compact(t)
      val e1 = intercept[Exception](drain(s"gstsr.$t", ckpt))
      def msg(x: Throwable): String = {
        def walk(c: Throwable): Seq[String] =
          if (c == null) Seq.empty else Option(c.getMessage).toSeq ++ walk(c.getCause)
        walk(x).mkString(" | ")
      }
      assert(msg(e1).contains("append-only"), msg(e1))

      // pending MOR deletes in range: refuse naming the recovery
      val t2 = "default.msrc"
      io.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t2)
      io.deleteWhereMOR(t2, col("id") === 2L)
      val ckpt2 = Files.createTempDirectory("graft_stsm_").toString
      val e2 = intercept[Exception](drain(s"gstsr.$t2", ckpt2))
      assert(msg(e2).contains("applyDeletes"), msg(e2))

      // Hive-dir-partitioned: loud batch-only refusal
      val t3 = "default.psrc"
      io.append(Seq((1L, "a", "x")).toDF("id", "s", "p"), t3, partitionCols = Seq("p"))
      val ckpt3 = Files.createTempDirectory("graft_stsp_").toString
      val e3 = intercept[Exception](drain(s"gstsr.$t3", ckpt3))
      assert(msg(e3).contains("batch-only"), msg(e3))

      // RENAME mid-stream is METADATA-ONLY (r18 — Iceberg field-IDs /
      // Delta column mapping): the physical (birth) name is the
      // stable ID every data file stores, so a checkpointed stream
      // drains straight through an ALTER RENAME with zero rewrite,
      // and batch reads of pre-rename files stay green
      val t4 = "default.rnsrc"
      io.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), t4)
      val ckpt4 = Files.createTempDirectory("graft_stsn_").toString
      assert(drain(s"gstsr.$t4", ckpt4).toSet === Set(1L -> "a"))
      val v4 = io.catalog.currentVersion(t4).get
      val files4 = io.catalog.manifest(t4, v4)
      spark.sql(s"ALTER TABLE gstsr.$t4 RENAME COLUMN s TO label")
      // zero rewrite: same version, byte-identical file list
      assert(io.catalog.currentVersion(t4).get === v4)
      assert(io.catalog.manifest(t4, v4) === files4)
      // writes keep landing under the physical name; the SAME
      // checkpoint drains only the new commit, under the new schema
      io.append(Seq((2L, "b")).toDF("id", "label").coalesce(1), t4)
      val buf4 = mutable.ArrayBuffer.empty[(Long, String)]
      val q4 = spark.readStream.table(s"gstsr.$t4").writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt4)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          buf4.synchronized {
            buf4 ++= batch.select("id", "label").as[(Long, String)].collect()
          }
          ()
        }
        .start()
      q4.awaitTermination()
      assert(buf4.toSet === Set(2L -> "b"))
      // batch reads resolve BOTH generations of files by physical ID
      assert(spark.table(s"gstsr.$t4").select("id", "label").as[(Long, String)]
        .collect().toSet === Set(1L -> "a", 2L -> "b"))
    }
  }

  private def msgChain(x: Throwable): String = {
    def walk(c: Throwable): Seq[String] =
      if (c == null) Seq.empty else Option(c.getMessage).toSeq ++ walk(c.getCause)
    walk(x).mkString(" | ")
  }

  test("skipRewriteCommits rides through compaction / sorted rewrite / respec, exactly once") {
    withCat("gstsk") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.ksrc"
      val opts = Map("skipRewriteCommits" -> "true")
      io.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t)
      val ckpt = Files.createTempDirectory("graft_stsk_").toString
      assert(drain(s"gstsk.$t", ckpt, opts).toSet === Set(1L -> "a", 2L -> "b"))

      // append → compact → append, all unseen by the consumer yet: one
      // drain serves exactly the two appends, nothing from the rewrite
      io.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)
      io.compact(t)
      io.append(Seq((4L, "d")).toDF("id", "s").coalesce(1), t)
      assert(drain(s"gstsk.$t", ckpt, opts).toSet === Set(3L -> "c", 4L -> "d"))

      // sorted rewrite and spec relay are marked maintenance too
      io.compactSorted(t, Seq("id"), targetFiles = 2)
      io.append(Seq((5L, "e")).toDF("id", "s").coalesce(1), t)
      io.respecTable(t, Seq("bucket(2, id)"))
      io.append(Seq((6L, "f")).toDF("id", "s").coalesce(1), t)
      assert(drain(s"gstsk.$t", ckpt, opts).toSet === Set(5L -> "e", 6L -> "f"))

      // a full replay from scratch over the same maintained history
      // serves every appended row exactly once
      val ckpt2 = Files.createTempDirectory("graft_stsk2_").toString
      assert(drain(s"gstsk.$t", ckpt2, opts).toSet ===
        (1L to 6L).map(i => i -> ("abcdef" (i.toInt - 1)).toString).toSet)

      // an UNMARKED data-change rewrite still refuses, naming the option
      io.deleteWhere(t, col("id") === 1L)
      val e = intercept[Exception](drain(s"gstsk.$t", ckpt, opts))
      assert(msgChain(e).contains("not a content-preserving rewrite"), msgChain(e))
    }
  }

  test("pre-respec Hive-dir files in range refuse: their column values live in dir names") {
    withCat("gstsh") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.hsrc"
      // identity (Hive-dir) layout first: the column's values ride
      // directory names, stripped from the footers
      io.append(Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "s", "p"),
        t, partitionCols = Seq("p"))
      // respec to a hidden spec: the CURRENT layout is streamable, so
      // loadTable's gate passes — the per-file guard must still refuse
      // the pre-respec files (serving them raw would NULL column p)
      io.respecTable(t, Seq("bucket(2, id)"))
      io.append(Seq((3L, "c", "z")).toDF("id", "s", "p").coalesce(1), t)
      val e = intercept[Exception](drain(s"gstsh.$t",
        Files.createTempDirectory("graft_stsh_").toString,
        Map("skipRewriteCommits" -> "true")))
      assert(msgChain(e).contains("Hive-style directory names"), msgChain(e))
      // a stream STARTING at the respec rewrite reads clean (post-respec
      // files carry every column in footers)
      val vRespec = io.catalog.versions(t).takeRight(2).head
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
      val q = spark.readStream
        .option("startingVersion", vRespec.toString)
        .option("skipRewriteCommits", "true")
        .table(s"gstsh.$t").writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", Files.createTempDirectory("graft_stsh2_").toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized { buf ++= batch.select("id", "s", "p").as[(Long, String, String)].collect() }
          ()
        }
        .start()
      q.awaitTermination()
      assert(buf.toSet === Set((3L, "c", "z")))
    }
  }

  test("a column-pruned skipChangeCommits stream over a dirty MOR head serves aligned rows") {
    withCat("gstsd") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.dsrc"
      io.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t)
      io.deleteWhereMOR(t, col("id") === 1L) // head stays dirty
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = spark.readStream
        .option("skipChangeCommits", "true")
        .table(s"gstsd.$t")
        .select("s") // prunes id: the stream schema must follow
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", Files.createTempDirectory("graft_stsd_").toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized { buf ++= batch.as[String].collect() }
          ()
        }
        .start()
      q.awaitTermination()
      assert(buf.toSet === Set("a", "b")) // append-as-of: MOR delete invisible
    }
  }

  test("skipChangeCommits serves append-as-of rows through COW DML and MOR deletes") {
    withCat("gstsc") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.csrc"
      val opts = Map("skipChangeCommits" -> "true")
      io.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), t)
      io.deleteWhere(t, col("id") === 2L) // COW change: skipped
      io.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)
      io.deleteWhereMOR(t, col("id") === 3L) // pending MOR: tolerated
      io.append(Seq((4L, "d")).toDF("id", "s").coalesce(1), t)
      val ckpt = Files.createTempDirectory("graft_stscc_").toString
      // every row as of its APPEND — later deletes invisible by contract
      assert(drain(s"gstsc.$t", ckpt, opts).toSet ===
        Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    }
  }

  test("startingTimestamp serves commits at or after the instant (Delta semantics)") {
    withCat("gstst") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.tsrc"
      io.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), t) // v1
      io.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t) // v2
      // pin manifest mtimes so the boundary is deterministic (commits
      // in a test land within the same millisecond)
      val now = System.currentTimeMillis()
      def setMtime(v: Int, ms: Long): Unit =
        Files.setLastModifiedTime(io.catalog.metaPath(t).resolve(s"v$v.json"),
          java.nio.file.attribute.FileTime.fromMillis(ms))
      setMtime(1, now - 100000)
      setMtime(2, now - 50000)
      // boundary between v1 and v2: only v2's rows serve
      assert(drain(s"gstst.$t", Files.createTempDirectory("graft_stst1_").toString,
        Map("startingTimestamp" -> (now - 60000).toString)).toSet === Set(2L -> "b"))
      // exactly v2's instant: v2 still serves (at-or-after)
      assert(drain(s"gstst.$t", Files.createTempDirectory("graft_stst2_").toString,
        Map("startingTimestamp" -> (now - 50000).toString)).toSet === Set(2L -> "b"))
      // before the table existed: full history
      assert(drain(s"gstst.$t", Files.createTempDirectory("graft_stst3_").toString,
        Map("startingTimestamp" -> (now - 200000).toString)).toSet ===
        Set(1L -> "a", 2L -> "b"))
      // after the last commit: nothing yet
      assert(drain(s"gstst.$t", Files.createTempDirectory("graft_stst4_").toString,
        Map("startingTimestamp" -> now.toString)).isEmpty)
      // both options together, and junk values, name the option
      val e1 = intercept[Exception](drain(s"gstst.$t",
        Files.createTempDirectory("graft_stst5_").toString,
        Map("startingTimestamp" -> now.toString, "startingVersion" -> "1")))
      assert(msgChain(e1).contains("mutually exclusive"), msgChain(e1))
      val e2 = intercept[Exception](drain(s"gstst.$t",
        Files.createTempDirectory("graft_stst6_").toString,
        Map("startingTimestamp" -> "not-a-time")))
      assert(msgChain(e2).contains("startingTimestamp"), msgChain(e2))
    }
  }

  test("startingVersion is validated: non-numeric and out-of-range values name the option") {
    withCat("gstsv") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.vsrc"
      io.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
      val e1 = intercept[Exception](drain(s"gstsv.$t",
        Files.createTempDirectory("graft_stsv1_").toString,
        Map("startingVersion" -> "banana")))
      assert(msgChain(e1).contains("startingVersion"), msgChain(e1))
      val e2 = intercept[Exception](drain(s"gstsv.$t",
        Files.createTempDirectory("graft_stsv2_").toString,
        Map("startingVersion" -> "99")))
      assert(msgChain(e2).contains("outside the table's history"), msgChain(e2))
      val e3 = intercept[Exception](drain(s"gstsv.$t",
        Files.createTempDirectory("graft_stsv3_").toString,
        Map("startingVersion" -> "-1")))
      assert(msgChain(e3).contains("startingVersion"), msgChain(e3))
    }
  }

  test("mid-stream schema evolution contract: ADD serves from restart with null-filled old files; RENAME refuses") {
    withCat("gsev") { _ =>
      val t = "default.evo"
      spark.sql(s"CREATE TABLE gsev.$t (id BIGINT, s STRING) USING parquet")
      spark.sql(s"INSERT INTO gsev.$t SELECT 1, 'a'") // v1
      val ckpt = Files.createTempDirectory("graft_sevc_").toString
      assert(drain(s"gsev.$t", ckpt).toSet === Set(1L -> "a"))

      // evolution between drained batches against the LIVE checkpoint:
      // a pre-ALTER append (its file lacks the column), the ALTER, and
      // a post-ALTER append carrying the new column
      spark.sql(s"INSERT INTO gsev.$t SELECT 2, 'b'") // v2: no 'tag' in file
      spark.sql(s"ALTER TABLE gsev.$t ADD COLUMN tag STRING")
      spark.sql(s"INSERT INTO gsev.$t SELECT 3, 'c', 'T'") // v3: carries 'tag'

      // CONTRACT (Delta/Iceberg add-column semantics): the restarted
      // reader resolves the NEW schema; committed-but-undrained files
      // written before the ALTER serve NULL for the added column,
      // post-ALTER rows serve their value. Within a single stream run
      // the schema stays pinned at start — Spark's streaming contract
      // forbids a mid-query schema change anyway.
      val buf = mutable.ArrayBuffer.empty[(Long, String, Option[String])]
      val q = spark.readStream.table(s"gsev.$t").writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= batch.select("id", "s", "tag")
              .collect().map(r => (r.getLong(0), r.getString(1),
                Option(r.getString(2))))
          }
          ()
        }
        .start()
      q.awaitTermination()
      assert(buf.toSet === Set((2L, "b", None), (3L, "c", Some("T"))),
        s"pre-ALTER files must null-fill the added column, got ${buf.toSet}")

      // RENAME against the live checkpoint (r18 — supersedes the r17
      // refuse-loudly contract): per-batch file reads run under
      // PHYSICAL names, which are exactly the stable field IDs every
      // data file stores — the restarted reader resolves the NEW
      // logical names over old and new files alike, zero rewrite
      spark.sql(s"ALTER TABLE gsev.$t RENAME COLUMN s TO label")
      spark.sql(s"INSERT INTO gsev.$t SELECT 4, 'd', 'U'")
      val buf2 = mutable.ArrayBuffer.empty[(Long, String, Option[String])]
      val q2 = spark.readStream.table(s"gsev.$t").writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          buf2.synchronized {
            buf2 ++= batch.select("id", "label", "tag")
              .collect().map(r => (r.getLong(0), r.getString(1),
                Option(r.getString(2))))
          }
          ()
        }
        .start()
      q2.awaitTermination()
      assert(buf2.toSet === Set((4L, "d", Some("U"))),
        s"the checkpointed stream must drain through RENAME, got ${buf2.toSet}")
    }
  }

  /** Drain under AvailableNow recording EACH micro-batch's rows —
    * the admission-control observable.
    */
  private def drainBatches(tableRef: String, checkpoint: String,
                           opts: Map[String, String]): Seq[Seq[(Long, String)]] = {
    val buf = mutable.ArrayBuffer.empty[Seq[(Long, String)]]
    val reader = opts.foldLeft(spark.readStream) { case (r, (k, v)) => r.option(k, v) }
    val q = reader.table(tableRef).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("id", "s").as[(Long, String)].collect().toSeq
        buf.synchronized { if (rows.nonEmpty) buf += rows }
        ()
      }
      .start()
    q.awaitTermination()
    buf.toSeq
  }

  test("admission control: maxVersionsPerBatch bounds each micro-batch; AvailableNow drains to the pinned target") {
    withCat("gadm") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.rated"
      (1 to 6).foreach { i =>
        io.append(Seq((i.toLong, s"s$i")).toDF("id", "s").coalesce(1), t)
      }
      // capped catch-up: 6 commits at 2 versions/batch = 3 batches,
      // union identical to the uncapped drain
      val ckpt = Files.createTempDirectory("graft_adm_").toString
      val batches = drainBatches(s"gadm.$t", ckpt, Map("maxVersionsPerBatch" -> "2"))
      assert(batches.length === 3, s"got ${batches.map(_.size)}")
      assert(batches.forall(_.size <= 2))
      assert(batches.flatten.toSet ===
        (1 to 6).map(i => i.toLong -> s"s$i").toSet)
      // exactly-once across the capped batches: no overlap
      assert(batches.flatten.size === 6)

      // a restart resumes from the checkpoint, still capped
      io.append(Seq((7L, "s7")).toDF("id", "s").coalesce(1), t)
      io.append(Seq((8L, "s8")).toDF("id", "s").coalesce(1), t)
      io.append(Seq((9L, "s9")).toDF("id", "s").coalesce(1), t)
      val batches2 = drainBatches(s"gadm.$t", ckpt, Map("maxVersionsPerBatch" -> "2"))
      assert(batches2.length === 2 && batches2.flatten.toSet ===
        Set(7L -> "s7", 8L -> "s8", 9L -> "s9"))
    }
  }

  test("admission control: maxFilesPerBatch packs whole commits up to the cap; an oversized commit still flows") {
    withCat("gadf") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.fcap"
      // commit sizes in files: 2, 2, 5(> cap), 1 — range-partitioned
      // on distinct ids so every partition holds exactly one row
      // (round-robin repartition packs unevenly at these sizes)
      io.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s")
        .repartitionByRange(2, col("id")), t)
      io.append(Seq((3L, "c"), (4L, "d")).toDF("id", "s")
        .repartitionByRange(2, col("id")), t)
      io.append((5L to 9L).map(i => (i, s"x$i")).toDF("id", "s")
        .repartitionByRange(5, col("id")), t)
      io.append(Seq((10L, "z")).toDF("id", "s").coalesce(1), t)
      // the batching assertions below assume these per-commit file
      // counts — pin them so a packing change fails diagnostically
      val sizes = (1 to 4).map(v => io.catalog.manifest(t, v).size)
      assert(sizes === Seq(2, 4, 9, 10), s"cumulative manifest sizes drifted: $sizes")
      val ckpt = Files.createTempDirectory("graft_admf_").toString
      val batches = drainBatches(s"gadf.$t", ckpt, Map("maxFilesPerBatch" -> "4"))
      // v1+v2 pack into one 4-file batch; v3 exceeds the cap ALONE and
      // must still be admitted (its own batch); v4 trails
      assert(batches.length === 3, s"got ${batches.map(_.size)}")
      assert(batches(0).map(_._1).toSet === Set(1L, 2L, 3L, 4L))
      assert(batches(1).map(_._1).toSet === (5L to 9L).toSet)
      assert(batches(2).map(_._1).toSet === Set(10L))
    }
  }

  test("admission control: maxBytesPerBatch budgets commits by file bytes; an oversized commit still flows") {
    withCat("gadb") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.bcap"
      // four single-file commits; the third is ~50x larger than the rest
      io.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
      io.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
      io.append((100L to 2000L).map(i => (i, s"pad$i" * 40)).toDF("id", "s").coalesce(1), t)
      io.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)
      val small = io.catalog.manifest(t, 1).map(f =>
        java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
      // budget: both small commits fit together, the big one never does
      val batches = drainBatches(s"gadb.$t",
        Files.createTempDirectory("graft_admb_").toString,
        Map("maxBytesPerBatch" -> (small * 3).toString))
      // v1+v2 pack into one batch; v3 exceeds the budget ALONE and
      // must still be admitted; v4 trails
      assert(batches.length === 3, s"got ${batches.map(_.size)}")
      assert(batches(0).map(_._1).toSet === Set(1L, 2L))
      assert(batches(1).map(_._1).toSet === (100L to 2000L).toSet)
      assert(batches(2).map(_._1).toSet === Set(3L))
      // invalid budget refuses naming the option
      val e = intercept[Exception] {
        drainBatches(s"gadb.$t", Files.createTempDirectory("graft_admb2_").toString,
          Map("maxBytesPerBatch" -> "nope"))
      }
      assert(msgChain(e).contains("maxBytesPerBatch"), msgChain(e))
    }
  }

  test("admission control: invalid caps refuse naming the option; caps compose with skipRewriteCommits") {
    withCat("gadv") { wh =>
      val io = TableIO(spark, wh)
      val t = "default.vcap"
      io.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
      val e = intercept[Exception] {
        drainBatches(s"gadv.$t", Files.createTempDirectory("graft_admv_").toString,
          Map("maxVersionsPerBatch" -> "0"))
      }
      assert(msgChain(e).contains("maxVersionsPerBatch"), msgChain(e))

      // caps + maintenance tolerance: the compaction version is free
      // (serves nothing) and the stream still sees every append once
      io.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
      io.compact(t)
      io.append(Seq((3L, "c")).toDF("id", "s").coalesce(1), t)
      val ckpt = Files.createTempDirectory("graft_admw_").toString
      val batches = drainBatches(s"gadv.$t", ckpt,
        Map("maxVersionsPerBatch" -> "2", "skipRewriteCommits" -> "true"))
      assert(batches.flatten.toSet === Set(1L -> "a", 2L -> "b", 3L -> "c"))
      assert(batches.flatten.size === 3)
    }
  }
}
