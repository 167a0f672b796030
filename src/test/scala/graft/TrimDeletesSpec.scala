package graft.io

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Unit-level pins for [[TableIO.trimDeletesForRewrite]] — the commit
  * half of SQL DML over a dirty MOR snapshot. The sharded-write shapes
  * (one entry per shuffle partition, every entry listing the full
  * dirty list) are hash-placement-dependent in integration, so the
  * per-entry trim matrix is pinned here deterministically with
  * hand-built entries.
  */
class TrimDeletesSpec extends graft.SparkSpec {
  import spark.implicits._

  test("per-entry trim matrix: full-carry kept, full-consume dropped, partial shrinks, A-only shard becomes a dropped phantom") {
    val wh = Files.createTempDirectory("graft_trim_").toString
    val io = TableIO(spark, wh)
    val t = "default.m"
    io.append(Seq(1L, 2L).toDF("id").coalesce(1), t) // file A
    io.append(Seq(3L, 4L).toDF("id").coalesce(1), t) // file B
    val Seq(fa, fb) = io.catalog.manifest(t, 2).sorted.toSeq
    val root = Paths.get(io.catalog.pathOf(t)).toAbsolutePath.normalize
    val (ka, kb) = (TableIO.fileKeyOf(root, fa), TableIO.fileKeyOf(root, fb))

    def writeDel(rows: Seq[(String, Long)]): String = {
      val dir = Paths.get(io.catalog.pathOf(t), "deletes",
        java.util.UUID.randomUUID().toString.take(8))
      rows.toDF("gd_file", "gd_pos").coalesce(1).write.parquet(dir.toString)
      scala.util.Using.resource(Files.list(dir)) { s =>
        s.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
      }
    }
    // simulate a SHARDED delete set: shard 1 holds only A positions,
    // shard 2 only B positions — both entries list BOTH dirty files
    // (exactly what the sharded write commits)
    val shardA = writeDel(Seq((ka, 0L)))
    val shardB = writeDel(Seq((kb, 1L)))
    val entries = Seq(
      TableCatalog.DeleteEntry(shardA, Seq(fa, fb)),
      TableCatalog.DeleteEntry(shardB, Seq(fa, fb)),
      // an equality entry scoped to A only: fully consumed when A is
      // rewritten, regardless of its parquet content
      TableCatalog.DeleteEntry(writeDel(Seq((ka, 9L))), Seq(fa), Seq("id")))

    // A rewritten, B carried: shard A trims to EMPTY -> dropped
    // (phantom), shard B trims to itself scoped to B, the A-scoped
    // equality entry is consumed
    val props = io.trimDeletesForRewrite(t, entries, carried = Seq(fb))
    val trimmed = props.get(TableCatalog.DeletesProp)
      .map(TableCatalog.decodeDeletes).getOrElse(Seq.empty)
    assert(trimmed.size === 1, s"expected one surviving entry, got $trimmed")
    assert(!trimmed.head.isEquality && trimmed.head.dirtyFiles === Seq(
      root.relativize(Paths.get(fb).toAbsolutePath.normalize).toString))
    // the surviving entry's parquet holds exactly B's position
    val base = io.catalog.pathOf(t)
    val survivor = Paths.get(base).resolve(trimmed.head.deleteFile).toString
    assert(spark.read.parquet(survivor).as[(String, Long)].collect().toSeq ===
      Seq(kb -> 1L))

    // everything rewritten: all entries consumed, props empty
    assert(io.trimDeletesForRewrite(t, entries, carried = Seq.empty).isEmpty)

    // nothing rewritten: all entries carried VERBATIM (same files, no
    // new parquet written)
    val full = io.trimDeletesForRewrite(t, entries, carried = Seq(fa, fb))
      .get(TableCatalog.DeletesProp).map(TableCatalog.decodeDeletes).getOrElse(Seq.empty)
    assert(full.size === 3 && full.map(_.dirtyFiles.size) === Seq(2, 2, 1))
  }
}
