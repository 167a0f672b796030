package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The graft table as a STREAMING SOURCE (`spark.readStream.table(...)`)
  * — the table-as-stream capability the reference inherits from
  * Iceberg/Delta: each micro-batch serves the files APPENDED between
  * two snapshot versions, so a downstream pipeline follows the table's
  * commit log with exactly-once progress tracked by the checkpointed
  * version offset. At 100 TB this is the CDC fan-out primitive: the
  * consumer's per-batch cost is O(files the producers committed since
  * the last batch), never a table rescan.
  *
  * Semantics mirror [[TableIO.readIncremental]] (the batch twin), and
  * so do the refusals — the stream is only sound over APPEND-ONLY
  * history:
  *  - a range containing a non-append commit (overwrite, COW DML,
  *    compaction) fails loudly: its rows cannot be expressed as a
  *    pure insert delta (restart the stream from a fresh checkpoint
  *    after such maintenance);
  *  - a range containing pending merge-on-read deletes fails loudly
  *    naming applyDeletes (a MOR commit changes no files, so the
  *    file diff would serve deleted rows as live);
  *  - an expired manifest in range fails loudly (history needed for
  *    the diff is gone).
  *
  * `option("startingVersion", v)` picks the baseline: the default 0
  * serves the table's full content as the first batch (Delta's
  * default); the CURRENT version at stream start makes it
  * new-commits-only.
  */
private[io] class GraftMicroBatchStream(
    tableName: String,
    cat: TableCatalog,
    physSchema: StructType,
    options: CaseInsensitiveStringMap
) extends MicroBatchStream {

  private case class V(v: Int) extends Offset {
    override def json(): String = v.toString
  }

  private val startV: Int =
    Option(options.get("startingVersion")).map(_.trim.toInt).getOrElse(0)

  override def initialOffset(): Offset = V(startV)
  override def latestOffset(): Offset = V(cat.currentVersion(tableName).getOrElse(0))
  override def deserializeOffset(json: String): Offset = V(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // the factory belongs to the batch planned LAST — micro-batch
  // planning is single-threaded per stream (plan, then factory)
  @volatile private var batchFactory: PartitionReaderFactory = EmptyReaderFactory

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[V].v
    val e = end.asInstanceOf[V].v
    if (e <= s) { batchFactory = EmptyReaderFactory; return Array.empty }
    def manifestOrReject(v: Int): Seq[String] =
      if (v == 0) Seq.empty
      else
        try cat.manifest(tableName, v)
        catch {
          case _: java.nio.file.NoSuchFileException => throw new IllegalStateException(
            s"table stream over $tableName: snapshot $v in range [$s, $e] is expired — " +
              "the commit log needed for the delta is gone; restart the stream")
        }
    (math.max(s, 1) to e).foreach { v =>
      if (cat.pendingDeletes(tableName, v).nonEmpty)
        throw new IllegalStateException(
          s"table stream over $tableName: snapshot $v carries pending merge-on-read " +
            "deletes — a MOR commit changes no files, so the file diff would serve " +
            "deleted rows as live. Run applyDeletes and restart the stream from the " +
            "applied snapshot (startingVersion)")
    }
    var prev = manifestOrReject(s).toSet
    val fromFiles = prev
    ((s + 1) to e).foreach { v =>
      val cur = manifestOrReject(v).toSet
      val removed = prev.diff(cur)
      if (removed.nonEmpty) throw new IllegalStateException(
        s"table stream over $tableName requires append-only history: snapshot $v " +
          s"removed ${removed.size} file(s) (overwrite, row-level DML, or compaction). " +
          "Restart the stream with a fresh checkpoint (startingVersion at or after the " +
          "rewrite) — its rows are not expressible as an insert delta")
      prev = cur
    }
    val added = manifestOrReject(e).filterNot(fromFiles)
    if (added.isEmpty) { batchFactory = EmptyReaderFactory; return Array.empty }
    // a plain parquet batch over exactly the added files, pinned to
    // the stream's schema (no inference: the manifest may be long
    // gone by restart time, but the schema rides the checkpoint).
    // basePath anchors partition-directory values (Hive-partitioned
    // and hidden-layout tables carry them in dir names, not footers)
    val scanOptions = new CaseInsensitiveStringMap(
      java.util.Map.of("basePath", cat.dataPath(tableName)))
    val scanTable = ParquetTable(s"$tableName#stream@v$e", SparkSession.active,
      scanOptions, added, Some(physSchema),
      classOf[ParquetFileFormat])
    val sb = scanTable.newScanBuilder(scanOptions)
    // prune to exactly the stream's schema: hidden gp_* layout dirs
    // would otherwise be inferred as partition columns and APPENDED,
    // breaking the fixed streaming row shape (their values derive from
    // source columns the footers already carry)
    sb match {
      case p: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
        p.pruneColumns(physSchema)
      case _ => ()
    }
    val batch = sb.build().toBatch
    batchFactory = batch.createReaderFactory()
    batch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = batchFactory

  private object EmptyReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
      throw new IllegalStateException("empty micro-batch planned no partitions")
  }
}

/** Mixin giving a graft Scan the streaming-source half — batch
  * delegation stays with the implementor. `None` = this scan shape
  * cannot stream (refuse loudly, never a generic default).
  */
private[io] trait GraftStreamableScan extends Scan {
  def streamSource: Option[(TableCatalog, String, StructType, CaseInsensitiveStringMap)]
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    streamSource match {
      case Some((cat, t, sch, opts)) => new GraftMicroBatchStream(t, cat, sch, opts)
      case None => throw new UnsupportedOperationException(
        "this graft scan shape cannot serve a stream (renamed-column, Hive-dir-" +
          "partitioned, and dirty merge-on-read tables are batch-only sources; " +
          "hidden-layout partitioning streams fine)")
    }
}

/** A plain graft scan with the streaming half attached — batch
  * planning (schema, partitions, stats, explain description) forwards
  * untouched to the pruned parquet scan.
  */
private[io] class StreamableParquetScan(
    inner: Scan,
    val streamSource: Option[(TableCatalog, String, StructType, CaseInsensitiveStringMap)]
) extends Scan with GraftStreamableScan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = inner.description()
  override def toBatch: org.apache.spark.sql.connector.read.Batch = inner.toBatch
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    inner match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        s.estimateStatistics()
      case _ => new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
      }
    }
}
