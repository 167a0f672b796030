package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned-join reporting for a hidden layout: wraps the
  * pruned parquet scan and reports `KeyGroupedPartitioning` over the
  * spec's transforms with layout-PURE input partitions, so a SQL join
  * (or GROUP BY) of tables sharing the spec — same transforms, same
  * literals, same key types, checked through [[TransformFunctions]]'
  * canonical names — plans with zero exchange, the storage-partitioned
  * join Iceberg does. A realistic `[days(ts), bucket(16, id)]` fact
  * layout reports BOTH keys; joins on the full tuple are co-partitioned
  * directly, joins on a subset (id alone) additionally need
  * `spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys
  * .enabled`.
  *
  * Partition shape: the delegate's size-packed `FilePartition`s are
  * kept whenever they are already key-pure and SPLIT per key tuple
  * when mixed — parallelism stays file/size-driven (a plain scan of a
  * bucketed table still uses every core); Spark's `BatchScanExec`
  * groups same-key partitions only when a plan actually exploits the
  * partitioning. Reading delegates untouched to the parquet reader
  * factory — the wrapper only re-labels partitions.
  *
  * Constructed ONLY when [[KeyedLayoutScan.fileKeys]] could derive a
  * key value from EVERY kept file's directories for EVERY transform
  * (pre-spec files, null/empty-valued dirs, and Identity transforms
  * make the layout unprovable and the builder falls back to the plain
  * scan — conservative, never wrong).
  */
private[io] class KeyedLayoutScan(
    inner: Scan,
    spec: Seq[PartitionTransform],
    clustering: Array[Transform],
    fileToKey: Map[String, Seq[Any]],
    val streamSource: Option[(TableCatalog, String, StructType,
      org.apache.spark.sql.util.CaseInsensitiveStringMap)] = None
) extends Scan with SupportsReportPartitioning with SupportsReportStatistics
  with GraftStreamableScan
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String =
    s"${inner.description()} (keyed: ${spec.map(_.spec).mkString(", ")})"

  // forward DSv2 runtime filtering (dynamic partition pruning) to the
  // file scan — the filter only SHRINKS the kept-file set, so the
  // proven fileToKey stays total over every planned file; absent
  // support downstream degrades to "no filterable attributes"
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    inner match {
      case f: org.apache.spark.sql.connector.read.SupportsRuntimeFiltering => f.filterAttributes()
      case _ => Array.empty
    }
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    inner match {
      case f: org.apache.spark.sql.connector.read.SupportsRuntimeFiltering => f.filter(filters)
      case _ => ()
    }

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      clustering.map(t => t: org.apache.spark.sql.connector.expressions.Expression),
      fileToKey.values.toSet.size)

  override def toBatch: Batch = new Batch {
    private val innerBatch = inner.toBatch

    override def planInputPartitions(): Array[InputPartition] = {
      val parts = innerBatch.planInputPartitions()
      def keyOf(pathStr: String): Seq[Any] =
        fileToKey.getOrElse(pathStr,
          // the builder proved totality against the kept-file list; a
          // miss here is a planner-introduced path mismatch — refuse
          // loudly rather than mis-key silently
          throw new IllegalStateException(
            s"keyed layout scan: no layout value for planned file $pathStr"))
      parts.iterator.flatMap {
        case fp: FilePartition =>
          fp.files.groupBy(pf => keyOf(pf.filePath.toUri.getPath))
        case other =>
          throw new IllegalStateException(
            s"keyed layout scan expected FilePartition, got ${other.getClass}")
      }.zipWithIndex.map { case ((k, pfs), idx) =>
        KeyedFilePartition(FilePartition(idx, pfs),
          new GenericInternalRow(k.toArray)): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new UnwrapKeyedReaderFactory(innerBatch.createReaderFactory())
  }
}

private[io] object KeyedLayoutScan {

  /** Per-file key tuple for `spec` from the file's layout directories —
    * None when ANY transform's value is absent (pre-spec file) or
    * unparseable (the Hive null/empty dir), or when the spec contains
    * a transform whose directory form is not safely invertible
    * (Identity — arbitrary source types round-trip through Hive
    * escaping ambiguously). Values are CATALYST-typed to match the
    * bound V2 functions' result types: bucket → Int, time transforms →
    * Long, truncate → UTF8String (string sources) / Long (integrals).
    */
  def fileKeys(files: Seq[String], spec: Seq[PartitionTransform],
               schema: StructType): Option[Map[String, Seq[Any]]] = {
    import scala.util.Try
    if (spec.isEmpty || files.isEmpty) return None
    def srcTypeOf(src: String): Option[DataType] =
      schema.fields.find(_.name == src).map(_.dataType)
    def value(f: String, t: PartitionTransform): Option[Any] = t match {
      case b: PartitionTransforms.Bucket =>
        PartitionTransforms.bucketDirValue(f, b).map(Int.box)
      case _: PartitionTransforms.Days | _: PartitionTransforms.Hours |
           _: PartitionTransforms.Months | _: PartitionTransforms.Years =>
        PartitionTransforms.pathValue(f, t.derivedName)
          .flatMap(v => Try(Long.box(v.trim.toLong)).toOption)
      case tr: PartitionTransforms.Truncate => srcTypeOf(tr.src).flatMap {
        case StringType =>
          PartitionTransforms.pathValue(f, tr.derivedName)
            .filter(_ != "__HIVE_DEFAULT_PARTITION__")
            .map(UTF8String.fromString)
        case _ =>
          PartitionTransforms.pathValue(f, tr.derivedName)
            .flatMap(v => Try(Long.box(v.trim.toLong)).toOption)
      }
      case _ => None // Identity: not safely invertible from a dir name
    }
    val keyed = files.map { f =>
      val vs = spec.map(t => value(f, t))
      if (vs.exists(_.isEmpty)) return None
      java.nio.file.Paths.get(f).toAbsolutePath.normalize.toString -> vs.map(_.get)
    }
    Some(keyed.toMap)
  }
}

/** A delegate `FilePartition` labeled with its layout key tuple — what
  * `BatchScanExec.groupPartitions` groups on.
  */
private[io] case class KeyedFilePartition(inner: FilePartition, keyRow: InternalRow)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = keyRow
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Unwraps [[KeyedFilePartition]] before handing partitions to the
  * real parquet reader factory — reading is byte-identical to the
  * unkeyed scan.
  */
private[io] class UnwrapKeyedReaderFactory(delegate: PartitionReaderFactory)
  extends PartitionReaderFactory {
  private def un(p: InputPartition): InputPartition = p match {
    case k: KeyedFilePartition => k.inner
    case other => other
  }
  override def createReader(p: InputPartition): org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    delegate.createReader(un(p))
  override def createColumnarReader(p: InputPartition): org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    delegate.createColumnarReader(un(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(un(p))
}
