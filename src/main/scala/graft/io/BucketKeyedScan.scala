package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.StructType

/** Storage-partitioned-join reporting for a `bucket(n, key)` hidden
  * layout: wraps the pruned parquet scan and reports
  * `KeyGroupedPartitioning(bucket(n, key))` with bucket-PURE input
  * partitions, so a SQL join of two tables sharing the spec (same n,
  * same key type — checked through [[GraftBucketFunction]]'s canonical
  * name) plans with zero exchange, the storage-partitioned join
  * Iceberg does. Unifies the layout's point-lookup pruning (q112) with
  * the shuffle-free co-located join (q69's programmatic twin) on the
  * SQL surface.
  *
  * Partition shape: the delegate's size-packed `FilePartition`s are
  * kept whenever they are already bucket-pure and SPLIT per bucket
  * when mixed — parallelism stays file/size-driven (a plain scan of a
  * 16-bucket table still uses every core); Spark's `BatchScanExec`
  * groups same-key partitions only when a join actually exploits the
  * partitioning. Reading delegates untouched to the parquet reader
  * factory — the wrapper only re-labels partitions.
  *
  * Constructed ONLY when every kept file carries the bucket directory
  * (`fileToBucket` total): pre-spec files make the layout unprovable
  * and the builder falls back to the plain scan — conservative, never
  * wrong.
  */
private[io] class BucketKeyedScan(
    inner: Scan,
    bucket: PartitionTransforms.Bucket,
    fileToBucket: Map[String, Int]
) extends Scan with SupportsReportPartitioning with SupportsReportStatistics {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String =
    s"${inner.description()} (keyed: ${bucket.spec})"

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(bucket.n, bucket.src)),
      fileToBucket.values.toSet.size)

  private def key(b: Int): InternalRow = new GenericInternalRow(Array[Any](b))

  override def toBatch: Batch = new Batch {
    private val innerBatch = inner.toBatch

    override def planInputPartitions(): Array[InputPartition] = {
      val parts = innerBatch.planInputPartitions()
      def bucketOf(pathStr: String): Int =
        fileToBucket.getOrElse(pathStr,
          // the builder proved totality against the kept-file list; a
          // miss here is a planner-introduced path mismatch — refuse
          // loudly rather than mis-bucket silently
          throw new IllegalStateException(
            s"bucket-keyed scan: no layout value for planned file $pathStr"))
      parts.iterator.flatMap {
        case fp: FilePartition =>
          fp.files.groupBy(pf => bucketOf(pf.filePath.toUri.getPath)).map {
            case (b, pfs) => (b, pfs)
          }
        case other =>
          throw new IllegalStateException(
            s"bucket-keyed scan expected FilePartition, got ${other.getClass}")
      }.zipWithIndex.map { case ((b, pfs), idx) =>
        KeyedFilePartition(FilePartition(idx, pfs), key(b)): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new UnwrapKeyedReaderFactory(innerBatch.createReaderFactory())
  }
}

/** A delegate `FilePartition` labeled with its bucket key — what
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
