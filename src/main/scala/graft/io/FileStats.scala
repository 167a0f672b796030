package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveComparator
import org.apache.spark.sql.sources._

import scala.jdk.CollectionConverters._

/** Driver-side parquet footer statistics, used to scope copy-on-write
  * row-level operations to the files a predicate can possibly touch
  * (the poor man's Iceberg manifest stats: same decision, read from
  * the footers at plan time instead of a stats table).
  *
  * Everything here is CONSERVATIVE: any column, type, filter shape, or
  * unreadable footer we don't understand yields "might match", which
  * only costs an unnecessary rewrite of that file — never a wrong
  * result. Supported prunes: Equal/In/>/>=/</<= and conjunctions over
  * top-level int/long/float/double/string columns, plus IsNull via the
  * footer null counts.
  */
object FileStats {

  /** Per-column (min, max, nullCount, hasValues) aggregated over the
    * file's row groups; None for columns whose stats are absent.
    */
  final case class ColStats(min: Any, max: Any, nullCount: Long, rowCount: Long)

  /** Footer stats memoized per absolute path — data files are
    * immutable once committed (overwrites write NEW files), so the
    * cache never staleses within a JVM. At real scale this cache is
    * the stand-in for stats persisted into the manifest at commit
    * time; rewriting it as a commit-time sidecar changes only where
    * `read` runs, not any decision made here.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Map[String, ColStats]]()

  def cached(file: String, conf: Configuration): Map[String, ColStats] =
    cache.computeIfAbsent(file, f => read(f, conf))

  /** Drop cache entries for files physically deleted by GC
    * (`removeOrphanFiles`) so a long-lived driver doesn't accumulate
    * stats for bytes that no longer exist.
    */
  def invalidate(files: Iterable[String]): Unit = files.foreach(cache.remove)

  def read(file: String, conf: Configuration): Map[String, ColStats] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rowCount = blocks.map(_.getRowCount).sum
      blocks.flatMap(_.getColumns.asScala)
        .filter(c => c.getPath.size() == 1) // top-level only
        .groupBy(_.getPath.toDotString)
        .flatMap { case (name, chunks) =>
          val stats = chunks.map(_.getStatistics)
          if (stats.exists(s => s == null || !s.isNumNullsSet ||
              (!s.hasNonNullValue && s.getNumNulls == 0L))) None
          else {
            val nulls = stats.map(_.getNumNulls).sum
            val withValues = stats.filter(_.hasNonNullValue)
            if (withValues.isEmpty) Some(name -> ColStats(null, null, nulls, rowCount))
            else Some(name -> ColStats(
              withValues.map(s => s.genericGetMin: Any).reduce(minOf),
              withValues.map(s => s.genericGetMax: Any).reduce(maxOf),
              nulls, rowCount))
          }
        }
    } finally reader.close()
  }

  private def minOf(a: Any, b: Any): Any = if (cmp(a, b).exists(_ <= 0)) a else b
  private def maxOf(a: Any, b: Any): Any = if (cmp(a, b).exists(_ >= 0)) a else b

  /** Compare a stats value against a filter literal in a shared
    * domain; None when the pair isn't comparable (-> conservative).
    */
  private def cmp(statVal: Any, litVal: Any): Option[Int] = (statVal, litVal) match {
    case (a: java.lang.Number, b: java.lang.Number)
        if isIntegral(a) && isIntegral(b) =>
      Some(java.lang.Long.compare(a.longValue(), b.longValue()))
    case (a: java.lang.Number, b: java.lang.Number) =>
      Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
    // parquet orders UTF8 binary min/max in UNSIGNED byte order; java
    // String.compareTo is UTF-16 code-unit order and the two disagree
    // for supplementary characters (anything above U+FFFF, e.g. emoji)
    // — comparing in the wrong order can "prove" a non-match and
    // silently drop a file, so compare literals as UTF-8 bytes in the
    // same unsigned order the stats were computed in
    case (a: Binary, b: String) =>
      Some(PrimitiveComparator.UNSIGNED_LEXICOGRAPHICAL_BINARY_COMPARATOR
        .compare(a, Binary.fromString(b)))
    case (a: Binary, b: Binary) =>
      Some(PrimitiveComparator.UNSIGNED_LEXICOGRAPHICAL_BINARY_COMPARATOR.compare(a, b))
    case _ => None
  }

  private def isIntegral(n: java.lang.Number): Boolean = n match {
    case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }

  /** Conservative file-level evaluation: false ONLY when the footer
    * stats PROVE no row of the file can satisfy every filter.
    */
  def mightMatch(stats: Map[String, ColStats], filters: Seq[Filter]): Boolean =
    filters.forall(f => mightMatchOne(stats, f))

  private def mightMatchOne(stats: Map[String, ColStats], f: Filter): Boolean = f match {
    case EqualTo(a, v) => rangeMayContain(stats.get(a), v)
    case In(a, vs) => vs.isEmpty || vs.exists(v => rangeMayContain(stats.get(a), v))
    case GreaterThan(a, v) =>
      stats.get(a).forall(s => s.max == null || cmp(s.max, v).forall(_ > 0))
    case GreaterThanOrEqual(a, v) =>
      stats.get(a).forall(s => s.max == null || cmp(s.max, v).forall(_ >= 0))
    case LessThan(a, v) =>
      stats.get(a).forall(s => s.min == null || cmp(s.min, v).forall(_ < 0))
    case LessThanOrEqual(a, v) =>
      stats.get(a).forall(s => s.min == null || cmp(s.min, v).forall(_ <= 0))
    case IsNull(a) => stats.get(a).forall(_.nullCount > 0)
    case IsNotNull(a) => stats.get(a).forall(s => s.min != null || s.nullCount < s.rowCount)
    case And(l, r) => mightMatchOne(stats, l) && mightMatchOne(stats, r)
    case Or(l, r) => mightMatchOne(stats, l) || mightMatchOne(stats, r)
    case _ => true // Not / string matches / unknown shapes: keep the file
  }

  private def rangeMayContain(s: Option[ColStats], v: Any): Boolean = s.forall { cs =>
    if (cs.min == null || cs.max == null) cs.nullCount > 0 || cs.min != null
    else cmp(cs.min, v).forall(_ <= 0) && cmp(cs.max, v).forall(_ >= 0)
  }
}
