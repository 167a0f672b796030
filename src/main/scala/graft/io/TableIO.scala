package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Path-based table catalog: name -> directory under a warehouse root.
  * Replaces the reference's Iceberg Hadoop catalog
  * (reference: IngestionJob.scala:16-19).
  *
  * Layout per table:
  *   <warehouse>/<ns>/<table>/data/...        parquet data files
  *                           /_graft_meta/vN.json   snapshot manifests
  *
  * Like Iceberg, the DIRECTORY CONTENTS do not define the table — the
  * latest manifest does. A manifest lists the data files belonging to
  * that snapshot, so overwrites are logical (a new manifest referencing
  * only the new files) and old snapshots stay readable: `readVersion`
  * gives the reference's `VERSION AS OF` semantics (reference:
  * README.md:143-154) without an Iceberg runtime. Names may be
  * qualified ("default.nyc_taxi_fact"); the namespace becomes a
  * subdirectory.
  *
  * Concurrency: single-writer batch, as in the reference pipeline
  * (SURVEY.md §7 risk 1) — manifest commit is a tmp-file + atomic
  * rename, so readers never observe a torn manifest.
  */
final case class TableCatalog(warehouse: String) {
  def pathOf(name: String): String = {
    val parts = name.split('.')
    (warehouse +: parts).mkString("/")
  }
  def dataPath(name: String): String = s"${pathOf(name)}/data"
  def metaPath(name: String): Path = Paths.get(pathOf(name), "_graft_meta")

  def tableExists(name: String): Boolean = currentVersion(name).isDefined

  /** Snapshot version numbers, ascending. */
  def versions(name: String): Seq[Int] = {
    val meta = metaPath(name)
    if (!Files.isDirectory(meta)) Seq.empty
    else
      Files.list(meta).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toInt
        }
        .toSeq.sorted
  }

  def currentVersion(name: String): Option[Int] = versions(name).lastOption

  /** Data files (absolute paths) in snapshot `version`. */
  def manifest(name: String, version: Int): Seq[String] = {
    val f = metaPath(name).resolve(s"v$version.json")
    val text = Files.readString(f)
    // minimal JSON: {"files": ["path", ...]}
    val body = text.substring(text.indexOf('[') + 1, text.lastIndexOf(']'))
    if (body.trim.isEmpty) Seq.empty
    else body.split(',').map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
  }

  def commitSnapshot(name: String, files: Seq[String]): Int = {
    val meta = metaPath(name)
    Files.createDirectories(meta)
    val v = currentVersion(name).getOrElse(0) + 1
    val json = files.map(f => "\"" + f + "\"").mkString("{\"files\": [", ", ", "]}")
    val tmp = meta.resolve(s".v$v.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, meta.resolve(s"v$v.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** All parquet data files currently on disk for the table. */
  def listDataFiles(name: String): Seq[String] = {
    val root = Paths.get(dataPath(name))
    if (!Files.isDirectory(root)) Seq.empty
    else
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .map(_.toString)
        .filter(p => p.endsWith(".parquet") || p.endsWith(".snappy.parquet"))
        .toSeq.sorted
  }

  def listTables(): Seq[String] = {
    val root = Paths.get(warehouse)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val out = Seq.newBuilder[String]
      Files.list(root).forEach { ns =>
        if (Files.isDirectory(ns))
          Files.list(ns).forEach { t =>
            if (Files.isDirectory(t)) out += s"${ns.getFileName}.${t.getFileName}"
          }
      }
      out.result().sorted
    }
  }

  def dropTable(name: String): Unit = {
    val p = Paths.get(pathOf(name))
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
  }
}

/** Table read/write API mirroring the reference's SDS Iceberg wrapper
  * surface (reference: IngestionJob.scala:4,80-84 `SDSIcebergWriter
  * .append(df, name, partitionCols)`; DimensionJob.scala:58
  * `overwritePartition`; FactJob.scala:39-42 `SDSIcebergReader.read`),
  * plus snapshot reads (`readVersion`) emulating Iceberg time travel.
  *
  * Scale notes: data files are written once and only manifests change
  * on commit — an overwrite never rewrites surviving bytes. Callers
  * control file count via the DataFrame's partitioning (the pipeline
  * repartitions by the table partition column before appending so each
  * Hive partition gets few large files). Partition-column predicates
  * prune at the file level because reads pass `basePath`, keeping
  * Hive-style directory semantics on the manifest's file list.
  */
final class TableIO(spark: SparkSession, val catalog: TableCatalog) {

  /** Current-snapshot read. */
  def read(name: String): DataFrame = {
    val v = catalog.currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"table not found: $name"))
    readVersion(name, v)
  }

  /** Time travel: the reference's `VERSION AS OF` (README.md:143-154). */
  def readVersion(name: String, version: Int): DataFrame = {
    val files = catalog.manifest(name, version)
    if (files.isEmpty) spark.emptyDataFrame
    else
      spark.read
        .option("basePath", catalog.dataPath(name))
        .parquet(files: _*)
  }

  /** Create-if-absent, append data files, commit a new snapshot. */
  def append(df: DataFrame, name: String, partitionCols: Seq[String] = Seq.empty): Unit =
    write(df, name, append = true, partitionCols)

  /** Logical full-table replace: new files, new manifest referencing
    * only them; prior snapshots stay readable. The reference calls this
    * `overwritePartition` but only ever uses whole-table overwrite
    * (DimensionJob.scala:58,90; AggregationJob.scala:87-90) — named
    * honestly here (SURVEY.md §7 risk 2).
    */
  def overwrite(df: DataFrame, name: String, partitionCols: Seq[String] = Seq.empty): Unit =
    write(df, name, append = false, partitionCols)

  def tableExists(name: String): Boolean = catalog.tableExists(name)

  def versions(name: String): Seq[Int] = catalog.versions(name)

  /** Register the current snapshot as a temp view so `spark.sql` /
    * SHOW TABLES-style introspection works over the warehouse
    * (reference: README.md:125-128 manual verification surface).
    */
  def registerView(name: String, viewName: String): Unit =
    read(name).createOrReplaceTempView(viewName)

  private def write(df: DataFrame, name: String, append: Boolean, partitionCols: Seq[String]): Unit = {
    val before = catalog.listDataFiles(name).toSet
    val w = df.write.mode(SaveMode.Append) // physical files accumulate; manifests decide visibility
    val withParts = if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
    withParts.parquet(catalog.dataPath(name))
    val newFiles = catalog.listDataFiles(name).filterNot(before)
    val prev =
      if (append) catalog.currentVersion(name).map(catalog.manifest(name, _)).getOrElse(Seq.empty)
      else Seq.empty
    catalog.commitSnapshot(name, prev ++ newFiles)
  }
}

object TableIO {
  def apply(spark: SparkSession, warehouse: String): TableIO =
    new TableIO(spark, TableCatalog(warehouse))
}
