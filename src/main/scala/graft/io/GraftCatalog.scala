package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog => V2TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource-v2 catalog plugin over the graft snapshot warehouse:
  * registers the manifest-based tables into Spark's catalog framework
  * so plain SQL resolves them by name, including snapshot reads and
  * SQL writes —
  *
  *   spark.sql.catalog.graft           = graft.io.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *
  *   SELECT * FROM graft.default.fact
  *   SELECT * FROM graft.default.fact VERSION AS OF 2
  *   CREATE TABLE graft.default.agg PARTITIONED BY (yr) AS SELECT ...
  *   INSERT INTO graft.default.agg SELECT ...
  *   INSERT OVERWRITE graft.default.agg SELECT ...
  *
  * This is the reference's Iceberg catalog surface (SparkCatalog +
  * `VERSION AS OF` + create-on-first-write, reference:
  * IngestionJob.scala:16-19,80-84, README.md:143-154) re-expressed
  * over our manifest layer: loadTable materializes the snapshot's file
  * list as a parquet v2 table with `basePath` set, so partition
  * columns and pruning behave exactly as in path reads. SQL writes go
  * through the V1Write fallback (the standard DSv2 escape hatch for
  * driver-committed sinks): the write itself is a fully distributed
  * `df.write.parquet`, only the snapshot commit runs on the driver —
  * identical semantics to the programmatic TableIO path, INSERT INTO
  * appending a snapshot and INSERT OVERWRITE committing a logical
  * replace (prior versions stay readable).
  */
class GraftCatalog extends V2TableCatalog {

  private var catalogName: String = "graft"
  private var catalog: TableCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
    catalog = TableCatalog(wh)
  }

  override def name(): String = catalogName

  private def qualified(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    catalog.listTables()
      .map(_.split('.'))
      .filter(parts => parts.init.sameElements(namespace))
      .map(parts => Identifier.of(parts.init, parts.last))
      .toArray

  override def tableExists(ident: Identifier): Boolean =
    catalog.tableExists(qualified(ident))

  override def loadTable(ident: Identifier): Table = {
    val name = qualified(ident)
    val v = catalog.currentVersion(name)
      .getOrElse(throw new NoSuchTableException(ident))
    loadVersion(ident, v)
  }

  /** SQL `VERSION AS OF <n>` lands here. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val name = qualified(ident)
    val v = version.toIntOption.getOrElse(throw new NoSuchTableException(ident))
    if (!catalog.versions(name).contains(v)) throw new NoSuchTableException(ident)
    loadVersion(ident, v)
  }

  private def loadVersion(ident: Identifier, version: Int): Table = {
    val name = qualified(ident)
    val files = catalog.manifest(name, version)
    val options = new CaseInsensitiveStringMap(
      Map("basePath" -> catalog.dataPath(name)).asJava)
    // declared schema only matters while the manifest is empty (a
    // just-created CTAS target); once files exist, schema-on-read (with
    // merge) wins, matching the path-read surface
    val declared =
      if (files.isEmpty)
        catalog.tableSchemaJson(name).map(DataType.fromJson(_).asInstanceOf[StructType])
      else None
    val delegate = ParquetTable(
      s"$catalogName.$name@v$version",
      SparkSession.active,
      options,
      files,
      userSpecifiedSchema = declared,
      fallbackFileFormat = classOf[ParquetFileFormat]
    )
    val pcols = catalog.tablePartitionCols(name)
      .getOrElse(partitionColsFromPaths(name, files))
    new GraftTable(name, catalog, delegate, pcols)
  }

  /** Hive-style partition columns inferred from a manifest's file
    * paths (tables written via TableIO carry no declared meta).
    */
  private def partitionColsFromPaths(name: String, files: Seq[String]): Seq[String] = {
    val data = java.nio.file.Paths.get(catalog.dataPath(name)).toAbsolutePath.normalize
    files.headOption.toSeq.flatMap { f =>
      val rel = data.relativize(java.nio.file.Paths.get(f).toAbsolutePath.normalize)
      (0 until rel.getNameCount - 1).map(rel.getName(_).toString)
        .filter(_.contains('=')).map(_.takeWhile(_ != '='))
    }
  }

  /** CTAS / CREATE TABLE: persist the declared schema + partitioning,
    * commit an empty first snapshot (create-on-first-write surface,
    * reference: IngestionJob.scala:80-84), and hand back a writable
    * table for the SELECT's rows.
    */
  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val name = qualified(ident)
    if (catalog.tableExists(name)) throw new TableAlreadyExistsException(ident)
    val pcols = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"graft catalog supports identity partitioning only, got $t")
      t.references().head.fieldNames().mkString(".")
    }
    catalog.writeTableMeta(name, schema.json, pcols)
    // the file index resolves basePath eagerly even for an empty table
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(catalog.dataPath(name)))
    catalog.commitSnapshot(name, Seq.empty)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val name = qualified(ident)
    val existed = catalog.tableExists(name)
    if (existed) catalog.dropTable(name)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!catalog.tableExists(qualified(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (catalog.tableExists(qualified(newIdent))) throw new TableAlreadyExistsException(newIdent)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(catalog.pathOf(qualified(oldIdent))),
      java.nio.file.Paths.get(catalog.pathOf(qualified(newIdent))))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog supports CTAS/INSERT but not ALTER; write via graft.io.TableIO")
}

/** A snapshot table that reads through the parquet v2 delegate and
  * writes through TableIO's snapshot commit (V1Write fallback — the
  * data movement is a distributed parquet write; only the manifest
  * commit is driver-side).
  */
private[io] class GraftTable(
    tableName: String,
    cat: TableCatalog,
    delegate: ParquetTable,
    partitionCols: Seq[String]
) extends Table with SupportsRead with SupportsWrite {

  override def name(): String = delegate.name
  override def schema(): StructType = delegate.schema

  override def partitioning(): Array[Transform] =
    partitionCols.map(Expressions.identity).toArray

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val io = new TableIO(data.sparkSession, cat)
              if (replace || overwrite) io.overwrite(data, tableName, partitionCols)
              else io.append(data, tableName, partitionCols)
            }
          }
      }
    }
}
