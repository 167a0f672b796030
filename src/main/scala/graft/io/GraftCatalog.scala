package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog => V2TableCatalog, TableChange}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource-v2 catalog plugin over the graft snapshot warehouse:
  * registers the manifest-based tables into Spark's catalog framework
  * so plain SQL resolves them by name, including snapshot reads —
  *
  *   spark.sql.catalog.graft           = graft.io.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *
  *   SELECT * FROM graft.default.fact
  *   SELECT * FROM graft.default.fact VERSION AS OF 2
  *
  * This is the reference's Iceberg catalog surface (SparkCatalog +
  * `VERSION AS OF`, reference: IngestionJob.scala:16-19,
  * README.md:143-154) re-expressed over our manifest layer: loadTable
  * materializes the snapshot's file list as a parquet v2 table with
  * `basePath` set, so partition columns and pruning behave exactly as
  * in path reads. Writes go through TableIO (single-writer batch);
  * the SQL surface is read-only and DDL mutations throw.
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
    ParquetTable(
      s"$catalogName.$name@v$version",
      SparkSession.active,
      options,
      files,
      userSpecifiedSchema = None,
      fallbackFileFormat = classOf[ParquetFileFormat]
    )
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
      "graft catalog is read-only over SQL; write via graft.io.TableIO")
}
