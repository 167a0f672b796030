package graft.io

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Using

/** Persisted catalog VIEWS for the graft warehouse — the storage half
  * of the DSv2 `ViewCatalog` surface (Iceberg's view spec, Delta's
  * catalog views re-expressed over our directory warehouse).
  *
  * A view is ONE file, `<warehouse>/<ns...>/<name>.view.json`, holding
  * the view SQL plus the context it must re-resolve under (the
  * creating session's current catalog + namespace — a bare `fact` in
  * the view body must mean the same table in every future session),
  * the schema captured at creation, declared column aliases/comments,
  * and properties. A FILE, deliberately: tables are directories
  * carrying `_graft_meta`, namespaces are bare directories, so a view
  * can never be mistaken for either by the existing listings, and
  * create/replace/rename inherit the same atomic filesystem semantics
  * as snapshot commits (exclusive hard-link create, atomic move).
  *
  * Scale note: view resolution is pure metadata — one ~KB file read at
  * ANALYSIS time per reference, zero data tasks — so this layer adds
  * nothing to executor-side cost at any table size.
  */
object ViewStore {

  /** Everything the DSv2 `View` interface reports, round-tripped
    * through one JSON document. `columnComments` aligns 1:1 with
    * `columnAliases` ("" = no comment) — both empty = no alias list.
    */
  final case class ViewRecord(
      sql: String,
      schemaJson: String,
      currentCatalog: String,
      currentNamespace: Seq[String],
      queryColumnNames: Seq[String],
      columnAliases: Seq[String],
      columnComments: Seq[String],
      properties: Map[String, String])

  private val Suffix = ".view.json"

  /** `<warehouse>/<ns dirs>/<name>.view.json` — name validated
    * filename-safe so a crafted view name can't escape the warehouse.
    */
  private def viewPath(warehouse: String, name: String): Path = {
    val parts = name.split('.')
    parts.foreach { p =>
      require(p.nonEmpty && p.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"),
        s"view name parts must be filename-safe ([A-Za-z0-9_.-]): '$name'")
    }
    Paths.get((warehouse +: parts.init).mkString("/")).resolve(parts.last + Suffix)
  }

  def exists(warehouse: String, name: String): Boolean =
    Files.isRegularFile(viewPath(warehouse, name))

  private def enc(rec: ViewRecord): String = {
    def s(k: String, v: String) = "\"" + k + "\": \"" + TableCatalog.escape(v) + "\""
    def arr(k: String, vs: Seq[String]) =
      vs.map(v => "\"" + TableCatalog.escape(v) + "\"").mkString("\"" + k + "\": [", ", ", "]")
    val props = rec.properties.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(k, v) }
    Seq(
      s("sql", rec.sql),
      s("schema", rec.schemaJson),
      s("cat", rec.currentCatalog),
      arr("ns", rec.currentNamespace),
      arr("qcols", rec.queryColumnNames),
      arr("aliases", rec.columnAliases),
      arr("acomments", rec.columnComments),
      arr("props", props)
    ).mkString("{", ", ", "}")
  }

  private def dec(json: String): ViewRecord =
    ViewRecord(
      sql = TableCatalog.parseStringAt(json, "sql").getOrElse(
        throw new IllegalStateException("corrupt view document: no sql field")),
      schemaJson = TableCatalog.parseStringAt(json, "schema").getOrElse(""),
      currentCatalog = TableCatalog.parseStringAt(json, "cat").getOrElse(""),
      currentNamespace = TableCatalog.parseStringArrayAt(json, "ns"),
      queryColumnNames = TableCatalog.parseStringArrayAt(json, "qcols"),
      columnAliases = TableCatalog.parseStringArrayAt(json, "aliases"),
      columnComments = TableCatalog.parseStringArrayAt(json, "acomments"),
      properties = TableCatalog.parseStringArrayAt(json, "props")
        .grouped(2).collect { case Seq(k, v) => k -> v }.toMap)

  def load(warehouse: String, name: String): Option[ViewRecord] = {
    val p = viewPath(warehouse, name)
    if (!Files.isRegularFile(p)) None
    else Some(dec(Files.readString(p)))
  }

  /** Create-exclusive (hard-link, same primitive as snapshot commits):
    * two racing CREATE VIEWs resolve to exactly one winner; the loser
    * sees false and surfaces the standard already-exists error.
    */
  def create(warehouse: String, name: String, rec: ViewRecord): Boolean = {
    val target = viewPath(warehouse, name)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      s".${target.getFileName}-${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, enc(rec))
    try {
      try { Files.createLink(target, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          if (Files.exists(target)) false
          else { Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE); true }
      }
    } finally { Files.deleteIfExists(tmp); () }
  }

  /** Atomic replace — readers racing the move see the old or the new
    * document, never a torn one.
    */
  def replace(warehouse: String, name: String, rec: ViewRecord): Unit = {
    val target = viewPath(warehouse, name)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      s".${target.getFileName}-${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, enc(rec))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def drop(warehouse: String, name: String): Boolean =
    Files.deleteIfExists(viewPath(warehouse, name))

  /** Rename without REPLACE_EXISTING: an existing target fails loudly
    * (FileAlreadyExistsException) instead of clobbering a view.
    */
  def rename(warehouse: String, from: String, to: String): Unit = {
    val dst = viewPath(warehouse, to)
    Files.createDirectories(dst.getParent)
    Files.move(viewPath(warehouse, from), dst)
  }

  /** Number of [[list]] directory listings performed — a test hook:
    * the MV rewrite rule's no-MV fast path is pinned by counting that
    * analysis of ordinary aggregates performs ZERO listings (the
    * mtime-validated cache in [[MaterializedViews.mvInfosOn]]).
    */
  val listCalls = new java.util.concurrent.atomic.LongAdder

  /** View names (last part only) directly under one namespace. */
  def list(warehouse: String, namespace: Seq[String]): Seq[String] = {
    listCalls.increment()
    val dir = Paths.get((warehouse +: namespace).mkString("/"))
    if (!Files.isDirectory(dir)) Seq.empty
    else Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(Suffix))
        .map(_.getFileName.toString.stripSuffix(Suffix))
        .toSeq
    }.sorted
  }
}
