package graft.connectors

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.VersionedStore

/** The MVCC store family as a Spark SQL CATALOG — the last step of the
  * SQL surface (round-15): stores under one warehouse root become
  * plain table names with NATIVE time-travel syntax, no format string
  * or options in sight,
  * {{{
  *   spark.conf spark.sql.catalog.graft      = graft.connectors.GraftVStoreCatalog
  *   spark.conf spark.sql.catalog.graft.root = s3a://bucket/warehouse
  *
  *   SELECT * FROM graft.events                            -- current snapshot
  *   SELECT * FROM graft.events VERSION AS OF 3            -- epoch 3
  *   SELECT * FROM graft.events TIMESTAMP AS OF '2026-...' -- epochAt(ts)
  * }}}
  * Each table resolves to the [[VStoreTable]] the `graft-vstore`
  * format serves, so the whole read discipline rides along: key-hash
  * chain pruning, `_cstats` data skipping, runtime filtering,
  * footer-answered aggregates, partial limit, in-reader merge-on-read
  * and snapshot schemas. `TIMESTAMP AS OF` arrives from Spark in
  * MICROseconds and resolves through [[VersionedStore.epochAt]]
  * (in-commit-timestamp monotonicity, the Delta rule).
  *
  * READ-ONLY by design, like the format: DDL and writes throw —
  * mutations go through the store's transactional API (commit fence,
  * ownership tokens, MOR semantics), which a blind catalog write
  * would bypass. A store is any direct child directory of `root`
  * carrying a `_schema` marker; namespaces are flat (the default
  * namespace only), matching the warehouse-of-stores layout —
  * `SHOW NAMESPACES` / `USE graft` behave (round-16:
  * [[SupportsNamespaces]] with the single `default` namespace).
  *
  * Snapshot consistency under concurrent writers is the store's own:
  * a table resolves its epoch ONCE at load (`currentEpoch` reads the
  * commit log), and every file it plans is immutable — a writer
  * committing mid-query can never tear a read (VStoreCatalogSpec
  * races a committing writer against repeated catalog reads). */
class GraftVStoreCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(sys.error(
      s"catalog $name needs spark.sql.catalog.$name.root = <warehouse dir>"))
  }
  override def name(): String = catalogName

  private def fs = new Path(root)
    .getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)

  private def storePath(ident: Identifier): String = {
    // flat namespace: `graft.tbl` and `graft.default.tbl` both serve
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("default")),
      s"graft catalog has a flat namespace: ${ident.namespace().mkString(".")}")
    require(!ident.name().contains("/") && !ident.name().startsWith("_") &&
      !ident.name().startsWith("."),
      s"illegal store name: ${ident.name()}")
    s"$root/${ident.name()}"
  }

  private def isStore(p: String): Boolean =
    fs.exists(new Path(p, "_schema"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!(namespace.isEmpty || namespace.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(namespace)
    val base = new Path(root)
    if (!fs.exists(base)) return Array.empty
    fs.listStatus(base)
      .filter(st => st.isDirectory && isStore(st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    try isStore(storePath(ident))
    catch { case _: IllegalArgumentException => false }

  private def tableAt(ident: Identifier, epoch: Long): Table = {
    val path = storePath(ident)
    if (!isStore(path)) throw new NoSuchTableException(ident)
    VStoreTable(path, epoch,
      StructType.fromDDL(VersionedStore.schemaAsOf(path, epoch)))
  }

  override def loadTable(ident: Identifier): Table =
    tableAt(ident, {
      val path = storePath(ident)
      if (!isStore(path)) throw new NoSuchTableException(ident)
      VersionedStore.currentEpoch(path)
    })

  /** `VERSION AS OF <epoch>` — the version string is the epoch. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val epoch = version.trim.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF takes a commit EPOCH — a " +
          s"positive integer from DESCRIBE HISTORY / " +
          s"VersionedStore.history — got '$version'; for wall-clock " +
          "addressing use TIMESTAMP AS OF"))
    tableAt(ident, epoch)
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    tableAt(ident, {
      val path = storePath(ident)
      if (!isStore(path)) throw new NoSuchTableException(ident)
      VersionedStore.epochAt(path, timestampMicros / 1000L)
    })

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog is read-only: $op goes through the store's " +
        "transactional API (VersionedStore.upsert/deltaUpsert/applyOps/" +
        "delete), which the catalog cannot bypass without losing the " +
        "commit fence, ownership tokens and MOR semantics")

  // ---- SupportsNamespaces (round-16): the one flat `default`
  // namespace, so SHOW NAMESPACES and USE behave; namespace DDL is
  // read-only like everything else
  override def defaultNamespace(): Array[String] = Array("default")
  override def listNamespaces(): Array[Array[String]] =
    Array(Array("default"))
  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespace.sameElements(Array("default"))) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default"))
  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] =
    if (namespaceExists(namespace)) {
      val m = new util.HashMap[String, String]()
      m.put("location", root)
      m
    } else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    readOnly("CREATE NAMESPACE")
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    readOnly("ALTER NAMESPACE")
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean =
    readOnly("DROP NAMESPACE")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}
