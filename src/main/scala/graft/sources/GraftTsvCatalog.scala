package graft.sources

import java.util
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 [[TableCatalog]] over a directory of TSV tables — the
  * NAME-BASED front door to the store the path-based gates drive with
  * `option("path", …)`. Registered per session with
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft_store", classOf[GraftTsvCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft_store.root", "/data/tsv")
  * }}}
  *
  * after which plain SQL addresses it like any lakehouse catalog:
  * `CREATE NAMESPACE graft_store.lake`, `CREATE TABLE
  * graft_store.lake.t (…)`, `INSERT INTO`, `SELECT`, `DROP TABLE` —
  * every statement resolving through THIS plugin to the same
  * [[TsvTable]] the path API returns, so reads keep the full scan
  * contract (pushdown, stats, metadata columns) and writes keep the
  * sink's task-commit protocol. Layout on disk: `root/<ns>/<table>/`
  * holding the data files plus a `_graft_schema` sidecar (DDL text;
  * `_`-prefixed files are invisible to scans and survive TRUNCATE by
  * the sink's own listing rules). At 100 TB this is how a thousand
  * pipelines share one store without passing paths around: the catalog
  * IS the contract, and governance (q280's partition DELETE, retention)
  * addresses tables by name.
  *
  * Deliberately unsupported, loudly: PARTITIONED BY at create time
  * (the writer targets flat layouts; keyed `shard=<v>/` layouts remain
  * the path API's read/delete surface), ALTER TABLE (the sidecar is
  * the single source of schema truth — evolve by recreate), and
  * multi-level namespaces (one level, one directory).
  */
final class GraftTsvCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: java.io.File = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null,
      s"graft tsv catalog '$name' needs spark.sql.catalog.$name.root")
    root = new java.io.File(r)
    root.mkdirs()
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): java.io.File = {
    require(namespace.length == 1,
      s"graft tsv catalog supports exactly one namespace level, got " +
        namespace.mkString("."))
    new java.io.File(root, namespace(0))
  }
  private def tableDir(ident: Identifier): java.io.File =
    new java.io.File(nsDir(ident.namespace()), ident.name())
  private def schemaFile(dir: java.io.File): java.io.File =
    new java.io.File(dir, "_graft_schema")

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!d.isDirectory) throw new NoSuchNamespaceException(namespace)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(t => t.isDirectory && schemaFile(t).isFile)
      .map(t => Identifier.of(namespace, t.getName))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    schemaFile(tableDir(ident)).isFile

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    val sf = schemaFile(dir)
    if (!sf.isFile) throw new NoSuchTableException(ident)
    val ddl = new String(
      java.nio.file.Files.readAllBytes(sf.toPath), "UTF-8")
    new TsvTable(StructType.fromDDL(ddl), dir.getPath)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "graft tsv catalog: PARTITIONED BY is not supported at create " +
          "time (the sink writes flat layouts; keyed shard=<v>/ layouts " +
          "are the path API's read/delete surface)")
    // the loud-refusal contract extends to clauses the catalog would
    // otherwise silently ignore: a LOCATION/EXTERNAL table would write
    // somewhere other than the managed root, and an explicit USING of a
    // DIFFERENT format would store TSV under a parquet-shaped promise.
    // (`USING <session default>` is indistinguishable from no USING —
    // Spark fills the provider property either way — so the default
    // passes and anything else fails.)
    if (properties.containsKey(TableCatalog.PROP_LOCATION) ||
        "true".equalsIgnoreCase(properties.get(TableCatalog.PROP_EXTERNAL)))
      throw new UnsupportedOperationException(
        "graft tsv catalog: LOCATION/EXTERNAL are not supported — " +
          "tables are managed under the catalog root")
    val provider = properties.get(TableCatalog.PROP_PROVIDER)
    val defaultProvider =
      org.apache.spark.sql.internal.SQLConf.get.defaultDataSourceName
    if (provider != null && provider != defaultProvider &&
        !Set("tsv", "graft_tsv", classOf[TsvSourceProvider].getName)
          .contains(provider.toLowerCase(java.util.Locale.ROOT)))
      throw new UnsupportedOperationException(
        s"graft tsv catalog: USING $provider is not supported — this " +
          "catalog stores TSV (omit USING, or say USING graft_tsv)")
    val dir = tableDir(ident)
    if (schemaFile(dir).isFile) throw new TableAlreadyExistsException(ident)
    if (!dir.getParentFile.isDirectory)
      throw new NoSuchNamespaceException(ident.namespace())
    dir.mkdirs()
    java.nio.file.Files.write(schemaFile(dir).toPath,
      schema.toDDL.getBytes("UTF-8"))
    new TsvTable(schema, dir.getPath)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft tsv catalog: ALTER TABLE is not supported — the schema " +
        "sidecar is the single source of truth; evolve by recreate")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!schemaFile(dir).isFile) false
    else { TsvWritePaths.deleteRecursively(dir); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val (from, to) = (tableDir(oldIdent), tableDir(newIdent))
    if (!schemaFile(from).isFile) throw new NoSuchTableException(oldIdent)
    if (schemaFile(to).isFile) throw new TableAlreadyExistsException(newIdent)
    if (!to.getParentFile.isDirectory)
      throw new NoSuchNamespaceException(newIdent.namespace())
    if (!from.renameTo(to))
      throw new java.io.IOException(
        s"graft tsv catalog: rename failed: $from -> $to")
  }

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => Array(d.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (nsDir(namespace).isDirectory) Array.empty // one level only
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && nsDir(namespace).isDirectory

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.singletonMap(
      SupportsNamespaces.PROP_LOCATION, nsDir(namespace).getPath)
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val d = nsDir(namespace)
    if (d.isDirectory) throw new NamespaceAlreadyExistsException(namespace)
    d.mkdirs()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft tsv catalog: namespaces carry no alterable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!d.isDirectory) false
    else {
      val tables = listTables(namespace)
      if (tables.nonEmpty && !cascade)
        throw new org.apache.spark.sql.catalyst.analysis
          .NonEmptyNamespaceException(namespace)
      TsvWritePaths.deleteRecursively(d)
      true
    }
  }
}
