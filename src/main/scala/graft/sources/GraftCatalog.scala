package graft.sources

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-addressable catalog for `graft-table` groups (VERDICT r14 item 5):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   spark.sql("SELECT * FROM graft.`/data/group`.snapshot VERSION AS OF 3")
  * }}}
  *
  * The identifier's single namespace element is the GROUP DIRECTORY and
  * the table name is the group-relative table (`snapshot`, `history`,
  * `customers_snapshot`, …) — the same pair the `load()` options carry,
  * so `VERSION AS OF` resolves through the identical pinned-version scan
  * ([[GraftTableScan]]), with the same filter + bucket + file-stats
  * pushdown. Spark's time-travel analysis calls
  * `loadTable(ident, version)`; the live read is the plain overload.
  *
  * Read-only by design: tables are created by the SINK's commit protocol
  * (epoch CAS transactions), not by DDL — create/alter/drop refuse. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name

  override def name(): String = catalogName

  private def opts(ident: Identifier,
      version: Option[String]): CaseInsensitiveStringMap = {
    if (ident.namespace().length != 1)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    val m = new java.util.HashMap[String, String]()
    m.put("path", ident.namespace()(0))
    m.put("table", ident.name())
    version.foreach(v => m.put("versionAsOf", v))
    new CaseInsensitiveStringMap(m)
  }

  /** Table names a transaction's group manifest commits — the
    * CommitStore-seam answer to "what tables exist": derived from the
    * PUBLISHED log entry's content, never from a directory walk, so it
    * holds on object-store deployments where table data is not
    * FS-backed (and it can never show a half-written table — a name
    * appears exactly when its first transaction commits). */
  private def committedTables(group: String, version: Option[String])
      : Option[Set[String]] =
    for {
      v <- version.flatMap(s => scala.util.Try(s.toLong).toOption)
        .orElse(graft.streaming.TableGroup.currentTxn(group))
      m <- graft.streaming.TableGroup.groupManifest(group, v)
    } yield m.keySet

  private def require_(ident: Identifier, version: Option[String]): Unit =
    if (!committedTables(ident.namespace()(0), version)
        .exists(_.contains(ident.name())))
      // a real NoSuchTableException (not a late IllegalArgumentException
      // from the scan): tableExists answers false and SELECT fails as
      // TABLE_OR_VIEW_NOT_FOUND, like every other catalog
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)

  override def loadTable(ident: Identifier): Table = {
    val o = opts(ident, None) // validates the namespace shape first
    require_(ident, None)
    new GraftTableTable(o)
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    val o = opts(ident, Some(version))
    require_(ident, Some(version))
    new GraftTableTable(o)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1) return Array.empty
    committedTables(namespace(0), None).getOrElse(Set.empty)
      .toArray.sorted.map(Identifier.of(namespace, _))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-only: tables are created by the graft-table " +
        "sink's commit protocol, not DDL")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
