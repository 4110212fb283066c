package graft.catalog

/**
 * Catalog inspection surface — operators A9-A14
 * (reference: src/iceberg_explorer/catalog/service.py:108-235 and the
 * DuckDB-introspection variant api/routes/catalog.py:184-373).
 *
 * The reference runs two parallel catalog clients (PyIceberg + DuckDB
 * ATTACH); here one trait serves both roles, with implementations over
 * (1) any Spark DSv2 catalog — the session catalog in this offline
 * environment, the Iceberg SparkCatalog when its runtime jar is present —
 * and (2) a direct Iceberg metadata-JSON reader for snapshot/partition
 * history that needs no Iceberg jar at all (SURVEY §7.2).
 */
trait CatalogProvider {

  /** List namespaces, optionally under a parent
    * (reference: catalog/service.py:108-129). */
  def listNamespaces(parent: Option[Seq[String]] = None): Seq[Seq[String]]

  /** List table names in a namespace
    * (reference: catalog/service.py:131-146). */
  def listTables(namespace: Seq[String]): Seq[String]

  /** Location + current snapshot + partition spec + snapshot history
    * (reference: catalog/service.py:148-202). */
  def tableDetails(namespace: Seq[String], table: String): TableDetails

  /** Ordered fields with type/nullability/partition flags
    * (reference: catalog/service.py:204-235, api/routes/catalog.py:184-288). */
  def tableSchema(namespace: Seq[String], table: String): TableSchemaInfo

  /** Existence probe — the reference's `SELECT * ... LIMIT 0` → 404
    * (reference: api/routes/ui.py:208, api/routes/catalog.py:219). */
  def tableExists(namespace: Seq[String], table: String): Boolean
}

/** Raised where the reference returns 404 (unknown namespace/table). */
final class NoSuchEntityException(msg: String) extends Exception(msg)
