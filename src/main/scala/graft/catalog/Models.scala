package graft.catalog

/**
 * Catalog data model — the Spark-side equivalents of the reference's
 * Pydantic catalog models
 * (reference: src/iceberg_explorer/models/catalog.py:14-259).
 */

/** One schema field with the reference's introspection attributes
  * (reference: models/catalog.py:212-238; stats plumbing exists there but
  * is always empty — kept optional here for the same shape). */
final case class SchemaField(
    name: String,
    dataType: String,
    nullable: Boolean,
    isPartitionColumn: Boolean = false,
    fieldId: Option[Int] = None)

/** Table schema response (reference: models/catalog.py:241-259). */
final case class TableSchemaInfo(
    namespace: Seq[String],
    table: String,
    fields: Seq[SchemaField],
    schemaId: Option[Int] = None)

/** One partition-spec field: `transform(source) AS name`
  * (reference: models/catalog.py:90-105). */
final case class PartitionFieldInfo(
    sourceId: Int,
    fieldId: Int,
    name: String,
    transform: String)

/** Partition spec (reference: models/catalog.py:108-121). */
final case class PartitionSpecInfo(specId: Int, fields: Seq[PartitionFieldInfo])

/** Iceberg snapshot (reference: models/catalog.py:69-87). v1 metadata has
  * no sequence numbers — they default to 0, matching PyIceberg
  * (reference: catalog/service.py:188-195). */
final case class Snapshot(
    sequenceNumber: Long,
    snapshotId: Long,
    timestampMs: Long,
    manifestList: String)

/** Table details (reference: models/catalog.py:158-192). */
final case class TableDetails(
    namespace: Seq[String],
    table: String,
    location: String,
    currentSnapshotId: Option[Long],
    partitionSpec: Option[PartitionSpecInfo],
    snapshots: Seq[Snapshot]) {

  /** Current snapshot = catalog-provided id when present, else max
    * sequence number (reference: api/routes/catalog.py:338-347,
    * api/routes/ui.py:284-287). */
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))
      .orElse(if (snapshots.isEmpty) None
              else Some(snapshots.maxBy(_.sequenceNumber)))
}

object NamespacePath {
  /** Wire-format namespace separator
    * (reference: api/routes/utils.py:9 — ASCII unit separator). */
  val UnitSeparator = "\u001f"

  /** Parse a wire namespace into components
    * (reference: api/routes/utils.py:12-24). */
  def parse(namespaceStr: String): Seq[String] =
    if (namespaceStr == null || namespaceStr.isEmpty) Seq.empty
    else namespaceStr.split(UnitSeparator, -1).toSeq

  def encode(parts: Seq[String]): String = parts.mkString(UnitSeparator)

  /** Quote an identifier for Spark SQL (backticks — the reference quotes
    * with double quotes for DuckDB, api/routes/utils.py:27-37; same
    * escape-by-doubling rule, dialect-appropriate character). */
  def quote(identifier: String): String =
    "`" + identifier.replace("`", "``") + "`"

  /** Fully qualified dotted path (reference: api/routes/utils.py:40-53). */
  def fqn(parts: Seq[String]): String = parts.map(quote).mkString(".")
}
