package graft.catalog

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{
  CatalogPlugin, Identifier, SupportsNamespaces, TableCatalog}
import org.apache.spark.sql.connector.expressions.Transform

/**
 * CatalogProvider over any Spark DSv2 catalog — operators A9-A14 on the
 * live catalog path (reference: src/iceberg_explorer/catalog/service.py +
 * api/routes/catalog.py DuckDB-introspection variant).
 *
 * Works against the session catalog (`spark_catalog`) in this offline
 * environment and, unchanged, against `org.apache.iceberg.spark.SparkCatalog`
 * when that jar is on the classpath — the DSv2 interfaces are the
 * abstraction boundary (SURVEY §7.2). Snapshot history is not part of the
 * DSv2 surface; it comes from [[IcebergMetadata]] when the table location
 * holds Iceberg metadata JSON, else empty (plain parquet tables have no
 * snapshots, like a freshly ATTACHed non-Iceberg source in the reference).
 *
 * Scale: all calls are pure metadata — no Spark job is ever triggered
 * (the reference's sub-second metadata-latency target, BASELINE.md).
 */
final class SparkCatalogProvider(
    spark: SparkSession,
    catalogName: Option[String] = None) extends CatalogProvider {

  private def plugin: CatalogPlugin = catalogName match {
    case Some(n) => spark.sessionState.catalogManager.catalog(n)
    case None    => spark.sessionState.catalogManager.currentCatalog
  }

  private def asNamespaces: SupportsNamespaces = plugin match {
    case s: SupportsNamespaces => s
    case other => throw new NoSuchEntityException(
      s"Catalog ${other.name} does not support namespaces")
  }

  private def asTables: TableCatalog = plugin match {
    case t: TableCatalog => t
    case other => throw new NoSuchEntityException(
      s"Catalog ${other.name} does not support tables")
  }

  override def listNamespaces(parent: Option[Seq[String]]): Seq[Seq[String]] =
    try {
      val raw = parent match {
        case Some(p) => asNamespaces.listNamespaces(p.toArray)
        case None    => asNamespaces.listNamespaces()
      }
      raw.map(_.toSeq).toSeq.sortBy(NamespacePath.encode)
    } catch {
      case e: Exception if isNoSuchNamespace(e) =>
        throw new NoSuchEntityException(
          s"Namespace not found: ${parent.map(_.mkString(".")).getOrElse("")}")
    }

  override def listTables(namespace: Seq[String]): Seq[String] =
    try asTables.listTables(namespace.toArray).map(_.name).toSeq.sorted
    catch {
      case e: Exception if isNoSuchNamespace(e) =>
        throw new NoSuchEntityException(
          s"Namespace not found: ${namespace.mkString(".")}")
    }

  override def tableExists(namespace: Seq[String], table: String): Boolean =
    try asTables.tableExists(Identifier.of(namespace.toArray, table))
    catch { case NonFatal(_) => false }

  private def loadTable(namespace: Seq[String], table: String) =
    try asTables.loadTable(Identifier.of(namespace.toArray, table))
    catch {
      // a missing NAMESPACE on a table load is also "table not found" to
      // the caller (the reference's PyIceberg NoSuchTableError covers both)
      case e: Exception if isNoSuchTable(e) || isNoSuchNamespace(e) =>
        throw new NoSuchEntityException(
          s"Table not found: ${(namespace :+ table).mkString(".")}")
    }

  override def tableDetails(namespace: Seq[String], table: String): TableDetails = {
    val t = loadTable(namespace, table)
    val location = Option(t.properties.get(TableCatalog.PROP_LOCATION)).getOrElse("")
    // Snapshot/current-id history: DSv2 exposes none; read Iceberg
    // metadata JSON when present (reference gets these via PyIceberg,
    // catalog/service.py:186-201).
    val meta = IcebergMetadata.readLatest(location)
    TableDetails(
      namespace = namespace,
      table = table,
      location = meta.map(_.location).filter(_.nonEmpty).getOrElse(location),
      currentSnapshotId = meta.flatMap(_.currentSnapshotId),
      partitionSpec = meta.flatMap(_.partitionSpec)
        .orElse(partitionSpecFromTransforms(t.partitioning)),
      snapshots = meta.map(_.snapshots).getOrElse(Seq.empty))
  }

  /** Derive a spec from DSv2 transforms for non-Iceberg tables. Field/source
    * ids are positional — DSv2 has no Iceberg field-id concept. */
  private def partitionSpecFromTransforms(
      transforms: Array[Transform]): Option[PartitionSpecInfo] =
    if (transforms.isEmpty) None
    else Some(PartitionSpecInfo(0, transforms.zipWithIndex.map {
      case (tr, i) =>
        val src = tr.references.headOption.map(_.describe).getOrElse("")
        val name = if (tr.name == "identity") src else s"${tr.name}($src)"
        PartitionFieldInfo(sourceId = i, fieldId = 1000 + i, name = name,
          transform = tr.name)
    }.toSeq))

  override def tableSchema(namespace: Seq[String], table: String): TableSchemaInfo = {
    val t = loadTable(namespace, table)
    val partitionCols: Set[String] =
      t.partitioning.flatMap(_.references.map(_.describe)).toSet
    val fields = t.columns.toSeq.map { c =>
      SchemaField(
        name = c.name,
        dataType = c.dataType.sql.toLowerCase,
        nullable = c.nullable,
        isPartitionColumn = partitionCols.contains(c.name))
    }
    TableSchemaInfo(namespace, table, fields)
  }

  private def isNoSuchNamespace(e: Exception): Boolean =
    e.getClass.getName.contains("NoSuchNamespace") ||
      e.getClass.getName.contains("NoSuchDatabase")

  private def isNoSuchTable(e: Exception): Boolean =
    e.getClass.getName.contains("NoSuchTable")
}
