package graft.catalog

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * Direct reader for Iceberg table-metadata JSON (the `.metadata.json`
 * files under `metadata/`)
 * — snapshot history, partition specs, and location without the
 * iceberg-spark-runtime jar (SURVEY §7.2; the jar is absent in this
 * environment, §7.0).
 *
 * The reference obtains the same facts through PyIceberg
 * (src/iceberg_explorer/catalog/service.py:148-202) and through DuckDB's
 * `iceberg_metadata()`/`iceberg_snapshots()` table functions
 * (api/routes/ui.py:221-271). Format-version handling matches PyIceberg's
 * surfaced behavior: v1 metadata has no `sequence-number` on snapshots —
 * default 0 (reference: catalog/service.py:188-195 discussion in SURVEY
 * §7.5(5)).
 *
 * Jackson-databind ships with Spark, so this parses anywhere Spark runs.
 * Driver-side metadata only — never a Spark job.
 */
object IcebergMetadata {

  final case class TableMetadata(
      formatVersion: Int,
      location: String,
      currentSnapshotId: Option[Long],
      partitionSpec: Option[PartitionSpecInfo],
      snapshots: Seq[Snapshot])

  private val mapper = new ObjectMapper()

  /** Parse one metadata JSON document. */
  def parse(json: String): TableMetadata = {
    val root = mapper.readTree(json)
    val formatVersion =
      Option(root.get("format-version")).map(_.asInt).getOrElse(1)

    val snapshots: Seq[Snapshot] =
      Option(root.get("snapshots")).toSeq.flatMap(_.elements.asScala).map { s =>
        Snapshot(
          // v1: no sequence-number → 0 (PyIceberg-compatible default)
          sequenceNumber =
            Option(s.get("sequence-number")).map(_.asLong).getOrElse(0L),
          snapshotId = s.get("snapshot-id").asLong,
          timestampMs = s.get("timestamp-ms").asLong,
          manifestList =
            Option(s.get("manifest-list")).map(_.asText).getOrElse(""))
      }

    TableMetadata(
      formatVersion = formatVersion,
      location = Option(root.get("location")).map(_.asText).getOrElse(""),
      currentSnapshotId =
        Option(root.get("current-snapshot-id")).map(_.asLong).filter(_ != -1L),
      partitionSpec = parseSpec(root),
      snapshots = snapshots)
  }

  /** Default spec: v2 `partition-specs` entry matching `default-spec-id`;
    * v1 fallback `partition-spec` (flat field list, spec id 0). */
  private def parseSpec(root: JsonNode): Option[PartitionSpecInfo] = {
    val defaultSpecId =
      Option(root.get("default-spec-id")).map(_.asInt).getOrElse(0)
    val fromSpecs = Option(root.get("partition-specs"))
      .flatMap(_.elements.asScala.find(s =>
        Option(s.get("spec-id")).map(_.asInt).getOrElse(0) == defaultSpecId))
      .map(s => PartitionSpecInfo(defaultSpecId,
        parseSpecFields(s.get("fields"))))
    val fromV1 = Option(root.get("partition-spec"))
      .map(f => PartitionSpecInfo(0, parseSpecFields(f)))
    fromSpecs.orElse(fromV1).filter(_.fields.nonEmpty)
  }

  private def parseSpecFields(fields: JsonNode): Seq[PartitionFieldInfo] =
    Option(fields).toSeq.flatMap(_.elements.asScala).zipWithIndex.map {
      case (f, i) =>
        PartitionFieldInfo(
          sourceId = Option(f.get("source-id")).map(_.asInt).getOrElse(0),
          fieldId = Option(f.get("field-id")).map(_.asInt).getOrElse(1000 + i),
          name = Option(f.get("name")).map(_.asText).getOrElse(""),
          transform = Option(f.get("transform")).map(_.asText).getOrElse("identity"))
    }

  /** Latest metadata file in `<tableLocation>/metadata/`, by the
    * `vN.metadata.json` / `NNNNN-uuid.metadata.json` numeric prefix
    * (highest N = newest, per the Iceberg spec's file-naming scheme). */
  def latestMetadataFile(tableLocation: String): Option[Path] = {
    if (tableLocation == null || tableLocation.isEmpty) return None
    val dir = Paths.get(stripScheme(tableLocation), "metadata")
    if (!Files.isDirectory(dir)) return None
    val files = Files.list(dir).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".metadata.json")).toSeq
    if (files.isEmpty) None
    else Some(files.maxBy(p => metadataVersion(p.getFileName.toString)))
  }

  private[catalog] def metadataVersion(fileName: String): Long = {
    val stem = fileName.stripSuffix(".metadata.json")
    val digits = stem.takeWhile(_ != '-').dropWhile(!_.isDigit).takeWhile(_.isDigit)
    if (digits.nonEmpty) digits.toLong else -1L
  }

  private def stripScheme(location: String): String =
    if (location.startsWith("file:")) location.stripPrefix("file:")
    else location

  /** Location derivation from a metadata file path — split on
    * `"/metadata/"` (reference: api/routes/ui.py:273-280). */
  def locationFromMetadataPath(metadataPath: String): Option[String] = {
    val idx = metadataPath.indexOf("/metadata/")
    if (idx > 0) Some(metadataPath.substring(0, idx)) else None
  }

  /** Read and parse the newest metadata for a table location, if it is an
    * Iceberg table directory reachable from the driver. */
  def readLatest(tableLocation: String): Option[TableMetadata] =
    try latestMetadataFile(tableLocation).map(p =>
      parse(Files.readString(p)))
    catch { case NonFatal(_) => None }
}
