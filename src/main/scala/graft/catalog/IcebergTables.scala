package graft.catalog

import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Versioned table write path with Iceberg-style snapshot metadata — the
 * "writes" half of the north-star capability (read/write + metadata
 * inspection) in this jar-free environment.
 *
 * Layout per table location:
 * {{{
 *   <location>/data/<seq>-<uuid>/   parquet files, one dir per snapshot
 *   <location>/metadata/vN.metadata.json     format-version 2 fields
 * }}}
 *
 * The metadata carries the real Iceberg v2 top-level fields our
 * [[IcebergMetadata]] reader (and the reference's inspection surface)
 * consumes — format-version, location, current-snapshot-id, snapshots
 * with sequence numbers/timestamps, partition-specs — with the snapshot's
 * `manifest-list` pointing at its data directory (a documented stand-in:
 * the full Iceberg commit protocol — manifests, stats, atomic swap —
 * belongs to the iceberg-spark-runtime binding of [[CatalogProvider]]
 * when that jar is present; nothing here pretends to be readable by other
 * Iceberg clients).
 *
 * Scale notes: data lands via the normal distributed parquet writer
 * (executors write, driver only writes the small metadata JSON), appends
 * never rewrite previous snapshots' files, and reads prune whole snapshot
 * directories, so time travel costs nothing at read time beyond path
 * selection.
 */
object IcebergTables {

  private def meta(location: String) = Paths.get(location, "metadata")

  private def nextVersion(location: String): Int =
    IcebergMetadata.latestMetadataFile(location)
      .map(p => IcebergMetadata.metadataVersion(p.getFileName.toString).toInt + 1)
      .getOrElse(1)

  private def currentState(location: String): Seq[Snapshot] =
    IcebergMetadata.readLatest(location).map(_.snapshots).getOrElse(Seq.empty)

  /** Create (snapshot 1) or append (snapshot N+1): writes the batch as a
    * new snapshot directory plus a new metadata version. Returns the new
    * snapshot id. */
  def write(df: DataFrame, location: String): Long = {
    val prior = currentState(location)
    val seq = prior.map(_.sequenceNumber).maxOption.getOrElse(0L) + 1
    val snapshotId = math.abs(UUID.randomUUID().getMostSignificantBits)
    val dataDir = s"$location/data/$seq-$snapshotId"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)

    val snapshots = prior :+ Snapshot(
      sequenceNumber = seq,
      snapshotId = snapshotId,
      timestampMs = System.currentTimeMillis(),
      manifestList = dataDir)
    writeMetadata(location, snapshotId, snapshots)
    snapshotId
  }

  private def writeMetadata(location: String, currentId: Long,
                            snapshots: Seq[Snapshot]): Unit = {
    val snapsJson = snapshots.map { s =>
      s"""    {"snapshot-id": ${s.snapshotId}, "sequence-number": ${s.sequenceNumber}, "timestamp-ms": ${s.timestampMs}, "manifest-list": "${s.manifestList}"}"""
    }.mkString("[\n", ",\n", "\n  ]")
    val json =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "${UUID.nameUUIDFromBytes(location.getBytes)}",
         |  "location": "$location",
         |  "last-sequence-number": ${snapshots.map(_.sequenceNumber).max},
         |  "current-snapshot-id": $currentId,
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "snapshots": $snapsJson
         |}""".stripMargin
    Files.createDirectories(meta(location))
    Files.writeString(
      meta(location).resolve(s"v${nextVersion(location)}.metadata.json"), json)
  }

  /** Read the table as of its current snapshot. */
  def read(spark: SparkSession, location: String): DataFrame =
    readAt(spark, location, snapshotId = None)

  /** Time-travel read: the table as of `snapshotId` (current when None) —
    * the union of all snapshot directories up to that snapshot's sequence
    * number; later snapshots' files are never listed or opened. */
  def readAt(spark: SparkSession, location: String,
             snapshotId: Option[Long]): DataFrame = {
    val m = IcebergMetadata.readLatest(location).getOrElse(
      throw new NoSuchEntityException(s"No table metadata at $location"))
    val target = snapshotId match {
      case Some(id) => m.snapshots.find(_.snapshotId == id).getOrElse(
        throw new NoSuchEntityException(s"Snapshot $id not found at $location"))
      case None =>
        // current-id match, else max sequence number (A13 semantics)
        TableDetails(Seq.empty, "", location, m.currentSnapshotId,
          m.partitionSpec, m.snapshots).currentSnapshot.getOrElse(
          throw new NoSuchEntityException(s"No snapshots at $location"))
    }
    val dirs = m.snapshots
      .filter(_.sequenceNumber <= target.sequenceNumber)
      .map(_.manifestList)
    spark.read.parquet(dirs: _*)
  }
}
