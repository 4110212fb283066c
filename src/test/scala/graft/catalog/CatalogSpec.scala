package graft.catalog

import java.nio.file.Files

import graft.SparkSuite

/** Catalog inspection operators A9-A14 — semantics ported from the
  * reference's catalog tests
  * (reference: tests/test_catalog.py:200-246,745-785,917-1025). */
class CatalogSpec extends SparkSuite {

  private lazy val provider: CatalogProvider = {
    spark.sql("CREATE DATABASE IF NOT EXISTS tpch")
    spark.sql(s"""CREATE TABLE IF NOT EXISTS tpch.nation
      USING parquet LOCATION '$sf/nation.parquet'""")
    spark.sql(s"""CREATE TABLE IF NOT EXISTS tpch.region
      USING parquet LOCATION '$sf/region.parquet'""")
    new SparkCatalogProvider(spark)
  }

  // --- namespace wire format (reference: tests/test_catalog.py:200-246) ---
  test("namespace parse: empty, single, multi-level") {
    assert(NamespacePath.parse(null) === Seq.empty)
    assert(NamespacePath.parse("") === Seq.empty)
    assert(NamespacePath.parse("db") === Seq("db"))
    assert(NamespacePath.parse("db\u001faccounting\u001ftax") ===
      Seq("db", "accounting", "tax"))
    assert(NamespacePath.encode(Seq("a", "b")) === "a\u001fb")
  }

  test("identifier quoting escapes the quote char") {
    assert(NamespacePath.quote("plain") === "`plain`")
    assert(NamespacePath.quote("we`ird") === "`we``ird`")
    assert(NamespacePath.fqn(Seq("cat", "ns", "t")) === "`cat`.`ns`.`t`")
  }

  // --- A9/A10 list namespaces + tables ---------------------------------
  test("listNamespaces includes created database") {
    assert(provider.listNamespaces().contains(Seq("tpch")))
  }

  test("listTables returns tables of the namespace, sorted") {
    val tables = provider.listTables(Seq("tpch"))
    assert(tables.containsSlice(Seq("nation", "region")))
    assert(tables === tables.sorted)
  }

  test("listTables on unknown namespace raises NoSuchEntity (reference 404)") {
    provider // force init
    intercept[NoSuchEntityException] {
      provider.listTables(Seq("nope"))
    }
  }

  // --- A12 schema introspection ----------------------------------------
  test("tableSchema returns ordered typed fields") {
    val schema = provider.tableSchema(Seq("tpch"), "nation")
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    assert(schema.fields.map(_.name) ===
      Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(byName("n_nationkey") === "int")
    assert(byName("n_name") === "string")
    assert(schema.fields.forall(!_.isPartitionColumn))
  }

  test("tableSchema on unknown table raises NoSuchEntity (reference 404)") {
    provider
    intercept[NoSuchEntityException] {
      provider.tableSchema(Seq("tpch"), "missing")
    }
  }

  test("tableExists probe") {
    assert(provider.tableExists(Seq("tpch"), "nation"))
    assert(!provider.tableExists(Seq("tpch"), "missing"))
  }

  // --- A11/A13 table details over plain (non-Iceberg) tables ------------
  test("tableDetails: parquet table has location, no snapshots") {
    val d = provider.tableDetails(Seq("tpch"), "nation")
    assert(d.location.nonEmpty)
    assert(d.snapshots.isEmpty)
    assert(d.currentSnapshot.isEmpty)
  }
}

/** Iceberg metadata-JSON reader — format v1/v2 snapshot + spec semantics
  * (reference behavior surfaced at catalog/service.py:148-202;
  * current-snapshot resolution api/routes/catalog.py:338-347). */
class IcebergMetadataSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val v2Json =
    """{
      "format-version": 2,
      "location": "s3://bucket/wh/db/t",
      "current-snapshot-id": 200,
      "default-spec-id": 1,
      "partition-specs": [
        {"spec-id": 0, "fields": []},
        {"spec-id": 1, "fields": [
          {"source-id": 4, "field-id": 1000, "name": "o_date_day",
           "transform": "day"},
          {"source-id": 1, "field-id": 1001, "name": "id_bucket",
           "transform": "bucket[16]"}]}
      ],
      "snapshots": [
        {"snapshot-id": 100, "sequence-number": 1, "timestamp-ms": 1700000000000,
         "manifest-list": "s3://bucket/wh/db/t/metadata/snap-100.avro"},
        {"snapshot-id": 200, "sequence-number": 2, "timestamp-ms": 1700000100000,
         "manifest-list": "s3://bucket/wh/db/t/metadata/snap-200.avro"}
      ]
    }"""

  private val v1Json =
    """{
      "format-version": 1,
      "location": "file:/wh/db/t1",
      "partition-spec": [
        {"source-id": 2, "field-id": 1000, "name": "region",
         "transform": "identity"}],
      "snapshots": [
        {"snapshot-id": 7, "timestamp-ms": 1600000000000,
         "manifest-list": "file:/wh/db/t1/metadata/snap-7.avro"}
      ]
    }"""

  test("v2: spec by default-spec-id, snapshots with sequence numbers") {
    val m = IcebergMetadata.parse(v2Json)
    assert(m.formatVersion === 2)
    assert(m.currentSnapshotId === Some(200L))
    val spec = m.partitionSpec.get
    assert(spec.specId === 1)
    assert(spec.fields.map(_.transform) === Seq("day", "bucket[16]"))
    assert(m.snapshots.map(_.sequenceNumber) === Seq(1L, 2L))
  }

  test("v1: sequence numbers default 0; v1 partition-spec field list") {
    val m = IcebergMetadata.parse(v1Json)
    assert(m.formatVersion === 1)
    assert(m.currentSnapshotId === None)
    assert(m.snapshots.map(_.sequenceNumber) === Seq(0L))
    assert(m.partitionSpec.get.fields.map(_.name) === Seq("region"))
  }

  test("current snapshot: id match, else max sequence-number") {
    val m = IcebergMetadata.parse(v2Json)
    val d = TableDetails(Seq("db"), "t", m.location, m.currentSnapshotId,
      m.partitionSpec, m.snapshots)
    assert(d.currentSnapshot.map(_.snapshotId) === Some(200L))
    // no current id → argmax(sequence_number) (reference: ui.py:284-287)
    val noId = d.copy(currentSnapshotId = None,
      snapshots = d.snapshots.reverse)
    assert(noId.currentSnapshot.map(_.snapshotId) === Some(200L))
  }

  test("readLatest picks highest-versioned metadata file") {
    val dir = Files.createTempDirectory("iceberg_meta")
    val meta = dir.resolve("metadata")
    Files.createDirectory(meta)
    Files.writeString(meta.resolve("v1.metadata.json"), v1Json)
    Files.writeString(meta.resolve("v2.metadata.json"), v2Json)
    val m = IcebergMetadata.readLatest(dir.toString)
    assert(m.map(_.formatVersion) === Some(2))
    // 00003-uuid style sorts above v2
    Files.writeString(meta.resolve(
      "00003-0b5a81c3-0000-4000-8000-000000000000.metadata.json"), v1Json)
    assert(IcebergMetadata.readLatest(dir.toString).map(_.formatVersion)
      === Some(1))
  }

  test("location derivation splits on /metadata/") {
    assert(IcebergMetadata.locationFromMetadataPath(
      "s3://b/wh/db/t/metadata/v3.metadata.json") === Some("s3://b/wh/db/t"))
    assert(IcebergMetadata.locationFromMetadataPath("no-meta-dir") === None)
  }
}
