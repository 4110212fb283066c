package graft.catalog

import java.nio.file.Files

import graft.SparkSuite
import graft.tables.Tables

/** Write path: create/append producing snapshot lineage our metadata
  * reader and catalog provider consume; time travel prunes to the target
  * snapshot's directories. */
class IcebergTablesSpec extends SparkSuite {

  test("create then append: snapshot history grows, current is latest") {
    val loc = Files.createTempDirectory("iceberg_tbl").toString
    val nation = Tables(spark, sf, "nation")

    val snap1 = IcebergTables.write(nation.limit(10), loc)
    val snap2 = IcebergTables.write(nation.limit(5), loc)

    val m = IcebergMetadata.readLatest(loc).get
    assert(m.snapshots.map(_.sequenceNumber) === Seq(1L, 2L))
    assert(m.currentSnapshotId === Some(snap2))
    assert(m.snapshots.map(_.snapshotId) === Seq(snap1, snap2))

    // reader sees the union at current, only batch 1 at snapshot 1
    assert(IcebergTables.read(spark, loc).count === 15)
    assert(IcebergTables.readAt(spark, loc, Some(snap1)).count === 10)
  }

  test("catalog provider surfaces the written snapshot history (A11/A13)") {
    val loc = Files.createTempDirectory("iceberg_tbl2").toString
    val s1 = IcebergTables.write(Tables(spark, sf, "region"), loc)
    val s2 = IcebergTables.write(Tables(spark, sf, "region"), loc)

    spark.sql("CREATE DATABASE IF NOT EXISTS wtest")
    // register the table at the metadata root (explicit schema: snapshot
    // files live in per-snapshot subdirectories; data access goes through
    // IcebergTables.read, metadata through the provider)
    spark.sql(s"""CREATE TABLE wtest.region_v (r_regionkey INT, r_name STRING)
      USING parquet LOCATION '$loc'""")
    val d = new SparkCatalogProvider(spark).tableDetails(Seq("wtest"), "region_v")
    assert(d.snapshots.map(_.snapshotId) === Seq(s1, s2))
    assert(d.currentSnapshotId === Some(s2))
    assert(d.currentSnapshot.map(_.sequenceNumber) === Some(2L))
  }

  test("unknown snapshot id raises (reference 404 shape)") {
    val loc = Files.createTempDirectory("iceberg_tbl3").toString
    IcebergTables.write(Tables(spark, sf, "region"), loc)
    intercept[NoSuchEntityException] {
      IcebergTables.readAt(spark, loc, Some(123456789L))
    }
    intercept[NoSuchEntityException] {
      IcebergTables.read(spark, "/tmp/definitely/missing/location")
    }
  }
}
