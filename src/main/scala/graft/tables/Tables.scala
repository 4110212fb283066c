package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/**
 * Fixture-table access for the TPC-H-ish parquet testdata
 * (`/root/testdata/sf*`, see TESTDATA.md).
 *
 * Mirrors the reference's catalog-attach step
 * (reference: src/iceberg_explorer/query/engine.py:86-110 — DuckDB `ATTACH`
 * makes catalog tables addressable by name); here the same capability is a
 * set of temp views over parquet so `spark.sql` queries can address tables
 * by bare name, while DataFrame pipelines read the parquet directly.
 *
 * Scale note: each table is a plain parquet scan — Catalyst pushes filters
 * and prunes columns into the scan, and on a real cluster the same code
 * would read a partitioned/bucketed layout or an Iceberg table via a V2
 * catalog without any query-code change.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // `spark.read.parquet` re-lists the path and re-reads footers for schema
  // inference on EVERY call; across a 60-query inventory that fixed cost
  // dominates small-SF runs. DataFrames are immutable logical plans, so
  // one per (session, dir, table) is safe to share. (On a real cluster the
  // equivalent is a catalog table, whose schema is cached by the
  // metastore/Iceberg metadata — this cache mirrors that behavior for
  // path-addressed fixtures.)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Read one fixture table as a DataFrame (lazy; no job is triggered). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts varies by testdata vintage: TIMESTAMP(NANOS) in the
      // round-1..4 generations (Spark's vectorized reader rejects it,
      // [PARQUET_TYPE_ILLEGAL] — read nanos as Long and truncate with
      // integer division: epoch-nanos exceed 2^53, a double round-trip
      // would corrupt the low bits), plain TIMESTAMP(MICROS) NTZ from
      // the round-5 regeneration on. Normalize BOTH to session-TZ
      // TimestampType so every downstream operator sees one type (the
      // session TZ is pinned UTC, so NTZ→LTZ is instant-preserving and
      // unix_micros/window bucketing are unchanged across vintages).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture table as a temp view for SQL-form queries. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach { n => apply(spark, dir, n).createOrReplaceTempView(n) }
}
