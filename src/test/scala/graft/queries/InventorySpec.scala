package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tables.Tables

/** Driver-contract smoke: every `SparkEntry.queries` entry must execute on
  * the sf0.001 fixtures, and every oracle key must reference an existing
  * query with matching column names (the driver hash sorts columns by
  * name, so a key mismatch silently zeroes that query's correctness). */
class InventorySpec extends SparkSuite {

  test("every declared query executes at sf0.001") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a query; flagship entry returns rows") {
    val missing = graft.SparkEntry.oracleSql.keySet
      .diff(graft.SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q29 emits the in-query ±5% verdict; raw sketch is within tolerance") {
    val row = Inventory.queries("q29_approx_distinct")(spark, sf).collect().head
    assert(row.getBoolean(1), s"within_tol must hold: $row")
    // and the raw HLL estimate itself (not shipped through the gate because
    // sketch values are engine-specific) stays within the tolerance
    val approx = Tables(spark, sf, "lineitem")
      .agg(approx_count_distinct(col("l_partkey"))).collect().head.getLong(0).toDouble
    val exact = row.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }
}
