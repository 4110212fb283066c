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

  test("q50: HLL sketches are mergeable — union of partials tracks the whole") {
    val li = Tables(spark, sf, "lineitem")
    val viaUnion = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).collect().head.getLong(0)
    val direct = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))))
      .collect().head.getLong(0)
    // merging per-group sketches must equal sketching the whole relation:
    // both see the same value set, the sketch is order/partition-insensitive
    assert(viaUnion === direct)
    assert(Inventory.queries("q50_hll_union")(spark, sf)
      .collect().head.getBoolean(1))
  }

  test("q51: percentile_approx lands within one quantity unit of exact") {
    val rows = Inventory.queries("q51_apx_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2), s"verdict failed: $r"))
  }
}
