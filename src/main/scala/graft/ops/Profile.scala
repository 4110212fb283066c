package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus data-quality profiling: per-column summary statistics in one
 * aggregation pass — the "is this table what I think it is" report every
 * curation pipeline runs before and after each stage (row counts, null
 * rates, cardinalities, value ranges).
 *
 * Reference behavior: iceberg-explorer exposes table schema/metadata
 * introspection (`api/routes/catalog.py`) but leaves content profiling to
 * ad-hoc SQL; this makes the profile a first-class relational operator.
 *
 * Scale design: ONE aggregation over the table computes every column's
 * metrics together (Catalyst plans the distinct counts via Expand — the
 * standard multi-count-distinct shape — with partial aggregation map-side),
 * then a literal-array explode pivots the single result row into one row
 * per column. No joins, no second scan, no driver-side loop; the exchange
 * carries one row per (grouping-set × partition).
 *
 * All metrics are exact integers or strings — deliberately no averages:
 * integer metrics hash-compare bit-exactly across engines, float division
 * would not. min/max are computed on the NATIVE type (so `499 > 99` for a
 * bigint column) and cast to string only for the schema-stable output.
 */
object Profile {

  /** One row per requested column: (col_name, n_rows, n_nulls,
    * n_distinct, min_val, max_val, sum_len) where sum_len totals the
    * string-rendered length (code points) of non-null values.
    * Duplicate column requests collapse to one row each.
    *
    * `approximate = true` swaps the exact `count_distinct` for
    * `approx_count_distinct` (HLL++, default ~5 % relative error) — the
    * 100 TB path: exact distinct counts are the only metric here that
    * shuffles per-VALUE state (via Expand), everything else partial-
    * aggregates to one row per partition. The x01 gate query runs the
    * exact form (oracle-checkable); the HTTP profile route and any
    * warehouse-scale caller should pass approximate. */
  def profile(df: DataFrame, cols: Seq[String],
              approximate: Boolean = false): DataFrame = {
    val colsU = cols.distinct
    require(colsU.nonEmpty, "profile needs at least one column")
    val missing = colsU.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: columns not in schema: $missing")
    val aggs = colsU.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__cnt"),
        (if (approximate) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"__${c}__nd"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"),
        sum(length(col(c).cast("string")).cast("long")).as(s"__${c}__len"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = colsU.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}__cnt")).as("n_nulls"),
        col(s"__${c}__nd").as("n_distinct"),
        col(s"__${c}__min").as("min_val"),
        col(s"__${c}__max").as("max_val"),
        col(s"__${c}__len").as("sum_len"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
