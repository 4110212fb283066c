package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the canonical relational inventory
  * (graft.queries.Inventory, SURVEY §5.3) and the training-data pipeline
  * operators (graft.ops.*); `oracleSql` carries the DuckDB-dialect oracle
  * for every hash-checkable query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style pricing summary — scan, filter-free groupBy with
    * map-side partial aggregation, canonicalized decimal output. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_groupby_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline operators (dedup/similarity/text/multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Inventory.queries ++ graft.queries.PipelineOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Inventory.oracle ++ graft.queries.PipelineOps.oracle
}
