package graft.results

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite

/** C1/C2/C3 server-side sort/filter/pagination semantics ported from the
  * reference UI (reference: templates/query.html:629-707,382-392). */
class ResultOpsSpec extends SparkSuite {

  import ResultOps._

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("score", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "Alpha", 10.0),
        Row(2, "beta", null),
        Row(3, null, 5.5),
        Row(4, "Gamma", -3.0),
        Row(5, "alpine", 100.0))),
      schema)
  }

  // --- C1 sort ---------------------------------------------------------
  test("sort asc: numeric order, nulls last (nulls compare largest)") {
    val got = sortByColumn(df, "score", Asc)
      .select("id").collect.map(_.getInt(0)).toSeq
    assert(got === Seq(4, 3, 1, 5, 2))
  }

  test("sort desc: nulls first (nulls compare largest)") {
    val got = sortByColumn(df, "score", Desc)
      .select("id").collect.map(_.getInt(0)).toSeq
    assert(got === Seq(2, 5, 1, 3, 4))
  }

  test("sort string column: case-insensitive compare") {
    val got = sortByColumn(df, "name", Asc)
      .select("id").collect.map(_.getInt(0)).toSeq
    // lower: alpha < alpine < beta < gamma, null last
    assert(got === Seq(1, 5, 2, 4, 3))
  }

  // --- C2 filters ------------------------------------------------------
  test("blank filters pass everything; filters AND across columns") {
    assert(applyFilters(df, Map("name" -> "  ", "score" -> "")).count === 5)
    assert(applyFilters(df,
      Map("name" -> "al", "score" -> ">5")).select("id")
      .collect.map(_.getInt(0)).toSeq.sorted === Seq(1, 5))
  }

  test("literal null matches only null cells (case-insensitive)") {
    assert(applyFilters(df, Map("name" -> "NULL")).select("id")
      .collect.map(_.getInt(0)).toSeq === Seq(3))
  }

  test("numeric range operators on numeric columns") {
    assert(applyFilters(df, Map("score" -> ">= 10")).select("id")
      .collect.map(_.getInt(0)).toSeq.sorted === Seq(1, 5))
    assert(applyFilters(df, Map("score" -> "<0")).select("id")
      .collect.map(_.getInt(0)).toSeq === Seq(4))
    // null cells never match a range filter (reference: query.html:681-683)
    assert(applyFilters(df, Map("score" -> "<=1000")).count === 4)
  }

  test("substring filter is case-insensitive contains on stringified value") {
    assert(applyFilters(df, Map("name" -> "ALPH")).select("id")
      .collect.map(_.getInt(0)).toSeq.sorted === Seq(1))
    // numeric column falls back to string contains for non-range filters
    assert(applyFilters(df, Map("score" -> "0.0")).select("id")
      .collect.map(_.getInt(0)).toSeq.sorted === Seq(1, 5))
  }

  // --- C3 pagination ---------------------------------------------------
  test("paginate slices (page-1)*size until page*size") {
    val big = spark.range(1, 1001).toDF("id")
    val page3 = paginate(big.orderBy("id"), page = 3, pageSize = 100)
      .collect.map(_.getLong(0))
    assert(page3.head === 201L && page3.last === 300L)
    intercept[IllegalArgumentException] { paginate(big, 0, 100) }
    intercept[IllegalArgumentException] { paginate(big, 1, 123) }
  }
}
