package graft.results

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Server-side equivalents of the reference UI's client-side result
 * operators C1-C3 (reference: src/iceberg_explorer/templates/query.html:
 * 629-707 sort/filter, 382-392 pagination) — the browser sorts/filters at
 * most 1000 fetched rows; here the same semantics are DataFrame transforms
 * so they run distributed over any result size and Catalyst pushes the
 * derived predicates into the scan.
 */
object ResultOps {

  sealed trait SortDirection
  case object Asc extends SortDirection
  case object Desc extends SortDirection

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /**
   * C1 column sort: nulls compare as largest (asc → nulls last, desc →
   * nulls first, query.html:657-660); numeric columns compare numerically;
   * everything else compares as case-insensitive strings
   * (`localeCompare` on lowercased values, query.html:663-670).
   */
  def sortByColumn(df: DataFrame, column: String,
                   direction: SortDirection): DataFrame = {
    val dt = df.schema(column).dataType
    val key: Column =
      if (isNumeric(dt)) col(column) else lower(col(column).cast(StringType))
    val ordered = direction match {
      case Asc  => key.asc_nulls_last
      case Desc => key.desc_nulls_first
    }
    df.orderBy(ordered)
  }

  /**
   * C2 per-column filters, ANDed across columns (query.html:675-707):
   *  - blank filter → pass
   *  - literal "null" (case-insensitive) → matches only null cells
   *  - numeric column + `>`/`<`/`>=`/`<=` prefix → numeric comparison
   *  - otherwise case-insensitive substring on the stringified value
   */
  def applyFilters(df: DataFrame, filters: Map[String, String]): DataFrame =
    filters.foldLeft(df) { case (d, (column, filter)) =>
      if (filter == null || filter.trim.isEmpty) d
      else d.filter(predicate(d, column, filter))
    }

  private val RangePattern = """^([<>]=?)\s*(-?\d+\.?\d*)$""".r

  private def predicate(df: DataFrame, column: String, filter: String): Column = {
    val c = col(column)
    // the reference lowercases but does NOT trim past the blank check
    if (filter.equalsIgnoreCase("null")) return c.isNull

    val dt = df.schema(column).dataType
    val range: Option[Column] =
      if (isNumeric(dt)) filter match {
        case RangePattern(op, num) =>
          val v = num.toDouble
          Some(op match {
            case ">"  => c > v
            case "<"  => c < v
            case ">=" => c >= v
            case "<=" => c <= v
          })
        case _ => None
      } else None

    range.getOrElse(
      c.isNotNull &&
        lower(c.cast(StringType)).contains(filter.toLowerCase))
  }

  /** C3 pagination: page slice `rows[(p-1)*size, p*size)`
    * (query.html:382-392) — `Offset` + `GlobalLimit` in Catalyst, so only
    * the page crosses to the driver. */
  def paginate(df: DataFrame, page: Int, pageSize: Int): DataFrame = {
    require(page >= 1, s"page must be >= 1, got $page")
    require(ResultStream.ValidPageSizes.contains(pageSize),
      s"pageSize must be one of ${ResultStream.ValidPageSizes.toSeq.sorted}")
    df.offset((page - 1) * pageSize).limit(pageSize)
  }
}
