package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — for each left row, the most recent right
 * row with `rightTs <= leftTs` on matching keys. Spark has no built-in
 * as-of join; per the extension preference order this COMPOSES existing
 * operators (union + window + last(ignoreNulls)) rather than adding a
 * custom physical operator:
 *
 *  1. tag both sides and union them on (keys, ts) — one dataset, no join;
 *  2. sort within each key partition by (ts, side) — right rows before
 *     left rows at equal timestamps so an exact-tie match is visible;
 *  3. `last(<right payload>, ignoreNulls)` over the running window carries
 *     the latest right payload forward to every left row;
 *  4. keep left rows.
 *
 * Scale shape: ONE shuffle of left+right on the key columns (the same
 * partitioning a sort-merge join would need), then a linear window pass —
 * no per-row range probe, no broadcast requirement, skew behaves like any
 * keyed window (salt hot keys upstream via [[Skew]] if needed).
 */
object AsOf {

  /**
   * @param left      rows to enrich (must contain `keys` and `leftTs`)
   * @param right     history to look up (must contain `keys` and `rightTs`)
   * @param keys      equality columns
   * @param leftTs    event-time column on `left`
   * @param rightTs   event-time column on `right`
   * @param rightCols right payload columns to carry (default: all except
   *                  keys and rightTs); null when no right row is at or
   *                  before the left timestamp
   */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payload =
      if (rightCols.nonEmpty) rightCols
      else right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq

    val leftCols = left.columns.toSeq
    // the payload columns come back under their bare names — a collision
    // with a left column would yield silent duplicate output names and
    // ambiguous col() downstream
    val clash = payload.filter(leftCols.contains)
    require(clash.isEmpty,
      s"as-of right payload column(s) ${clash.mkString(", ")} collide with " +
        "left columns — rename them on the right side or pass rightCols " +
        "with non-colliding names")
    val ts = "__asof_ts"
    val side = "__asof_side" // 0 = right, 1 = left → right first on ties

    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .select(Seq(col(ts), col(side)) ++ keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn(ts, col(rightTs))
      .withColumn(side, lit(0))
      .select(Seq(col(ts), col(side)) ++ keys.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .select((keys.map(col) ++ leftCols.filterNot(keys.contains).map(col) :+
        col(side)) ++
        payload.map(c => last(col(s"__r_$c"), ignoreNulls = true)
          .over(w).as(c)): _*)
      .filter(col(side) === 1)
      .drop(side)
  }
}
