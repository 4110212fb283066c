package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Behavioral event analytics — funnel completion and cohort retention,
 * the two standard product-analytics reports over an event stream (and,
 * in a training-data context, over user feedback/telemetry streams when
 * building interaction datasets).
 *
 * Everything is exact integer arithmetic over microsecond epochs and
 * counts — both reports hash-verify bit-for-bit against a SQL oracle.
 */
object Behavior {

  private def micros(tsCol: String): Column = expr(s"unix_micros($tsCol)")

  /**
   * Ordered funnel: for every key that performed `steps.head`, the time
   * it first reached each subsequent step STRICTLY AFTER its previous
   * step's first time — the classic "view → click → purchase" completion
   * report (first-touch semantics; re-entries don't reset progress).
   * Output: (key, t1_us .. tk_us, depth) with NULL times past the
   * drop-off point and `depth` = number of steps completed. Keys that
   * never performed the first step are absent — a funnel counts its
   * entrants.
   *
   * Scale: one filtered key-keyed min-aggregation per step plus a keyed
   * equi-join per step transition (k−1 joins of key-sized tables, each
   * with map-side partial mins; the event scan is filtered to one step's
   * rows before each aggregation). Nothing global, nothing iterative
   * beyond the fixed step count.
   */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    val k = col(keyCol)
    var stage = events.filter(col(typeCol) === steps.head)
      .groupBy(k.as("key"))
      .agg(min(micros(tsCol)).as("t1_us"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = s"t${i}_us"
      val cur = s"t${i + 1}_us"
      val nxt = events.filter(col(typeCol) === step)
        .select(k.as("__k"), micros(tsCol).as("__t"))
      stage = stage
        .join(nxt, stage("key") === col("__k") &&
          col("__t") > stage(prev), "left")
        .groupBy(stage.columns.toIndexedSeq.map(col): _*)
        .agg(min(col("__t")).as(cur))
    }
    val depth = steps.indices.map { i =>
      when(col(s"t${i + 1}_us").isNotNull, 1).otherwise(0)
    }.reduce(_ + _)
    stage.withColumn("depth", depth).orderBy(col("key"))
  }

  /**
   * Weekly cohort retention: users bucketed by their FIRST active epoch
   * week (`unix_micros div week` — integer epoch weeks, not calendar
   * weeks, so the bucketing is engine- and locale-independent), counted
   * once per (cohort, weeks-since-first) they were active in. The
   * classic retention triangle; `week_offset = 0` rows are cohort sizes.
   *
   * Scale: one key-keyed min (first week), one (key, week) distinct,
   * one (cohort, offset)-keyed count — all partial-aggregated, shuffles
   * carry (long, long) pairs.
   */
  def cohortRetention(events: DataFrame, keyCol: String,
                      tsCol: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // integer DIV, not double /: epoch micros exceed double's exact range
    // once weeks of drift accumulate, and a truncated x.999... would
    // misbucket exact week boundaries
    val weeks = events.select(col(keyCol).as("key"),
      expr(s"unix_micros($tsCol) DIV ${weekUs}L").as("wk"))
    val first = weeks.groupBy(col("key")).agg(min(col("wk")).as("cohort"))
    weeks.distinct()
      .join(first, "key")
      .groupBy(col("cohort").as("cohort_week"),
        (col("wk") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
