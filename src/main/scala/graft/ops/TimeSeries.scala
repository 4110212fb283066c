package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization for event streams: resample onto a fixed
 * grid and gap-fill — the feature-store shape (one row per key per
 * bucket, no holes) that downstream trainers and as-of joins expect.
 *
 * Reference computes nothing like this (its streams are HTTP transfer);
 * this is engine capability a Spark pipeline adds, like graft.ops.AsOf.
 *
 * Scale: gap rows are generated per OBSERVED bucket pair with `lag` +
 * `sequence` + `explode` (row-local fan-out between consecutive
 * observations — no second source scan, no grid join), and the
 * forward-fill is a keyed window — everything partitions by key, so
 * 100 TB of events resample with key-count parallelism. Grid size per
 * key is bounded by that key's own [min, max] activity span.
 */
object TimeSeries {

  /**
   * Hourly (or any `step`) resample of `valueCol` aggregated per
   * (`keyCol`, bucket), with empty buckets forward-filled from the last
   * observed value (nulls remain before a key's first observation —
   * there is nothing to fill from).
   *
   * Output: (key, bucket, n_events, v, v_ffill) where `v` is the bucket's
   * own aggregate (null for generated gap rows), `n_events` its event
   * count (0 for gaps), and `v_ffill` the forward-filled value.
   *
   * CAVEAT — outlier timestamps: the per-key grid spans that key's OWN
   * [min, max] bucket range, so one corrupt timestamp (a zeroed 1970
   * field, a far-future clock skew) inflates that key's grid to the whole
   * bogus span (and past Spark's sequence-length cap at fine steps).
   * Like any event-time pipeline, bound the time range BEFORE
   * regularizing (`events.filter(col(ts).between(...))`); the operator
   * deliberately does not silently clamp.
   */
  def resampleFill(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, step: String = "1 hour"): DataFrame = {
    val reserved = Set("bucket", "n_events", "v", "v_ffill", "__w", "__prev", "__obs")
    require(!Seq(keyCol, tsCol, valueCol).exists(reserved.contains),
      s"column names $reserved are produced by resampleFill — rename the " +
        "input column first")
    // validate `step` up front (expr()/window() only fail at plan analysis,
    // with an error pointing at generated SQL instead of the parameter)
    val parsed =
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(step))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"resampleFill: unparseable step '$step'", e)
      }
    require(parsed != null,
      s"resampleFill: unparseable step '$step'")
    val stepInterval = expr(s"interval $step")

    // tumbling-window START as the bucket: epoch-aligned for any `step`
    // (date_trunc would only be right for whole calendar units). The
    // window() expression must appear directly in the grouping list for
    // the analyzer's TimeWindow rewrite; the start field projects after.
    val obs = events
      .groupBy(col(keyCol), window(col(tsCol), step).as("__w"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("v"))
      .select(col(keyCol), col("__w.start").as("bucket"),
        col("n_events"), col("v"))

    // Gap filling without a grid join: each observation learns its
    // predecessor bucket via lag() over the key, then explodes the run
    // [prev+step .. bucket] in ONE Generate — the last element is the
    // observation itself, the rest are the gap rows (buckets are
    // epoch-aligned multiples of `step`, so the run is exact). Earlier
    // form derived a per-key [min, max] grid from a SECOND reference to
    // `obs` and left-joined observations back: two source scans (column
    // pruning differed per branch, so the exchanges never unified) plus
    // a join. This shape scans once, and the fill window inherits the
    // lag window's key partitioning — the explode is row-local, so no
    // exchange sits between the two windows (pinned in PlanSpec).
    val w0 = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val runs = obs
      .withColumn("__prev", lag(col("bucket"), 1).over(w0))
      .select(col(keyCol), col("n_events"), col("v"),
        col("bucket").as("__obs"),
        explode(when(col("__prev").isNull, array(col("bucket")))
          .otherwise(sequence(col("__prev") + stepInterval, col("bucket"),
            stepInterval))).as("bucket"))

    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs
      .select(col(keyCol), col("bucket"),
        when(col("bucket") === col("__obs"), col("n_events"))
          .otherwise(lit(0L)).as("n_events"),
        when(col("bucket") === col("__obs"), col("v")).as("v"))
      .select(col(keyCol), col("bucket"), col("n_events"),
        col("v"),
        // last(ignoreNulls) up to AND INCLUDING the current row IS
        // forward-fill: a bucket's own value wins, else the latest
        // preceding non-null
        last(col("v"), ignoreNulls = true).over(w).as("v_ffill"))
  }

  /**
   * Gap report — the downtime/coverage audit of a time series: one row
   * per maximal run of MISSING buckets per key (gap start/end bucket and
   * the exact missing count). The dual of [[resampleFill]]: instead of
   * materializing the gap rows, each lag() pair whose distance exceeds
   * one step IS a gap island — so the operator emits one row per gap
   * with no Generate at all, and a key whose series is years of
   * downtime costs one row, not years of buckets.
   *
   * Scale: one keyed aggregation (bucketing) + one keyed lag window —
   * both partition by `keyCol`; nothing global, nothing exploded.
   * n_missing is integer epoch arithmetic (buckets are epoch-aligned
   * multiples of the step), so the report hash-verifies.
   */
  def gapReport(events: DataFrame, keyCol: String, tsCol: String,
                step: String = "1 hour"): DataFrame = {
    val parsed =
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(step))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"gapReport: unparseable step '$step'", e)
      }
    require(parsed != null && parsed.months == 0,
      s"gapReport: step '$step' must be a fixed-length interval " +
        "(no month/year units — buckets must be epoch-aligned)")
    val stepSeconds =
      parsed.days * 86400L + parsed.microseconds / 1000000L
    require(stepSeconds > 0, s"gapReport: step '$step' must be positive")
    val stepInterval = expr(s"interval $step")

    // observed-bucket set: distinct (key, bucket) — no dead count buffer
    val obs = events
      .select(col(keyCol), window(col(tsCol), step).as("__w"))
      .select(col(keyCol), col("__w.start").as("bucket"))
      .distinct()
    val w0 = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    obs
      .withColumn("__prev", lag(col("bucket"), 1).over(w0))
      .filter(col("__prev").isNotNull &&
        col("bucket") > col("__prev") + stepInterval)
      .select(col(keyCol),
        (col("__prev") + stepInterval).as("gap_start"),
        (col("bucket") - stepInterval).as("gap_end"),
        ((unix_timestamp(col("bucket")) - unix_timestamp(col("__prev")))
          / stepSeconds - 1).cast("long").as("n_missing"))
      .orderBy(col(keyCol), col("gap_start"))
  }

  /**
   * Batch sessionization — assign every event its session index per key,
   * where a new session starts after `gap` of inactivity (the
   * gaps-and-islands cumulative-sum form of what `session_window` does
   * for streaming aggregation in q32; this per-EVENT assignment is the
   * shape funnel/attribution queries join against). Session indexes are
   * 1-based in (ts, id) order; `is_session_start` marks the boundary
   * rows. All integer epoch arithmetic — hash-exact. Boundary semantics
   * MATCH `session_window`'s half-open [ts, ts+gap) window: two events
   * exactly `gap` apart are in DIFFERENT sessions (the comparison is
   * `delta >= gap`, not `>`), so a funnel built on this operator agrees
   * with its streaming q32 counterpart at the exact boundary.
   *
   * Scale: two stacked keyed windows (lag, then running sum) over one
   * partition-by-key exchange — key-count parallelism, no global sort.
   */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 idCol: String, gap: String = "30 minutes"): DataFrame = {
    val parsed =
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(gap))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"sessionize: unparseable gap '$gap'", e)
      }
    require(parsed != null && parsed.months == 0,
      s"sessionize: gap '$gap' must be a fixed-length interval")
    // keep full microsecond precision: the comparison below is in
    // micros, so truncating to seconds would silently shrink gaps like
    // "1 second 500 milliseconds" and reject sub-second gaps outright
    val gapMicros = parsed.days * 86400L * 1000000L + parsed.microseconds
    require(gapMicros > 0, s"sessionize: gap '$gap' must be positive")
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val run = order.rowsBetween(Window.unboundedPreceding, 0L)
    // integer MICROsecond epochs: the fixtures carry sub-second
    // timestamps, and a truncated-seconds comparison would classify a
    // boundary pair differently from an engine comparing full precision
    events
      .withColumn("__prev",
        lag(expr(s"unix_micros($tsCol)"), 1).over(order))
      .withColumn("is_session_start",
        col("__prev").isNull ||
          expr(s"unix_micros($tsCol)") - col("__prev") >= gapMicros)
      .withColumn("session_ix",
        sum(when(col("is_session_start"), 1L).otherwise(0L)).over(run))
      .select(col(idCol), col(keyCol), col(tsCol), col("session_ix"),
        col("is_session_start"))
      .orderBy(col(idCol))
  }

  /**
   * Rolling z-score anomaly detection: flag each observation whose value
   * deviates more than `zThreshold` standard deviations from the mean of
   * its key's trailing window (the previous `n` observations, current row
   * EXCLUDED — the detector must not contaminate its own baseline). The
   * streaming-telemetry outlier pass (spend spikes, metric jumps) in its
   * batch form.
   *
   * EXACT integer arithmetic: values fix to 4-dp micro-units
   * (`vi = cast(cast(v as decimal(14,4)) * 10000 as bigint)` — the
   * established double→decimal cast parity path), and the flag is the
   * algebraic test `(vi·c − S)² > z²·(c·SS − S²)` over BIGINT window
   * sums S=Σvi, SS=Σvi² (z² scaled — μ and σ are never materialized as
   * floats), with every product in DECIMAL(38,0) so nothing can wrap:
   * the report hash-verifies bit-for-bit on any engine. Windows shorter
   * than `minObs` observations flag false (no baseline, no verdict).
   *
   * Scale: one keyed window (partitioned by `keyCol`, ordered by
   * (`tsCol`, `idCol`) so timestamp ties can't flip frames across
   * engines) — key-count parallelism, no global sort.
   */
  def rollingZScore(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valueCol: String, n: Int = 20,
                    minObs: Int = 8, zThreshold: Int = 3): DataFrame = {
    require(n >= 2, s"rollingZScore needs n >= 2, got $n")
    require(minObs >= 2 && minObs <= n,
      s"rollingZScore needs 2 <= minObs <= n, got $minObs")
    require(zThreshold >= 1, s"rollingZScore needs zThreshold >= 1, got $zThreshold")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-n.toLong, -1L)
    events
      .withColumn("__vi",
        (col(valueCol).cast("decimal(14,4)") * 10000).cast("bigint"))
      .withColumn("__c", count(col("__vi")).over(w))
      .withColumn("__s", sum(col("__vi")).over(w))
      // square inside DECIMAL: __vi is a ×1e4 fixed-point BIGINT, so a
      // |value| above ~3e5 would overflow the BIGINT square (ANSI throw)
      .withColumn("__ss",
        sum(col("__vi").cast("decimal(38,0)") * col("__vi")).over(w))
      .select(col(idCol), col(keyCol), col(tsCol),
        col(valueCol).cast("decimal(18,2)").cast("double").as("value"),
        col("__c").as("n_window"),
        (col("__c") >= minObs &&
          expr(s"""(CAST(__vi AS DECIMAL(38,0)) * __c - __s)
                   * (CAST(__vi AS DECIMAL(38,0)) * __c - __s)
                 > ${zThreshold.toLong * zThreshold}
                   * (CAST(__c AS DECIMAL(38,0)) * __ss
                      - CAST(__s AS DECIMAL(38,0)) * __s)"""))
          .as("is_anomaly"))
      .orderBy(col(idCol))
  }
}
