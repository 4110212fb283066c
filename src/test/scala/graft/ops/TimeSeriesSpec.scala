package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleFill closes gaps, forward-fills, and bounds per key") {
    val events = Seq(
      // user 1: observations at 00h and 03h → grid 00,01,02,03
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 00:40:00"), 2.0),
      (1L, ts("2024-01-01 03:05:00"), 7.0),
      // user 2: single observation → single-row grid
      (2L, ts("2024-01-02 12:30:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleFill(events, "user_id", "ts", "value")
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(0, 13),
        r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3)),
        r.getDouble(4)))
    assert(out === Seq(
      (1L, "2024-01-01 00", 2L, Some(12.0), 12.0), // 10+2 in the bucket
      (1L, "2024-01-01 01", 0L, None, 12.0),       // gap: filled from 00h
      (1L, "2024-01-01 02", 0L, None, 12.0),
      (1L, "2024-01-01 03", 1L, Some(7.0), 7.0),   // own value wins
      (2L, "2024-01-02 12", 1L, Some(5.0), 5.0)))  // no fabricated rows
    // grid never extends beyond a key's own activity span
    assert(out.count(_._1 == 2L) == 1)
  }

  test("resampleFill rejects reserved column names and malformed steps early") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("v", "ts", "value")
    intercept[IllegalArgumentException](
      TimeSeries.resampleFill(df, "v", "ts", "value"))
    val ok = Seq((1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    intercept[IllegalArgumentException](
      TimeSeries.resampleFill(ok, "user_id", "ts", "value", step = "1 bogus"))
  }

  test("resampleFill honors sub-hour steps with epoch alignment") {
    val events = Seq(
      (1L, ts("2024-01-01 00:07:00"), 1.0),
      (1L, ts("2024-01-01 00:52:00"), 3.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleFill(events, "user_id", "ts", "value",
        step = "15 minutes")
      .orderBy("bucket")
      .select(date_format(col("bucket"), "HH:mm").as("b"), col("v_ffill"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(out === Seq(
      "00:00" -> 1.0, "00:15" -> 1.0, "00:30" -> 1.0, "00:45" -> 3.0))
  }

  test("gapReport: one row per missing-bucket island, exact counts") {
    val events = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.0),   // bucket 00
      (1L, ts("2024-01-01 03:20:00"), 1.0),   // bucket 03 -> gap 01-02
      (1L, ts("2024-01-01 04:05:00"), 1.0),   // bucket 04 (adjacent, no gap)
      (1L, ts("2024-01-01 09:00:00"), 1.0),   // bucket 09 -> gap 05-08
      (2L, ts("2024-01-01 00:00:00"), 1.0))   // single obs -> no gaps
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.gapReport(events, "user_id", "ts", "1 hour")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
    assert(out === Array(
      (1L, "2024-01-01 01:00:00.0", "2024-01-01 02:00:00.0", 2L),
      (1L, "2024-01-01 05:00:00.0", "2024-01-01 08:00:00.0", 4L)))
  }

  test("gapReport rejects calendar-unit and malformed steps") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    intercept[IllegalArgumentException](
      TimeSeries.gapReport(df, "user_id", "ts", "1 month"))
    intercept[IllegalArgumentException](
      TimeSeries.gapReport(df, "user_id", "ts", "1 bogus"))
  }

  test("sessionize: gap starts new session, half-open boundary, per-key") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (2L, ts("2024-01-01 00:29:00"), 1L),   // within gap -> session 1
      (3L, ts("2024-01-01 00:59:00"), 1L),   // exactly 30 min later: NEW
      //   (session_window's [ts, ts+gap) half-open boundary — q32 parity)
      (4L, ts("2024-01-01 01:28:59"), 1L),   // 29m59s -> same session 2
      (5L, ts("2024-01-01 00:00:00"), 2L))   // other key: own session 1
      .toDF("event_id", "ts", "user_id")
    val out = TimeSeries.sessionize(events, "user_id", "ts", "event_id",
        gap = "30 minutes")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) === ((1L, true)))
    assert(out(2L) === ((1L, false)))
    assert(out(3L) === ((2L, true)))         // exactly gap: new session
    assert(out(4L) === ((2L, false)))
    assert(out(5L) === ((1L, true)))
    intercept[IllegalArgumentException](
      TimeSeries.sessionize(events, "user_id", "ts", "event_id", "1 month"))
    intercept[IllegalArgumentException](
      TimeSeries.sessionize(events, "user_id", "ts", "event_id", "bogus"))
  }

  test("sessionize: sub-second gaps keep full microsecond precision") {
    // 1.2 s apart with a 1.5 s gap -> same session (a seconds-truncated
    // gap would have split them); with a 500 ms gap -> new session
    val events = Seq(
      (1L, new java.sql.Timestamp(0L), 1L),
      (2L, new java.sql.Timestamp(1200L), 1L))
      .toDF("event_id", "ts", "user_id")
    def ix(gap: String) =
      TimeSeries.sessionize(events, "user_id", "ts", "event_id", gap)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val wide = ix("1 second 500 milliseconds")
    assert(wide(1L) === 1L && wide(2L) === 1L)
    val narrow = ix("500 milliseconds")
    assert(narrow(1L) === 1L && narrow(2L) === 2L)
  }

  test("rollingZScore: large magnitudes stay in DECIMAL (no BIGINT square overflow)") {
    // |value| = 1e6 -> vi = 1e10; vi*vi = 1e20 would overflow a BIGINT
    // square under ANSI — the sum-of-squares must widen first
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1000000.0),
      (2L, ts("2024-01-01 01:00:00"), 1L, 1000000.0),
      (3L, ts("2024-01-01 02:00:00"), 1L, 1000000.0),
      (4L, ts("2024-01-01 03:00:00"), 1L, -1000000.0))
      .toDF("event_id", "ts", "user_id", "value")
    val out = TimeSeries.rollingZScore(events, "user_id", "ts", "event_id",
        "value", n = 4, minObs = 2, zThreshold = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(3L) === false)   // flat prefix
    assert(out(4L) === true)    // sign flip vs zero-variance base
  }

  test("rollingZScore: spike flags, baseline rows and flat series do not") {
    // 10 steady observations then a spike; minObs 4 so rows 1-3 have no
    // verdict (false), rows 5-10 see a zero-variance window (no flag for
    // equal values, flag for ANY deviation), row 11 is the spike
    val events = (1 to 10).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i - 1}%02d:00:00"), 1L, 10.0)) :+
      ((11L, ts("2024-01-01 10:00:00"), 1L, 100.0))
    val df = events.toDF("event_id", "ts", "user_id", "value")
    val out = TimeSeries.rollingZScore(df, "user_id", "ts", "event_id",
        "value", n = 20, minObs = 4, zThreshold = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) === ((0L, false)))         // empty window
    assert(out(4L) === ((3L, false)))         // below minObs
    assert(out(5L) === ((4L, false)))         // flat series: no anomaly
    assert(out(10L) === ((9L, false)))
    assert(out(11L) === ((10L, true)))        // spike vs zero-variance base
  }

  test("rollingZScore: 3-sigma boundary is exact (strict inequality)") {
    // window = {0, 8}: mean 4e4 micro-units... use values 0 and 8:
    // vi in {0, 80000}; for x with window {0,8,0,8}: S=160000, SS=1.28e10,
    // c=4 -> variance term 9*(c*SS - S^2)=9*(5.12e10-2.56e10)=2.304e11;
    // (x*4-160000)^2 for x=16 (vi=160000): (480000)^2=2.304e11 -> NOT >
    // (exactly 3 sigma, strict), for x=17: flagged
    val base = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 0.0),
      (2L, ts("2024-01-01 01:00:00"), 1L, 8.0),
      (3L, ts("2024-01-01 02:00:00"), 1L, 0.0),
      (4L, ts("2024-01-01 03:00:00"), 1L, 8.0))
    val at3 = base :+ ((5L, ts("2024-01-01 04:00:00"), 1L, 16.0))
    val past3 = base :+ ((5L, ts("2024-01-01 04:00:00"), 1L, 17.0))
    def flag(rows: Seq[(Long, java.sql.Timestamp, Long, Double)]): Boolean =
      TimeSeries.rollingZScore(rows.toDF("event_id", "ts", "user_id", "value"),
          "user_id", "ts", "event_id", "value", n = 4, minObs = 4,
          zThreshold = 3)
        .filter($"event_id" === 5L).collect().head.getBoolean(5)
    assert(!flag(at3))                        // exactly 3 sigma: not flagged
    assert(flag(past3))
    intercept[IllegalArgumentException](TimeSeries.rollingZScore(
      base.toDF("event_id", "ts", "user_id", "value"),
      "user_id", "ts", "event_id", "value", n = 1))
    intercept[IllegalArgumentException](TimeSeries.rollingZScore(
      base.toDF("event_id", "ts", "user_id", "value"),
      "user_id", "ts", "event_id", "value", n = 4, minObs = 5))
  }
}
