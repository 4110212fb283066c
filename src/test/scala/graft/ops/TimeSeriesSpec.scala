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
}
