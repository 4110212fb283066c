package graft.ops

import graft.SparkSuite

class BehaviorSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  test("funnel: strict ordering, first-touch, drop-offs keep NULL tail") {
    val events = Seq(
      // user 1 completes in order
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:05:00"), "click"),
      (1L, ts("2024-01-01 00:10:00"), "purchase"),
      // user 2: purchase BEFORE the first view -> doesn't count; then
      // click after view but no later purchase -> depth 2
      (2L, ts("2024-01-01 00:00:00"), "purchase"),
      (2L, ts("2024-01-01 00:01:00"), "view"),
      (2L, ts("2024-01-01 00:02:00"), "click"),
      // user 3: click at the SAME instant as view -> strict after fails
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:00:00"), "click"),
      // user 4 never views -> absent
      (4L, ts("2024-01-01 00:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.isNullAt(2), r.isNullAt(3), r.getInt(4)))).toMap
    assert(out(1L) === ((false, false, 3)))
    assert(out(2L) === ((false, true, 2)))    // pre-view purchase ignored
    assert(out(3L) === ((true, true, 1)))     // same-instant is not after
    assert(!out.contains(4L))                 // never entered the funnel
    intercept[IllegalArgumentException](
      Behavior.funnel(events, "user_id", "ts", "event_type", Seq("view")))
    intercept[IllegalArgumentException](
      Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "view")))
  }

  test("cohortRetention: epoch-week buckets, one count per active week") {
    val events = Seq(
      // user 1 first active week W, active again W+1 (twice -> one count)
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-08 00:00:00")),
      (1L, ts("2024-01-09 00:00:00")),
      // user 2 same cohort week, only week 0
      (2L, ts("2024-01-02 00:00:00")),
      // user 3 cohort one week later
      (3L, ts("2024-01-08 00:00:00")))
      .toDF("user_id", "ts")
    val out = Behavior.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0 = out.keys.map(_._1).min
    assert(out((w0, 0L)) === 2L)              // users 1 and 2
    assert(out((w0, 1L)) === 1L)              // user 1 retained
    assert(out((w0 + 1, 0L)) === 1L)          // user 3's own cohort
    assert(out.size === 3)
  }
}
