package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

/** As-of join semantics: latest right row at or before the left
  * timestamp, per key; null when no prior right row exists. */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), 100),
    (1L, ts("2024-01-01 10:00:20"), 200),
    (2L, ts("2024-01-01 10:00:10"), 300),
    (3L, ts("2024-01-01 10:00:10"), 400)  // key with no quotes at all
  ).toDF("sym", "trade_ts", "qty")

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 9.9),
    (1L, ts("2024-01-01 10:00:05"), 10.1),  // exact tie with trade 1
    (1L, ts("2024-01-01 10:00:15"), 10.5),
    (1L, ts("2024-01-01 10:00:30"), 11.0),  // after every trade
    (2L, ts("2024-01-01 10:00:12"), 20.0)   // after trade for sym 2
  ).toDF("sym", "quote_ts", "px")

  test("latest quote at-or-before each trade; ties match; missing → null") {
    val out = AsOf.join(trades, quotes, Seq("sym"), "trade_ts", "quote_ts")
      .orderBy("sym", "trade_ts")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2),
        Option(r.get(r.fieldIndex("px"))).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      (1L, 100, Some(10.1)),   // exact-tie quote wins
      (1L, 200, Some(10.5)),   // 10:00:15 quote, not the 10:00:30 one
      (2L, 300, None),         // only quote is later
      (3L, 400, None)))        // no quotes for key
  }

  test("payload column colliding with a left column is rejected") {
    // right payload 'qty' collides with left 'qty' → would produce
    // duplicate output names; must fail fast instead
    val badQuotes = quotes.withColumnRenamed("px", "qty")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(trades, badQuotes, Seq("sym"), "trade_ts", "quote_ts")
    }
    assert(e.getMessage.contains("qty"))
  }

  test("result keeps exactly the left rows and columns plus payload") {
    val out = AsOf.join(trades, quotes, Seq("sym"), "trade_ts", "quote_ts")
    assert(out.count === trades.count)
    assert(out.columns.toSeq === Seq("sym", "trade_ts", "qty", "px"))
  }
}
