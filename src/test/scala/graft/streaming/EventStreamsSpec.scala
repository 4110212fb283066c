package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.tables.Tables

/** Structured Streaming extension operators (SURVEY §7.5): windowed aggs
  * with watermark, session windows, and mapGroupsWithState — checked for
  * batch/stream equivalence over the events fixture. */
class EventStreamsSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedTypeCounts on batch input matches a hand aggregation") {
    val events = Tables(spark, sf, "events")
    val got = EventStreams.windowedTypeCounts(events, "1 hour", "10 minutes")
    val manual = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.agg(sum("n")).collect.head.getLong(0) === events.count)
    assert(got.count === manual.count)
  }

  test("stream and batch produce identical windowed aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val streamedDf = input.toDF.toDF("ts", "event_type", "value")

    val rows = Seq(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 00:15:00"), "click", 2.0),
      (ts("2024-01-01 00:45:00"), "view", 3.0),
      (ts("2024-01-01 01:05:00"), "click", 4.0),
      (ts("2024-01-01 03:00:00"), "view", 5.0)) // advances watermark past h0-h1

    input.addData(rows: _*)
    val result = EventStreams.runOnce(spark,
      EventStreams.windowedTypeCounts(streamedDf, "1 hour", "10 minutes"),
      "win_counts", OutputMode.Append)

    val batchDf = rows.toDF("ts", "event_type", "value")
    val expected = EventStreams
      .windowedTypeCounts(batchDf, "1 hour", "10 minutes")
      .collect.map(_.toSeq).toSet
    // append-mode emits only watermark-closed windows → subset equality on
    // the closed ones (h0 windows closed; the 03:00 window is still open)
    val got = result.collect.map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got.subsetOf(expected))
    assert(got.exists(r => r(2) == "click" && r(3) == 2L)) // h0: two clicks
  }

  test("intervalJoin: stream-stream with watermarks matches the batch form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val rIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val cols = Seq("event_id", "ts", "user_id", "value")
    val lDf = lIn.toDF.toDF(cols: _*)
    val rDf = rIn.toDF.toDF(cols: _*)

    val purchases = Seq(
      (1L, ts("2024-01-01 01:00:00"), 7L, 10.0),
      (2L, ts("2024-01-01 02:00:00"), 7L, 20.0),
      (3L, ts("2024-01-01 02:00:00"), 8L, 30.0))
    val clicks = Seq(
      (101L, ts("2024-01-01 00:10:00"), 7L, 1.0),  // outside 1h of p1? no: 50min before -> in
      (102L, ts("2024-01-01 00:59:00"), 7L, 2.0),  // in p1's window only
      (103L, ts("2024-01-01 01:30:00"), 7L, 3.0),  // in p2's window only
      (104L, ts("2024-01-01 01:45:00"), 9L, 4.0),  // wrong user
      // late sentinel advances both watermarks far past all joins
      (105L, ts("2024-01-01 06:00:00"), 7L, 5.0))
    val purchaseSentinel = Seq((99L, ts("2024-01-01 06:00:00"), 9L, 0.0))

    lIn.addData(purchases: _*); lIn.addData(purchaseSentinel: _*)
    rIn.addData(clicks: _*)
    val streamed = EventStreams.runOnce(spark,
      EventStreams.intervalJoin(lDf, rDf, "1 hour", "10 minutes"),
      "ij_sink", OutputMode.Append)
    val got = streamed.select("event_id", "n_matches", "max_value")
      .as[(Long, Long, Double)].collect().toSet

    val batch = EventStreams.intervalJoin(
        purchases.toDF(cols: _*), clicks.toDF(cols: _*), "1 hour")
      .select("event_id", "n_matches", "max_value")
      .as[(Long, Long, Double)].collect().toSet
    // batch: p1 matches c101+c102, p2 matches c103 (c102 is 61min before
    // p2 — outside), p3 has no same-user clicks → inner-join drops it
    assert(batch === Set((1L, 2L, 2.0), (2L, 1L, 3.0)))
    // stream emits the watermark-closed subset of the batch answer and
    // nothing else; the sentinel rows push every real window closed
    assert(got.subsetOf(batch))
    assert(got.nonEmpty)
  }

  test("intervalJoinOuter: unmatched purchases survive with zero matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cols = Seq("event_id", "ts", "user_id", "value")
    val purchases = Seq(
      (1L, ts("2024-01-01 01:00:00"), 7L, 10.0),
      (3L, ts("2024-01-01 02:00:00"), 8L, 30.0))   // no user-8 clicks
    val clicks = Seq(
      (102L, ts("2024-01-01 00:59:00"), 7L, 2.0))
    // batch gate: outer keeps p3 at n=0/NULL where inner drops it
    val batch = EventStreams.intervalJoinOuter(
        purchases.toDF(cols: _*), clicks.toDF(cols: _*), "1 hour")
      .select("event_id", "n_matches", "max_value")
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(batch === Set((1L, 1L, Some(2.0)), (3L, 0L, None)))

    // streaming: watermarks + time bound accepted by the planner; the
    // sentinel advances the watermark so the negative can be emitted
    val lIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val rIn = MemoryStream[(Long, Timestamp, Long, Double)]
    lIn.addData(purchases: _*)
    lIn.addData(Seq((99L, ts("2024-01-01 06:00:00"), 9L, 0.0)): _*)
    rIn.addData(clicks: _*)
    rIn.addData(Seq((105L, ts("2024-01-01 06:00:00"), 7L, 5.0)): _*)
    val streamed = EventStreams.runOnce(spark,
      EventStreams.intervalJoinOuter(lIn.toDF.toDF(cols: _*),
        rIn.toDF.toDF(cols: _*), "1 hour", "10 minutes"),
      "ijo_sink", OutputMode.Append)
    val got = streamed.select("event_id", "n_matches", "max_value")
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(got.subsetOf(batch ++ Set((99L, 0L, None))))
  }

  test("enrich: stream-static left join matches batch; misses -> NULLs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("ck", "name")
    val input = MemoryStream[(Long, Long, Double)]
    val streamedDf = input.toDF.toDF("event_id", "user_id", "value")
    // user 9 has no dimension row — must pass through with NULL name
    val rows = Seq((100L, 1L, 1.0), (101L, 2L, 2.0), (102L, 9L, 3.0))
    input.addData(rows: _*)
    val result = EventStreams.runOnce(spark,
      EventStreams.enrich(streamedDf, dim, "user_id", "ck")
        .select(col("event_id"), col("name")),
      "enriched", OutputMode.Append)
    val got = result.collect().map(r => r.getLong(0) ->
      Option(r.getString(1))).toMap
    val batch = EventStreams.enrich(
        rows.toDF("event_id", "user_id", "value"), dim, "user_id", "ck")
      .select(col("event_id"), col("name"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === batch)
    assert(got === Map(100L -> Some("alice"), 101L -> Some("bob"),
      102L -> None))
  }

  test("userSessions folds events within the gap into one session") {
    import spark.implicits._
    val batch = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:10:00"), 1L, 2.0),  // same session (gap 30m)
      (ts("2024-01-01 12:00:00"), 1L, 4.0),  // new session
      (ts("2024-01-01 10:05:00"), 2L, 8.0)
    ).toDF("ts", "user_id", "value")
    val sessions = EventStreams.userSessions(batch, "30 minutes", "10 minutes")
      .orderBy("user_id", "session_start").collect
    assert(sessions.length === 3)
    val first = sessions.head
    assert(first.getAs[Long]("user_id") === 1L)
    assert(first.getAs[Long]("n_events") === 2L)
    assert(first.getAs[Double]("session_value") === 3.0)
  }

  test("userRunningTotals accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.userRunningTotals(input.toDS)
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update).start()

    input.addData(
      EventStreams.Event(1, ts("2024-01-01 00:00:00"), 7L, "click", 10.0),
      EventStreams.Event(2, ts("2024-01-01 00:01:00"), 7L, "view", 5.0))
    q.processAllAvailable()
    input.addData(
      EventStreams.Event(3, ts("2024-01-01 00:02:00"), 7L, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val snaps = spark.table("running")
      .filter(col("user_id") === 7L)
      .orderBy(col("n_events")).collect
    assert(snaps.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 3L))
    assert(snaps.last.getAs[Double]("total_value") === 16.0)
  }

  test("userTypeBreakdown emits per-(user,type) rows, state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.userTypeBreakdown(input.toDS)
      .writeStream.format("memory").queryName("breakdown")
      .outputMode(OutputMode.Append).start()

    input.addData(
      EventStreams.Event(1, ts("2024-01-01 00:00:00"), 7L, "click", 10.0),
      EventStreams.Event(2, ts("2024-01-01 00:01:00"), 7L, "view", 5.0))
    q.processAllAvailable()
    input.addData(
      EventStreams.Event(3, ts("2024-01-01 00:02:00"), 7L, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    // second batch re-emits the updated click row from carried state
    // (n=2, total 11) alongside the untouched view row
    val rows = spark.table("breakdown")
      .filter(col("user_id") === 7L && col("event_type") === "click")
      .orderBy(col("n")).collect
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(1L, 2L))
    assert(rows.last.getAs[Double]("total_value") === 11.0)
  }

  test("file-source stream over the events fixture reaches batch totals") {
    // the file source needs a directory; stage the fixture file into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStreams.readEventStream(spark, dir.toString)
    val result = EventStreams.runOnce(spark,
      EventStreams.windowedTypeCounts(streamed, "1 hour", "0 seconds"),
      "fixture_win", OutputMode.Append)
    val batchTotal = Tables(spark, sf, "events").count
    // append mode withholds the last open window; totals must be close to
    // and bounded by the batch count
    val streamTotal = result.agg(sum("n")).collect.head.getLong(0)
    assert(streamTotal > 0 && streamTotal <= batchTotal)
  }

  test("dedupEvents drops duplicate event_ids in stream and batch modes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val streamedDf = input.toDF.toDF("event_id", "ts", "value")
    val q = EventStreams.dedupEvents(streamedDf, "10 minutes")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:01"), 1.0),   // dup within batch
      (2L, ts("2024-01-01 00:00:02"), 2.0))
    q.processAllAvailable()
    input.addData((2L, ts("2024-01-01 00:01:00"), 2.0)) // dup across batches
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_sink").select("event_id")
      .collect.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))

    // batch mode: same call site, plain dropDuplicates
    val batch = Seq((1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:01"), 1.0)).toDF("event_id", "ts", "value")
    assert(EventStreams.dedupEvents(batch).count === 1)
  }

  test("slidingTypeCounts: each event lands in windowLength/slide windows") {
    import spark.implicits._
    val df = Seq((ts("2024-01-01 01:07:00"), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val out = EventStreams.slidingTypeCounts(df, "1 hour", "15 minutes")
      .collect().map(r => r.getTimestamp(0).toString).sorted
    // 4 overlapping windows cover 01:07: starts 00:15..01:00
    assert(out === Array("2024-01-01 00:15:00.0", "2024-01-01 00:30:00.0",
      "2024-01-01 00:45:00.0", "2024-01-01 01:00:00.0"))
  }

  test("streaming layout maintenance: batches append into the release " +
      "layout through the STORED bounds, probes stay fresh, replay " +
      "appends nothing, a missing layout fails loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("evstream-layout").toString + "/layout"
    def facts(ids: Seq[Long]) = ids
      .map(i => (i, i % 11, s"t${i % 3}"))
      .toDF("event_id", "user_id", "event_type")
    // release provisioning: the seed's envelope covers the expected
    // key domain (event ids to 999, users to 10)
    val seed = facts(Seq(0L, 999L) ++ (1L to 40L))
    graft.ops.Layout.zorderWrite(seed, "user_id", "event_id", dir,
      bits = 4, nBuckets = 16)
    // a missing layout fails loudly (no silent first-batch bounds)
    val e = intercept[IllegalArgumentException](
      EventStreams.layoutBatch(spark, facts(Seq(1L)), 0L,
        dir + "-nowhere", "user_id", "event_id"))
    assert(e.getMessage.contains("zorderWrite first"), e.getMessage)
    // two micro-batches, delivered through the real streaming path
    val input = MemoryStream[(Long, Long, String)]
    val q = EventStreams.layoutMaintenanceQuery(
      input.toDF().toDF("event_id", "user_id", "event_type"),
      dir, "user_id", "event_id")
    input.addData((100L, 1L, "a"), (200L, 2L, "b"))
    q.processAllAvailable()
    input.addData((300L, 3L, "c"))
    q.processAllAvailable()
    q.stop()
    // the checkpoint lives OUTSIDE the layout dir (sibling path):
    // zorderWiden swaps and deletes the whole dir — a checkpoint
    // inside it would die with the swap and the resumed query would
    // restart batch ids at 0, colliding with the store's markers
    assert(new java.io.File(dir + ".__checkpoint").exists(),
      "checkpoint must live at the sibling path")
    assert(!new java.io.File(s"$dir/_checkpoint").exists(),
      "checkpoint must not live inside the layout dir")
    // the probe answers through the maintained store: seed + batches
    val got = graft.ops.Layout.boxProbe(spark, dir, "user_id",
        "event_id", 0L, 10L, 50L, 500L)
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(got === Seq(100L, 200L, 300L))
    // replay idempotence: re-running a committed batch appends nothing
    val before = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/data").count()
    EventStreams.layoutBatch(spark,
      facts(Seq(300L)).select(col("event_id"), col("user_id"),
        col("event_type")), 1L, dir, "user_id", "event_id")
    assert(spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/data").count() === before)
    // empty micro-batches are a clean no-op, not an append failure
    EventStreams.layoutBatch(spark, facts(Nil), 7L, dir,
      "user_id", "event_id")
    assert(spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/data").count() === before)
    // an out-of-envelope batch fails ITS batch loudly (widen + resume)
    val e2 = intercept[IllegalArgumentException](
      EventStreams.layoutBatch(spark, facts(Seq(5000L)), 8L, dir,
        "user_id", "event_id"))
    assert(e2.getMessage.contains("envelope"), e2.getMessage)
  }

  test("widen-then-resume: the zorderWiden remedy preserves the " +
      "store's batch markers (store passed as widen corpus), so a " +
      "resumed maintenance stream neither double-appends a committed " +
      "batch nor silently skips a fresh one") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("evstream-widen").toString + "/layout"
    def facts(rows: (Long, Long)*) = rows
      .map { case (id, u) => (id, u, "t") }
      .toDF("event_id", "user_id", "event_type")
    graft.ops.Layout.zorderWrite(facts((0L, 0L), (999L, 10L)),
      "user_id", "event_id", dir, bits = 4, nBuckets = 16)
    EventStreams.layoutBatch(spark, facts((100L, 1L)), 0L, dir,
      "user_id", "event_id")
    EventStreams.layoutBatch(spark, facts((200L, 2L)), 1L, dir,
      "user_id", "event_id")
    // batch 2 lands outside the envelope -> fails loudly; the remedy
    // the error names: zorderWidenStore, which reads the store itself
    // WITH mergeSchema (a caller-side plain read can sample a release
    // footer, silently drop batch_id, and double-append on resume)
    val e = intercept[IllegalArgumentException](
      EventStreams.layoutBatch(spark, facts((5000L, 3L)), 2L, dir,
        "user_id", "event_id"))
    assert(e.getMessage.contains("zorderWidenStore"), e.getMessage)
    graft.ops.Layout.zorderWidenStore(spark, dir,
      "user_id", "event_id", (0L, 10L, 0L, 9999L))
    // resume: the failed batch replays under its id and now lands
    EventStreams.layoutBatch(spark, facts((5000L, 3L)), 2L, dir,
      "user_id", "event_id")
    // a replay of an ALREADY-COMMITTED batch appends nothing (the
    // markers survived the widen - this is the silent-data-loss /
    // double-append axis the sibling checkpoint + store-corpus
    // convention exists for)
    val n = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/data").count()
    EventStreams.layoutBatch(spark, facts((200L, 2L)), 1L, dir,
      "user_id", "event_id")
    assert(spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/data").count() === n)
    // and the maintained store serves every batch exactly once
    val got = graft.ops.Layout.boxProbe(spark, dir, "user_id",
        "event_id", 0L, 10L, 50L, 9000L)
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(got === Seq(100L, 200L, 999L, 5000L))
  }

  test("legacy in-dir checkpoint: resuming through the relocated " +
      "sibling path fails loudly with the one-rename remedy instead " +
      "of silently restarting batch ids at 0") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("evstream-legacy").toString + "/layout"
    graft.ops.Layout.zorderWrite(
      Seq((0L, 0L, "t"), (999L, 10L, "t"))
        .toDF("event_id", "user_id", "event_type"),
      "user_id", "event_id", dir, bits = 4, nBuckets = 16)
    // simulate the pre-relocation deployment: a checkpoint INSIDE dir
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/_checkpoint"))
    val input = MemoryStream[(Long, Long, String)]
    val e = intercept[IllegalStateException](
      EventStreams.layoutMaintenanceQuery(
        input.toDF().toDF("event_id", "user_id", "event_type"),
        dir, "user_id", "event_id"))
    assert(e.getMessage.contains("_checkpoint") &&
      e.getMessage.contains(".__checkpoint"), e.getMessage)
    // BOTH existing is always anomalous (the remedy is a MOVE) — it
    // means a resume already ran ungated and batches may already have
    // been dropped; also loud, with the reconcile recipe
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir + ".__checkpoint"))
    val e2 = intercept[IllegalStateException](
      EventStreams.layoutMaintenanceQuery(
        input.toDF().toDF("event_id", "user_id", "event_type"),
        dir, "user_id", "event_id"))
    assert(e2.getMessage.contains("BOTH"), e2.getMessage)
    // a user batch_id column on the streamed facts would be silently
    // overwritten by the stamp — rejected loudly instead
    val e3 = intercept[IllegalArgumentException](
      EventStreams.layoutBatch(spark,
        Seq((1L, 1L, 5L)).toDF("event_id", "user_id", "batch_id"),
        9L, dir, "user_id", "event_id"))
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
  }
}
