package graft.engine

import java.util.UUID

import graft.SparkSuite
import graft.tables.Tables

/** Lifecycle/state-machine + real-engine integration tests
  * (reference: tests/test_executor.py:204-245, 341-383, 411-465). */
class QueryExecutorSpec extends SparkSuite {

  private lazy val executor = new QueryExecutor(spark)

  // --- QueryResult state machine ------------------------------------------
  test("initial state is pending") {
    val r = new QueryResult("SELECT 1")
    assert(r.state == QueryState.Pending && !r.isTerminal)
  }

  test("setRunning transitions state") {
    val r = new QueryResult("SELECT 1")
    r.setRunning()
    assert(r.state == QueryState.Running && !r.isTerminal)
  }

  test("setCompleted records rows, schema, metrics") {
    val r = new QueryResult("SELECT 1")
    r.setRunning()
    val df = spark.range(1).toDF("value")
    r.setCompleted(df.collect().toVector, df.schema)
    assert(r.state == QueryState.Completed && r.isTerminal)
    assert(r.rows.length == 1 && r.schema.contains(df.schema))
    assert(r.metrics.rowsReturned == 1)
  }

  test("setFailed records error") {
    val r = new QueryResult("SELECT 1")
    r.setFailed("Something went wrong")
    assert(r.state == QueryState.Failed && r.isTerminal)
    assert(r.errorMessage.contains("Something went wrong"))
  }

  test("setCancelled is terminal") {
    val r = new QueryResult("SELECT 1")
    r.setCancelled()
    assert(r.state == QueryState.Cancelled && r.isTerminal)
  }

  // --- real execution (reference runs these against in-memory DuckDB) -----
  test("aggregation query completes with correct values") {
    // reference asserts COUNT=10 / SUM=45 over range(10)
    val r = executor.execute("SELECT count(*) AS c, sum(id) AS s FROM range(10)")
    assert(r.state == QueryState.Completed)
    val row = r.rows.head
    assert(row.getLong(0) == 10 && row.getLong(1) == 45)
  }

  test("CTE query returns expected rows") {
    val r = executor.execute(
      "WITH t AS (SELECT id, id * 2 AS dbl FROM range(5)) SELECT * FROM t")
    assert(r.rows.length == 5)
    assert(r.rows.map(_.getLong(1)).sorted == Vector(0L, 2L, 4L, 6L, 8L))
  }

  test("query over fixture tables") {
    Tables.register(spark, sf)
    val r = executor.execute("SELECT count(*) AS n FROM lineitem")
    assert(r.state == QueryState.Completed && r.rows.head.getLong(0) == 6000L)
  }

  test("invalid SQL rejected before registration") {
    intercept[InvalidSqlError](executor.execute("DROP TABLE lineitem"))
  }

  test("failed query records error state") {
    val ex = intercept[Exception](
      executor.execute("SELECT * FROM nonexistent_table_xyz"))
    assert(ex.getMessage != null)
  }

  test("metrics are tracked") {
    val r = executor.execute("SELECT * FROM range(100)")
    assert(r.metrics.rowsReturned == 100)
    assert(r.metrics.endTime.isDefined)
  }

  test("one span per execute with the reference's attributes (A19)") {
    val before = Metrics.recentSpans.size
    val r = executor.execute("SELECT * FROM range(42)")
    val spans = Metrics.recentSpans
    assert(spans.size == before + 1, "exactly one span per execution")
    val s = spans.last
    assert(s.name == "spark.query")
    assert(s.queryId == r.queryId.toString)
    assert(s.status == "completed" && s.statusCode == "OK")
    assert(s.rowsReturned.contains(42L))
    assert(s.durationSeconds.exists(_ >= 0.0))
    assert(s.timeoutSeconds == executor.validateTimeout(None))
    // failed execution → ERROR span with the failure message
    intercept[Exception](executor.execute("SELECT 1/0 AS x FROM range(1)"))
    val f = Metrics.recentSpans.last
    assert(f.status == "failed" && f.statusCode == "ERROR")
    assert(f.statusDescription.isDefined)
  }

  test("query_duration_seconds uses the OTel default bucket boundaries") {
    Metrics.recordQueryDuration(0.3, "spec_status")
    Metrics.recordQueryDuration(7.0, "spec_status")
    Metrics.recordQueryDuration(99999.0, "spec_status")
    val h = Metrics.durationHistogram("spec_status").get
    assert(h.length == Metrics.DurationBuckets.length + 1)
    assert(h(1) == 1)        // 0 < 0.3 <= 5
    assert(h(2) == 1)        // 5 < 7 <= 10
    assert(h.last == 1)      // overflow bucket
    assert(h.sum == 3)
    val (count, sum) = Metrics.durationStats("spec_status")
    assert(count == 3 && sum > 100006.0 && sum < 100007.0)
  }

  test("max_rows cap truncates driver buffering (enforced, unlike reference)") {
    val small = new QueryExecutor(spark, QueryConfig(maxRows = 50))
    val r = small.execute("SELECT * FROM range(1000)")
    assert(r.rows.length == 50 && r.truncated)
  }

  test("get_status returns tracked query; cleanup removes it") {
    val r = executor.execute("SELECT 1 AS one")
    assert(executor.getStatus(r.queryId).contains(r))
    executor.cleanup(r.queryId)
    assert(executor.getStatus(r.queryId).isEmpty)
  }

  test("positional parameters bind ? placeholders post-gate") {
    val r = executor.execute(
      "SELECT id FROM range(10) WHERE id > ? AND id < ? ORDER BY id",
      params = Seq(3, 7))
    assert(r.state == QueryState.Completed)
    assert(r.rows.map(_.getLong(0)) === Seq(4L, 5L, 6L))
    // parameter values never reach the gate: a keyword as a VALUE is fine
    val r2 = executor.execute(
      "SELECT ? AS s", params = Seq("DROP TABLE t"))
    assert(r2.rows.head.getString(0) == "DROP TABLE t")
  }

  test("cancel unknown query returns false") {
    assert(!executor.cancel(UUID.randomUUID()))
  }

  test("cancel terminal query returns false") {
    val r = executor.execute("SELECT 1 AS one")
    assert(!executor.cancel(r.queryId))
  }

  test("timeout kills a long query and records failed state") {
    val fast = new QueryExecutor(spark, QueryConfig(minTimeout = 1))
    // interruptible long query (see the cancel test below for why a pure
    // codegen loop would leave zombie tasks starving the suite): ~25 s of
    // per-row sleeps across 4 threads, killed instantly by the job-group
    // cancel's thread interrupt
    spark.udf.register("spec_sleep_udf", (x: Long) => { Thread.sleep(5); x })
    val t0 = System.nanoTime()
    intercept[QueryTimeoutError] {
      fast.execute("SELECT sum(spec_sleep_udf(id)) FROM range(20000)",
        timeout = Some(1))
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 30, s"timeout took ${elapsed}s — job group cancel not effective")
  }

  test("cancel from another thread transitions a running query to cancelled") {
    val ex2 = new QueryExecutor(spark)
    // the long query must be INTERRUPTIBLE: a pure codegen cross-join loop
    // has no interrupt checks between task boundaries, so its cancelled
    // tasks can occupy every local executor thread for minutes and starve
    // the rest of the suite (observed: a later SELECT 1 health check queued
    // behind 4 zombie tasks). A per-row sleep makes the job-group cancel's
    // thread interrupt land in Thread.sleep and kill tasks immediately —
    // and even a lost interrupt bounds the tail at ~25 s.
    spark.udf.register("spec_sleep_udf",
      (x: Long) => { Thread.sleep(5); x })
    @volatile var caught: Option[Throwable] = None
    @volatile var started: Option[java.util.UUID] = None
    val runner = new Thread(() => {
      try ex2.execute(
        "SELECT sum(spec_sleep_udf(id)) FROM range(20000)")
      catch { case t: Throwable => caught = Some(t) }
    })
    runner.start()
    // wait for the query to register
    val deadline = System.currentTimeMillis() + 30000
    while (started.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
      started = ex2.activeQueryIds.headOption
    }
    assert(started.isDefined, "query never registered")
    assert(ex2.cancel(started.get))
    // the semantic under test: cancel() transitioned the lifecycle
    assert(ex2.getStatus(started.get).exists(_.state == QueryState.Cancelled))
    // worker exit is cooperative (next task/row boundary) — under suite
    // load the codegen'd cross-join can take minutes to reach one, so the
    // caller-side observations are asserted only if the worker returned
    runner.join(60000)
    if (!runner.isAlive) {
      assert(caught.isDefined, "execute returned normally despite cancel")
      assert(caught.exists(_.isInstanceOf[QueryCancelledError]),
        s"caught=$caught")
    }
  }

  test("health check healthy on live session") {
    val h = GraftEngine.healthCheck(spark)
    assert(h("engine") == "healthy" && h("status") == "healthy")
  }
}
