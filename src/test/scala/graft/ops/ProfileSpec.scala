package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions.{col, lit}

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile: exact per-column counts, nulls, ranges on a known fixture") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "aa"), (2L, null), (3L, "bb"), (null, "aa"), (5L, "ccc"))
      .toDF("id", "s")
    val out = Profile.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5), r.getLong(6)))).toMap
    //                     rows nulls distinct min  max   sum_len
    assert(out("id") === ((5L, 1L, 4L, "1", "5", 4L)))
    assert(out("s") === ((5L, 1L, 3L, "aa", "ccc", 9L)))
  }

  test("profileBy: per-group metrics; NULL group forms its own row") {
    val df = Seq[(String, java.lang.Long)](
      ("en", 1L), ("en", 3L), ("de", 2L), (null, 7L), ("de", null))
      .toDF("lang", "v")
    val out = Profile.profileBy(df, "lang", Seq("v"))
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5),
          r.getString(6)))).toMap
    //                          rows nulls distinct min  max
    assert(out(Some("en")) === ((2L, 0L, 2L, "1", "3")))
    assert(out(Some("de")) === ((2L, 1L, 1L, "2", "2")))
    assert(out(None) === ((1L, 0L, 1L, "7", "7")))
    intercept[IllegalArgumentException](
      Profile.profileBy(df, "nope", Seq("v")))
  }

  test("profile: typed min/max (bigint 499 > 99), unknown column rejected") {
    val df = (1L to 499L).toDF("n")
    val row = Profile.profile(df, Seq("n")).collect().head
    assert(row.getString(4) === "1" && row.getString(5) === "499")
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("nope"))
    }
  }

  test("profile: duplicate column requests collapse; approximate mode close") {
    val df = (1L to 1000L).toDF("n")
    val out = Profile.profile(df, Seq("n", "n", "n"))
    assert(out.count() === 1)
    val approx = Profile.profile(df, Seq("n"), approximate = true)
      .collect().head.getLong(3)
    // HLL++ default rsd is 5%; allow a wide safety band
    assert(approx > 800L && approx < 1200L, s"approx distinct $approx")
    // approximate mode must not plan the per-value Expand rewrite
    val q = Profile.profile(df, Seq("n"), approximate = true)
    q.collect()
    assert(!q.queryExecution.executedPlan.toString.contains("Expand"),
      q.queryExecution.executedPlan.toString)
  }

  test("profile: single aggregation pass — no join, one scan") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val q = Profile.profile(df, Seq("id", "s"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // multi-count-distinct plans via Expand over the one input scan
    assert(plan.contains("Expand"), plan)
  }

  test("classBalance: exact ppm shares and Gini, NULL label kept") {
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), None)
      .map(Tuple1(_)).toDF("label")
    // N=5: shares 600000/200000/200000; gini = (25-(9+1+1))*1e6 DIV 25
    val out = Profile.classBalance(df, "label")
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(Some("a")) === ((3L, 600000L, 560000L)))
    assert(out(Some("b")) === ((1L, 200000L, 560000L)))
    assert(out(None) === ((1L, 200000L, 560000L)))
  }

  test("indexAudit: coverage/orphan set arithmetic, duplicate index rows " +
      "count once, empty corpus reads fully fresh") {
    val corpus = Seq(1L, 2L, 3L).toDF("doc_id")
    // 4 appears twice (a postings-style index holds many rows per doc —
    // the audit distincts), 2 and 3 covered, 1 unindexed, 4 orphaned
    val index = Seq(2L, 3L, 4L, 4L).toDF("cid")
    val r = Profile.indexAudit(corpus, "doc_id", index, "cid").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ===
      ((3L, 3L, 2L, 1L, 1L, 666666L)))
    val empty = Profile.indexAudit(
      corpus.filter(org.apache.spark.sql.functions.col("doc_id") > 99),
      "doc_id", index, "cid").collect()(0)
    assert((empty.getLong(0), empty.getLong(4), empty.getLong(5)) ===
      ((0L, 3L, 1000000L)))
    // non-integral ids would cast to null and report a fresh index as
    // fully stale — rejected up front (the rankTopK contract)
    intercept[IllegalArgumentException] {
      Profile.indexAudit(Seq("a", "b").toDF("doc_id"), "doc_id",
        index, "cid")
    }
    intercept[IllegalArgumentException] {
      Profile.indexAudit(corpus, "doc_id",
        Seq("x").toDF("cid"), "cid")
    }
  }

  test("releaseAudit: one tagged indexAudit row per family, each " +
      "against its OWN corpus, family-ordered; duplicate names rejected") {
    val dc = Seq(1L, 2L, 3L).toDF("doc_id")
    val vc = Seq(10L, 11L).toDF("vec_id")
    val stale = Seq(2L, 3L, 4L).toDF("cid")       // 1 unindexed, 4 orphaned
    val fresh = Seq(10L, 11L).toDF("id")          // exactly the vec corpus
    val rows = Profile.releaseAudit(Seq(
        ("zz_dedup", dc, "doc_id", stale, "cid"),
        ("aa_ivf", vc, "vec_id", fresh, "id"))).collect()
    assert(rows.length === 2)
    // ordered by family name, not input order
    assert(rows(0).getString(0) === "aa_ivf")
    assert(rows(1).getString(0) === "zz_dedup")
    assert((rows(0).getLong(1), rows(0).getLong(4), rows(0).getLong(5),
      rows(0).getLong(6)) === ((2L, 0L, 0L, 1000000L)))
    assert((rows(1).getLong(1), rows(1).getLong(4), rows(1).getLong(5),
      rows(1).getLong(6)) === ((3L, 1L, 1L, 666666L)))
    intercept[IllegalArgumentException] {
      Profile.releaseAudit(Seq(
        ("same", dc, "doc_id", stale, "cid"),
        ("same", vc, "vec_id", fresh, "id")))
    }
    intercept[IllegalArgumentException] {
      Profile.releaseAudit(Seq.empty)
    }
  }

  test("releaseAudit per-family freshness semantics (the x13 ten-row " +
      "form): batch-ledger coverage for synopsis/model stores, row " +
      "reconciliation for the layout — pinned against deliberately-" +
      "staled stores") {
    // corpus = 8 ingestion batches (0..7); each family's audited id is
    // the ledger dimension its rows actually carry
    val corpusBatches = spark.range(480)
      .select((col("id") / 60).cast("long").as("batch"))
    // KMV covers batches 0..6 (one batch of append lag)
    val kmv = spark.range(7).select(col("id").cast("int").as("shard"),
      lit(1L).as("h"))
    // histogram covers all 8 (the fresh row)
    val hist = spark.range(8).select(col("id").cast("int").as("shard"),
      lit(0).as("bin"), lit(1L).as("n"))
    // model ledger covers labeled batches 0..5 (two batches unlabeled)
    val ledger = spark.range(6).select(col("id").as("batch_id"),
      lit(1L).as("dp"), lit(1L).as("dn"))
    // layout: rows ARE the store — audit reconciles row ids (50
    // missing, 100 orphaned by deletes)
    val evCorpus = spark.range(800).select(col("id").as("event_id"))
    val layout = spark.range(50, 900).select(col("id").as("event_id"))
    val rows = Profile.releaseAudit(Seq(
        ("kmv", corpusBatches, "batch", kmv, "shard"),
        ("hist", corpusBatches, "batch", hist, "shard"),
        ("model", corpusBatches, "batch", ledger, "batch_id"),
        ("layout", evCorpus, "event_id", layout, "event_id")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows("kmv") === ((1L, 0L, 875000L)))
    assert(rows("hist") === ((0L, 0L, 1000000L)))
    assert(rows("model") === ((2L, 0L, 750000L)))
    assert(rows("layout") === ((50L, 100L, 937500L)))
  }

  test("indexRepair: orphans dropped, unindexed backfilled via the " +
      "family builder — repaired ≡ rebuild, after-audit reads fresh") {
    import org.apache.spark.sql.functions.{col, lit}
    // corpus ids 0..9; the stale index was built from a drifted cut
    // 3..12 → 0..2 unindexed (append lag), 10..12 orphaned (delete lag)
    val all = (0L to 12L).map(i => (i, s"doc number $i with words " +
      s"alpha beta gamma delta ${('a' + (i % 5)).toChar}")).toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") < 10)
    val stale = Dedup.incrementalIndex(
        all.filter(col("doc_id") >= 3), "text", "doc_id")
      .withColumn("batch_id", lit(7L))
    val repaired = Profile.indexRepair(corpus, "doc_id", stale, "cid",
      unindexed => Dedup.incrementalIndex(unindexed, "text", "doc_id"))
    // per-document index facts + a deterministic builder ⇒ the repaired
    // rows equal a from-scratch rebuild over the corpus, exactly
    val rebuild = Dedup.incrementalIndex(corpus, "text", "doc_id")
    assert(repaired.drop("batch_id").exceptAll(rebuild).count() === 0L)
    assert(rebuild.exceptAll(repaired.drop("batch_id")).count() === 0L)
    // the streaming stores' batch_id survives on kept rows and reads
    // null on backfill rows (the pre-stamping convention)
    assert(repaired.filter(col("cid") >= 3 && col("batch_id").isNull)
      .count() === 0L)
    assert(repaired.filter(col("cid") < 3 && col("batch_id").isNotNull)
      .count() === 0L)
    // the audit loop closes: repair(audit-failing state) → audit-clean
    val before = Profile.indexAudit(corpus, "doc_id", stale, "cid")
      .collect()(0)
    assert((before.getLong(3), before.getLong(4)) === ((3L, 3L)))
    val after = Profile.indexAudit(corpus, "doc_id", repaired, "cid")
      .collect()(0)
    assert((after.getLong(2), after.getLong(3), after.getLong(4),
      after.getLong(5)) === ((10L, 0L, 0L, 1000000L)))
    // integral-id contract shared with the audit
    intercept[IllegalArgumentException] {
      Profile.indexRepair(Seq("a").toDF("doc_id"), "doc_id",
        stale, "cid", identity)
    }
  }
}
