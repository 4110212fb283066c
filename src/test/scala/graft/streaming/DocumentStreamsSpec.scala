package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming ingestion + incremental dedup (foreachBatch): planted
  * within-batch and cross-batch duplicates must be flagged, survivors
  * accumulate in the corpus store, decisions carry batch ids. */
class DocumentStreamsSpec extends SparkSuite {
  import spark.implicits._

  private val tA = "alpha beta gamma delta epsilon zeta"
  private val tB = "one two three four five six seven eight nine ten"
  // tB with the trailing word changed: 10 words → 8 3-shingles, the edit
  // touches only the final shingle → jaccard 7/9 ≈ 0.78 >= 0.7
  private val tBNear = "one two three four five six seven eight nine zzz"
  private val tNew = "completely different content entirely fresh words"

  test("dedupeStep: first batch all-new except within-batch duplicates") {
    val batch = Seq((1L, tA), (2L, tB), (3L, tA)).toDF("doc_id", "text")
    val (decisions, survivors) =
      DocumentStreams.dedupeStep(None, batch, "text", "doc_id", 0.7)
    val d = decisions.collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        r.getBoolean(3)))).toMap
    assert(d(1L) === ((None, None, true)))
    assert(d(2L) === ((None, None, true)))
    assert(d(3L) === ((None, Some(1L), false)))   // within-batch dup of 1
    assert(survivors.select("doc_id").as[Long].collect().sorted
      === Array(1L, 2L))
  }

  test("streaming query: cross-batch exact + fuzzy dups against the corpus") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("docstream").toString
    val input = MemoryStream[(Long, String)]
    val q = DocumentStreams.incrementalDedupQuery(
      input.toDF.toDF("doc_id", "text"), dir, "text", "doc_id", 0.7)
    try {
      input.addData((1L, tA), (2L, tB))
      q.processAllAvailable()
      // batch 2: 4 = exact copy of 1, 5 = new, 6 = near-dup of 2
      input.addData((4L, tA), (5L, tNew), (6L, tBNear))
      q.processAllAvailable()
    } finally q.stop()

    val decisions = spark.read.parquet(s"$dir/decisions")
    val d = decisions.collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        r.getBoolean(3)))).toMap
    // cross-batch exact copy: exact_dup_of = 1 (the band probe also
    // reports it fuzzily — jaccard 1 — which is correct, not asserted)
    assert(d(4L)._1 === Some(1L))
    assert(d(4L)._3 === false)
    assert(d(5L) === ((None, None, true)))
    assert(d(6L)._1 === None)                     // cross-batch fuzzy
    assert(d(6L)._2 === Some(2L))
    assert(d(6L)._3 === false)
    // corpus holds only survivors; batch ids recorded per decision
    assert(spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().sorted === Array(1L, 2L, 5L))
    assert(decisions.select("batch_id").distinct().count() === 2)
    // the stored dedup index mirrors the corpus — one artifact row per
    // accepted doc (this is what batch 2 probed: its cross-batch
    // verdicts above came from the STORED columns, the corpus text was
    // never re-read)
    val index = spark.read.parquet(s"$dir/index")
    assert(index.columns.sorted.toSeq === Seq("cid", "csh", "dig", "sig"))
    assert(index.select("cid").as[Long].collect().sorted
      === Array(1L, 2L, 5L))
  }

  test("migration guard: corpus store without an index store fails the " +
      "batch instead of silently resetting dedup") {
    val dir = Files.createTempDirectory("docstream-migrate").toString
    Seq((1L, tA)).toDF("doc_id", "text")
      .write.parquet(s"$dir/corpus") // pre-index-store layout
    val batch = Seq((2L, tA)).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      DocumentStreams.processBatch(spark, batch, 0L, dir,
        "text", "doc_id", 0.7)
    }
    assert(e.getMessage.contains("backfill"), e.getMessage)
    // nothing was appended — the duplicate was not re-admitted
    assert(spark.read.parquet(s"$dir/corpus").count() === 1L)
  }
}
