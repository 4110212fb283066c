package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Multimodal

class MediaStreamsSpec extends SparkSuite {
  import spark.implicits._

  private def media(rows: (Long, String)*) =
    Multimodal.mediaFromDocuments(rows.toDF("doc_id", "text"))

  // format = id % 4, so cross-item dups need ids congruent mod 4
  private val tA = "aaaa bbbb cccc dddd"
  private val tB = "totally different content zzz"
  private val tC = "yet another third corpus text !!"

  test("media ingestion: within-batch and stored-index near-dup gates, " +
      "append == rebuild under the released geometry, replay appends " +
      "nothing, a missing meta release fails loudly") {
    val dir = Files.createTempDirectory("mediastream").toString
    // missing release fails loudly BEFORE any state is created
    val e = intercept[IllegalStateException](
      MediaStreams.processBatch(spark, media((1L, tA)), 0L,
        dir + "-nowhere"))
    assert(e.getMessage.contains("mediaSignatureIndex"), e.getMessage)
    // release: geometry + signatures of the initial corpus (ids 1, 2)
    val release = media((1L, tA), (2L, tB))
    val (sigs, meta) = Multimodal.mediaSignatureIndex(spark, release)
    sigs.write.mode("overwrite").partitionBy("sb").parquet(s"$dir/sigs")
    meta.coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // batch 0: 101 dups released 1 (same text, same format: 101%4 ==
    // 1%4); 102/106 are within-batch dups of each other; 103 is new
    val b0 = media((101L, tA), (102L, tC), (106L, tC), (103L, tB))
    MediaStreams.processBatch(spark, b0, 0L, dir)
    val dec = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/decisions")
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[java.lang.Long]("index_dup_of")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("batch_dup_of")).map(_.toLong),
          r.getAs[Boolean]("is_new")))).toMap
    assert(dec(101L) === ((Some(1L), None, false)))
    assert(dec(102L) === ((None, None, true)))
    assert(dec(106L) === ((None, Some(102L), false)))
    // 103 is format-blocked from 2 ONLY if formats differ (103%4=3,
    // 2%4=2) — same text as a released item in ANOTHER format is new
    assert(dec(103L) === ((None, None, true)))
    // survivors' signatures appended; the accumulated store row-set-
    // equals a from-scratch derivation under the SAME released meta
    val stored = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/sigs").drop("batch_id")
      .withColumn("sb", col("sb").cast("int"))
    val rebuilt = Multimodal.mediaSignatureRows(meta,
      media((1L, tA), (2L, tB), (102L, tC), (103L, tB)))
    assert(stored.except(rebuilt).isEmpty && rebuilt.except(stored).isEmpty)
    // replay idempotence: the same batch id appends nothing anywhere
    val (nS, nD) = (spark.read.parquet(s"$dir/sigs").count(),
      spark.read.parquet(s"$dir/decisions").count())
    MediaStreams.processBatch(spark, b0, 0L, dir)
    assert(spark.read.parquet(s"$dir/sigs").count() === nS)
    assert(spark.read.parquet(s"$dir/decisions").count() === nD)
    // batch 1: a dup of a batch-0 SURVIVOR (106%4 == 102%4 == 2) proves
    // the cross-batch gate reads the maintained store, not the release
    MediaStreams.processBatch(spark, media((110L, tC)), 1L, dir)
    val d110 = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/decisions")
      .filter(col("id") === 110L).collect()(0)
    assert(d110.getAs[java.lang.Long]("index_dup_of") === 102L)
    // an all-duplicates batch appends no signature files
    val before = spark.read.parquet(s"$dir/sigs").count()
    MediaStreams.processBatch(spark, media((114L, tC)), 2L, dir)
    assert(spark.read.parquet(s"$dir/sigs").count() === before)
    // compaction preserves the sb layout and moves no verdict
    val report = MediaStreams.compactState(spark, dir)
    assert(report.contains("sigs") && report.contains("decisions"))
    assert(new java.io.File(s"$dir/sigs").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("sb=")))
    MediaStreams.processBatch(spark, media((118L, tC)), 3L, dir)
    val d118 = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/decisions")
      .filter(col("id") === 118L).collect()(0)
    assert(d118.getAs[java.lang.Long]("index_dup_of") === 102L)
  }

  test("media ingestion through the real streaming path: file-source " +
      "micro-batches maintain the store incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("mediastream-q").toString
    val release = media((1L, tA))
    val (sigs, meta) = Multimodal.mediaSignatureIndex(spark, release)
    sigs.write.mode("overwrite").partitionBy("sb").parquet(s"$dir/sigs")
    meta.coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = Multimodal.mediaFromDocuments(
      input.toDF().toDF("doc_id", "text"))
    val q = MediaStreams.incrementalMediaQuery(stream, dir)
    input.addData((105L, tA)) // dup of released 1 (105%4 == 1)
    q.processAllAvailable()
    input.addData((202L, tC)) // new
    q.processAllAvailable()
    q.stop()
    val dec = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/decisions")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Boolean]("is_new")).toMap
    assert(dec === Map(105L -> false, 202L -> true))
    // the maintained store serves the family's dedup read end to end
    val corpus = media((1L, tA), (202L, tC))
    val got = Multimodal.mediaNearDupIndexed(
      spark.read.option("mergeSchema", "true").parquet(s"$dir/sigs")
        .drop("batch_id"),
      spark.read.parquet(s"$dir/meta"), corpus)
    val want = Multimodal.mediaNearDup(spark, corpus)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }
}
