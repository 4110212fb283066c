package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tables.Tables

class MultimodalSpec extends SparkSuite {

  private def media = Multimodal.mediaFromDocuments(
    Tables(spark, sf, "documents").limit(50))

  test("media table has the declared binary+metadata schema") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height", "n_bytes"))
  }

  test("feature extraction: one fixed-width vector per input, batched per partition") {
    val out = Multimodal.extractFeatures(spark, media.repartition(4))
    val rows = out.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val f = r.getSeq[Float](3)
      assert(f.length == 16)
      // histogram is normalized: sums to ~1 for non-empty payloads
      assert(math.abs(f.sum - 1.0f) < 1e-3)
    }
  }

  test("fakeDecode is deterministic and length-invariant") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.fakeDecode(b).toSeq == Multimodal.fakeDecode(b.clone()).toSeq)
    assert(Multimodal.fakeDecode(Array.emptyByteArray).forall(_ == 0f))
  }

  test("mediaNearDup: same-format identical content flagged; formats block") {
    import spark.implicits._
    // ids 1, 5, 9 share a format (id % 4 == 1); id 2 does not
    val docs = Seq(
      (1L, "aaaa bbbb cccc"), (5L, "aaaa bbbb cccc"), // identical content
      (2L, "aaaa bbbb cccc"),                         // other format
      (9L, "zzzz !!!! ####")                          // dissimilar content
    ).toDF("doc_id", "text")
    val out = Multimodal.mediaNearDup(spark,
        Multimodal.mediaFromDocuments(docs), thresholdPpm = 999990)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) === ((1L, false)))
    assert(out(5L) === ((1L, true)))   // identical histogram, same format
    assert(out(2L) === ((2L, false)))  // format-blocked despite identity
    assert(out(9L) === ((9L, false)))  // cosine far below threshold
    intercept[IllegalArgumentException](Multimodal.mediaNearDup(spark,
      Multimodal.mediaFromDocuments(docs), thresholdPpm = 1000001))
  }

  test("mediaNearDup: empty payloads pair with each other, never content") {
    import spark.implicits._
    // ids 13, 17, 21 share a format (id % 4 == 1); 13 and 17 are empty
    val docs = Seq((13L, ""), (17L, ""), (21L, "real content here"))
      .toDF("doc_id", "text")
    val out = Multimodal.mediaNearDup(spark,
        Multimodal.mediaFromDocuments(docs), thresholdPpm = 999990)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(13L) === ((13L, false)))
    assert(out(17L) === ((13L, true)))  // empty ~ empty
    // without the both-norms guard, 0 >= 0 would link 13 to 21 too
    assert(out(21L) === ((21L, false)))
  }

  test("frame sampling respects stride and cap") {
    val out = Multimodal.sampleFrames(spark, media, stride = 64, maxFrames = 8)
    val byDoc = out.groupBy("id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    byDoc.values.foreach { case (n, mx) =>
      assert(n <= 8 && mx == n - 1)
    }
    // doc lengths 44..577 chars → at least 1 frame each
    assert(byDoc.size == 50)
  }

  test("resize: bounded payload, rewritten meta, schema-stable for chaining") {
    val m = media
    val resized = Multimodal.resize(spark, m, targetBytes = 128)
    assert(resized.schema === Multimodal.mediaSchema)
    val rows = resized.collect()
    assert(rows.forall { r =>
      val p = r.getAs[Array[Byte]](1)
      p == null || p.length <= 128
    })
    assert(rows.forall(_.getStruct(2).getInt(1) == 64)) // target width
    // chains: resize output feeds extractFeatures unchanged
    val feats = Multimodal.extractFeatures(spark, resized)
    assert(feats.count === m.count)
  }

  test("mediaNearDupScaled matches the brute-force tier on the fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa bbbb cccc"), (5L, "aaaa bbbb cccc"),  // same-format dups
      (2L, "aaaa bbbb cccc"),                          // other format
      (9L, "zzzz !!!! ####"),                          // dissimilar
      (13L, ""), (17L, "")                             // empty pair
    ).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getBoolean(2))).toSet
    assert(collect(Multimodal.mediaNearDupScaled(spark, media)) ===
      collect(Multimodal.mediaNearDup(spark, media)))
  }

  test("grid tier: pair set identical to brute force on the fixture corpus") {
    // 50 real documents — near-collinear English byte histograms, the
    // regime where the round-6 scale probe caught the LSH/brute pair of
    // tiers going quadratic. The grid tier must reproduce the brute
    // tier's verified pair set EXACTLY (recall-1 blocking + the shared
    // ppmExact gate), including planted exact duplicates.
    import spark.implicits._
    val base = Tables(spark, sf, "documents").limit(50)
      .select(col("doc_id"), col("text"))
    val planted = Seq(
      (9001L, "the quick brown fox jumps over the lazy dog"),
      (9005L, "the quick brown fox jumps over the lazy dog"), // same format as 9001
      (9013L, ""), (9017L, "")                                // empty pair
    ).toDF("doc_id", "text")
    val hists = Multimodal.mediaHists(
      Multimodal.mediaFromDocuments(base.unionAll(planted)))
    val thr2 = 999990L * 999990L
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Multimodal.brutePairsOf(hists, thr2, 4))
    val grid = pairs(Multimodal.gridPairsOf(hists, 999990, thr2, 4))
    assert(brute.contains((9001L, 9005L)) && brute.contains((9013L, 9017L)))
    assert(grid === brute)
  }

  test("grid tier: neighbor replication catches a pair in ADJACENT cells") {
    import spark.implicits._
    // Hand-built histograms at ppm = 999000 (w = √(2·10⁻³) ≈ 0.0447):
    // rows 1 and 5 have normalized bin-1 coordinates ≈ 0.0400 / 0.0797 —
    // cells 0 and 1, DIFFERENT — while their cosine ≈ 0.999202 passes the
    // gate, so only the 3×3 neighbor replication can find the pair. Row 9
    // (bin-1 ≈ 0.447) drives the variance pick to bin 1 and is below the
    // gate against both. Rows 13/17 are the all-zero sentinel pair.
    def h(b0: Long, b1: Long): Array[Long] =
      Array(b0, b1) ++ Array.fill(14)(0L)
    val hists = Seq(
      (1L, "png", h(10000, 400), 100160000L),
      (5L, "png", h(10000, 800), 100640000L),
      (9L, "png", h(10000, 5000), 125000000L),
      (13L, "png", h(0, 0), 0L), (17L, "png", h(0, 0), 0L)
    ).toDF("id", "format", "hist", "nn")
    val pairs = Multimodal.gridPairsOf(hists, 999000, 999000L * 999000L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 5L), (13L, 17L)))
  }

  private def sigTmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mediasig-$tag").toString

  private def writeSigStore(dir: String,
      m: org.apache.spark.sql.DataFrame,
      thresholdPpm: Int = 999990, buckets: Int = 64): Unit = {
    val (sigs, meta) =
      Multimodal.mediaSignatureIndex(spark, m, thresholdPpm, buckets)
    sigs.write.mode("overwrite").partitionBy("sb").parquet(s"$dir/sigs")
    meta.coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  test("stored signature index: probe-over-store equals the exact brute " +
    "gate on the fixture (recall-1 grid blocking + identical ppm gate), " +
    "payload-free on the corpus side") {
    import spark.implicits._
    val base = Tables(spark, sf, "documents").limit(50)
      .select(col("doc_id"), col("text"))
    val planted = Seq(
      (9001L, "the quick brown fox jumps over the lazy dog"),
      (9005L, "the quick brown fox jumps over the lazy dog"),
      (9013L, ""), (9017L, "")).toDF("doc_id", "text")
    val m = Multimodal.mediaFromDocuments(base.unionAll(planted))
    val dir = sigTmp("roundtrip")
    writeSigStore(dir, m)
    val got = Multimodal.mediaNearDupIndexed(
      spark.read.parquet(s"$dir/sigs"), spark.read.parquet(s"$dir/meta"), m)
    val want = Multimodal.mediaNearDup(spark, m)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() === want.count())
  }

  test("stored signature index: append == rebuild under the release " +
    "geometry, and the probe answers through the appended store") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents").limit(60)
      .select(col("doc_id"), col("text"))
    val all = Multimodal.mediaFromDocuments(docs)
    val dir = sigTmp("append")
    writeSigStore(dir, all.filter(col("id") < 40))
    val meta = spark.read.parquet(s"$dir/meta")
    val delta = Multimodal.mediaSignatureAppend(
      spark.read.parquet(s"$dir/sigs"), meta, all.filter(col("id") >= 40))
    delta.write.mode("append").partitionBy("sb").parquet(s"$dir/sigs")
    // row-set equality with a from-scratch derivation under the SAME
    // released meta (bins are frozen release geometry, the zorder-
    // envelope stance) — sb reads back as a directory-inferred
    // partition column, so compare through a cast
    val stored = spark.read.parquet(s"$dir/sigs")
      .withColumn("sb", col("sb").cast("int"))
    val rebuilt = Multimodal.mediaSignatureRows(meta, all)
    assert(stored.except(rebuilt).isEmpty && rebuilt.except(stored).isEmpty)
    // and the dedup read over the appended store equals the exact gate
    val got = Multimodal.mediaNearDupIndexed(
      spark.read.parquet(s"$dir/sigs"), meta, all)
    val want = Multimodal.mediaNearDup(spark, all)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("stored signature index: a drifted meta is rejected against the " +
    "stored rows before any probe or append (silent false negatives " +
    "and misplaced partitions are the failure being gated)") {
    import spark.implicits._
    val m = Multimodal.mediaFromDocuments(
      Tables(spark, sf, "documents").limit(30)
        .select(col("doc_id"), col("text")))
    val dir = sigTmp("drift")
    writeSigStore(dir, m)
    val sigs = spark.read.parquet(s"$dir/sigs")
    val meta = spark.read.parquet(s"$dir/meta")
    val metaRow = meta.head()
    val (b1, b2) = (metaRow.getAs[Int]("bin1"), metaRow.getAs[Int]("bin2"))
    // wrong bins — a different blocking dimension than the store's
    val wrongBins = spark.range(1).select(
      lit((b1 + 3) % 16).as("bin1"), lit(b2).as("bin2"),
      lit(999990).as("threshold_ppm"), lit(64).as("n_buckets"))
    val e1 = intercept[IllegalArgumentException](
      Multimodal.mediaSignatureProbe(sigs, wrongBins, m))
    assert(e1.getMessage.contains("meta geometry"), e1.getMessage)
    // wrong bucket modulus — would misplace appended partitions
    val wrongBuckets = spark.range(1).select(
      lit(b1).as("bin1"), lit(b2).as("bin2"),
      lit(999990).as("threshold_ppm"), lit(32).as("n_buckets"))
    val e2 = intercept[IllegalArgumentException](
      Multimodal.mediaSignatureAppend(sigs, wrongBuckets, m))
    assert(e2.getMessage.contains("meta geometry"), e2.getMessage)
    // a multi-row or hollow meta is not a geometry at all
    intercept[IllegalArgumentException](
      Multimodal.mediaSignatureProbe(sigs, meta.unionAll(meta), m))
    intercept[IllegalArgumentException](
      Multimodal.mediaSignatureProbe(sigs,
        spark.range(1).select(lit(5).as("bin1"), lit(5).as("bin2"),
          lit(999990).as("threshold_ppm"), lit(64).as("n_buckets")), m))
  }

  test("stored signature index: a small probe dynamically prunes the " +
    "sb-partitioned store and reads a strict subset of its partitions") {
    import spark.implicits._
    val m = Multimodal.mediaFromDocuments(
      Tables(spark, sf, "documents").limit(200)
        .select(col("doc_id"), col("text")))
    val dir = sigTmp("dpp")
    writeSigStore(dir, m, buckets = 16)
    val probe = Multimodal.mediaSignatureProbe(
      spark.read.parquet(s"$dir/sigs"), spark.read.parquet(s"$dir/meta"),
      m.filter(col("id") === 1L))
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    // the FINAL plan must carry a real IN-subquery prune — AQE degrades
    // an unreusable broadcast to dynamicpruningexpression(true), which
    // still contains the substring but scans the whole store
    assert(plan.split("== Initial Plan ==")(0)
      .contains("dynamicpruningexpression(sb"), plan)
    // AQE nests the scan inside materialized query stages - walk them
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(probe.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("sigs")))
    assert(scans.nonEmpty)
    // selectedPartitions is the STATIC listing; the runtime-pruned
    // count is the scan's numPartitions metric
    val read = scans.map(_.metrics("numPartitions").value).sum
    val total = new java.io.File(s"$dir/sigs").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("sb="))
    assert(read < total,
      s"probe read $read of $total sb partitions - DPP is not pruning")
  }

  test("media family repair member: indexRepair with mediaSignatureRows " +
    "as the row builder drops orphans, backfills unindexed items, and " +
    "the repaired store is audit-clean and probe-identical") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents").limit(60)
      .select(col("doc_id"), col("text"))
    val all = Multimodal.mediaFromDocuments(docs)
    val corpus = all.filter(col("id") < 50)
    val dir = sigTmp("repair")
    // drifted store: built from [10, 60) — 10 unindexed, 10 orphaned
    writeSigStore(dir, all.filter(col("id") >= 10))
    val meta = spark.read.parquet(s"$dir/meta")
    val stale = spark.read.parquet(s"$dir/sigs")
      .withColumn("sb", col("sb").cast("int"))
    val repaired = Profile.indexRepair(corpus, "id", stale, "id",
      unindexed => Multimodal.mediaSignatureRows(meta, unindexed))
    repaired.write.mode("overwrite").partitionBy("sb")
      .parquet(s"$dir/sigs2")
    val audit = Profile.indexAudit(corpus, "id",
      spark.read.parquet(s"$dir/sigs2"), "id").collect()(0)
    assert(audit.getAs[Long]("n_unindexed") === 0L &&
      audit.getAs[Long]("n_orphaned") === 0L &&
      audit.getAs[Long]("fresh_ppm") === 1000000L)
    val got = Multimodal.mediaNearDupIndexed(
      spark.read.parquet(s"$dir/sigs2"), meta, corpus)
    val want = Multimodal.mediaNearDup(spark, corpus)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("grid tier: threshold 10^6 (w -> 0 guard) still pairs exact dups") {
    import spark.implicits._
    val hists = Seq(
      (1L, "png", Array(7777L) ++ Array.fill(15)(0L), 7777L * 7777L),
      (5L, "png", Array(7777L) ++ Array.fill(15)(0L), 7777L * 7777L),
      (9L, "png", Array(0L, 7777L) ++ Array.fill(14)(0L), 7777L * 7777L)
    ).toDF("id", "format", "hist", "nn")
    assert(Multimodal.gridCellWidth(1000000) > 0)
    val pairs = Multimodal.gridPairsOf(hists, 1000000, 1000000L * 1000000L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 5L))) // orthogonal row 9 never pairs
  }
}
