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
    val hists = Multimodal.histsForTest(spark,
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
