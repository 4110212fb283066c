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
}
