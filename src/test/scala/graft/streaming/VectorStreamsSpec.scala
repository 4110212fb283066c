package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming vector ingestion (foreachBatch): within-batch and
  * cross-batch (index-probed) near-dups flagged, survivors' assignment
  * rows accumulate in the cid-partitioned index, replay is exactly-once,
  * compaction preserves the partitioned layout. */
class VectorStreamsSpec extends SparkSuite {
  import spark.implicits._

  private val vA = Array(1.0f, 0.1f, 0.0f, 0.0f)   // near centroid 0
  private val vA2 = Array(1.0f, 0.11f, 0.0f, 0.0f) // cosine(vA, vA2) ≈ 0.99998
  private val vB = Array(0.0f, 1.0f, 0.1f, 0.0f)   // near centroid 1
  private val vC = Array(0.0f, 0.0f, 1.0f, 0.0f)   // far from everything

  private def writeCentroids(dir: String): Unit =
    Seq((0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
        (1, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("cid", "cvec").write.mode("overwrite").parquet(s"$dir/cent")

  test("streaming query: within-batch rep, index-probed cross-batch dup, " +
      "survivors land in the partitioned index") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("vecstream").toString
    writeCentroids(dir)
    val input = MemoryStream[(Long, Array[Float])]
    val q = VectorStreams.incrementalIndexQuery(
      input.toDF.toDF("vec_id", "embedding"), dir, "embedding", "vec_id",
      dim = 4, threshold = 0.95, nprobe = 2)
    try {
      input.addData((1L, vA), (2L, vB), (3L, vA)) // 3 = exact copy of 1
      q.processAllAvailable()
      input.addData((4L, vA2), (5L, vC)) // 4 near-dups the INDEXED 1
      q.processAllAvailable()
    } finally q.stop()

    val d = spark.read.parquet(s"$dir/decisions").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        r.getBoolean(3)))).toMap
    assert(d(1L) === ((None, None, true)))
    assert(d(2L) === ((None, None, true)))
    assert(d(3L) === ((None, Some(1L), false))) // within-batch rep
    assert(d(4L) === ((Some(1L), None, false))) // probed from the INDEX
    assert(d(5L) === ((None, None, true)))
    // the index holds one assignment row per accepted vector, in the
    // released lists: 1 and 5 under cid 0 (vC ties 0/0 across both
    // centroids — cid-ascending argmax), 2 under cid 1
    val ix = spark.read.parquet(s"$dir/index")
    assert(ix.select("id").as[Long].collect().sorted === Array(1L, 2L, 5L))
    assert(ix.filter(col("cid") === 0).select("id").as[Long]
      .collect().sorted === Array(1L, 5L))
    assert(ix.filter(col("cid") === 1).select("id").as[Long]
      .collect() === Array(2L))
    // the layout is the serving one: one directory per inverted list
    val base = new java.io.File(s"$dir/index")
    assert(base.listFiles().filter(_.isDirectory).map(_.getName).sorted
      .toSeq === Seq("cid=0", "cid=1"))
  }

  test("missing centroid release fails the batch with a setup instruction") {
    val dir = Files.createTempDirectory("vecstream-nocent").toString
    val batch = Seq((1L, vA)).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      VectorStreams.processBatch(spark, batch, 0L, dir,
        "embedding", "vec_id", dim = 4, threshold = 0.95, nprobe = 2)
    }
    assert(e.getMessage.contains("centroid release"), e.getMessage)
  }

  test("replay idempotence: a committed batch re-appends nothing; an " +
      "all-duplicates batch never creates an empty index") {
    val dir = Files.createTempDirectory("vecstream-replay").toString
    writeCentroids(dir)
    VectorStreams.processBatch(spark,
      Seq((1L, vA), (2L, vB)).toDF("vec_id", "embedding"),
      0L, dir, "embedding", "vec_id", 4, 0.95, 2)
    VectorStreams.processBatch(spark,
      Seq((4L, vA2), (5L, vC)).toDF("vec_id", "embedding"),
      1L, dir, "embedding", "vec_id", 4, 0.95, 2)
    def counts() = (spark.read.parquet(s"$dir/index").count(),
      spark.read.parquet(s"$dir/decisions").count())
    val before = counts()
    assert(before === ((3L, 4L)))
    VectorStreams.processBatch(spark,
      Seq((4L, vA2), (5L, vC)).toDF("vec_id", "embedding"),
      1L, dir, "embedding", "vec_id", 4, 0.95, 2)
    assert(counts() === before)
    // an all-duplicates batch: decisions recorded, index untouched
    VectorStreams.processBatch(spark,
      Seq((6L, vA)).toDF("vec_id", "embedding"),
      2L, dir, "embedding", "vec_id", 4, 0.95, 2)
    assert(counts() === ((3L, 5L)))
  }

  test("pq ingestion: the codes store tracks the index store — ADC " +
      "probe over streamed codes equals a from-scratch rebuild, replay " +
      "appends nothing, the cid layout survives compaction") {
    import graft.ops.Similarity
    val dir = Files.createTempDirectory("vecstream-pq").toString
    writeCentroids(dir)
    // released codebook: the quantization geometry, a release artifact
    // written next to cent/ (3 codewords, m=2 subspaces of 2 dims)
    val seeds = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
        (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
        (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val (_, cb) = Similarity.ivfPqIndex(
      seeds.withColumn("lbl", lit(0)), "embedding", "vec_id", "lbl",
      seeds, "embedding", "vec_id", m = 2, dim = 4)
    cb.write.mode("overwrite").parquet(s"$dir/codebook")
    VectorStreams.processBatch(spark,
      Seq((1L, vA), (2L, vB), (3L, vA)).toDF("vec_id", "embedding"),
      0L, dir, "embedding", "vec_id", 4, 0.95, 2, pq = true, m = 2)
    VectorStreams.processBatch(spark,
      Seq((4L, vA2), (5L, vC)).toDF("vec_id", "embedding"),
      1L, dir, "embedding", "vec_id", 4, 0.95, 2, pq = true, m = 2)
    val codes = spark.read.parquet(s"$dir/codes")
    // m code rows per ACCEPTED vector (duplicates never code), in the
    // raw index's lists, one directory per inverted list
    assert(codes.select("id").distinct().as[Long].collect().sorted
      === Array(1L, 2L, 5L))
    assert(codes.count() === 6L)
    assert(new java.io.File(s"$dir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
      === Seq("cid=0", "cid=1"))
    // equivalence: an ADC probe of the streamed codes equals one over
    // codes rebuilt from the accumulated index store (same codebook,
    // same lists — codes are per-vector facts, lists the same argmax)
    val cent = spark.read.parquet(s"$dir/cent")
    val cbS = spark.read.parquet(s"$dir/codebook")
    val queries = Seq((100L, vA), (101L, vC)).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rk", "id", "dist")
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    def probe(c: org.apache.spark.sql.DataFrame) =
      rows(Similarity.ivfPqProbe(c, cent, "cvec", "cid", cbS,
        queries, "embedding", "vec_id", m = 2, dim = 4,
        k = 3, nprobe = 2))
    val streamed = probe(codes.drop("batch_id"))
    val rebuilt = Similarity.ivfPqCodesFromAssigned(
      spark.read.parquet(s"$dir/index").drop("batch_id"),
      "vec", "id", "cid", cbS, m = 2, dim = 4)
    assert(streamed === probe(rebuilt))
    assert(streamed.nonEmpty)
    // replay idempotence: the codes store carries the batch marker
    val before = spark.read.parquet(s"$dir/codes").count()
    VectorStreams.processBatch(spark,
      Seq((4L, vA2), (5L, vC)).toDF("vec_id", "embedding"),
      1L, dir, "embedding", "vec_id", 4, 0.95, 2, pq = true, m = 2)
    assert(spark.read.parquet(s"$dir/codes").count() === before)
    // compaction covers codes/, preserves the layout, moves no rank
    val report = VectorStreams.compactState(spark, dir)
    assert(report.contains("codes"), report.toString)
    assert(new java.io.File(s"$dir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
      === Seq("cid=0", "cid=1"))
    assert(probe(spark.read.parquet(s"$dir/codes").drop("batch_id"))
      === streamed)
    // a missing codebook release fails loudly, like a missing cent/
    val dir2 = Files.createTempDirectory("vecstream-pq-nocb").toString
    writeCentroids(dir2)
    val e = intercept[IllegalStateException] {
      VectorStreams.processBatch(spark,
        Seq((1L, vA)).toDF("vec_id", "embedding"),
        0L, dir2, "embedding", "vec_id", 4, 0.95, 2, pq = true, m = 2)
    }
    assert(e.getMessage.contains("codebook release"), e.getMessage)
  }

  test("a first batch of null vectors never creates an unreadable " +
      "index dir (the guard tests the append rows, not the survivors)") {
    val dir = Files.createTempDirectory("vecstream-null").toString
    writeCentroids(dir)
    // contract violation upstream: a null vector is recorded is_new but
    // cannot be assigned — the batch must not write a schema-less index
    // dir that wedges every later read
    VectorStreams.processBatch(spark,
      Seq((1L, null: Array[Float])).toDF("vec_id", "embedding"),
      0L, dir, "embedding", "vec_id", 4, 0.95, 2)
    assert(!new java.io.File(s"$dir/index").exists())
    assert(spark.read.parquet(s"$dir/decisions").count() === 1L)
    // ingestion proceeds normally afterwards
    VectorStreams.processBatch(spark,
      Seq((2L, vA)).toDF("vec_id", "embedding"),
      1L, dir, "embedding", "vec_id", 4, 0.95, 2)
    assert(spark.read.parquet(s"$dir/index").select("id").as[Long]
      .collect() === Array(2L))
  }

  test("survivors derive from the persisted decisions subplan: one " +
      "LSH+probe execution serves every sink action") {
    // the DocumentStreams pin's vector symmetric: with decisions cached
    // (processBatch's single persist), the survivors plan reads the
    // cache instead of re-embedding the within-batch LSH and the k=1
    // stored-index probe
    val dir = Files.createTempDirectory("vecstream-persist").toString
    writeCentroids(dir)
    VectorStreams.processBatch(spark,
      Seq((1L, vA)).toDF("vec_id", "embedding"),
      0L, dir, "embedding", "vec_id", 4, 0.95, 2)
    val (decisions, survivors) = VectorStreams.dedupeStep(
      Some(spark.read.parquet(s"$dir/index").drop("batch_id")),
      spark.read.parquet(s"$dir/cent"),
      Seq((7L, vA2), (8L, vC)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", 4, 0.95, 2)
    decisions.persist()
    try {
      decisions.count()
      val cached = survivors.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      assert(cached.nonEmpty,
        "survivors must read the persisted decisions subplan")
      assert(survivors.select("vec_id").as[Long].collect().sorted
        === Array(8L))  // 7 is an index dup of 1
    } finally { decisions.unpersist(); () }
  }

  test("compactState: the index keeps its cid partitioning through " +
      "compaction; probe decisions identical pre/post") {
    val dir = Files.createTempDirectory("vecstream-compact").toString
    writeCentroids(dir)
    VectorStreams.processBatch(spark,
      Seq((1L, vA), (2L, vB)).toDF("vec_id", "embedding"),
      0L, dir, "embedding", "vec_id", 4, 0.95, 2)
    VectorStreams.processBatch(spark,
      Seq((5L, vC)).toDF("vec_id", "embedding"),
      1L, dir, "embedding", "vec_id", 4, 0.95, 2)
    def probe() = VectorStreams.dedupeStep(
        Some(spark.read.parquet(s"$dir/index").drop("batch_id")),
        spark.read.parquet(s"$dir/cent"),
        Seq((7L, vA2), (8L, vC), (9L, vA2)).toDF("vec_id", "embedding"),
        "embedding", "vec_id", 4, 0.95, 2)._1
      .collect().map(r => (r.getLong(0), Option(r.get(1)),
        Option(r.get(2)), r.getBoolean(3))).sortBy(_._1).toSeq
    val probeBefore = probe()
    val report = VectorStreams.compactState(spark, dir)
    assert(report.keySet === Set("index", "decisions"))
    report.foreach { case (store, (b, a)) =>
      assert(b > 1, s"$store had $b files before compaction")
      assert(a <= b, s"$store grew: $b -> $a")
    }
    // layout preserved: still one directory per inverted list, and the
    // partition-pruned read path still resolves
    val base = new java.io.File(s"$dir/index")
    assert(base.listFiles().filter(_.isDirectory).map(_.getName).sorted
      .toSeq === Seq("cid=0", "cid=1"))
    assert(probe() === probeBefore)
    // ingestion resumes on the compacted layout
    VectorStreams.processBatch(spark,
      Seq((7L, vA2), (8L, Array(0.0f, 0.0f, 0.0f, 1.0f)))
        .toDF("vec_id", "embedding"),
      2L, dir, "embedding", "vec_id", 4, 0.95, 2)
    assert(spark.read.parquet(s"$dir/index").select("id").as[Long]
      .collect().sorted === Array(1L, 2L, 5L, 8L))
  }
}
