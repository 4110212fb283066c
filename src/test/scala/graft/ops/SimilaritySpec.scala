package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tables.Tables

/** Semantics specs for ANN search: brute force is the ground truth; IVF
  * must agree on the vast majority of results at nprobe=2; LSH near-dup
  * must find planted duplicate vectors. */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def embeddings = Tables(spark, sf, "embeddings")

  test("cosineTopK returns k exact neighbors per query, self first") {
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 3)
    val out = Similarity.cosineTopK(
      corpus, "embedding", "vec_id", queries, "embedding", "vec_id", k = 5)
      .collect()
    assert(out.length == 15)
    // rank 1 of each query is the query vector itself (cosine 1.0)
    val top1 = out.filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2))
    top1.foreach { case (q, id) => assert(q == id) }
    // sims are non-increasing within a query
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b - 1e-12 })
    }
  }

  test("assignCentroids matches brute-force argmax with cid tie-break") {
    val corpus = embeddings
    val centroids = corpus.filter(col("vec_id") < 8)
    val got = Similarity.assignCentroids(corpus, "embedding", "vec_id",
        centroids, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    // brute force through the same cosine expression, argmax via window
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val cent = centroids.select(col("vec_id").as("cid"),
      col("embedding").as("cvec"))
    val want = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .crossJoin(broadcast(cent))
      .select(col("id"), col("cid"),
        graft.functions.GraftFunctions.vecCosine(col("vec"), col("cvec"))
          .as("csim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("csim").desc, col("cid"))))
      .filter(col("rk") === 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    assert(got.size === want.size)
    got.foreach { case (id, (cid, sim)) =>
      assert(want(id)._1 === cid, s"centroid mismatch for $id")
      assert(math.abs(want(id)._2 - sim) < 1e-12)
    }
    // centroid rows assign to themselves at cosine 1
    (0L until 8L).foreach(c => assert(got(c)._1 === c && got(c)._2 > 0.9999))
  }

  test("kmeansUpdate: exact per-dimension means on a hand fixture") {
    // 2-D, binary-exact coordinates: ids 0,1 nearest c10=(1,0);
    // ids 2,3 nearest c11=(0,1)
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.75f, 0.25f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.25f, 0.75f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansUpdate(corpus, "embedding", "vec_id",
        cents, "embedding", "vec_id")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out((10L, 0)) === ((2L, 0.875)))
    assert(out((10L, 1)) === ((2L, 0.125)))
    assert(out((11L, 0)) === ((2L, 0.125)))
    assert(out((11L, 1)) === ((2L, 0.875)))
    assert(out.size === 4)
  }

  test("kmeansUpdate: truncating 9-dp mean, not float division") {
    // one centroid, three vectors: mean of dim 0 is 1/3 -> truncates
    // to 0.333333333 exactly (1e9-scaled integer DIV)
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((9L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.kmeansUpdate(corpus, "embedding", "vec_id",
        cents, "embedding", "vec_id")
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(0) === 0.333333333)
    assert(out(1) === 0.666666666)
  }

  test("kmeansUpdate: negative non-exact sum truncates toward zero") {
    // one centroid, three vectors with a NEGATIVE dim-0 sum (-1) that
    // does not divide 3 evenly: Spark's DIV truncates toward zero, so
    // the 9-dp mean is -0.333333333, NOT floor's -0.333333334 — the
    // DuckDB oracle (PipelineOps e14) computes the same truncating
    // quotient via sign/abs because `//` floors toward −∞
    val corpus = Seq(
      (0L, Array(-1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((9L, Array(-1.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.kmeansUpdate(corpus, "embedding", "vec_id",
        cents, "embedding", "vec_id")
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(0) === -0.333333333)
    assert(out(1) === 0.666666666)
  }

  test("gramMatrix: exact scaled products on a hand fixture") {
    // two 3-d vectors with binary-exact coords: (1, 0.5, -2), (0.25, 2, 4)
    // gram[i][j] = v1[i]*v1[j] + v2[i]*v2[j], ×1e18 after the ×1e9 per-
    // coordinate quantization
    val corpus = Seq(
      (0L, Array(1.0f, 0.5f, -2.0f)),
      (1L, Array(0.25f, 2.0f, 4.0f))).toDF("vec_id", "embedding")
    val out = Similarity.gramMatrix(corpus, "embedding", "vec_id")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3))))
      .toMap
    // per-coordinate ×1e6 quantization (coords are binary-exact here);
    // the exact sums stay < 2^53, so toDouble below is lossless — the
    // same cast the op performs
    val v1 = Seq(1000000L, 500000L, -2000000L).map(BigInt(_))
    val v2 = Seq(250000L, 2000000L, 4000000L).map(BigInt(_))
    for (i <- 0 to 2; j <- i to 2) {
      val exact = v1(i) * v1(j) + v2(i) * v2(j)
      assert(exact.abs < BigInt(2).pow(53))
      assert(out((i, j)) === ((2L, exact.toDouble / 1e12)),
        s"dim pair ($i,$j)")
    }
    // upper triangle only: 3*(3+1)/2 entries
    assert(out.size === 6)
  }

  test("gramMatrix: null embeddings drop, symmetry pairs absent") {
    val corpus = Seq(
      (0L, Array(1.0f, 2.0f)), (1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val rows = Similarity.gramMatrix(corpus, "embedding", "vec_id").collect()
    assert(rows.forall(_.getLong(2) == 1L))
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ===
      Set((0, 0), (0, 1), (1, 1)))
  }

  test("ivfTopK: probing all clusters equals brute force; partial probe recalls some") {
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(
      corpus, "embedding", "vec_id", queries, "embedding", "vec_id", k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val centroids = Similarity.labelCentroids(corpus, "embedding", "label")
    def ivf(nprobe: Int) = Similarity.ivfTopK(
      corpus, "embedding", "vec_id", queries, "embedding", "vec_id",
      centroids, "cvec", "cid", k = 5, nprobe = nprobe)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    // nprobe = nlist → every corpus vector is searched → exact answer
    assert(ivf(10) == exact)
    // partial probe: recall bounded below (fixture labels are only weakly
    // clustered — measured top5 same-label fraction ≈ 0.27)
    val recall3 = exact.intersect(ivf(3)).size.toDouble / exact.size
    assert(recall3 >= 0.3, s"IVF nprobe=3 recall: $recall3")
  }

  test("nprobeSweep: hand-computed recall curve; one candidate set per nprobe") {
    import spark.implicits._
    // label 1's min-id centroid (0.99, 0.141) is NEARER the query (1, 0)
    // than label 0's (0.95, 0.3122), so nprobe=1 probes list 1 only —
    // which holds the true #1 (id 10) but not the true #2 (id 0, parked
    // in list 0): recall@2 = 1/2. nprobe=2 probes both lists: recall 1.
    val corpus = Seq(
      (0L, Array(0.95f, 0.3122f), 0),
      (1L, Array(0.6f, 0.8f), 0),
      (10L, Array(0.99f, 0.141f), 1),
      (11L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((100L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.nprobeSweep(corpus, "embedding", "vec_id", "label",
        queries, "embedding", "vec_id",
        Similarity.minIdCentroids(corpus, "embedding", "vec_id", "label"),
        "cvec", "cid", k = 2, nprobes = Seq(1, 2))
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1, 2L, 1L, 500000L),   // list 1 only: candidates {10, 11}, hit {10}
      (2, 4L, 2L, 1000000L))) // both lists: the full top-2 recovered
    intercept[IllegalArgumentException](
      Similarity.nprobeSweep(corpus, "embedding", "vec_id", "label",
        queries, "embedding", "vec_id",
        Similarity.minIdCentroids(corpus, "embedding", "vec_id", "label"),
        "cvec", "cid", k = 2, nprobes = Nil))
  }

  test("nprobeNlistSweep: surface rows; coarse config saturates at its list count") {
    import spark.implicits._
    // same planted geometry as the curve test, plus an all-in-one-list
    // coarse config (label0 = 0): nlist=1 probes everything at ANY
    // nprobe — every row is the brute-force result, the surface's
    // visible ceiling.
    val corpus = Seq(
      (0L, Array(0.95f, 0.3122f), 0),
      (1L, Array(0.6f, 0.8f), 0),
      (10L, Array(0.99f, 0.141f), 1),
      (11L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
      .withColumn("label0", lit(0))
    val queries = Seq((100L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.nprobeNlistSweep(corpus, "embedding", "vec_id",
        Seq(2 -> "label", 1 -> "label0"),
        queries, "embedding", "vec_id", k = 2, nprobes = Seq(1, 2))
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 1, 4L, 2L, 1000000L), // one list holds all 4: already exact
      (1L, 2, 4L, 2L, 1000000L), // probing "more" lists changes nothing
      (2L, 1, 2L, 1L, 500000L),  // fine index, 1 probe: half the top-2
      (2L, 2, 4L, 2L, 1000000L)))
  }

  test("ivfTopKPartitioned: label lists + min-id centroids, full probe = brute force") {
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(
      corpus, "embedding", "vec_id", queries, "embedding", "vec_id", k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val centroids =
      Similarity.minIdCentroids(corpus, "embedding", "vec_id", "label")
    // centroid = the min-id member's vector, verbatim
    val minIds = corpus.groupBy(col("label"))
      .agg(min(col("vec_id")).as("mid"))
    val c0 = centroids
      .join(minIds, col("cid") === col("label"))
      .join(corpus, col("vec_id") === col("mid"))
      .select(col("cvec"), col("embedding")).collect()
    assert(c0.nonEmpty)
    c0.foreach(r => assert(r.getSeq[Float](0) === r.getSeq[Float](1)))
    def ivf(nprobe: Int) = Similarity.ivfTopKPartitioned(
      corpus, "embedding", "vec_id", "label",
      queries, "embedding", "vec_id",
      centroids, "cvec", "cid", k = 5, nprobe = nprobe)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    // probing every list searches the whole corpus → exact answer
    assert(ivf(10) == exact)
    // partial probe returns k rows per query and a subset-quality answer
    val part = ivf(2)
    assert(part.size == exact.size)
  }

  test("ivfIndex round-trips through list-partitioned parquet: the " +
      "stored probe equals the live composition") {
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 10)
    val (assign, cent) =
      Similarity.ivfIndex(corpus, "embedding", "vec_id", "label")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-e21-idx").toString
    assign.write.mode("overwrite").partitionBy("cid")
      .parquet(s"$dir/assign")
    cent.write.mode("overwrite").parquet(s"$dir/cent")
    val storedAssign = spark.read.parquet(s"$dir/assign")
    // the partition-column type survives the directory round trip
    assert(storedAssign.schema("cid").dataType ===
      corpus.schema("label").dataType)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rk", "id").as[(Long, Int, Long)]
      .collect().toSeq.sorted
    val stored = rows(Similarity.ivfTopKPartitioned(
      storedAssign, "vec", "id", "cid",
      queries, "embedding", "vec_id",
      spark.read.parquet(s"$dir/cent"), "cvec", "cid", k = 5, nprobe = 2))
    val live = rows(Similarity.ivfTopKPartitioned(
      corpus, "embedding", "vec_id", "label",
      queries, "embedding", "vec_id",
      Similarity.minIdCentroids(corpus, "embedding", "vec_id", "label"),
      "cvec", "cid", k = 5, nprobe = 2))
    assert(stored === live)
  }

  test("ivfIndexAppend: new vectors append into the stored layout — " +
      "assignment matches the e05 argmax, untouched partitions keep " +
      "their exact files, appended probe equals a fixed-centroid rebuild") {
    val all = embeddings
    val corpus = all.filter(col("vec_id") < 400)
    val delta = all.filter(col("vec_id") >= 400)
    val (assign, cent) =
      Similarity.ivfIndex(corpus, "embedding", "vec_id", "label")
    val centDf = cent.cache()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-append").toString
    assign.write.mode("overwrite").partitionBy("cid").parquet(dir)
    def filesByPartition(): Map[String, Set[String]] = {
      val base = new java.io.File(dir)
      base.listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    }
    val before = filesByPartition()
    val appendRows = Similarity.ivfIndexAppend(delta, "embedding",
      "vec_id", centDf, "cvec", "cid").cache()
    try {
      appendRows.write.mode("append").partitionBy("cid").parquet(dir)
      val after = filesByPartition()
      // nothing shipped is rewritten: every partition the delta does
      // not touch keeps its exact file set; touched ones only GAIN
      val touched = appendRows.select("cid").distinct()
        .as[Int].collect().map(c => s"cid=$c").toSet
      before.foreach { case (part, files) =>
        if (touched.contains(part))
          assert(files.subsetOf(after(part)), s"$part lost files")
        else assert(after(part) === files, s"$part was rewritten")
      }
      // the append assignment IS the e05 argmax under the released
      // centroids (brute-force re-derivation, cid-ascending tie-break)
      val expected = Similarity.cosineTopK(centDf, "cvec", "cid",
          delta, "embedding", "vec_id", k = 1)
        .select(col("query_id"), col("id"))
        .as[(Long, Long)].collect().toMap
      val appended = spark.read.parquet(dir)
        .filter(col("id") >= 400).select(col("id"), col("cid"))
        .as[(Long, Int)].collect()
      assert(appended.length === delta.count())
      appended.foreach { case (id, cid) =>
        assert(cid.toLong === expected(id), s"vec $id")
      }
      // the equivalence contract: a probe over the APPENDED stored
      // index equals the index rebuilt from scratch over corpus ∪ delta
      // under the same fixed centroids
      val queries = all.filter(col("vec_id") < 10)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "rk", "id").as[(Long, Int, Long)]
        .collect().toSeq.sorted
      val storedProbe = rows(Similarity.ivfTopKPartitioned(
        spark.read.parquet(dir), "vec", "id", "cid",
        queries, "embedding", "vec_id", centDf, "cvec", "cid",
        k = 5, nprobe = 2))
      val rebuilt = corpus.select(col("vec_id").as("id"),
          col("embedding").as("vec"), col("label").as("cid"))
        .unionAll(appendRows)
      val rebuiltProbe = rows(Similarity.ivfTopKPartitioned(
        rebuilt, "vec", "id", "cid",
        queries, "embedding", "vec_id", centDf, "cvec", "cid",
        k = 5, nprobe = 2))
      assert(storedProbe === rebuiltProbe)
      assert(storedProbe.nonEmpty)
    } finally { appendRows.unpersist(); centDf.unpersist(); () }
  }

  test("ivfPqIndex/ivfPqProbe: the stored cid-partitioned codes table " +
      "returns identical ADC rankings to the live ivfPqTopK") {
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 10)
    val seeds = corpus.filter(col("vec_id") < 8)
    val (codes, codebook) = Similarity.ivfPqIndex(corpus, "embedding",
      "vec_id", "label", seeds, "embedding", "vec_id", m = 4, dim = 64)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq").toString
    codes.write.mode("overwrite").partitionBy("cid").parquet(s"$dir/codes")
    codebook.write.mode("overwrite").parquet(s"$dir/codebook")
    val cent =
      Similarity.minIdCentroids(corpus, "embedding", "vec_id", "label")
    cent.write.mode("overwrite").parquet(s"$dir/cent")
    val storedCodes = spark.read.parquet(s"$dir/codes")
    // m code rows per corpus vector; the partition-column type survives
    assert(storedCodes.count() === corpus.count() * 4)
    assert(storedCodes.schema("cid").dataType ===
      corpus.schema("label").dataType)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rk", "id", "dist")
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    val stored = rows(Similarity.ivfPqProbe(storedCodes,
      spark.read.parquet(s"$dir/cent"), "cvec", "cid",
      spark.read.parquet(s"$dir/codebook"),
      queries, "embedding", "vec_id", m = 4, dim = 64, k = 5, nprobe = 2))
    val live = rows(Similarity.ivfPqTopK(
      corpus, "embedding", "vec_id", "label",
      queries, "embedding", "vec_id", cent, "cvec", "cid",
      seeds, "embedding", "vec_id", m = 4, dim = 64, k = 5, nprobe = 2))
    assert(stored === live)
    assert(stored.nonEmpty)
    // ADC distances ascend within each query (rank order is real)
    stored.groupBy(_._1).foreach { case (_, rs) =>
      val ds = rs.sortBy(_._2).map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        rs.mkString(", "))
    }
  }

  test("ivfPqIndexAppend: delta vectors code against the stored " +
      "codebook and append into the cid layout — untouched partitions " +
      "keep their exact files, appended probe equals a rebuild") {
    val all = embeddings
    val corpus = all.filter(col("vec_id") < 400)
    val delta = all.filter(col("vec_id") >= 400 && col("vec_id") < 480)
    val seeds = all.filter(col("vec_id") < 8)
    val (codes, codebook) = Similarity.ivfPqIndex(corpus, "embedding",
      "vec_id", "label", seeds, "embedding", "vec_id", m = 4, dim = 64)
    val cent = Similarity
      .minIdCentroids(corpus, "embedding", "vec_id", "label").cache()
    val cbS = codebook.cache()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-append").toString
    codes.write.mode("overwrite").partitionBy("cid").parquet(dir)
    def filesByPartition(): Map[String, Set[String]] = {
      val base = new java.io.File(dir)
      base.listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    }
    val before = filesByPartition()
    val appendRows = Similarity.ivfPqIndexAppend(delta, "embedding",
      "vec_id", cent, "cvec", "cid", cbS, m = 4, dim = 64).cache()
    try {
      appendRows.write.mode("append").partitionBy("cid").parquet(dir)
      // m code rows per delta vector; untouched partitions unchanged
      assert(appendRows.count() === delta.count() * 4)
      val after = filesByPartition()
      val touched = appendRows.select("cid").distinct()
        .as[Int].collect().map(c => s"cid=$c").toSet
      before.foreach { case (part, files) =>
        if (touched.contains(part))
          assert(files.subsetOf(after(part)), s"$part lost files")
        else assert(after(part) === files, s"$part was rewritten")
      }
      // equivalence: a probe over the APPENDED stored index equals the
      // codes rebuilt from scratch over corpus ∪ delta with delta lists
      // from the same fixed-centroid argmax
      val queries = all.filter(col("vec_id") < 10)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "rk", "id", "dist")
        .as[(Long, Int, Long, Double)].collect().toSeq.sorted
      val storedProbe = rows(Similarity.ivfPqProbe(
        spark.read.parquet(dir), cent, "cvec", "cid", cbS,
        queries, "embedding", "vec_id", m = 4, dim = 64,
        k = 5, nprobe = 2))
      val rebuilt = codes.unionAll(appendRows
        .select(col("id"), col("sub"), col("code"), col("cid")))
      val rebuiltProbe = rows(Similarity.ivfPqProbe(
        rebuilt, cent, "cvec", "cid", cbS,
        queries, "embedding", "vec_id", m = 4, dim = 64,
        k = 5, nprobe = 2))
      assert(storedProbe === rebuiltProbe)
      assert(storedProbe.nonEmpty)
    } finally {
      appendRows.unpersist(); cent.unpersist(); cbS.unpersist(); ()
    }
  }

  test("ivfPqRerank: with kCoarse covering the probed pool the two-stage " +
      "path equals exact IVF search; kCoarse < k rejected") {
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 10)
    val seeds = corpus.filter(col("vec_id") < 8)
    val (codes, codebook) = Similarity.ivfPqIndex(corpus, "embedding",
      "vec_id", "label", seeds, "embedding", "vec_id", m = 4, dim = 64)
    val cent =
      Similarity.minIdCentroids(corpus, "embedding", "vec_id", "label")
    val (raw, _) = Similarity.ivfIndex(corpus, "embedding", "vec_id",
      "label")
    // kCoarse >= the probed pool: the ADC stage nominates EVERYTHING in
    // the probed lists, so the exact re-rank must return precisely what
    // exact IVF search over the same lists returns — the refine stage
    // recovers full precision when the candidate pool allows it
    val kCoarse = corpus.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rk", "id").as[(Long, Int, Long)]
      .collect().toSeq.sorted
    val twoStage = rows(Similarity.ivfPqRerank(codes, cent, "cvec",
      "cid", codebook, raw, queries, "embedding", "vec_id",
      m = 4, dim = 64, k = 5, kCoarse = kCoarse, nprobe = 2))
    val exact = rows(Similarity.ivfTopKPartitioned(corpus, "embedding",
      "vec_id", "label", queries, "embedding", "vec_id",
      cent, "cvec", "cid", k = 5, nprobe = 2))
    assert(twoStage === exact)
    assert(twoStage.nonEmpty)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqRerank(codes, cent, "cvec", "cid", codebook, raw,
        queries, "embedding", "vec_id", m = 4, dim = 64,
        k = 5, kCoarse = 4, nprobe = 2)
    }
  }

  test("cosineNearDup clusters planted duplicate vectors") {
    val v1 = Array.tabulate(8)(i => 1.0f / (i + 1))
    val v1b = v1.clone(); v1b(7) *= 1.01f               // tiny perturbation
    val v2 = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq((1L, v1.toSeq), (2L, v1.toSeq), (3L, v1b.toSeq), (4L, v2.toSeq))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDup(df, "embedding", "vec_id",
        dim = 8, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 4L)
  }

  test("pqAssign: seeds code to themselves at 0; argmin matches brute force") {
    val corpus = embeddings.filter(col("vec_id") < 48)
    val seeds = embeddings.filter(col("vec_id") < 8)
    val out = Similarity.pqAssign(corpus, "embedding", "vec_id",
      seeds, "embedding", "vec_id", m = 4, dim = 64).collect()
    assert(out.length === 48 * 4)
    out.filter(_.getLong(0) < 8).foreach { r =>
      assert(r.getLong(2) === r.getLong(0), r)   // own codeword
      assert(r.getDouble(3) === 0.0, r)          // at distance 0
    }
    // brute-force argmin over the seed subvectors, double arithmetic
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float], s: Int): Double =
      (s * 16 until s * 16 + 16).foldLeft(0.0) { (acc, i) =>
        val d = a(i).toDouble - b(i).toDouble; acc + d * d
      }
    out.foreach { r =>
      val (id, sub, code) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val best = (0L until 8L).minBy(c =>
        (d2(vecs(id), vecs(c), sub.toInt), c))
      assert(code === best, s"id=$id sub=$sub")
    }
    intercept[IllegalArgumentException](Similarity.pqAssign(corpus,
      "embedding", "vec_id", seeds, "embedding", "vec_id", m = 5, dim = 64))
  }

  test("hardNegatives excludes same-label vectors, ranks the rest by cosine") {
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 5)
    val out = Similarity.hardNegatives(corpus, "embedding", "vec_id",
      "label", queries, "embedding", "vec_id", "label", k = 5)
    val labels = corpus.collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length === 25)
    // no result may share its query's label (its own id is excluded too,
    // since a vector always has its own label)
    rows.foreach { case (qid, _, id) =>
      assert(labels(id) !== labels(qid), s"q=$qid got same-label $id")
      assert(id !== qid)
    }
  }

  test("ivfPqTopK: k ADC-ranked rows per query, ascending distance") {
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 10)
    val cents = Similarity.minIdCentroids(corpus, "embedding", "vec_id",
      "label")
    val seeds = corpus.filter(col("vec_id") < 8)
    val out = Similarity.ivfPqTopK(corpus, "embedding", "vec_id", "label",
      queries, "embedding", "vec_id", cents, "cvec", "cid",
      seeds, "embedding", "vec_id",
      m = 4, dim = 64, k = 5, nprobe = 2).collect()
    assert(out.length === 50)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to 5))
      val ds = sorted.map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, ds.toSeq)
    }
    intercept[IllegalArgumentException](Similarity.ivfPqTopK(corpus,
      "embedding", "vec_id", "label", queries, "embedding", "vec_id",
      cents, "cvec", "cid", seeds, "embedding", "vec_id",
      m = 5, dim = 64))
  }

  test("semDedup flags near-dups within a cluster, ignores cross-cluster twins") {
    val v1 = Array.tabulate(8)(i => 1.0f / (i + 1))
    val v1b = v1.clone(); v1b(7) *= 1.01f               // tiny perturbation
    val v2 = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq(
      (1L, v1.toSeq, 0), (2L, v1b.toSeq, 0), (3L, v2.toSeq, 0),
      // exact twin of vector 1 but in another cluster: SemDeDup must NOT
      // flag it (within-cluster pairs only — the d05 global form would)
      (4L, v1.toSeq, 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(df, "embedding", "vec_id", "label",
        threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq((1L, 1L, false), (2L, 1L, true),
      (3L, 3L, false), (4L, 4L, false)))
  }

  test("cosineTopK tolerates null embeddings and non-long integral ids") {
    val corpus = Seq(
      (1, Option(Seq(1.0f, 0.0f))),
      (2, Option(Seq(0.9f, 0.1f))),
      (3, Option.empty[Seq[Float]]),   // null embedding: must not crash
      (4, Option(Seq(0.0f, 1.0f))))
      .toDF("vec_id", "embedding")     // vec_id is INT, not LONG
    val queries = corpus.filter(col("vec_id") === 1)
    val out = Similarity.cosineTopK(
      corpus, "embedding", "vec_id", queries, "embedding", "vec_id", k = 3)
    // id column keeps the input's integer width
    assert(out.schema("id").dataType ===
      org.apache.spark.sql.types.IntegerType)
    val rows = out.collect().map(r => (r.getInt(1), r.getInt(2)))
    // the null-embedding row is dropped, not an encoder crash
    assert(rows.toSeq === Seq((1, 1), (2, 2), (3, 4)))
  }

  test("cosineTopK rejects non-integral id columns with a clear error") {
    val corpus = Seq(("a", Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineTopK(
        corpus, "embedding", "vec_id", corpus, "embedding", "vec_id", k = 1)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("dot/norm/cosine column math is correct") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")),
      Similarity.norm(col("a")),
      Similarity.cosine(col("a"), col("b"))).head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
  }

  test("quantizeInt8: range, zero-vector, and reconstruction bounds") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),         // all-zero -> scale 0
      (3L, Seq(2.0f, 1.0f, -2.0f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "embedding", "vec_id")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // max-|x| element saturates exactly at +/-127
    assert(out(1L).getAs[Int]("q_min") === -127)
    assert(out(1L).getAs[Int]("q_max") === 64)    // 0.5 * 127 = 63.5 -> 64
    assert(out(2L).getAs[Double]("scale") === 0.0)
    assert(out(2L).getAs[Int]("q_min") === 0)
    assert(out(3L).getAs[Int]("n_sat") === 2)     // 2.0 and -2.0 saturate
    // reconstruction: |q/scale - x| <= 0.5/scale for every component
    val r1 = out(1L)
    val scale = r1.getAs[Double]("scale")
    val q = r1.getSeq[Int](r1.fieldIndex("qvec"))
    val x = Seq(0.5, -1.0, 0.25, 0.0)
    q.zip(x).foreach { case (qi, xi) =>
      assert(math.abs(qi / scale - xi) <= 0.5 / scale + 1e-12) }
  }

  test("matryoshka: head norm, retained energy, renormalized q1, zero edge") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f, 0.0f, 0.0f)),      // head(2) = full vector
      (2L, Seq(1.0f, 0.0f, 2.0f, 2.0f)),      // head(2) holds 1/9 energy
      (3L, Seq(0.0f, 0.0f, 1.0f, 1.0f)),      // zero head
      (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))      // zero vector
      .toDF("vec_id", "embedding")
    val out = Similarity.matryoshka(df, "embedding", "vec_id", m = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((5.0, 1.0, 0.6)))     // 3-4-5; q1 = 3/5
    assert(out(2L)._1 === 1.0)
    assert(math.abs(out(2L)._2 - 1.0 / 9.0) < 1e-6)
    assert(out(2L)._3 === 1.0)
    assert(out(3L) === ((0.0, 0.0, 0.0)))     // zero head -> q1 guard
    assert(out(4L) === ((0.0, 0.0, 0.0)))     // zero vector -> energy guard
    intercept[IllegalArgumentException] {
      Similarity.matryoshka(df, "embedding", "vec_id", m = 0)
    }
  }

  test("ivfStats: per-list counts, shares, mean residual to the centroid") {
    // list 0: centroid = vec 1 (min id). residuals: vec1 -> 0,
    // vec2 -> (1-0)^2 + 0 = 1, vec3 -> 0 + (2-0)^2 = 4; mean = 5/3
    // list 1: single member -> residual 0
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 2.0f), 0),
      (4L, Seq(5.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfStats(df, "embedding", "vec_id", "label",
        Similarity.minIdCentroids(df, "embedding", "vec_id", "label"),
        "cvec", "cid")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(0)._1 === 3L)
    assert(out(0)._2 === 0.75)                 // 3*1e6 DIV 4 / 1e6
    // (0 + 1 + 4) * 1e9 DIV 3 = 1666666666 -> 1.666666666 (truncating)
    assert(out(0)._3 === 1.666666666)
    assert(out(1) === ((1L, 0.25, 0.0)))
  }

  test("annRecall: per-query hits, zero rows for missed queries") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L)).toDF("query_id", "id")
    // query 1: 2/3 recovered; query 2: none (e.g. probe missed the list)
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 98L), (2L, 97L), (2L, 96L)).toDF("query_id", "id")
    val out = Similarity.annRecall(exact, approx, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) === ((2L, 0.666666)))   // truncating 6-dp
    assert(out(2L) === ((0L, 0.0)))        // present, not silently absent
    intercept[IllegalArgumentException](
      Similarity.annRecall(exact, approx, k = 0))
  }

  test("ivfStats broadcasts the centroid set; vectors never shuffle") {
    val df = (1 to 40).map(i =>
      (i.toLong, Seq(i.toFloat, 0.0f), i % 4)).toDF("vec_id", "embedding", "label")
    val q = Similarity.ivfStats(df, "embedding", "vec_id", "label",
      Similarity.minIdCentroids(df, "embedding", "vec_id", "label"),
      "cvec", "cid")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("embeddingOutliers: farthest-from-centroid first, k bound, ties by id") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), 0),   // centroid (min id)
      (2L, Seq(3.0f, 0.0f), 0),   // residual 9
      (3L, Seq(0.0f, 2.0f), 0),   // residual 4
      (4L, Seq(1.0f, 0.0f), 0),   // residual 1
      (5L, Seq(9.0f, 9.0f), 1))   // own list, residual 0
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(df, "embedding", "vec_id",
        "label", Similarity.minIdCentroids(df, "embedding", "vec_id",
          "label"), "cvec", "cid", k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3))))
    assert(out.toMap === Map(
      (0, 1) -> ((2L, 9.0)), (0, 2) -> ((3L, 4.0)),
      (1, 1) -> ((5L, 0.0))))
    intercept[IllegalArgumentException](Similarity.embeddingOutliers(
      df, "embedding", "vec_id", "label",
      Similarity.minIdCentroids(df, "embedding", "vec_id", "label"),
      "cvec", "cid", k = 0))
  }

  test("binaryQuantize: exact sign-bit packing into 32-bit words") {
    // 64 dims, positives at 0, 1, 33; zeros and negatives clear
    val v = Array.fill(64)(-1.0f)
    v(0) = 0.5f; v(1) = 2.0f; v(33) = 1e-9f; v(40) = 0.0f
    val df = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
    val out = Similarity.binaryQuantize(df, "embedding", "vec_id", dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) === Seq(3L, 2L))           // word0 = bits 0+1, word1 = bit 1
  }

  test("binaryQuantize: ragged last word at non-multiple-of-32 dims") {
    val df = Seq((1L, Seq(1.0f, -1.0f, 1.0f, 1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    // dim 5 -> one word, bits 0,2,3 set = 13
    val out = Similarity.binaryQuantize(df, "embedding", "vec_id", dim = 5)
      .collect().head.getSeq[Long](1)
    assert(out === Seq(13L))
    intercept[IllegalArgumentException](
      Similarity.binaryQuantize(df, "embedding", "vec_id", dim = 0))
  }

  test("binaryQuantize: truncated/null vectors signature to NULL (no ANSI throw)") {
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 1.0f, 1.0f)),
      (2L, Seq(1.0f, -1.0f)),                  // shorter than dim
      (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val out = Similarity.binaryQuantize(df, "embedding", "vec_id", dim = 4)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    // and the top-k over the same corpus drops the malformed rows
    // instead of aborting the job
    val q = df.filter($"vec_id" === 1L)
    val ranked = Similarity.hammingTopK(df, "embedding", "vec_id",
      q, "embedding", "vec_id", dim = 4, k = 5)
    assert(ranked.collect().map(_.getLong(2)).toSet === Set(1L))
  }

  test("hammingTopK: exact popcount distances, ties break by id") {
    val corpus = Seq(
      (1L, Seq(1.0f, 1.0f, 1.0f, 1.0f)),     // sig 1111
      (2L, Seq(1.0f, 1.0f, 1.0f, -1.0f)),    // dist 1 to query
      (3L, Seq(-1.0f, 1.0f, 1.0f, -1.0f)),   // dist 2
      (4L, Seq(1.0f, -1.0f, -1.0f, 1.0f)))   // dist 2 (tie with 3, id wins)
      .toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val out = Similarity.hammingTopK(corpus, "embedding", "vec_id",
        q, "embedding", "vec_id", dim = 4, k = 3)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3))))
    assert(out === Array(
      1 -> ((1L, 0L)), 2 -> ((2L, 1L)), 3 -> ((3L, 2L))))
  }

  // three x-axis vectors + one diagonal: Gram = [[3.25, 0.25],
  // [0.25, 0.25]]e12 in the x1e6-quantized integer units
  private def pcaCorpus = Seq(
    (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)),
    (4L, Seq(0.5f, 0.5f)))
    .toDF("vec_id", "embedding")

  test("pcaPowerIteration: one hand-computed exact-integer step") {
    val out = Similarity.pcaPowerIteration(pcaCorpus, "embedding", "vec_id",
        iters = 1)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    // w = G.(1e6,1e6) = (3.5e18, 5e17); m = 3.5e18:
    //   v0' = 1e6 (the max component pins at exactly 1.0)
    //   v1' = (5e17*1e6) DIV 3.5e18 = 142857 (floor of 142857.14...)
    //   growth = 3.5e18 DIV 1e6
    assert(out.toSeq === Seq(
      (0, 1.0, 3500000000000L), (1, 0.142857, 3500000000000L)))
  }

  test("pcaPowerIteration: converges to the dominant eigendirection") {
    val out = Similarity.pcaPowerIteration(pcaCorpus, "embedding", "vec_id",
        iters = 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // dominant eigvec of [[3.25,0.25],[0.25,0.25]]: ratio
    // x1/x0 = 0.25/(lambda-0.25) = 0.08276...
    assert(out(0) === 1.0)
    assert(out(1) > 0.080 && out(1) < 0.086)
  }

  test("gramDrift: hand means, truncating negative mean, absent side zero") {
    // snapshot a: two 2-d vectors; snapshot b: one vector with a
    // negative dim-0 coordinate whose squared mean doesn't divide evenly
    val a = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val b = Seq((0L, Array(-1.0f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.gramDrift(a, b, "embedding", k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // a grams (x1e12): (0,0)=2, (0,1)=1, (1,1)=2 over n=3
    //   -> means 2e12 DIV 3 = 666666666666, 333333333333, 666666666666
    // b grams: (0,0)=1e12, (0,1)=-5e11, (1,1)=2.5e11 over n=1
    assert(out((0, 0)) ===
      ((3L, 1L, 666666666666L, 1000000000000L, 333333333334L)))
    assert(out((0, 1)) ===
      ((3L, 1L, 333333333333L, -500000000000L, 833333333333L)))
    assert(out((1, 1)) ===
      ((3L, 1L, 666666666666L, 250000000000L, 416666666666L)))
    intercept[IllegalArgumentException](
      Similarity.gramDrift(a, b, "embedding", k = 0))
  }

  test("gramDrift: negative sum truncates toward zero (DIV, not floor)") {
    // cross-moment sum -1e12 over n=3 does not divide evenly and is
    // negative — the case where truncation and floor differ by one
    val a = Seq((0L, Array(1.0f, -1.0f)), (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val b = a.limit(0)
    val out = Similarity.gramDrift(a, b, "embedding", k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(4)).toMap
    // (0,1) gram = -1e12 over n=3: truncation gives -333333333333,
    // floor would give -333333333334
    assert(out((0, 1)) === -333333333333L)
  }

  test("removeDominantDirection: exact zeros on-axis, near-orthogonal residuals") {
    // corpus entirely on the x axis: the direction IS (1, 0) and every
    // residual is exactly zero (no truncation error on this fixture)
    val axis = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.5f, 0.0f)),
      (2L, Seq(0.25f, 0.0f))).toDF("vec_id", "embedding")
    val zeros = Similarity.removeDominantDirection(axis, "embedding",
      "vec_id", iters = 3).collect()
    assert(zeros.length === 6)
    assert(zeros.forall(_.getDouble(2) === 0.0))

    // mixed corpus: residuals are near-orthogonal to the direction
    // (exact up to the one truncating division per vector)
    val u = Similarity.pcaPowerIteration(pcaCorpus, "embedding", "vec_id",
      iters = 8).collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val res = Similarity.removeDominantDirection(pcaCorpus, "embedding",
        "vec_id", iters = 8)
      .collect().groupBy(_.getLong(0))
    res.values.foreach { rows =>
      val d = rows.map(r => r.getDouble(2) * u(r.getInt(1))).sum
      assert(math.abs(d) < 1e-5, s"residual not orthogonal: $d")
    }
    intercept[IllegalArgumentException](
      Similarity.removeDominantDirection(pcaCorpus, "embedding", "vec_id",
        iters = 0))
  }

  test("pcaPowerIteration: null embeddings drop; determinism; validation") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(pcaCorpus.collect().toSeq :+
        Row(9L, null)), schema)
    val a = Similarity.pcaPowerIteration(withNull, "embedding", "vec_id",
      iters = 3).collect().toSeq
    val b = Similarity.pcaPowerIteration(pcaCorpus, "embedding", "vec_id",
      iters = 3).collect().toSeq
    assert(a === b)
    intercept[IllegalArgumentException](
      Similarity.pcaPowerIteration(pcaCorpus, "embedding", "vec_id",
        iters = 0))
  }

  test("lloydTrace round 1 composes assignCentroids + kmeansUpdate") {
    val corpus = embeddings
    val seeds = corpus.filter(col("vec_id") < 8)
    val trace = Similarity.lloydTrace(corpus, "embedding", "vec_id",
      seeds, "embedding", "vec_id", rounds = 1).collect()

    val counts = Similarity.assignCentroids(corpus, "embedding", "vec_id",
        seeds, "embedding", "vec_id")
      .groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val means = Similarity.kmeansUpdate(corpus, "embedding", "vec_id",
        seeds, "embedding", "vec_id")
      .filter(col("dim") === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap

    assert(trace.map(_.getLong(2)).sum === corpus.count())
    trace.foreach { r =>
      val cid = r.getLong(1)
      assert(r.getInt(0) === 1)
      assert(r.getLong(2) === counts(cid))
      assert(r.getDouble(4) === means(cid), s"c0 mismatch for $cid")
      assert(r.getDouble(3) >= 0.0 - 1e-12)
    }
  }

  test("lloydTrace iterates: 3 rounds, full membership, deterministic") {
    val corpus = embeddings
    val seeds = corpus.filter(col("vec_id") < 8)
    val n = corpus.count()
    val run = () => Similarity.lloydTrace(corpus, "embedding", "vec_id",
      seeds, "embedding", "vec_id", rounds = 3).collect().toSeq
    val a = run()
    assert(a.map(_.getInt(0)).distinct.sorted === Seq(1, 2, 3))
    (1 to 3).foreach { r =>
      assert(a.filter(_.getInt(0) == r).map(_.getLong(2)).sum === n,
        s"round $r memberships don't cover the corpus")
    }
    // centroids move: round-2 c0s differ from the seed coordinates
    // somewhere (the update actually fed the next assignment)
    assert(a === run(), "lloydTrace is not deterministic")
    intercept[IllegalArgumentException](
      Similarity.lloydTrace(corpus, "embedding", "vec_id",
        seeds, "embedding", "vec_id", rounds = 0))
  }

  test("lloydTrace keeps an emptied cluster's centroid (COALESCE rule)") {
    // corpus all in the +x half-space; centroid 1 points the opposite
    // way and never wins a member — its coordinates must persist
    // unchanged through both rounds (it's absent from the trace, but
    // round 2 still scores against it without crashing or drifting)
    val corpus = Seq((10L, Array(1.0f, 0.1f)), (11L, Array(1.0f, -0.1f)),
      (12L, Array(0.9f, 0.0f))).toDF("vec_id", "embedding")
    val init = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val trace = Similarity.lloydTrace(corpus, "embedding", "vec_id",
      init, "embedding", "vec_id", rounds = 2).collect()
    assert(trace.map(_.getLong(1)).distinct.toSeq === Seq(0L))
    assert(trace.map(_.getInt(0)).distinct.sorted === Seq(1, 2))
    trace.foreach(r => assert(r.getLong(2) === 3L))
    // cid 0's centroid converged to the member mean on round 1, so the
    // round-2 update reproduces it: c0 identical across rounds
    val c0 = trace.sortBy(_.getInt(0)).map(_.getDouble(4))
    assert(c0(0) === c0(1))
  }
}
