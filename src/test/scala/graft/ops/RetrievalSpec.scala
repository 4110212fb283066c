package graft.ops

import graft.SparkSuite

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  // Hand corpus: 4 docs, 3 tokens each → N=4, total_tokens=12, avgdl=3.
  private def corpus = Seq(
    (1L, "spark spark spark"),   // tf(spark)=3
    (2L, "spark join b"),        // tf(spark)=1, tf(join)=1
    (3L, "join c d"),            // tf(join)=1
    (4L, "e f g")                // no hits
  ).toDF("doc_id", "text")

  test("bm25: hand-computed integer scores, rarer term weighs heavier") {
    val out = Retrieval.bm25TopK(corpus, "text", "doc_id",
        Seq("spark", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // df(spark)=2, df(join)=2; idf_rat = (1e6*(2*(4-2)+1)) DIV (2*2+1)
    //   = 5_000_000 DIV 5 = 1_000_000 for both terms.
    // dlr = (9000*3*4) DIV 12 = 9000 for every doc (all dl=3).
    // term(tf) = (1_000_000*tf*22000) DIV (10000*tf + 3000 + 9000)
    //   tf=1 → 2.2e10 DIV 22000 = 1_000_000
    //   tf=3 → 6.6e10 DIV 42000 = 1_571_428
    assert(out.toSeq == Seq(
      (2L, 2L, 2000000L),   // spark+join, one each
      (1L, 1L, 1571428L),   // spark×3: saturation < 2 single hits
      (3L, 1L, 1000000L)))  // doc 4 has no hits → absent
  }

  test("bm25: rare term outweighs common term (rational idf)") {
    // "rare" appears in 1 doc, "common" in 3 → idf_rat differs.
    val df = Seq(
      (1L, "rare x x"), (2L, "common x x"), (3L, "common x x"),
      (4L, "common x x")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(df, "text", "doc_id",
        Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // idf_rat(rare) = (1e6*7) DIV 3 = 2_333_333;
    // idf_rat(common) = (1e6*3) DIV 7 = 428_571 — doc 1 must rank first.
    assert(out.head._1 == 1L)
    assert(out.head._2 > out(1)._2)
    // ties below the head break by id ascending
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("bm25: k caps the result and empty-hit docs never appear") {
    val out = Retrieval.bm25TopK(corpus, "text", "doc_id",
      Seq("spark"), k = 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L)
  }

  test("bm25: validation") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "text", "doc_id", Seq.empty, k = 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "text", "doc_id", Seq("spark"), k = 0)
    }
  }

  // (id, rank) rank lists for the fusion tests
  private def rankList(rows: (Long, Long)*) = rows.toDF("id", "rk")

  test("rrf: hand-computed fusion at c=0, per-list ranks, null absences") {
    val a = rankList(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val b = rankList(2L -> 1L, 3L -> 2L, 4L -> 3L)
    val out = Retrieval.rrfFusion(Seq("a" -> a, "b" -> b), "id", "rk",
        c = 0, k = 10)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getLong(3), r.getLong(4)))
    // 1e9/rank weights: id2 = 1e9/2 + 1e9 = 1.5e9; id1 = 1e9;
    // id3 = 1e9/3 + 1e9/2 = 833333333; id4 = 1e9/3
    assert(out.toSeq === Seq(
      (2L, Some(2L), Some(1L), 2L, 1500000000L),
      (1L, Some(1L), None, 1L, 1000000000L),
      (3L, Some(3L), Some(2L), 2L, 833333333L),
      (4L, None, Some(3L), 1L, 333333333L)))
  }

  test("rrf: equal scores break by id ascending and k cuts the tail") {
    // id 9 only in list a at rank 3, id 8 only in list b at rank 3 —
    // identical fused score, id 8 must sort first
    val a = rankList(1L -> 1L, 2L -> 2L, 9L -> 3L)
    val b = rankList(1L -> 1L, 2L -> 2L, 8L -> 3L)
    val out = Retrieval.rrfFusion(Seq("a" -> a, "b" -> b), "id", "rk",
      c = 60, k = 3).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 2L, 8L))
  }

  test("rrf: single list degenerates to the input ranking") {
    val a = rankList(5L -> 1L, 6L -> 2L, 7L -> 3L)
    val out = Retrieval.rrfFusion(Seq("only" -> a), "id", "rk", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq(5L -> 1L, 6L -> 2L, 7L -> 3L))
  }

  test("rrf: validation") {
    val a = rankList(1L -> 1L)
    intercept[IllegalArgumentException] {
      Retrieval.rrfFusion(Seq.empty, "id", "rk")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFusion(Seq("x" -> a, "x" -> a), "id", "rk")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFusion(Seq("x" -> a), "id", "rk", c = -1)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFusion(Seq("x" -> a), "id", "rk", k = 0)
    }
    // string ids would cast to null and collapse every row into one
    // fused group — rejected up front, same contract as rankTopK
    val strIds = {
      import spark.implicits._
      Seq(("doc-1", 1L)).toDF("id", "rk")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFusion(Seq("x" -> strIds), "id", "rk")
    }
  }

  test("bm25 stored postings probe equals the live top-k through the " +
      "parquet round trip; dl rides denormalized on every posting") {
    import org.apache.spark.sql.functions.col
    val docs = graft.tables.Tables(spark, sf, "documents")
    val terms = Seq("spark", "join", "vector", "window")
    val (post, stats) = Retrieval.bm25Index(docs, "text", "doc_id")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-t28-idx").toString
    post.repartitionByRange(col("t")).sortWithinPartitions(col("t"))
      .write.mode("overwrite").parquet(s"$dir/postings")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
    val storedPost = spark.read.parquet(s"$dir/postings")
    // the denormalized dl: every posting of a doc carries the SAME
    // length, equal to the t-series whitespace token count
    assert(storedPost.select("id", "dl").distinct().count() ===
      storedPost.select("id").distinct().count())
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val stored = triples(Retrieval.bm25Probe(storedPost,
      spark.read.parquet(s"$dir/stats"), terms, 10))
    val live = triples(Retrieval.bm25TopK(docs, "text", "doc_id",
      terms, 10))
    assert(stored === live)
    assert(stored.nonEmpty)
  }

  test("bm25IndexAppend: delta postings are per-doc facts, stats " +
      "derived-rewritten — append ≡ rebuild, nothing shipped rewritten") {
    import org.apache.spark.sql.functions.col
    val all = graft.tables.Tables(spark, sf, "documents")
    val released = all.filter(col("doc_id") < 400)
    val delta = all.filter(col("doc_id") >= 400)
    val terms = Seq("spark", "join", "vector", "window")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-t30-idx").toString
    val (post, stats) = Retrieval.bm25Index(released, "text", "doc_id")
    post.repartitionByRange(col("t")).sortWithinPartitions(col("t"))
      .write.mode("overwrite").parquet(s"$dir/postings")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
    def files() = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val before = files()
    val (deltaPost, newStats) = Retrieval.bm25IndexAppend(delta, "text",
      "doc_id", spark.read.parquet(s"$dir/stats"))
    deltaPost.write.mode("append").parquet(s"$dir/postings")
    newStats.write.mode("overwrite").parquet(s"$dir/stats2")
    // append-only: the release's files survive byte-named; the delta
    // only ADDS files
    assert(before.subsetOf(files()))
    assert(files().size > before.size)
    // posting rows are per-document facts: release ∪ delta rows equal
    // the postings rebuilt from scratch over the full corpus
    val appended = spark.read.parquet(s"$dir/postings")
    val (rebuiltPost, rebuiltStats) =
      Retrieval.bm25Index(all, "text", "doc_id")
    assert(appended.exceptAll(rebuiltPost).count() === 0L)
    assert(rebuiltPost.exceptAll(appended).count() === 0L)
    // the stats decision: the 1-row table is REWRITTEN, derived as
    // released ⊕ delta — and equals the rebuild's row exactly
    val ns = spark.read.parquet(s"$dir/stats2").collect()(0)
    val rs = rebuiltStats.collect()(0)
    assert((ns.getLong(0), ns.getLong(1)) === ((rs.getLong(0), rs.getLong(1))))
    // the equivalence contract a probe actually observes:
    // probe(append(index, delta)) ≡ the live top-k over corpus ∪ delta
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val probed = triples(Retrieval.bm25Probe(appended,
      spark.read.parquet(s"$dir/stats2"), terms, 10))
    assert(probed === triples(Retrieval.bm25TopK(all, "text", "doc_id",
      terms, 10)))
    assert(probed.nonEmpty)
  }
}
