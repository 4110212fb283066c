package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, explode, max}

import graft.SparkSuite

/** Semantics specs for the dedup family: planted exact and near-duplicates
  * must be found; unrelated docs must not be merged. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  // Base corpus: two identical docs (1,2), one near-dup of them (3: one
  // word changed out of 24), and two unrelated docs (4,5).
  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps on the warm mat near the old wooden door today"
  private val nearDup = base.replace("warm", "cold")
  private def corpus: DataFrame = Seq(
    (1L, base), (2L, base), (3L, nearDup),
    (4L, "completely different content about spark query engines and " +
      "distributed shuffle aggregation plans running on large clusters"),
    (5L, "unrelated short text")).toDF("doc_id", "text")

  test("exact dedup keeps min id per identical text and flags copies") {
    val out = Dedup.exact(corpus, "text", "doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(byId(1L) == ((1L, 2L, false)))
    assert(byId(2L) == ((1L, 2L, true)))   // dup of 1
    assert(byId(3L) == ((3L, 1L, false)))  // near-dup is NOT exact-dup
    assert(byId(4L) == ((4L, 1L, false)))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val out = Dedup.minHashLSH(corpus, "text", "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L)
    assert(out(2L) == 1L)  // identical → clustered
    assert(out(3L) == 1L)  // near-dup → clustered
    assert(out(4L) == 4L)  // unrelated → own cluster
    assert(out(5L) == 5L)
  }

  test("simhash clusters near-identical docs within hamming bound") {
    val out = Dedup.simHash(corpus, "text", "doc_id", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L) // identical fingerprints
    assert(out(4L) == 4L)                  // unrelated stays apart
  }

  test("ngram jaccard exact similarity join matches planted dups") {
    val out = Dedup.ngramJaccard(corpus, "text", "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 4L && out(5L) == 5L)
  }

  test("minhash signature approximates jaccard") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, base), (3L, nearDup)).toDF("doc_id", "text")
      .select(col("doc_id"), Shingles.wordShingles(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minHashSignature(col("sh"), 128))
    val Array(a, b) = df.orderBy("doc_id").collect()
    val sigA = a.getSeq[Long](2); val sigB = b.getSeq[Long](2)
    val shA = a.getSeq[Long](1).toSet; val shB = b.getSeq[Long](1).toSet
    val trueJ = shA.intersect(shB).size.toDouble / shA.union(shB).size
    val estJ = sigA.zip(sigB).count { case (x, y) => x == y } / 128.0
    assert(math.abs(trueJ - estJ) < 0.2, s"true=$trueJ est=$estJ")
  }

  test("prefix-filtered ngram jaccard equals brute force on a random corpus") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha","beta","gamma","delta","epsilon","zeta",
      "eta","theta","iota","kappa","lambda","mu")
    // overlapping random docs: enough shared 3-grams to produce pairs
    val docs = (1L to 40L).map { i =>
      val base = Vector.fill(20)(vocab(rnd.nextInt(vocab.size)))
      (i, base.mkString(" "))
    }
    // plant some near-dups
    val planted = docs.take(5).map { case (i, t) =>
      (i + 100L, t.replaceFirst("\\w+", "omega")) }
    val corpus = (docs ++ planted).toDF("doc_id", "text")

    val got = Dedup.ngramJaccard(corpus, "text", "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force: all pairs, exact jaccard, same min-id clustering
    val sh = corpus.select(col("doc_id").as("id"),
      Shingles.wordShingles(col("text"), 3).as("sh"))
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Shingles.jaccard(col("a.sh"), col("b.sh")).as("sim"))
      .filter(col("sim") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val neighborMin = (pairs.map(p => p._2 -> p._1) ++ pairs.map(p => p._1 -> p._2))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = corpus.select("doc_id").collect().map(_.getLong(0))
      .map(id => id -> math.min(id, neighborMin.getOrElse(id, id))).toMap

    assert(got === expected)
  }

  test("gate fixtures stay below the d04 hot-shingle cap (recall-1 precondition)") {
    // ngramJaccard's maxShingleFreq drop is a documented recall
    // approximation; the brute-force oracle comparison is only valid while
    // no shingle's document frequency reaches the cap on the gate
    // fixtures — assert it so fixture growth can't silently break the
    // "recall is exactly 1" justification.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val docs = graft.tables.Tables(spark, dir, "documents")
      val maxDf = docs
        .select(explode(Shingles.wordShingles(col("text"), 3)).as("s"))
        .groupBy(col("s")).count()
        .agg(max(col("count"))).head().getLong(0)
      assert(maxDf < 1000,
        s"$dir: max shingle df $maxDf reaches the 1000 cap — " +
          "the d04 oracle's recall-1 precondition no longer holds")
    }
  }

  test("incremental flags delta docs against the corpus: exact, fuzzy, new") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "completely unrelated corpus document about query engines"),
      (3L, "the quick brown fox jumps over the lazy dog by the river"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (101L, "the quick brown fox jumps over the lazy dog by the river"),  // exact (of 1, min id)
      (102L, "the quick brown fox jumps over the lazy dog by the creek"),  // fuzzy only
      (103L, "entirely new content that matches nothing in the corpus"))   // new
      .toDF("doc_id", "text")
    val out = Dedup.incremental(corpus, delta, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(3)))).toMap
    assert(out(101L)._1 === Some(1L))           // exact match, min corpus id
    assert(out(101L)._2 === Some(1L))           // exact pairs are fuzzy too
    assert(out(101L)._3 === false)
    assert(out(102L)._1 === None)
    assert(out(102L)._2 === Some(1L))
    assert(out(102L)._3 === false)
    assert(out(103L) === ((None, None, true)))
  }

  test("incrementalIndex round-trips through parquet: the stored index " +
      "probe equals the live composition") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "completely unrelated corpus document about query engines"),
      (3L, "the quick brown fox jumps over the lazy dog by the river"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (101L, "the quick brown fox jumps over the lazy dog by the river"),
      (102L, "the quick brown fox jumps over the lazy dog by the creek"),
      (103L, "entirely new content that matches nothing in the corpus"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-d18-idx").toString
    Dedup.incrementalIndex(corpus, "text", "doc_id")
      .write.mode("overwrite").parquet(dir)
    // the stored state is one row per corpus doc with all four columns
    val idx = spark.read.parquet(dir)
    assert(idx.columns.sorted.toSeq === Seq("cid", "csh", "dig", "sig"))
    assert(idx.count() === 3L)
    val viaIndex = Dedup.incrementalProbe(idx, delta, "text", "doc_id",
      threshold = 0.5).collect().map(_.toSeq).toSeq
    val live = Dedup.incremental(corpus, delta, "text", "doc_id",
      threshold = 0.5).collect().map(_.toSeq).toSeq
    assert(viaIndex === live)
  }

  test("chunkDedup drops cross-doc repeated chunks, keeps order") {
    // 4-word chunks; docs 1 and 2 share their first chunk (boilerplate),
    // doc 3 is disjoint. maxDocFreq=1 -> the shared chunk is dropped
    // from both carriers, unique chunks survive in position order.
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, "totally original content right here")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "text", "doc_id",
        chunkWords = 4, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("alpha beta gamma delta", 2L, 1L)))
    assert(out(2L) === (("epsilon zeta eta theta", 2L, 1L)))
    assert(out(3L) === (("totally original content right here", 2L, 0L)))
  }

  test("substringDedup excises repeats at non-chunk-aligned offsets " +
      "chunkDedup misses") {
    // the d08 blind spot: a 5-word span repeated at offsets 2 and 3 —
    // no FIXED 5-word chunk boundary ever lines up with it, so
    // chunkDedup keeps both copies; sliding anchors cover it exactly
    val span = "gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"alpha beta $span theta iota"),         // span at offset 2
      (2L, s"one two three $span four five"),       // span at offset 3
      (3L, "totally unrelated words right here ok")
    ).toDF("doc_id", "text")
    // chunkDedup at the same granularity: nothing dropped (the miss)
    val fixed = Dedup.chunkDedup(docs, "text", "doc_id",
        chunkWords = 5, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(fixed.values.forall(_ === 0L),
      "fixed chunks must miss the unaligned repeat for this test to bite")
    // substringDedup with 3-word anchors: span (5 words >= 3) fully
    // covered in both carriers, at different offsets
    val out = Dedup.substringDedup(docs, "text", "doc_id",
        anchorWords = 3, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === (("alpha beta theta iota", 9L, 5L, 1L)))
    assert(out(2L) === (("one two three four five", 10L, 5L, 1L)))
    assert(out(3L) === (("totally unrelated words right here ok", 6L, 0L, 0L)))
  }

  test("substringDedup: two separated repeats excise as two spans; " +
      "within-doc-only repeats survive") {
    val docs = Seq(
      (1L, "aa bb cc xx yy zz dd ee ff one two three"),
      (2L, "aa bb cc qq dd ee ff four five six"),
      // doc 3 repeats its own trigram twice but shares nothing across
      // docs — cross-doc df stays 1, nothing excised (d09's job)
      (3L, "pp qq2 rr pp qq2 rr seven eight nine")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, "text", "doc_id",
        anchorWords = 3, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // docs 1/2 share "aa bb cc" and "dd ee ff": two maximal spans each
    assert(out(1L) === (("xx yy zz one two three", 12L, 6L, 2L)))
    assert(out(2L) === (("qq four five six", 10L, 6L, 2L)))
    assert(out(3L) === (("pp qq2 rr pp qq2 rr seven eight nine", 9L, 0L, 0L)))
  }

  test("substringDedup: docs shorter than the anchor are untouched; " +
      "null text is empty") {
    val docs = Seq(
      (1L, Option("tiny doc")),
      (2L, Option("tiny doc")),   // identical but < anchorWords words
      (3L, None)
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, "text", "doc_id",
        anchorWords = 5, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === (("tiny doc", 2L, 0L, 0L)))
    assert(out(2L) === (("tiny doc", 2L, 0L, 0L)))
    assert(out(3L) === (("", 1L, 0L, 0L)))
  }

  test("substringDedup: adjacent hot anchors from different partners " +
      "merge into one excised span") {
    // doc 1's words 0..5 are covered by "aa bb cc" (shared with doc 2)
    // and "dd ee ff" (shared with doc 3) ADJACENTLY — one merged span,
    // even though no single partner shares the whole 6-word run
    val docs = Seq(
      (1L, "aa bb cc dd ee ff tail words here"),
      (2L, "aa bb cc other stuff entirely one"),
      (3L, "prefix bit dd ee ff closing words two")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, "text", "doc_id",
        anchorWords = 3, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === (("tail words here", 6L, 1L)))
    assert(out(2L) === (("other stuff entirely one", 3L, 1L)))
    assert(out(3L) === (("prefix bit closing words two", 3L, 1L)))
  }

  test("chunkDedup treats NULL text as empty — no phantom chunks") {
    val docs = Seq((1L, Option("real words here ok")), (2L, None))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "text", "doc_id", chunkWords = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("real words here ok", 1L, 0L)))
    // null text ≡ "" : one empty chunk, kept (df = 1)
    assert(out(2L) === (("", 1L, 0L)))
  }

  test("chunkDedup: fully-boilerplate doc empties; freq threshold holds") {
    val b = "one two three four"
    val docs = Seq(
      (1L, b), (2L, b), (3L, b),      // chunk in 3 docs
      (4L, "five six seven eight")).toDF("doc_id", "text")
    // maxDocFreq=2: df=3 > 2 -> dropped everywhere
    val strict = Dedup.chunkDedup(docs, "text", "doc_id", 4, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strict(1L) === "" && strict(2L) === "" && strict(3L) === "")
    assert(strict(4L) === "five six seven eight")
    // maxDocFreq=3: df=3 <= 3 -> everything kept
    val lax = Dedup.chunkDedup(docs, "text", "doc_id", 4, maxDocFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lax(1L) === b && lax(3L) === b)
  }

  test("transitive clusters merge duplicate chains the one-hop form splits") {
    // chain: 1 ~ 2 (one word changed) and 2 ~ 3 (one more word changed)
    // but 1 !~ 3 at this threshold — the transitive closure puts all
    // three in cluster 1, while one-hop assigns 3 its min NEIGHBOR (2)
    val d3 = nearDup.replace("dog", "cat")
    val chain = Seq((1L, base), (2L, nearDup), (3L, d3),
      (4L, "completely unrelated text about query planners"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(chain, "text", "doc_id",
      threshold = 0.65)
    val sims = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims.contains((1L, 2L)) && sims.contains((2L, 3L)) &&
      !sims.contains((1L, 3L)), s"fixture sims: $sims")

    val trans = ConnectedComponents.clusterReps(chain, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(trans === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))

    val oneHop = Dedup.ngramJaccard(chain, "text", "doc_id",
        threshold = 0.65)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneHop(3L) === 2L) // one-hop stops at the direct neighbor
  }

  test("intraDocDedup keeps first occurrence of a repeated chunk, in order") {
    val docs = Seq(
      (1L, "click here now click here now buy stuff today"),
      (2L, "no repeats in this doc at all ok")).toDF("doc_id", "text")
    // 3-word chunks: doc 1 = [click here now, click here now, buy stuff
    // today] -> second occurrence dropped; doc 2 untouched (chunks
    // [no repeats in, this doc at, all ok])
    val out = Dedup.intraDocDedup(docs, "text", "doc_id", chunkWords = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("click here now buy stuff today", 3L, 1L)))
    assert(out(2L) === (("no repeats in this doc at all ok", 3L, 0L)))
  }

  test("canonicalize picks the longest doc per cluster, ties by min id") {
    import org.apache.spark.sql.functions.col
    val dedup = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // one cluster keyed 1
      (4L, 4L)).toDF("id", "keep_id") // singleton
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L),   // 2 and 3 tie on length -> 2 wins
      (4L, 2L)).toDF("doc_id", "n_chars")
    val out = Dedup.canonicalize(dedup, docs, "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) === (2L, true))
    assert(out(2L) === (2L, false))
    assert(out(3L) === (2L, true))
    assert(out(4L) === (4L, false))
  }

  test("minhashEstimate: identical docs agree on all permutations, " +
    "disjoint docs on none, estimate tracks exact jaccard") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),     // identical to 1
      (3L, "alpha beta gamma delta epsilon eta"),      // near-dup of 1
      (4L, "one two three four five six"))             // disjoint
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.minhashEstimate(docs, "text", "doc_id", pairs, k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out((1L, 2L)) === ((16L, 1000000L, 1000000L)))   // identical
    assert(out((1L, 4L))._1 === 0L)                         // disjoint
    assert(out((1L, 4L))._3 === 0L)
    val (agree13, est13, exact13) = out((1L, 3L))
    // 4 shingles each, 3 shared -> exact jaccard 3/5 = 600000 ppm; the
    // 16-perm estimate must be a plausible draw around it
    assert(exact13 === 600000L)
    assert(agree13 >= 4L && agree13 <= 15L, s"agree=$agree13")
    assert(est13 === agree13 * 1000000L / 16L)
    intercept[IllegalArgumentException](
      Dedup.minhashEstimate(docs, "text", "doc_id", pairs, k = 0))
  }

  test("dedupPipeline: exact tier, transitive fuzzy tier, longest canonical") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, base),                 // fuzzy-dups with 3 (J = 7/8)
      (2L, base),                 // exact dup of 1
      (3L, base + " tonight"),    // longest in the cluster -> canonical
      (4L, "completely different text with no overlap at all ok"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
    val out = Dedup.dedupPipeline(docs, "text", "doc_id", "n_chars",
        threshold = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((1L, 1L, 3L, false)))   // cluster kept by 3
    assert(out(2L) === ((1L, 1L, 3L, false)))   // exact dup follows 1
    assert(out(3L) === ((3L, 1L, 3L, true)))    // longest wins
    assert(out(4L) === ((4L, 4L, 4L, true)))    // singleton survives
  }

  test("thresholdSweep: hand-computed counts per threshold, one pair set") {
    import spark.implicits._
    // shingle sets (3-grams): doc1/doc2 identical (4 shingles, J = 1.0);
    // doc3 shares 3 of 5 union with them (J = 3/5 = 0.6 exactly — the
    // boundary case: both engines compute 3.0/5.0 and compare to the
    // same 0.6 double, so >= holds at t = 0.6 and fails at 0.7);
    // doc4 is disjoint.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "a b c d e x"),
      (4L, "q r s t u v")
    ).toDF("doc_id", "text")
    val out = Dedup.thresholdSweep(docs, "text", "doc_id",
        thresholds = Seq(0.5, 0.6, 0.7, 0.8, 0.9))
      .collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // t <= 0.6: pairs (1,2) J=1, (1,3) J=.6, (2,3) J=.6 -> 3 pairs,
    // docs {1,2,3}, dropped = distinct id_b {2,3}, ppm = 2e6 div 4
    assert(out(0.5) === ((3L, 3L, 2L, 500000L)))
    assert(out(0.6) === ((3L, 3L, 2L, 500000L)))
    // t >= 0.7: only the exact pair (1,2) survives
    assert(out(0.7) === ((1L, 2L, 1L, 250000L)))
    assert(out(0.8) === ((1L, 2L, 1L, 250000L)))
    assert(out(0.9) === ((1L, 2L, 1L, 250000L)))
    intercept[IllegalArgumentException](
      Dedup.thresholdSweep(docs, "text", "doc_id", thresholds = Nil))
  }

  test("thresholdSweep: a threshold with zero pairs keeps its zero row") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "q r s t u v"))
      .toDF("doc_id", "text")
    val out = Dedup.thresholdSweep(docs, "text", "doc_id",
        thresholds = Seq(0.5, 0.9))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(4)))
    assert(out.toSeq === Seq((0.5, 0L, 0L), (0.9, 0L, 0L)))
  }

  /** The engine's exact-fixed-point S-curve, replayed locally: both
    * powers as iterated `acc·x DIV 1e6` integer floors (Long is enough:
    * intermediates cap at 1e12). */
  private def sCurvePpm(jPpm: Long, bands: Int, rows: Int): Long = {
    val sR = (1 to rows).foldLeft(1000000L)((acc, _) => acc * jPpm / 1000000L)
    1000000L - (1 to bands).foldLeft(1000000L)(
      (acc, _) => acc * (1000000L - sR) / 1000000L)
  }

  test("lshPlan: hand-traced S-curve on exact-jaccard pairs, every " +
      "factorization row replayed in integer arithmetic") {
    import spark.implicits._
    // exact jaccards by construction (3-word shingles):
    // (1,2) identical -> j_ppm = 1000000; (1,3)/(2,3) share 3 of 5
    // shingles -> j_ppm = 1000000*3 DIV 5 = 600000; doc4 overlaps only
    // {a b c} with doc1 (1/7 = 142857 < the 0.5 floor); doc5 disjoint.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "a b c d e x"),
      (4L, "a b c x y z"), (5L, "q r s t u v")).toDF("doc_id", "text")
    val out = Dedup.lshPlan(docs, "text", "doc_id", numHashes = 12,
        floorThreshold = 0.5)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // one row per divisor factorization of 12
    assert(out.keySet === Set((1, 12), (2, 6), (3, 4), (4, 3), (6, 2),
      (12, 1)))
    val pairJs = Seq(1000000L, 600000L, 600000L)
    out.foreach { case ((b, r), (indexRows, nPairs, expFound, meanP, minP)) =>
      assert(indexRows === b.toLong * 5L)   // bands x n_docs
      assert(nPairs === 3L)                 // the verified pair set
      val ps = pairJs.map(j => sCurvePpm(j, b, r))
      assert(expFound === ps.sum, s"($b,$r) exp_found")
      assert(meanP === ps.sum / 3L, s"($b,$r) mean_p")
      assert(minP === ps.min, s"($b,$r) min_p")
    }
    // two rows traced fully by hand (not via the replay helper):
    // (6,2), j=600000: s_r = 360000; (1e6-360000)=640000 folded 6x ->
    // 640000, 409600, 262144, 167772, 107374, 68719 -> p = 931281
    assert(out((6, 2))._5 === 931281L)
    // (1,12), j=600000: s_r after 12 x0.6 floors = 2176; one band ->
    // p = s_r itself
    assert(out((1, 12))._5 === 2176L)
    // identical pair: s_r = 1e6 at any r, so every config detects it
    // with certainty -> exp_found - 2 x (the 600000 curve) = exactly 1e6
    assert(out((4, 3))._3 - 2L * sCurvePpm(600000L, 4, 3) === 1000000L)
  }

  test("lshPlan: recall surface is monotone in bands; n_pairs matches " +
      "the d04 pair join at the floor") {
    import spark.implicits._
    val docs = corpus  // the planted near-dup fixture
    val rows = Dedup.lshPlan(docs, "text", "doc_id", numHashes = 16,
        floorThreshold = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getLong(6)))
    // ordered by bands: fewer rows per band => every verified pair's
    // detect probability rises => the worst pair's odds never fall
    val byBands = rows.sortBy(_._1)
    byBands.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 >= a._3, s"min_p fell from bands=${a._1} to ${b._1}")
      case _ => ()
    }
    // the planner prices the SAME pair population x08/d04 verify: every
    // factorization row carries the exact pair count at the floor
    val nPairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      shingleLen = 3, threshold = 0.5).count()
    assert(nPairs > 0L)
    rows.foreach { case (b, n, _) => assert(n === nPairs, s"bands=$b") }
    // a pairless corpus keeps its zero rows (left join + coalesce)
    val lonely = Seq((1L, "a b c d e f"), (2L, "q r s t u v"))
      .toDF("doc_id", "text")
    val zero = Dedup.lshPlan(lonely, "text", "doc_id", numHashes = 4)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(6)))
    assert(zero.forall { case (ir, n, p) => ir > 0L && n === 0L && p === 0L })
    intercept[IllegalArgumentException](
      Dedup.lshPlan(docs, "text", "doc_id", numHashes = 0))
  }

  test("planLsh picks the cheapest factorization meeting the target; " +
      "conservative fallback when nothing qualifies") {
    import spark.implicits._
    // the hand-traced fixture: verified pairs at j_ppm {1e6, 6e5, 6e5},
    // so min_p per factorization is the j=600000 S-curve — by bands:
    // (1,12)=2176 (2,6)=91136 (3,4)=340589 (4,3)=622199 (6,2)=931281
    // (12,1)=999984
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "a b c d e x"),
      (4L, "a b c x y z"), (5L, "q r s t u v")).toDF("doc_id", "text")
    def pick(target: Long) = Dedup.planLsh(docs, "text", "doc_id",
      targetMinPpm = target, numHashes = 12, floorThreshold = 0.5)
    assert(pick(900000L) === ((6, 2)))   // 931281 qualifies, 622199 not
    assert(pick(999990L) === ((12, 1)))  // only the max-recall shape
    assert(pick(2000L) === ((1, 12)))    // even one band clears it
    // unreachable target -> highest-recall fallback, never a quiet
    // under-detection
    assert(pick(1000000L) === ((12, 1)))
    // pairless corpus: nothing to price -> same conservative fallback
    val lonely = Seq((1L, "a b c d e f"), (2L, "q r s t u v"))
      .toDF("doc_id", "text")
    assert(Dedup.planLsh(lonely, "text", "doc_id", targetMinPpm = 900000L,
      numHashes = 12) === ((12, 1)))
    intercept[IllegalArgumentException](
      Dedup.planLsh(docs, "text", "doc_id", targetMinPpm = -1L))
  }

  test("pickLsh: the pick rule alone over a collected surface") {
    // (bands, rows_per_band, n_pairs, min_p_ppm)
    val surface = Seq((1, 8, 3L, 2000L), (2, 4, 3L, 500000L),
      (4, 2, 3L, 960000L), (8, 1, 3L, 999999L))
    assert(Dedup.pickLsh(surface, 950000L) === ((4, 2)))
    assert(Dedup.pickLsh(surface, 990000L) === ((8, 1)))
    assert(Dedup.pickLsh(surface, 1000L) === ((1, 8)))
    // nothing qualifies -> max-recall fallback
    assert(Dedup.pickLsh(surface, 1000000L) === ((8, 1)))
    // unpriced surface (zero pairs everywhere) -> same fallback
    assert(Dedup.pickLsh(surface.map(s => s.copy(_3 = 0L)), 1000L)
      === ((8, 1)))
    intercept[IllegalArgumentException](Dedup.pickLsh(Nil, 1000L))
  }

  test("minHashLSHWith: the planned factorization reproduces the " +
      "default shape's clusters exactly") {
    // the factorization is a cost/recall knob — every candidate is
    // exactly verified, so clusters must be identical across shapes
    val default = Dedup.minHashLSH(corpus, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planned = Dedup.minHashLSHWith(corpus, "text", "doc_id",
        bands = 64, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planned === default)
    intercept[IllegalArgumentException](
      Dedup.minHashLSHWith(corpus, "text", "doc_id", bands = 0,
        rowsPerBand = 2))
  }
}
