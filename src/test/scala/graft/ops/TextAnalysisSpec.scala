package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("langId picks the profile with most stopword hits") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el gato es un animal que vive en la casa"),
      (3L, "der hund ist ein tier und die katze ist klein"),
      (4L, "le chat est dans la maison et il est chaud"),
      (5L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.langIdOf(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
    assert(out(4L) == "fr")
    assert(out(5L) == "und")
  }

  test("token counts: chars, whitespace words, subword pieces") {
    val df = Seq((1L, "Hello, world! It's 42."), (2L, ""), (3L, "  a  b  "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenCounts(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((22, 4, 9)))  // Hello , world ! It ' s 42 .
    assert(out(2L) == ((0, 0, 0)))
    assert(out(3L) == ((8, 2, 2)))
  }

  test("quality score rewards long alphabetic low-punct text") {
    val good = (1L, ("word " * 30).trim)
    val bad = (2L, "!!! ??? ... ;;; ### @@@")
    val df = Seq(good, bad).toDF("doc_id", "text")
    val out = TextAnalysis.qualityScore(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(7)).toMap
    assert(out(1L) >= 0.8)
    assert(out(2L) <= 0.2)
  }

  test("cleanText strips tags, masks URLs/emails, collapses whitespace") {
    val df = Seq(
      (1L, "<p>Hello <b>world</b></p>\n\nVisit https://example.com/a?b=1 now"),
      (2L, "contact me at jane.doe+spam@mail.example.org   today"),
      (3L, "ctrl\u0001chars\u0007here\u007F gone"),
      (4L, "  already   clean  text  "),
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.cleaned(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Hello world Visit <URL> now")
    assert(out(2L) == "contact me at <EMAIL> today")
    assert(out(3L) == "ctrlcharshere gone")
    assert(out(4L) == "already clean text")
    assert(out(5L) == "")
  }

  test("piiRedact masks emails, phones, IPv4 and counts each match") {
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org and d@e.io please"),
      (2L, "call +1-555-0142 or +44-207-9460 soon"),
      (3L, "host 192.168.0.1 peered with 10.0.0.254"),
      (4L, "version 1.2.3 costs +5 dollars, no pii here"),
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) === (("mail <EMAIL> and <EMAIL> please", 2, 0, 0)))
    assert(out(2L) === (("call <PHONE> or <PHONE> soon", 0, 2, 0)))
    assert(out(3L) === (("host <IP> peered with <IP>", 0, 0, 2)))
    // dotted versions (3 octets) and bare "+5" must NOT be redacted
    assert(out(4L) === (("version 1.2.3 costs +5 dollars, no pii here",
      0, 0, 0)))
    assert(out(5L) === (("", 0, 0, 0)))
  }

  test("winnowing fingerprints: shared for near-dups, robust to edits") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val edited = base.replace("river", "creek")
    val df = Seq((1L, base), (2L, base), (3L, edited)).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprints(df, "text", "doc_id")
      .select("id", "fps").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(out(1L) == out(2L))                    // identical docs, identical fps
    val overlap = out(1L).intersect(out(3L)).size.toDouble / out(1L).size
    assert(overlap > 0.5, s"local edit should preserve most fingerprints: $overlap")
    assert(out(1L) != out(3L))                    // but not all
  }

  test("fingerprints are a winnowing subset of all k-gram hashes") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text")
    val n = TextAnalysis.fingerprints(df, "text", "doc_id")
      .select("n_fps").head().getInt(0)
    // 26 chars → 19 8-grams → 16 windows of 4 → ≤16 distinct mins, ≥5 (19/4)
    assert(n >= 5 && n <= 16)
  }

  test("gopherStats flags repetitive and vocabulary-collapsed docs") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "a diverse sentence with many different interesting words here now"),
      (3L, "ab ab cd cd ef ef gh gh ij ij")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherStats(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: one word repeated 10x -> top_ratio 1.0, distinct_ratio 0.1
    assert(out(1L).getAs[Double]("top_ratio") === 1.0)
    assert(!out(1L).getAs[Boolean]("keep"))
    // doc 2: all-distinct words of healthy length -> keep
    assert(out(2L).getAs[Int]("n_distinct") === out(2L).getAs[Int]("n_words"))
    assert(out(2L).getAs[Boolean]("keep"))
    // doc 3: mean word length 2 -> fails the [3, 10] band
    assert(out(3L).getAs[Double]("mean_word_len") === 2.0)
    assert(!out(3L).getAs[Boolean]("keep"))
  }

  test("topNgrams counts bigrams, breaks ties by gram, skips 1-word docs") {
    val df = Seq(
      (1L, "to be or not to be"),
      (2L, "single"),
      (3L, "to be honest")).toDF("doc_id", "text")
    val out = TextAnalysis.topNgrams(df, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head === ("to be", 3L))     // 2x doc1 + 1x doc3
    // remaining all have count 1 -> ordered by gram text
    assert(out.drop(1).map(_._2).forall(_ == 1L))
    assert(out.drop(1).map(_._1) === out.drop(1).map(_._1).sorted)
  }

  test("contamination finds planted probe overlap, skips self and disjoint") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "a completely different document about query engines and joins"),
      (3L, "unrelated text with its own words entirely elsewhere")).toDF("doc_id", "text")
    // probe 101 = doc 1 with a small edit; probe 102 = disjoint
    val probes = Seq(
      (101L, "the quick brown fox jumps over the lazy dog by the creek"),
      (102L, "nothing in common with anything above at all")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, "text", "doc_id",
        probes, "text", "doc_id", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 101L)))          // near-identical -> flagged
    assert(!out.exists(_._2 == 102L))         // disjoint probe never fires
    assert(!out.exists(p => p._1 == p._2))    // no self-pairs
  }

  test("contamination stored fingerprint index: the bucket-partitioned " +
      "parquet round trip returns the live operator's exact verdicts") {
    val corpus = graft.tables.Tables(spark, sf, "documents")
    val probes = corpus.filter(col("doc_id") < 20)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-t29-idx").toString
    TextAnalysis.contaminationIndex(corpus, "text", "doc_id")
      .write.mode("overwrite").partitionBy("fpb").parquet(dir)
    val stored = spark.read.parquet(dir)
    // the bucket column survives the directory round trip as the
    // partition column, and the inverted rows are bucket-consistent
    assert(stored.filter(pmod(col("fp"), lit(64)).cast("int") =!=
      col("fpb")).count() === 0L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val probed = rows(TextAnalysis.contaminationProbe(stored,
      probes, "text", "doc_id"))
    val live = rows(TextAnalysis.contamination(corpus, "text", "doc_id",
      probes, "text", "doc_id"))
    assert(probed === live)
    assert(probed.nonEmpty)
    // a buckets value that differs from the index's build modulus would
    // silently drop join matches (false negatives in a safety check) —
    // rejected against a bounded sample of the stored rows
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.contaminationProbe(stored, probes, "text", "doc_id",
        buckets = 128)
    }
    assert(e.getMessage.contains("buckets"), e.getMessage)
    intercept[IllegalArgumentException] {
      TextAnalysis.contaminationProbe(stored, probes, "text", "doc_id",
        buckets = 0)
    }
  }

  test("contaminationIndexAppend: partition-wise delta into the fpb " +
      "layout — untouched buckets keep their exact files, appended " +
      "probe equals a full rebuild's, wrong modulus rejected") {
    val all = graft.tables.Tables(spark, sf, "documents")
    val released = all.filter(col("doc_id") < 400)
    val delta = all.filter(col("doc_id") >= 400)
    val probes = all.filter(col("doc_id") < 20)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-t31-idx").toString
    TextAnalysis.contaminationIndex(released, "text", "doc_id")
      .write.mode("overwrite").partitionBy("fpb").parquet(dir)
    def filesByPartition(): Map[String, Set[String]] = {
      val base = new java.io.File(dir)
      base.listFiles().filter(_.isDirectory)
        .map(p => p.getName -> p.listFiles().map(_.getName).toSet).toMap
    }
    val before = filesByPartition()
    val appendRows = TextAnalysis.contaminationIndexAppend(
      spark.read.parquet(dir), delta, "text", "doc_id").cache()
    try {
      appendRows.write.mode("append").partitionBy("fpb").parquet(dir)
      val after = filesByPartition()
      // nothing shipped is rewritten: untouched buckets keep their
      // exact file sets; touched ones only GAIN (the e22 invariant)
      val touched = appendRows.select("fpb").distinct()
        .as[Int].collect().map(b => s"fpb=$b").toSet
      before.foreach { case (part, fs) =>
        if (touched.contains(part))
          assert(fs.subsetOf(after(part)), s"$part lost files")
        else assert(after(part) === fs, s"$part was rewritten")
      }
      // fingerprint rows are per-document facts: the appended store
      // row-set-equals the index rebuilt over the full corpus
      val appended = spark.read.parquet(dir)
      val rebuild = TextAnalysis.contaminationIndex(all, "text", "doc_id")
        .select("cid", "fp", "fpb")
      assert(appended.select("cid", "fp", "fpb")
        .exceptAll(rebuild).count() === 0L)
      assert(rebuild.exceptAll(
        appended.select("cid", "fp", "fpb")).count() === 0L)
      // and the contract a probe observes: appended verdicts ≡ live
      // verdicts over corpus ∪ delta
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      val probed = rows(TextAnalysis.contaminationProbe(appended,
        probes, "text", "doc_id"))
      assert(probed === rows(TextAnalysis.contamination(all, "text",
        "doc_id", probes, "text", "doc_id")))
      assert(probed.nonEmpty)
    } finally { appendRows.unpersist(); () }
    // a wrong modulus on the APPEND path would scatter the delta into
    // the wrong partitions permanently — rejected against the stored
    // sample, same check as the probe's
    intercept[IllegalArgumentException] {
      TextAnalysis.contaminationIndexAppend(spark.read.parquet(dir),
        delta, "text", "doc_id", buckets = 128)
    }
  }

  test("tokenRarity: exact corpus-frequency signals per doc") {
    val df = Seq(
      (1L, "the the cat"),        // corpus freqs: the=3, cat=2
      (2L, "the cat zzyx"),       // zzyx is a hapax
      (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenRarity(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    //                 n_tokens sum_freq      min_freq n_hapax
    assert(out(1L) === ((3L, 3L + 3L + 2L, 2L, 0L)))
    assert(out(2L) === ((3L, 3L + 2L + 1L, 1L, 1L)))
    assert(!out.contains(3L))    // whitespace-only doc has no tokens
  }

  test("vocabStats: tokens, types, hapax, top-10 mass — hand-computed") {
    // corpus tokens: a×4, b×3, then 10 distinct singletons c..l
    val docs = Seq((1L, "a a b c d e f"), (2L, "a a b b g h i j k l"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.vocabStats(docs, "text").collect().head
    assert(r.getLong(0) === 17L)   // n_tokens
    assert(r.getLong(1) === 12L)   // n_types: a, b + 10 singletons
    assert(r.getLong(2) === 10L)   // n_hapax
    // top-10 by count: a(4), b(3), then 8 of the singletons = 15
    assert(r.getLong(3) === 15L)
  }

  test("bigramLmScore: add-one smoothed integer scores, hand-computed") {
    // corpus: U(a)=2 U(b)=3 U(c)=1 U(x)=1, V=4; B(a,b)=2 B(b,a)=1 B(b,c)=1
    // term = floor(1e9 * (B+1) / (U(w1)+V)):
    //   (a,b) -> 3e9/6  = 500000000
    //   (b,a) -> 2e9/7  = 285714285
    //   (b,c) -> 2e9/7  = 285714285
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 3L, 1285714285L),   // 500000000 + 285714285 + 500000000
      (2L, 1L, 285714285L),
      (3L, 0L, 0L)))           // single-word doc: no bigrams
  }

  test("perplexityBuckets: value-based terciles, hand-computed; ties share") {
    // U(a)=U(b)=5, singles c,d,e,f,x; V=7
    // s(a,b) = floor(6e9/12) = 500000000; s(b,a) = s(c,d) = s(e,f) =
    // floor((B+1)e9/(U+7)) = 250000000
    // means: doc3 500000000 | doc1=doc2 (identical) 416666666 |
    //        doc4=doc5 250000000 | doc6 (no bigrams) 0
    // n=6 -> r1=2, r2=4; b1 = largest mean with >=-count >= 2 =
    // 416666666 (ties pull BOTH copies into head, head grows to 3);
    // b2 = 250000000. Boundaries land in coarse cells 106 and 64 —
    // both phases of the histogram search run.
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b a b"), (3L, "a b"),
      (4L, "c d"), (5L, "e f"), (6L, "x")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 416666666L, "head"), (2L, 416666666L, "head"),
      (3L, 500000000L, "head"),
      (4L, 250000000L, "middle"), (5L, 250000000L, "middle"),
      (6L, 0L, "tail")))
  }

  test("perplexityBuckets: an all-tied corpus is all head") {
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "p q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq === Seq((1L, "head"), (2L, "head"), (3L, "head")))
  }

  test("slidingChunks covers every word with overlap; final chunk may be short") {
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "x y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.slidingChunks(docs, "text", "doc_id",
        window = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, "a b c d", 4L), (1L, 1L, "c d e f", 4L),
      (1L, 2L, "e f g h", 4L), (1L, 3L, "g h i", 3L),
      (2L, 0L, "x y", 2L)))
  }

  test("slidingChunks: stride = window is disjoint; bad strides rejected") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = TextAnalysis.slidingChunks(docs, "text", "doc_id", 2, 2)
      .collect().map(r => (r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(("a b", 2L), ("c d", 2L), ("e", 1L)))
    intercept[IllegalArgumentException](
      TextAnalysis.slidingChunks(docs, "text", "doc_id", 2, 3))
    intercept[IllegalArgumentException](
      TextAnalysis.slidingChunks(docs, "text", "doc_id", 0, 1))
  }

  test("heavyHitters equals brute force on a skewed corpus, any partitioning") {
    // planted zipf-ish skew: "alpha" dominates, a long uniform tail keeps
    // the Misra-Gries summaries churning (decrement events fire)
    val docs = (1 to 120).map { i =>
      val tail = (1 to 40).map(j => s"w${(i * 7 + j) % 97}").mkString(" ")
      (i.toLong, s"alpha beta alpha $tail alpha gamma")
    }
    val k = 25
    def bruteForce(df: org.apache.spark.sql.DataFrame) = {
      val toks = df.select(explode(split(lower(trim(col("text"))), "\\s+"))
        .as("token")).filter(col("token") =!= "")
      val total = toks.count()
      toks.groupBy("token").count()
        .filter(col("count") * k > lit(total))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = docs.toDF("doc_id", "text").repartition(parts)
      val got = TextAnalysis.heavyHitters(df, "text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === bruteForce(df), s"parts=$parts")
      assert(got.contains("alpha"), s"parts=$parts")
    }
  }

  test("heavyHitters equals brute force on randomized corpora (fixed seed)") {
    // randomized distributions exercise the decrement path from many
    // angles (uniform, zipf-ish, adversarial alternation); seed fixed so
    // failures reproduce
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      val vocabSize = 20 + rnd.nextInt(200)
      val k = 2 + rnd.nextInt(40)
      val docs = (1 to 30).map { i =>
        val words = (1 to 50 + rnd.nextInt(100)).map { _ =>
          // skew: token ids drawn as min of two uniforms -> low ids common
          val a = rnd.nextInt(vocabSize); val b = rnd.nextInt(vocabSize)
          s"w${math.min(a, b)}"
        }
        (i.toLong, words.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(8))
      val toks = df.select(explode(split(lower(trim(col("text"))), "\\s+"))
        .as("token")).filter(col("token") =!= "")
      val total = toks.count()
      val brute = toks.groupBy("token").count()
        .filter(col("count") * k > lit(total))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = TextAnalysis.heavyHitters(df, "text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === brute, s"trial=$trial vocab=$vocabSize k=$k")
    }
  }

  test("heavyHitters recount join broadcasts the candidate set") {
    val df = (1 to 50).map(i => (i.toLong, s"x y z w$i")).toDF("doc_id", "text")
    val q = TextAnalysis.heavyHitters(df, "text", k = 4)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("readability: counts, fixed-point ratios, degenerate docs") {
    // "See the cat. It sat!" — 5 words, 2 sentence runs; vowel runs:
    // ee, e, a, i, a = 5 syllables
    val docs = Seq(
      (1L, "See the cat. It sat!"),
      (2L, ""),           // empty: all counts 0, ratios 0 by convention
      (3L, "zzz grr")     // no vowels, no sentence marks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getLong(1) === 5L)  // n_words
    assert(out(1L).getLong(2) === 2L)  // n_sentences ('.', '!')
    assert(out(1L).getLong(3) === 5L)  // n_syllables
    // wps6 = 5*1e6 DIV 2 = 2500000; spw6 = 5*1e6 DIV 5 = 1000000
    assert(out(1L).getDouble(4) === 2.5)
    assert(out(1L).getDouble(5) === 1.0)
    // fk6 = 39*2500000 DIV 100 + 118*1000000 DIV 10 - 15590000
    //     = 975000 + 11800000 - 15590000 = -2815000
    assert(out(1L).getDouble(6) === -2.815)
    // re6 = 206835000 - 1015*2500000 DIV 1000 - 846*1000000 DIV 10
    //     = 206835000 - 2537500 - 84600000 = 119697500
    assert(out(1L).getDouble(7) === 119.6975)

    assert(out(2L).getLong(1) === 0L)
    assert(out(2L).getDouble(4) === 0.0 && out(2L).getDouble(5) === 0.0)
    // all-zero ratios: fk = -15.59, ease = 206.835 (the formula constants)
    assert(out(2L).getDouble(6) === -15.59)
    assert(out(2L).getDouble(7) === 206.835)

    assert(out(3L).getLong(2) === 0L && out(3L).getLong(3) === 0L)
  }

  test("readability: the regex counts sit behind an exchange barrier") {
    // one Exchange between counting and ratio layers, so CollapseProject
    // cannot re-inline the three regex subtrees into the CASE branches.
    // (repartition on the input keeps ConvertToLocalRelation from
    // constant-folding the whole pipeline at optimize time)
    val docs = Seq((1L, "a b. c")).toDF("doc_id", "text").repartition(2)
    val q = TextAnalysis.readability(docs, "text", "doc_id")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("RepartitionByExpression"), plan)
    // the regex counting appears exactly once per count column
    assert("regexp_extract_all".r.findAllIn(plan).size === 2, plan)
  }

  test("noveltyScore: unique-shingle fraction, short-doc fallback") {
    // doc 1 and 2 share the shingle "a b c"; doc 1 has one unique
    // shingle ("b c d"); doc 3 is short (<3 words) -> whole-text shingle
    val docs = Seq(
      (1L, "a b c d"),      // shingles: "a b c", "b c d"
      (2L, "a b c"),        // shingle:  "a b c"  (df 2, not unique)
      (3L, "zz yy")         // short fallback: unique whole text
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((1L, 0L, 0.0)))   // boilerplate: nothing unique
    assert(out(3L) === ((1L, 1L, 1.0)))
  }

  test("vocabGrowth: exact prefix checkpoints, hand-computed") {
    // ids 1..10; doc i has text "w<i> shared" -> each prefix of k docs
    // has k+1 types (k unique + "shared"), 2k tokens, k docs
    val docs = (1L to 10L).map(i => (i, s"w$i shared")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, "text", "doc_id",
        pcts = Seq(50, 100))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(50) === ((5L, 5L, 10L, 6L)))     // thr=5: 5 docs, 10 tok
    assert(out(100) === ((10L, 10L, 20L, 11L)))
    intercept[IllegalArgumentException](
      TextAnalysis.vocabGrowth(docs, "text", "doc_id", pcts = Seq(0)))
  }

  test("mojibakeScore: counts, ppm, and the clean-text zero") {
    val df = Seq(
      (1L, "clean ascii text"),                    // 16 chars, all clean
      (2L, "cafÃ© mis-decoded"),         // one Ã mark
      (3L, "lost��bytes"),               // two U+FFFD
      (4L, "itâ€™s fine"),          // â€™ curly-quote moji
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.mojibakeScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out(1L) === ((16L, 0L, 0L, 0L, false)))
    assert(out(2L) === ((17L, 0L, 1L, 58823L, true)))
    assert(out(3L) === ((11L, 2L, 0L, 181818L, true)))
    assert(out(4L) === ((11L, 0L, 1L, 90909L, true)))
    assert(out(5L) === ((0L, 0L, 0L, 0L, false)))   // no div-by-zero
    intercept[IllegalArgumentException](
      TextAnalysis.mojibakeScore(df, "text", "doc_id", suspectPpm = -1))
  }

  test("bpePairCounts: hand pairs, 1-char words drop, ties by pair") {
    import spark.implicits._
    val df = Seq(
      (1L, "ab ab x"),      // ab twice, x contributes nothing
      (2L, "abc"),          // ab, bc
      (3L, "AB cd"))        // lowercased: ab again; cd once
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpePairCounts(df, "text", "doc_id", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ab: 4 occurrences across docs {1, 2, 3}; bc and cd tie at 1 and
    // order by pair text
    assert(out.toSeq === Seq(
      ("ab", 4L, 3L), ("bc", 1L, 1L), ("cd", 1L, 1L)))
    intercept[IllegalArgumentException](
      TextAnalysis.bpePairCounts(df, "text", "doc_id", k = 0))
  }

  test("filterChain: one doc per gate, chain-ordered reject reasons") {
    import spark.implicits._
    val good = "the cat sat of the mat and it is that good for all to " +
      "see in every way here now"
    val df = Seq(
      (1L, good),                                   // passes every gate
      (2L, "!!! ??? ... ;;; :::"),                  // quality 0.0
      (3L, Array.fill(25)("spam").mkString(" ")),   // top_ratio 1.0
      (4L, good.replace("cat", "cÃ©t")),            // latin-1 mojibake
      (5L, "el perro grande corre por la casa blanca y que los gatos " +
        "en un jardin verde son una vista es muy bonita para todos aqui"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.filterChain(df, "text", "doc_id",
        allowedLangs = Seq("en", "de", "fr"), minQuality = 0.6)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(5), Option(r.getString(6))))).toMap
    assert(out(1L) === ((true, None)))
    assert(out(2L) === ((false, Some("quality"))))
    assert(out(3L) === ((false, Some("repetition"))))
    assert(out(4L) === ((false, Some("encoding"))))
    assert(out(5L) === ((false, Some("language"))))
    intercept[IllegalArgumentException](
      TextAnalysis.filterChain(df, "text", "doc_id", Seq.empty))
  }

  test("quoteContainment: directional ppm, self-pair excluded, short-doc fallback") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"),          // probe: shingles {a b c, b c d, c d e}
      (2L, "x a b c d y z"),      // contains {a b c, b c d} -> 2/3
      (3L, "c d e q r s t"),      // contains {c d e} -> 1/3
      (4L, "nothing shared here"),
      (5L, "hi"))                 // short probe: whole-text shingle
      .toDF("doc_id", "text")
    val probes = corpus.filter($"doc_id" === 1L || $"doc_id" === 5L)
    val out = TextAnalysis.quoteContainment(corpus, "text", "doc_id",
        probes, "text", "doc_id", n = 3, minPpm = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out((1L, 2L)) === ((2L, 3L, 666666L)))
    assert(out((1L, 3L)) === ((1L, 3L, 333333L)))
    assert(!out.contains((1L, 1L)))           // self excluded
    assert(!out.contains((1L, 4L)))           // no shared shingles
    assert(!out.keys.exists(_._1 == 5L))      // "hi" appears nowhere else
    // threshold keeps only the 2/3 match
    val cut = TextAnalysis.quoteContainment(corpus, "text", "doc_id",
        probes, "text", "doc_id", n = 3, minPpm = 500000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cut.toSeq === Seq((1L, 2L)))
    intercept[IllegalArgumentException](
      TextAnalysis.quoteContainment(corpus, "text", "doc_id", probes,
        "text", "doc_id", n = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.quoteContainment(corpus, "text", "doc_id", probes,
        "text", "doc_id", minPpm = 2000000))
  }

  test("bpePairCounts: multibyte characters pair per code point") {
    import spark.implicits._
    val df = Seq((1L, "héllo héllo")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairCounts(df, "text", "doc_id", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(
      ("hé", 2L), ("ll", 2L), ("lo", 2L), ("él", 2L)))
  }

  test("bpeSegment: hand-segmented fixtures incl. multi-round merge chains") {
    val df = Seq(
      (1L, "The TABLE scan"),        // 4-round chain builds "table" whole
      (2L, "value row window"),      // value/row fuse; window -> w ind o w
      (3L, "Ta-ble!! 42"),           // punctuation splits words; digits pass
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeSegment(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getLong(5)))).toMap
    // "the" has no merges in the table -> stays t h e; table/scan fuse
    // through 4- and 3-round chains (t+a, ta+b, l+e, tab+le / s+c, sc+a,
    // sca+n)
    assert(out(1L) === ((3L, 12L, 5L, "t h e table scan", 416666L)))
    // window: i+n then in+d fire, the rest never match -> w ind o w
    assert(out(2L) === ((3L, 14L, 6L, "value row w ind o w", 428571L)))
    // "ta-ble" splits at '-' so tab+le can't see across; 42 stays chars
    assert(out(3L) === ((3L, 7L, 5L, "ta b le 4 2", 714285L)))
    assert(out(4L) === ((0L, 0L, 0L, "", 0L)))
  }

  test("bpeSegment: greedy pass is non-overlapping and never re-merges its own output") {
    val df = Seq(
      (1L, "tata"),   // (t,a) fires twice left-to-right -> ta ta
      (2L, "ttata"),  // leading t can't pair with t -> t ta ta
      (3L, "tabb")    // after ta+b -> tab, the next b must NOT merge
                      // (pair is (ta,b), last token is now "tab")
    ).toDF("doc_id", "text")
    val segs = TextAnalysis.bpeSegment(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(segs(1L) === "ta ta")
    assert(segs(2L) === "t ta ta")
    assert(segs(3L) === "tab b")
  }

  test("bpeTrain: hand-traced greedy rounds, tie rule, early stop") {
    val df = Seq((1L, "aa ab"), (2L, "ab aa")).toDF("doc_id", "text")
    // round 1: (a,a) and (a,b) both count 2 -> tie breaks to (a,a);
    // round 2: only (a,b) x2 remains; round 3: no pairs -> early stop
    val out = TextAnalysis.bpeTrain(df, "text", "doc_id", nMerges = 5)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, "a", "a", 2L), (2L, "a", "b", 2L)))
  }

  test("bpeTrain: later rounds merge merged tokens") {
    val df = Seq((1L, "abab")).toDF("doc_id", "text")
    // r1: (a,b) x2 (left-to-right non-overlap) beats (b,a) x1;
    // r2: the two ab tokens pair -> (ab, ab) x1
    val out = TextAnalysis.bpeTrain(df, "text", "doc_id", nMerges = 5)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, "a", "b", 2L), (2L, "ab", "ab", 1L)))
  }

  test("bpeTrain rank 1 equals bpePairCounts' top row; learned list feeds bpeSegment") {
    val df = Seq(
      (1L, "the then there"), (2L, "other the weather"),
      (3L, "ten the nets")).toDF("doc_id", "text")
    val trained = TextAnalysis.bpeTrain(df, "text", "doc_id", nMerges = 4)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // the trainer's first round over raw characters IS t22's statistic
    val t22top = TextAnalysis.bpePairCounts(df, "text", "doc_id", k = 1)
      .collect()(0)
    assert(trained.head._2 + trained.head._3 === t22top.getString(0))
    assert(trained.head._4 === t22top.getLong(1))
    // the learned list is well-formed by construction: applying it via
    // bpeSegment must produce tokens consistent with the final counts
    // (no pair of adjacent tokens may still match a learned merge)
    val merges = trained.map(t => t._2 -> t._3).toSeq
    val segged = TextAnalysis.bpeSegment(df, "text", "doc_id", merges)
      .collect()
    assert(segged.nonEmpty)
  }
}
