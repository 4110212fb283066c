package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tables.Tables

/** Determinism + invariant specs for the sampling/splitting/packing ops. */
class SamplingSpec extends SparkSuite {

  private def docs = Tables(spark, sf, "documents")

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shufflePositions: exact global md5 rank without a global window") {
    import spark.implicits._
    val df = (0L until 500L).toDF("doc_id")
    val out = Sampling.shufflePositions(df, "doc_id", "epochA")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // positions are the permutation 0..n-1 in (key, id) order
    assert(out.map(_._3).sorted.toSeq === (0L until 500L))
    val byKey = out.sortBy(t => (t._2, t._1))
    assert(byKey.map(_._3).toSeq === (0L until 500L), "rank != key order")
    // a different seed permutes differently; the same seed is stable
    val other = Sampling.shufflePositions(df, "doc_id", "epochB")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.exists(t => other(t._1) != t._3))
    val again = Sampling.shufflePositions(df, "doc_id", "epochA")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.forall(t => again(t._1) == t._3))
  }

  test("hashSplit is deterministic, complete, and roughly uniform") {
    val a = Sampling.hashSplit(docs, "doc_id", 3).select("doc_id", "split")
    val b = Sampling.hashSplit(docs, "doc_id", 3).select("doc_id", "split")
    assert(a.collect().toSet === b.collect().toSet)
    val bySplit = a.groupBy("split").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set(0, 1, 2))
    val n = bySplit.values.sum
    // 3-way split of the fixture: each split within [15%, 55%]
    bySplit.values.foreach(c =>
      assert(c > n * 0.15 && c < n * 0.55, bySplit.toString))
    // assignment matches the declared md5 rule
    val row = a.orderBy("doc_id").head()
    val bucket = Integer.parseInt(
      md5hex(row.getLong(0).toString).substring(0, 2), 16)
    assert(row.getInt(1) == bucket % 3)
  }

  test("stratifiedQuota caps every stratum at n, deterministically") {
    val q = Sampling.stratifiedQuota(docs, "lang", "doc_id", 30)
    val perLang = q.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, c) =>
      assert(perLang(lang) == math.min(c, 30L), s"$lang: $perLang vs $full")
    }
    assert(q.agg(max("rk")).head().getInt(0) <= 30)
    // deterministic: the kept id set is stable across runs
    val ids1 = q.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedQuota(docs, "lang", "doc_id", 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("packSequences matches a local next-fit simulation per shard") {
    val budget = 2048L
    val out = Sampling.packSequences(docs, "doc_id", "n_chars", budget, shards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // recompute: shard by md5 bucket, order by (md5, id), running sum
    val weights = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = out.map(_._1).map { id =>
      val h = md5hex(id.toString)
      (id, Integer.parseInt(h.substring(0, 2), 16) % 4, h)
    }.groupBy(_._2).iterator.flatMap { case (shard, members) =>
      var before = 0L
      members.sortBy(m => (m._3, m._1)).map { case (id, _, _) =>
        val bin = before / budget
        val off = before - bin * budget
        val row = (id, shard, bin, off, weights(id))
        before += weights(id)
        row
      }
    }.toSet
    assert(out.toSet === expected)
    // structural invariants: offset always inside the budget window
    out.foreach { case (_, _, _, off, _) =>
      assert(off >= 0 && off < budget)
    }
  }

  test("weightedSample: deterministic, biased toward heavy docs, top-k plan") {
    import spark.implicits._
    // 500 light docs (w=10) vs 500 heavy docs (w=1000)
    val df = ((1L to 500L).map((_, 10L)) ++ (501L to 1000L).map((_, 1000L)))
      .toDF("doc_id", "w")
    val s1 = Sampling.weightedSample(df, "doc_id", "w", 100)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(df, "doc_id", "w", 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)                       // rerun-identical
    val heavy = s1.count(_ > 500L)
    assert(heavy > 80, s"heavy docs should dominate the sample: $heavy/100")
    assert(s1.size === 100)
    // global top-n is TakeOrderedAndProject, not a global sort
    val q = Sampling.weightedSample(df, "doc_id", "w", 100)
    q.collect()
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      q.queryExecution.executedPlan.toString)
  }

  test("upsampleMix: whole+fractional copies, drops, default weight, no shuffle") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "src")
    val weights = Map("src0" -> 2.25, "src1" -> 0.0, "src2" -> 0.75)
    val out = Sampling.upsampleMix(df, "doc_id", "src", weights)
    val perDoc = out.groupBy("doc_id", "src")
      .agg(org.apache.spark.sql.functions.count("*").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every emitted doc's copy count is floor(w) or floor(w)+1
    perDoc.foreach { case (id, src, n) =>
      val w = weights.getOrElse(src, 1.0)
      assert(n == math.floor(w).toLong || n == math.floor(w).toLong + 1,
        s"doc $id src $src copies $n for weight $w")
    }
    val bySrc = perDoc.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(!bySrc.contains("src1"))                  // weight 0 -> dropped
    assert(bySrc("src3") == 100L)                    // default weight 1
    assert(bySrc("src0") > 200L && bySrc("src0") < 260L)   // ~2.25x of 100
    assert(bySrc("src2") > 55L && bySrc("src2") < 95L)     // ~0.75x of 100
    // deterministic re-run
    val again = Sampling.upsampleMix(df, "doc_id", "src", weights)
      .select("doc_id", "copy_ix").as[(Long, Long)].collect().toSet
    assert(again ===
      out.select("doc_id", "copy_ix").as[(Long, Long)].collect().toSet)
    // map-only: no exchange anywhere in the plan
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("temperatureMix: sqrt-share rates, budget tracking, determinism") {
    import spark.implicits._
    // skewed sources: 320 / 60 / 20 docs
    val df = ((1L to 320L).map(i => (i, "big")) ++
      (321L to 380L).map(i => (i, "mid")) ++
      (381L to 400L).map(i => (i, "small"))).toDF("doc_id", "src")
    val out = Sampling.temperatureMix(df, "doc_id", "src", budget = 400L)

    // rates follow sqrt shares exactly (integer arithmetic re-derived)
    val sBig = math.floor(math.sqrt(320.0) * 1e6).toLong
    val sMid = math.floor(math.sqrt(60.0) * 1e6).toLong
    val sSml = math.floor(math.sqrt(20.0) * 1e6).toLong
    val t = sBig + sMid + sSml
    val rates = out.select("src", "rate_256").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("big") === 400L * sBig * 256 / (t * 320))
    assert(rates("mid") === 400L * sMid * 256 / (t * 60))
    assert(rates("small") === 400L * sSml * 256 / (t * 20))
    // sqrt temperature flattens: small's per-doc rate exceeds big's
    assert(rates("small") > rates("mid") && rates("mid") > rates("big"))

    // emitted copies track the per-source quota: exact up to the
    // md5-bucket selection of WHICH docs carry the fractional copy
    // (deviation bounded like a binomial draw over n docs, ~3·sqrt(n))
    val emitted = out.groupBy("src").count().as[(String, Long)].collect().toMap
    Seq("big" -> 320L, "mid" -> 60L, "small" -> 20L).foreach { case (s, n) =>
      val expect = rates(s).toDouble / 256 * n
      assert(math.abs(emitted(s) - expect) <= 3 * math.sqrt(n.toDouble) + 1,
        s"$s emitted ${emitted(s)} vs expected ~$expect")
    }
    // deterministic: second run emits the identical multiset
    val again = Sampling.temperatureMix(df, "doc_id", "src", budget = 400L)
      .select("doc_id", "copy_ix").as[(Long, Long)].collect().toSet
    assert(again === out.select("doc_id", "copy_ix")
      .as[(Long, Long)].collect().toSet)
  }

  test("temperatureMix: NULL source forms its own group, docs not dropped") {
    import spark.implicits._
    val df = ((1L to 90L).map(i => (i, Option("a"))) ++
      (91L to 100L).map(i => (i, None: Option[String]))).toDF("doc_id", "src")
    val out = Sampling.temperatureMix(df, "doc_id", "src", budget = 100L)
    val bySrc = out.groupBy("src").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // the null group participates like any source: sqrt share of the
    // budget, not silently dropped by the rate join
    assert(bySrc.contains(None), s"null-source docs vanished: $bySrc")
    assert(bySrc(None) >= 10L) // sqrt temperature upsamples the minority
  }

  test("curriculumPositions equals the global-window spec") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, (i % 4).toDouble / 4.0))
      .toDF("doc_id", "q")
    val got = Sampling.curriculumPositions(df, "doc_id", "q", "s1")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // spec: one global row_number over (q DESC, md5(seed:id), id)
    val spec = df.select(col("doc_id"), col("q"),
        md5(concat(lit("s1:"), col("doc_id").cast("string"))).as("key"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("q").desc, col("key"), col("doc_id"))).cast("long") - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === spec)
    // high-quality tier occupies the leading positions
    val tier = df.filter(col("q") === 0.75).select("doc_id")
      .as[Long].collect().toSet
    val leading = got.filter(_._2 < tier.size).keySet
    assert(leading === tier)
  }

  test("splitLeakage: fixed matrix, diagonal vs cross rows, zero rows") {
    import spark.implicits._
    val splits = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 2), (5L, 2))
      .toDF("doc_id", "split")
    // (1,2) within split 0; (1,3) crosses 0-1; (3,4) crosses 1-2;
    // (4,5) within 2; doc 3 participates in two buckets
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val out = Sampling.splitLeakage(splits, "doc_id", "split", pairs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 6)                    // k(k+1)/2 with k=3
    assert(out((0, 0)) === ((1L, 2L)))        // within-train pair
    assert(out((0, 1)) === ((1L, 2L)))        // leaked 0-1
    assert(out((0, 2)) === ((0L, 0L)))        // zero row present
    assert(out((1, 1)) === ((0L, 0L)))
    assert(out((1, 2)) === ((1L, 2L)))        // leaked 1-2
    assert(out((2, 2)) === ((1L, 2L)))
  }

  test("splitLeakage: pairs with unassigned ids land in the -1 bucket") {
    import spark.implicits._
    val splits = Seq((1L, 0), (2L, 1)).toDF("doc_id", "split")
    // doc 9 has no split row — the (1,9) pair must NOT vanish
    val pairs = Seq((1L, 9L), (1L, 2L)).toDF("id_a", "id_b")
    val out = Sampling.splitLeakage(splits, "doc_id", "split", pairs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((-1, 0)) === 1L)               // surfaced, not dropped
    assert(out((0, 1)) === 1L)
    assert(out.size === 6)                    // axes now {-1, 0, 1}
  }

  test("dsirWeights: target-profile docs outrank off-profile, shorts score 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target subcorpus is "the cat sat"-flavored; doc 10 is a raw doc
    // with the target's bigrams, doc 11 shares none of them
    val docs = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the cat sat again and again", true),
      (3L, "a dog ran far away today", false),
      (10L, "the cat sat on a mat", false),
      (11L, "zebra quark flux omega delta pi", false),
      (12L, "word", false))
      .toDF("doc_id", "text", "tgt")
    val out = Sampling.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size === 6)                    // every doc present
    assert(out(10L)._2 > out(11L)._2)         // target-like wins
    assert(out(12L) === ((0L, 0L)))           // sub-bigram doc: zero, not absent
    assert(out(10L)._1 === 5L)                // 6 words -> 5 bigram occurrences
  }

  test("splitDrift: identical distributions score 0, skew is exact ppm") {
    import spark.implicits._
    // split 0: features 0,0 (bucket 0 twice); split 1: 0 and 250
    // (buckets 0 and 2) at width 100 -> hand TV: 250000 ppm each side
    val df = Seq((0, 0L), (0, 0L), (1, 0L), (1, 250L))
      .toDF("split", "f")
    val out = Sampling.splitDrift(df, "split", "f", 100L, 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(0 -> ((2L, 250000L)), 1 -> ((2L, 250000L))))

    val same = Seq((0, 0L), (0, 150L), (1, 0L), (1, 150L))
      .toDF("split", "f")
    val zero = Sampling.splitDrift(same, "split", "f", 100L, 4)
      .collect().map(_.getLong(2))
    assert(zero === Array(0L, 0L))
    intercept[IllegalArgumentException](
      Sampling.splitDrift(df, "split", "f", 0L, 4))
    intercept[IllegalArgumentException](
      Sampling.splitDrift(df, "split", "f", 100L, 1))
  }

  test("packStats: per-bin counts and fill ppm, order-independent") {
    import spark.implicits._
    // one shard, equal weights: bin membership depends only on rank
    // (md5 order), so counts are deterministic whatever the order
    val df = (1L to 5L).map(i => (i, 4L)).toDF("doc_id", "w")
    val out = Sampling.packStats(df, "doc_id", "w",
        budget = 10L, shards = 1)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // cumulative starts 0,4,8,12,16 -> bins 0,0,0,1,1
    assert(out(0L) === ((3L, 12L, 1200000L)))
    assert(out(1L) === ((2L, 8L, 800000L)))
  }

  private def mixRows(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("domain", "w")
  }

  private def allocOf(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap

  test("mixtureAllocation: water-filling caps the small domains exactly") {
    val df = mixRows("a" -> 4L, "a" -> 6L, "b" -> 20L, "c" -> 100L)
    val out = allocOf(Sampling.mixtureAllocation(df, "domain", "w",
      expr("avail * 2"), budget = 100L))
    // caps 20/40/200 vs budget 100: a and b cap (prefix test
    // 0+20*3=60 and 20+40*2=100 both <= 100), c takes the 40 remainder
    assert(out("a") === ((10L, 20L, 20L, 2000000L)))
    assert(out("b") === ((20L, 40L, 40L, 2000000L)))
    assert(out("c") === ((100L, 200L, 40L, 400000L)))
    assert(out.values.map(_._3).sum === 100L)   // spends the budget exactly
  }

  test("mixtureAllocation: largest-remainder +1s go to first domains in order") {
    val df = mixRows("x" -> 100L, "y" -> 100L, "z" -> 100L)
    val out = allocOf(Sampling.mixtureAllocation(df, "domain", "w",
      expr("avail * 10"), budget = 100L))
    // nobody caps; 100 div 3 = 33 rem 1 -> x (first in (cap, domain)
    // order) gets the extra token
    assert(out("x")._3 === 34L)
    assert(out("y")._3 === 33L)
    assert(out("z")._3 === 33L)
  }

  test("mixtureAllocation: all-capped leaves the shortfall visible") {
    val df = mixRows("a" -> 10L, "b" -> 20L)
    val out = allocOf(Sampling.mixtureAllocation(df, "domain", "w",
      expr("avail * 2"), budget = 1000L))
    assert(out("a")._3 === 20L && out("b")._3 === 40L)
    assert(out.values.map(_._3).sum === 60L)    // < budget: capped corpus
  }

  test("mixtureAllocation: validation") {
    intercept[IllegalArgumentException](
      Sampling.mixtureAllocation(mixRows("a" -> 1L), "domain", "w",
        expr("avail"), budget = -1L))
  }

  test("mixtureAllocation: non-integral weight columns work (avail cast to long)") {
    import spark.implicits._
    // double and decimal weights both ride the HTTP route's NumericType
    // check; avail is cast to long so the DIVs and the route's getLong
    // hold for every admitted type
    val dbl = Seq(("a", 10.6), ("b", 20.2)).toDF("domain", "w")
    val outD = allocOf(Sampling.mixtureAllocation(dbl, "domain", "w",
      expr("avail * 2"), budget = 1000L))
    assert(outD("a")._1 === 10L && outD("b")._1 === 20L)
    val dec = Seq(("a", BigDecimal("10.00")), ("b", BigDecimal("20.00")))
      .toDF("domain", "w")
    val outC = allocOf(Sampling.mixtureAllocation(dec, "domain", "w",
      expr("avail * 2"), budget = 1000L))
    assert(outC("a")._3 === 20L && outC("b")._3 === 40L)
  }

  test("mixtureAllocation/epochPlan invariants hold on randomized instances") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { k =>
      val nDom = 2 + rnd.nextInt(6)
      val docsFix = (0 until nDom).flatMap { d =>
        (0 until 1 + rnd.nextInt(5)).map(i =>
          (s"dom$d", (d * 100 + i).toLong, (1 + rnd.nextInt(999)).toLong))
      }
      val df = docsFix.toDF("domain", "doc_id", "w")
      val totalAvail = docsFix.map(_._3).sum
      val mult = 1 + rnd.nextInt(4)
      val budget = (rnd.nextLong() & Long.MaxValue) % (3 * totalAvail + 1)
      val alloc = Sampling.mixtureAllocation(df, "domain", "w",
          expr(s"avail * $mult"), budget)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // exact budget conservation and per-domain cap respect
      val sumCap = alloc.values.map(_._2).sum
      assert(alloc.values.map(_._3).sum === math.min(budget, sumCap),
        s"case $k: sum(alloc) != min(budget, sum(cap))")
      alloc.values.foreach { case (_, cap, a) =>
        assert(a >= 0 && a <= cap, s"case $k: alloc outside [0, cap]") }
      // water level: uncapped domains share equally up to the +1s
      val uncapped = alloc.values.collect { case (_, cap, a) if a < cap => a }
      if (uncapped.nonEmpty)
        assert(uncapped.max - uncapped.min <= 1, s"case $k: unequal shares")
      // the epoch plan realizes the allocation: whole epochs for every
      // doc, fractional prefix never overspending it
      val plan = Sampling.epochPlan(df, "domain", "doc_id", "w",
          expr(s"avail * $mult"), budget)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      plan.groupBy(_._1).foreach { case (dom, rows) =>
        val (avail, _, a) = alloc(dom)
        val fe = if (avail > 0) a / avail else 0L
        val spent = rows.map(r => r._2 * r._3).sum
        assert(spent <= a, s"case $k dom $dom overspends")
        assert(spent >= fe * avail, s"case $k dom $dom misses full epochs")
        rows.foreach(r => assert(r._3 === fe || r._3 === fe + 1,
          s"case $k dom $dom copy count"))
      }
    }
  }

  test("crossSplitDedup: removes only boundary-crossing train docs, min provenance") {
    import spark.implicits._
    val splits = Seq((1L, 0), (2L, 1), (3L, 2), (4L, 1), (5L, 0))
      .toDF("doc_id", "split")
    // 1 and 5 are protected (eval); pairs: eval-train (1,2), (1,3),
    // (5,3); train-train (3,4); eval-eval (1,5)
    val pairs = Seq((1L, 2L), (1L, 3L), (5L, 3L), (3L, 4L), (1L, 5L))
      .toDF("id_a", "id_b")
    val out = Sampling.crossSplitDedup(splits, "doc_id", "split",
        pairs, protectedSplit = 0L)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), Option(r.get(3))))).toMap
    assert(out(1L) === ((0, false, None)))        // protected, kept
    assert(out(5L) === ((0, false, None)))        // eval-eval pair: kept
    assert(out(2L) === ((1, true, Some(1L))))
    assert(out(3L) === ((2, true, Some(1L))))     // min of evals {1, 5}
    assert(out(4L) === ((1, false, None)))        // train-train pair: kept
  }

  test("epochPlan: whole epochs for capped domains, zero for oversized docs") {
    import spark.implicits._
    val df = Seq(("a", 10L, 4L), ("a", 11L, 6L), ("b", 12L, 20L),
      ("c", 13L, 100L)).toDF("domain", "doc_id", "w")
    val out = Sampling.epochPlan(df, "domain", "doc_id", "w",
        expr("avail * 2"), budget = 100L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    // allocs (see the water-filling test): a=20, b=40, c=40
    // a/b: alloc = 2 x avail exactly -> 2 whole epochs, no fraction
    assert(out(10L) === (("a", 4L, 2L)))
    assert(out(11L) === (("a", 6L, 2L)))
    assert(out(12L) === (("b", 20L, 2L)))
    // c: 0 whole epochs, fractional 40 cannot fit the single 100-weight
    // doc (docs are never split) -> 0 copies
    assert(out(13L) === (("c", 100L, 0L)))
  }

  test("epochPlan: NULL-domain docs get verdict rows (null-safe join)") {
    import spark.implicits._
    // the allocation treats NULL as a real domain (groupBy keeps it,
    // NULLS LAST rank is pinned) — the realization join must too, or
    // null-metadata docs silently vanish from the plan
    val df = ((1L to 40L).map(i => (i, Option("en"), 10L)) ++
      (41L to 50L).map(i => (i, None: Option[String], 10L)))
      .toDF("doc_id", "lang", "w")
    val out = Sampling.epochPlan(df, "lang", "doc_id", "w",
        expr("avail * 2"), budget = 1000L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(3)))).toMap
    assert(out.size === 50, "every doc gets a plan row, null domain too")
    // budget = sum of caps (en 800 + null 200): both domains cap at
    // exactly 2 epochs
    (41L to 50L).foreach(i => assert(out(i) === ((None, 2L)), s"doc $i"))
    (1L to 40L).foreach(i => assert(out(i) === ((Some("en"), 2L))))
  }

  test("shardManifest: next-fit simulation, contiguity, p08 positions, " +
      "null/negative weights") {
    import spark.implicits._
    // weights include NULL (every 37th) and negative (every 23rd): both
    // count 0 toward shard weight but the doc keeps its position
    val rows: Seq[(Long, Option[Long])] = (1L to 300L).map { i =>
      val w: Option[Long] =
        if (i % 37 == 0) None
        else if (i % 23 == 0) Some(-5L)
        else Some((i % 97) + 1)
      (i, w)
    }
    val budget = 200L
    val df = rows.toDF("doc_id", "w")
    val out = Sampling.shardManifest(df, "doc_id", "w", "relA", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

    // local replay of the declared rule: p08 order = (md5(seed:id), id),
    // shard = cumulative-weight-before DIV budget, etag = xor of 60-bit
    // md5(id) prefixes, fill = floor(1e6 * w_total / budget)
    val eff = rows.map { case (i, w) => i -> math.max(w.getOrElse(0L), 0L) }
      .toMap
    val order = rows.map(_._1).sortBy(i => (md5hex("relA:" + i), i))
    var before = 0L
    val sim = order.zipWithIndex.map { case (id, pos) =>
      val shard = before / budget
      before += eff(id)
      (id, pos.toLong, shard)
    }
    val expected = sim.groupBy(_._3).toSeq.map { case (shard, ms) =>
      val ids = ms.map(_._1)
      val w = ids.map(eff).sum
      val etag = ids.map(id => java.lang.Long.parseLong(
        md5hex(id.toString).substring(0, 15), 16)).reduce(_ ^ _)
      (shard, ids.size.toLong, w, ms.map(_._2).min, ms.map(_._2).max,
        etag, w * 1000000L / budget)
    }.sortBy(_._1)
    assert(out.toSeq === expected)

    // the spec-pinned invariants, by name:
    // (1) contiguity: first_pos(0) = 0, first_pos(k) = last_pos(k-1)+1,
    //     the final shard ends at n-1 — shards tile the training order
    assert(out.head._4 === 0L)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 === a._5 + 1, s"gap between shards ${a._1} and ${b._1}")
      case _ => ()
    }
    assert(out.last._5 === 299L)
    // (2) positions ARE p08's shufflePositions output (same seed)
    val p08 = Sampling.shufflePositions(df.select(col("doc_id")),
        "doc_id", "relA")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    sim.foreach { case (id, pos, _) => assert(p08(id) === pos) }
    // (3) overflow by at most one doc: a shard exceeds the budget by
    //     strictly less than one member's weight
    val memberW = sim.groupBy(_._3).view
      .mapValues(_.map(m => eff(m._1)).max).toMap
    out.foreach { case (shard, _, w, _, _, _, _) =>
      assert(w < budget + math.max(memberW(shard), 1L),
        s"shard $shard weight $w overflows by a full doc")
    }
    intercept[IllegalArgumentException](
      Sampling.shardManifest(df, "doc_id", "w", "relA", 0L))
  }

  test("shardManifest: manifest is input-order independent; etag is " +
      "member-order independent") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, i % 50 + 1)).toDF("doc_id", "w")
    val base = Sampling.shardManifest(df, "doc_id", "w", "s1", 300L)
      .collect().toSeq
    // reversed and repartitioned input: identical manifest (positions,
    // shard cuts, and the bit_xor etag all derive from (seed, id, w),
    // never from arrival order)
    val shuffled = Sampling.shardManifest(
      df.orderBy(col("doc_id").desc).repartition(7), "doc_id", "w",
      "s1", 300L).collect().toSeq
    assert(base === shuffled)
    // a different seed re-cuts the shards (the permutation moved)
    val other = Sampling.shardManifest(df, "doc_id", "w", "s2", 300L)
      .collect().toSeq
    assert(base !== other)
  }

  test("epochPlan: fractional prefix follows (md5, id) order exactly") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L)
    val df = ids.map(i => ("z", i, 30L)).toDF("domain", "doc_id", "w")
    // one domain, avail 120, cap 1200, budget 60 -> alloc 60: 0 whole
    // epochs, fractional 60 = exactly the first two docs in md5 order
    val out = Sampling.epochPlan(df, "domain", "doc_id", "w",
        expr("avail * 10"), budget = 60L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val md5Order = ids.sortBy(i => (md5hex(i.toString), i))
    md5Order.take(2).foreach(i => assert(out(i) === 1L, s"doc $i"))
    md5Order.drop(2).foreach(i => assert(out(i) === 0L, s"doc $i"))
  }
}
