package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  test("log2Fixed: exact powers, hand-checked irrationals, symmetry, " +
    "and closeness to the real log2") {
    assert(Classifier.log2Fixed(BigInt(1), BigInt(1)) === 0L)
    assert(Classifier.log2Fixed(BigInt(2), BigInt(1)) === 1048576L)
    assert(Classifier.log2Fixed(BigInt(1), BigInt(2)) === -1048576L)
    assert(Classifier.log2Fixed(BigInt(1024), BigInt(1)) === 10L * 1048576L)
    // 2^20 * log2(3) = 1661980.97...; compounded mantissa-squaring
    // truncation lands a few dozen ulp BELOW the true floor (relative
    // error ~2^-30 at step 1 doubles per squaring step) — pin the
    // documented band, not exactness
    val l3 = Classifier.log2Fixed(BigInt(3), BigInt(1))
    assert(l3 <= 1661980L && l3 >= 1661980L - 64L, s"log2(3) fixed = $l3")
    // symmetric truncation: swapped operands negate exactly
    for ((n, d) <- Seq((7, 5), (123456, 789), (1, 999983)))
      assert(Classifier.log2Fixed(BigInt(n), BigInt(d)) ===
        -Classifier.log2Fixed(BigInt(d), BigInt(n)))
    // accuracy: within 1e-4 of the true log2 across magnitudes
    for ((n, d) <- Seq((3, 2), (17, 13), (1000003, 7), (5, 1 << 20),
        (999999937, 104729), (BigInt("123456789123456789").toInt.abs, 97))) {
      val got = Classifier.log2Fixed(BigInt(n), BigInt(d)) / 1048576.0
      val want = math.log(n.toDouble / d.toDouble) / math.log(2.0)
      assert(math.abs(got - want) < 1e-4, s"log2($n/$d): $got vs $want")
    }
  }

  test("log2FixedCol ≡ log2Fixed over a magnitude sweep (differential: " +
    "the in-plan fold and the driver mirror are the same algorithm)") {
    val pairs = for {
      n <- Seq(1L, 2L, 3L, 7L, 100L, 12345L, 999983L, 1L << 40)
      d <- Seq(1L, 3L, 64L, 999L, 104729L, (1L << 35) + 7L)
    } yield (n, d)
    val df = pairs.toDF("n", "d")
    val got = df.select(col("n"), col("d"),
        Classifier.log2FixedCol(col("n"), col("d")).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((n, d) <- pairs)
      assert(got((n, d)) === Classifier.log2Fixed(BigInt(n), BigInt(d)),
        s"($n, $d)")
  }

  // train fixture with hand-countable tokens:
  //   pos docs: "good good text", "good stuff"   -> tp = 5, dp = 2
  //   neg docs: "bad text", "bad bad noise"      -> tn = 5, dn = 2
  // vocab = {good, text, stuff, bad, noise}      -> v = 5
  private def trainDf = Seq(
    (1L, "good good text", true), (2L, "good stuff", true),
    (3L, "bad text", false), (4L, "bad bad noise", false))
    .toDF("id", "text", "label")

  private def model = Classifier.nbTrain(trainDf, "text", "id", col("label"))

  test("the |log2(n/d)| < 64 envelope is ENFORCED on both sides: " +
    "boundary ratios stay exact, past-envelope ratios fail loudly " +
    "(silent Long overflow otherwise — the r12 advisory)") {
    // 2^63 is the largest in-envelope power: exponent search tops out
    // at e = 63 with a == b, mantissa exactly 2^30, zero fraction bits
    assert(Classifier.log2Fixed(BigInt(1) << 63, BigInt(1)) ===
      63L * 1048576L)
    assert(Classifier.log2Fixed((BigInt(1) << 64) - 1, BigInt(1)) >
      63L * 1048576L) // just inside: mantissa saturates, no overflow
    intercept[IllegalArgumentException](
      Classifier.log2Fixed(BigInt(1) << 64, BigInt(1)))
    intercept[IllegalArgumentException](
      Classifier.log2Fixed(BigInt(1), BigInt(1) << 64))
    // the in-plan fold raises the same envelope error from the data path
    val df = Seq((BigDecimal(BigInt(1) << 64), BigDecimal(1)))
      .toDF("n", "d")
    val e = intercept[Exception](
      df.select(Classifier.log2FixedCol(col("n"), col("d")).as("w"))
        .collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
        String.valueOf(t.getMessage).contains("envelope")),
      s"expected the envelope raise_error, got: $e")
    // and the boundary ratio flows through the column form unharmed
    val ok = Seq((BigDecimal(BigInt(1) << 63), BigDecimal(1)))
      .toDF("n", "d")
      .select(Classifier.log2FixedCol(col("n"), col("d")).as("w"))
      .collect()(0).getLong(0)
    assert(ok === 63L * 1048576L)
  }

  test("nbTrain: hand-checked class counts, token totals, doc totals") {
    val (counts, totals) = model
    val c = counts.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(c("good") === ((3L, 0L)))
    assert(c("text") === ((1L, 1L)))
    assert(c("stuff") === ((1L, 0L)))
    assert(c("bad") === ((0L, 3L)))
    assert(c("noise") === ((0L, 1L)))
    val t = totals.head()
    assert((t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3),
      t.getLong(4)) === ((5L, 5L, 5L, 2L, 2L)))
  }

  test("nbScore: per-token log-odds sums match the BigInt mirror; " +
    "unseen tokens take the totals-only weight; verdict by margin+prior") {
    val (counts, totals) = model
    def w(cp: Long, cn: Long) = Classifier.log2Fixed(
      BigInt(cp + 1) * BigInt(10), BigInt(cn + 1) * BigInt(10))
    val out = Classifier.nbScore(
      Seq((10L, "good text"), (11L, "bad noise"), (12L, "zzz unseen"))
        .toDF("id", "text"),
      "text", "id", counts, totals)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val prior = Classifier.log2Fixed(BigInt(2), BigInt(2)) // = 0
    assert(out(10L) === ((2L, w(3, 0) + w(1, 1), prior, true)))
    assert(out(11L) === ((2L, w(0, 3) + w(0, 1), prior, false)))
    // unseen: both tokens at the count-0 weight, which here is 0 -> a
    // zero margin, and a zero margin is NOT positive
    assert(out(12L) === ((2L, 2L * w(0, 0), prior, false)))
    assert(w(0, 0) === 0L)
  }

  test("scoring from the STORED model equals scoring from the live one") {
    val (counts, totals) = model
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nbmodel").toString
    counts.write.mode("overwrite").parquet(s"$dir/counts")
    totals.coalesce(1).write.mode("overwrite").parquet(s"$dir/totals")
    val docs = Seq((20L, "good bad text"), (21L, "stuff noise zzz"))
      .toDF("id", "text")
    val live = Classifier.nbScore(docs, "text", "id", counts, totals)
    val stored = Classifier.nbScore(docs, "text", "id",
      spark.read.parquet(s"$dir/counts"), spark.read.parquet(s"$dir/totals"))
    assert(live.collect().toSeq === stored.collect().toSeq)
  }

  test("the classifier actually learns: planted class-exclusive vocab is " +
    "recovered on held-out docs despite 9:1 imbalance") {
    // 90 pos docs of neutral pool + 'the'; 10 neg docs of pool + 'zzz'.
    // Signal = one class-exclusive token per doc buried under 8 neutral
    // tokens - the shape the additive (no-log) variant measurably
    // failed on (its probability differences drown a single token's
    // evidence in the smoothing tilt of the neutral majority).
    val pool = Seq("alpha", "beta", "gamma", "delta", "eps")
    def text(i: Int, pos: Boolean) = {
      val base = (0 until 8).map(j => pool((i * 7 + j) % pool.size))
      (base :+ (if (pos) "the" else "zzz")).mkString(" ")
    }
    val docs = (0 until 100).map { i =>
      val pos = i % 10 != 0
      (i.toLong, text(i, pos), pos)
    }
    val train = docs.filter(_._1 < 70).toDF("id", "text", "label")
    val test = docs.filter(_._1 >= 70).toDF("id", "text", "label")
    val (c, t) = Classifier.nbTrain(train, "text", "id", col("label"))
    val scored = Classifier.nbScore(test.drop("label"), "text", "id", c, t)
      .join(test.select(col("id"), col("label")), Seq("id"))
    val agree = scored.filter(col("is_pos") === col("label")).count()
    assert(agree === 30L, s"held-out agreement $agree/30")
  }

  test("nbModelFold: append + fold ≡ retrain (the t30/t31 contract) — " +
    "scored outputs match bit-for-bit, and folding an un-appended " +
    "model is the identity in the score sense") {
    val a = Seq((1L, "the quick fox jumps", true),
      (2L, "der schnelle fuchs springt", false),
      (3L, "the lazy dog sleeps", true)).toDF("id", "text", "pos")
    val b = Seq((10L, "the fox jumps again", true),
      (11L, "noch ein schneller fuchs", false)).toDF("id", "text", "pos")
    val held = Seq((100L, "the fox"), (101L, "der fuchs"),
      (102L, "wholly unseen tokens only")).toDF("id", "text")
    val (ca, ta) = Classifier.nbTrain(a, "text", "id", col("pos"))
    val (cb, tb) = Classifier.nbTrain(b, "text", "id", col("pos"))
    // the appended store: counts rows unioned, totals as a ledger
    val (fc, ft) = Classifier.nbModelFold(
      ca.unionByName(cb), ta.unionByName(tb))
    val (cu, tu) = Classifier.nbTrain(a.unionByName(b), "text", "id",
      col("pos"))
    assert(Classifier.nbScore(held, "text", "id", fc, ft).collect().toSeq
      === Classifier.nbScore(held, "text", "id", cu, tu).collect().toSeq)
    // v is the non-additive total: the fold must RECOMPUTE it (shared
    // vocabulary across batches would double-count under a ledger sum)
    assert(ft.select(col("v")).collect()(0).getLong(0) ===
      tu.select(col("v")).collect()(0).getLong(0))
    val (f1c, f1t) = Classifier.nbModelFold(ca, ta)
    assert(Classifier.nbScore(held, "text", "id", f1c, f1t)
      .collect().toSeq ===
      Classifier.nbScore(held, "text", "id", ca, ta).collect().toSeq)
  }

  test("null label aborts training; one-class and empty models rejected " +
    "at scoring") {
    val bad = Seq((1L, "x", java.lang.Boolean.TRUE),
      (2L, "y", null.asInstanceOf[java.lang.Boolean]))
      .toDF("id", "text", "label")
    val (c, _) = Classifier.nbTrain(bad, "text", "id", col("label"))
    val e = intercept[Exception](c.collect())
    assert(e.getMessage.contains("NULL label") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL label")),
      e.toString)
    val (oc, ot) = Classifier.nbTrain(
      trainDf.filter(col("label")), "text", "id", col("label"))
    intercept[IllegalArgumentException](
      Classifier.nbScore(trainDf, "text", "id", oc, ot))
    val (ec, et) = Classifier.nbTrain(
      trainDf.filter(lit(false)), "text", "id", col("label"))
    intercept[IllegalArgumentException](
      Classifier.nbScore(trainDf, "text", "id", ec, et))
  }
}
