package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-layout-$tag").toString

  test("mortonOf: hand-checked interleave; in-plan morton equals the " +
    "driver mirror over the full cell grid (differential)") {
    // ca = 0b11 to the odd bit positions (1,3) = 0b1010; cb = 0b01 to
    // the even (0) = 0b0001 -> 0b1011 = 11
    assert(Layout.mortonOf(3L, 1L, 2) === 11L)
    assert(Layout.mortonOf(0L, 0L, 5) === 0L)
    assert(Layout.mortonOf(31L, 31L, 5) === 1023L)
    val grid = spark.range(32).select(col("id").as("ca"))
      .crossJoin(spark.range(32).select(col("id").as("cb")))
    val bad = grid
      .withColumn("plan_z", Layout.morton(col("ca"), col("cb"), 5))
      .collect()
      .filter(r => r.getLong(2) != Layout.mortonOf(r.getLong(0), r.getLong(1), 5))
    assert(bad.isEmpty, bad.take(3).mkString(", "))
  }

  test("cellOf: monotone, full-range safe, degenerate single-value domain") {
    assert(Layout.cellOf(0L, 0L, 99L, 5) === 0L)
    assert(Layout.cellOf(99L, 0L, 99L, 5) === 31L)
    assert(Layout.cellOf(7L, 7L, 7L, 5) === 0L) // mn = mx
    // BIGINT extremes must not overflow (the DECIMAL/BigInt contract)
    assert(Layout.cellOf(Long.MaxValue, Long.MinValue, Long.MaxValue, 5) === 31L)
    assert(Layout.cellOf(Long.MinValue, Long.MinValue, Long.MaxValue, 5) === 0L)
  }

  test("write + box probe ≡ raw filter, including negative domains and " +
    "boxes overhanging the data bounds") {
    val df = spark.range(5000).select(
      (col("id") % 211 - 100).as("a"), // negative min
      (col("id") * 37 % 1009).as("b"),
      concat(lit("p"), col("id")).as("payload"))
    val dir = tmp("diff")
    Layout.zorderWrite(df, "a", "b", dir, bits = 4, nBuckets = 16)
    for ((loA, hiA, loB, hiB) <- Seq(
        (-50L, 20L, 100L, 400L),
        (-1000L, 1000L, -5L, 2000L), // overhangs every bound
        (110L, 110L, 0L, 1008L),     // single-value slice
        (60L, 40L, 0L, 10L))) {      // inverted -> empty
      val got = Layout.boxProbe(spark, dir, "a", "b", loA, hiA, loB, hiB)
      val want = df.filter(col("a").between(loA, hiA) &&
        col("b").between(loB, hiB))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"box ($loA,$hiA,$loB,$hiB)")
      assert(got.count() === want.count(), s"box ($loA,$hiA,$loB,$hiB)")
    }
  }

  test("probe plans a statically partition-pruned scan: a small box reads " +
    "fewer zbucket directories than the layout holds") {
    // full 128x128 grid: every cell (and so every bucket) is occupied
    val df = spark.range(128L * 128L).select(
      (col("id") / 128).cast("long").as("a"),
      (col("id") % 128).as("b"))
    val dir = tmp("prune")
    Layout.zorderWrite(df, "a", "b", dir, bits = 5, nBuckets = 64)
    val probe = Layout.boxProbe(spark, dir, "a", "b", 10L, 40L, 100L, 120L)
    probe.collect()
    val scans = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val read = scans.map(_.selectedPartitions.partitionCount).sum
    val total = new java.io.File(s"$dir/data").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("zbucket="))
    assert(total === 64, s"layout wrote $total buckets")
    assert(read < total / 2,
      s"probe read $read of $total partitions — pruning is not happening")
  }

  test("layout is self-describing: probe fails loudly without bounds; " +
    "disjoint box returns empty with the original schema") {
    val df = spark.range(100).select(col("id").as("a"), col("id").as("b"))
    val dir = tmp("bounds")
    Layout.zorderWrite(df, "a", "b", dir, bits = 3, nBuckets = 4)
    val empty = Layout.boxProbe(spark, dir, "a", "b", 500L, 900L, 0L, 10L)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("a", "b"))
    // simulate the crashed-write state: data present, bounds missing
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(s"$dir/bounds"))
    intercept[Exception](
      Layout.boxProbe(spark, dir, "a", "b", 0L, 10L, 0L, 10L).collect())
  }

  test("candidateBuckets ≡ per-cell enumeration (differential over " +
    "random boxes, every bits/nBuckets shape)") {
    val rnd = new scala.util.Random(13)
    def perCell(ca1: Long, ca2: Long, cb1: Long, cb2: Long,
                bits: Int, nBuckets: Int): Seq[Long] = {
      val cpb = (1L << (2 * bits)) / nBuckets
      (for { ca <- ca1 to ca2; cb <- cb1 to cb2 }
        yield Layout.mortonOf(ca, cb, bits) / cpb).distinct.sorted
    }
    for (bits <- 1 to 6; _ <- 1 to 8) {
      val side = 1L << bits
      // every power-of-two divisor of 4^bits is a legal bucket count
      val nBuckets = 1 << rnd.nextInt(2 * bits + 1)
      def span(): (Long, Long) = {
        val x = rnd.nextLong(side); val y = rnd.nextLong(side)
        (math.min(x, y), math.max(x, y))
      }
      val ((ca1, ca2), (cb1, cb2)) = (span(), span())
      val (got, _) = Layout.candidateBuckets(ca1, ca2, cb1, cb2, bits, nBuckets)
      val want = perCell(ca1, ca2, cb1, cb2, bits, nBuckets)
      assert(got === want,
        s"bits=$bits nBuckets=$nBuckets box=($ca1,$ca2,$cb1,$cb2)")
    }
  }

  test("candidateBuckets driver cost is bucket-bounded, never cell-" +
    "bounded: a wide box at bits=16 visits <= 4*nBuckets nodes") {
    // the r12 per-cell form would iterate ~4.3e9 cells here; the
    // quadtree stops at bucket granularity — 85 nodes for 64 buckets
    val side = (1L << 16) - 1
    val (buckets, visited) =
      Layout.candidateBuckets(1L, side - 1, 1L, side - 1, 16, 64)
    assert(buckets === (0L until 64L), "a near-full box touches every bucket")
    assert(visited <= 4L * 64,
      s"visited $visited nodes — enumeration is not bucket-bounded")
    // and a genuinely narrow box stays cheap AND tight
    val (few, v2) = Layout.candidateBuckets(7L, 7L, 0L, side, 16, 64)
    assert(few.size < 64 && v2 <= 4L * 64, s"${few.size} buckets, $v2 nodes")
  }

  test("boxProbeTables re-validates stored parameters: oversized bits " +
    "and non-divisor n_buckets from a caller-supplied bounds table are " +
    "rejected, not silently wrong") {
    val df = spark.range(100).select(col("id").as("a"), col("id").as("b"))
    val dir = tmp("revalidate")
    Layout.zorderWrite(df, "a", "b", dir, bits = 3, nBuckets = 4)
    val store = spark.read.parquet(s"$dir/data")
    def bounds(bits: Int, nBuckets: Int) = spark.range(1).select(
      lit(0L).as("min_a"), lit(99L).as("max_a"),
      lit(0L).as("min_b"), lit(99L).as("max_b"),
      lit(bits).as("bits"), lit(nBuckets).as("n_buckets"))
    // bits = 40 would wrap the 2*i+1 Morton shifts past 63 and prune
    // WRONG buckets silently (the r12 ADVICE hazard)
    val e1 = intercept[IllegalArgumentException](
      Layout.boxProbeTables(store, bounds(40, 4), "a", "b", 0L, 9L, 0L, 9L))
    assert(e1.getMessage.contains("bits"))
    val e2 = intercept[IllegalArgumentException](
      Layout.boxProbeTables(store, bounds(3, 7), "a", "b", 0L, 9L, 0L, 9L))
    assert(e2.getMessage.contains("n_buckets"))
  }

  test("zorderAppend ≡ rewrite over the union (in-envelope delta), and " +
    "probes answer through the appended store") {
    val all = spark.range(4000).select(col("id"),
      (col("id") % 211 - 100).as("a"),
      (col("id") * 37 % 1009).as("b"),
      concat(lit("p"), col("id")).as("payload"))
    val corpus = all.filter(col("id") < 3000)
    val delta = all.filter(col("id") >= 3000)
    val dir = tmp("append"); val dir2 = tmp("rewrite")
    Layout.zorderWrite(corpus, "a", "b", dir, bits = 4, nBuckets = 16)
    Layout.zorderAppend(delta, "a", "b", dir)
    // bit-for-bit: same rows, same z, same zbucket as a from-scratch
    // rewrite (the delta stays inside the envelope, so the rewrite's
    // recomputed bounds equal the stored ones)
    Layout.zorderWrite(all, "a", "b", dir2, bits = 4, nBuckets = 16)
    val appended = spark.read.parquet(s"$dir/data")
    val rewritten = spark.read.parquet(s"$dir2/data")
    assert(appended.except(rewritten).isEmpty &&
      rewritten.except(appended).isEmpty)
    val got = Layout.boxProbe(spark, dir, "a", "b", -50L, 20L, 100L, 400L)
    val want = all.filter(col("a").between(-50L, 20L) &&
      col("b").between(100L, 400L))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("zorderAppend out-of-envelope delta fails loudly (the decided " +
    "widen-and-rewrite semantics), and empty deltas are rejected") {
    val corpus = spark.range(100).select(col("id").as("a"),
      col("id").as("b"))
    val dir = tmp("envelope")
    Layout.zorderWrite(corpus, "a", "b", dir, bits = 3, nBuckets = 4)
    val outside = Seq((500L, 5L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      Layout.zorderAppend(outside, "a", "b", dir))
    assert(e.getMessage.contains("envelope") &&
      e.getMessage.contains("zorderWiden"), e.getMessage)
    // nothing was written by the failed append
    assert(spark.read.parquet(s"$dir/data").count() === 100L)
    intercept[IllegalArgumentException](
      Layout.zorderAppend(corpus.filter(lit(false)), "a", "b", dir))
  }

  test("zorderWrite with a provisioned envelope: maintenance can land " +
    "anywhere inside it (not just inside the first cut's data range); " +
    "data outside a GIVEN envelope is rejected at write") {
    val dir = tmp("envelope-prov")
    val seed = spark.range(10, 50).select(col("id").as("a"),
      col("id").as("b"))
    Layout.zorderWrite(seed, "a", "b", dir, bits = 3, nBuckets = 4,
      envelope = Some((0L, 99L, 0L, 99L)))
    // outside the seed's data range, inside the provisioned envelope —
    // a data-derived envelope would have rejected this append
    Layout.zorderAppend(Seq((0L, 99L)).toDF("a", "b"), "a", "b", dir)
    assert(Layout.boxProbe(spark, dir, "a", "b", 0L, 5L, 90L, 99L)
      .count() === 1L)
    intercept[IllegalArgumentException](
      Layout.zorderWrite(seed, "a", "b", tmp("envelope-bad"), bits = 3,
        nBuckets = 4, envelope = Some((20L, 99L, 0L, 99L))))
  }

  test("zorderRepair: orphans dropped, unindexed rows clustered through " +
    "the STORED bounds, audit-clean after, kept rows untouched") {
    val all = spark.range(1000).select(col("id"),
      (col("id") % 97).as("a"), (col("id") * 13 % 503).as("b"))
    val corpus = all.filter(col("id") < 800)
    val dir = tmp("repair")
    // drifted store: missing the interior slice [100, 149] (50 rows of
    // append lag, inside the envelope) and carrying deleted [800, 900)
    Layout.zorderWrite(
      all.filter(col("id") < 900 && !col("id").between(100, 149)),
      "a", "b", dir, bits = 4, nBuckets = 16)
    // zbucket reads back as a directory-inferred partition column
    // (INT at these magnitudes) — cast for a stable read
    val before = spark.read.parquet(s"$dir/data")
      .select(col("id"), col("z"), col("zbucket").cast("long")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (orphans, backfilled) =
      Layout.zorderRepair(corpus, "a", "b", "id", dir)
    assert((orphans, backfilled) === ((100L, 50L)))
    val repaired = spark.read.parquet(s"$dir/data")
    val audit = Profile.indexAudit(corpus, "id", repaired, "id")
      .collect()(0)
    assert(audit.getAs[Long]("n_unindexed") === 0L &&
      audit.getAs[Long]("n_orphaned") === 0L &&
      audit.getAs[Long]("fresh_ppm") === 1000000L)
    // kept rows keep their exact (z, zbucket); backfilled rows get the
    // cell the stored quantization assigns (the probe-completeness
    // invariant) — checked through a probe straddling the slice
    val after = repaired
      .select(col("id"), col("z"), col("zbucket").cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(before.view.filterKeys(_ < 800).forall { case (k, v) =>
      after(k) == v })
    val got = Layout.boxProbe(spark, dir, "a", "b", 10L, 60L, 100L, 400L)
    val want = corpus.filter(col("a").between(10L, 60L) &&
      col("b").between(100L, 400L))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("zorderWiden: the envelope-failure remedy — corpus re-clustered " +
    "under the wider envelope, whole-layout swap, previously-rejected " +
    "appends then land; a domain-dropping 'widen' is rejected") {
    val dir = tmp("widen") + "/layout"
    val corpus = spark.range(100).select(col("id").as("a"),
      (col("id") * 7 % 100).as("b"))
    Layout.zorderWrite(corpus, "a", "b", dir, bits = 3, nBuckets = 4)
    val outside = Seq((500L, 5L)).toDF("a", "b")
    intercept[IllegalArgumentException](
      Layout.zorderAppend(outside, "a", "b", dir))
    Layout.zorderWiden(corpus, "a", "b", dir, (0L, 999L, 0L, 999L))
    Layout.zorderAppend(outside, "a", "b", dir) // now in-envelope
    val got = Layout.boxProbe(spark, dir, "a", "b", 0L, 600L, 0L, 10L)
    val want = corpus.unionByName(outside)
      .filter(col("a").between(0L, 600L) && col("b").between(0L, 10L))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // bounds carry the provisioned envelope (data + bounds swapped
    // TOGETHER — a probe must never see mixed quantization) AND the
    // stored geometry: widen defaults bits/nBuckets from the layout,
    // never from a coarse constant (the r13 ADVICE hazard — a default
    // here would silently degrade a fine layout's pruning tightness)
    val nb = spark.read.parquet(s"$dir/bounds").head()
    assert(nb.getAs[Long]("max_a") === 999L && nb.getAs[Long]("max_b") === 999L)
    assert(nb.getAs[Int]("bits") === 3 && nb.getAs[Int]("n_buckets") === 4)
    intercept[IllegalArgumentException](
      Layout.zorderWiden(corpus, "a", "b", dir, (10L, 999L, 0L, 999L)))
  }

  test("a crash in the widen swap window strands the old layout at " +
    ".__old - every stored-layout read detects the state and names " +
    "the recovery instead of failing on a missing path") {
    val dir = tmp("swapcrash") + "/layout"
    val corpus = spark.range(50).select(col("id").as("a"), col("id").as("b"))
    Layout.zorderWrite(corpus, "a", "b", dir, bits = 3, nBuckets = 4)
    // simulate the between-renames crash: dir moved aside, nothing in
    val moved = new java.io.File(dir)
      .renameTo(new java.io.File(dir + ".__old"))
    assert(moved)
    val e = intercept[IllegalStateException](
      Layout.boxProbe(spark, dir, "a", "b", 0L, 9L, 0L, 9L))
    assert(e.getMessage.contains(".__old") &&
      e.getMessage.contains("renaming"), e.getMessage)
    val e2 = intercept[IllegalStateException](
      Layout.zorderAppend(corpus, "a", "b", dir))
    assert(e2.getMessage.contains(".__old"), e2.getMessage)
    // the named recovery restores the layout intact
    assert(new java.io.File(dir + ".__old").renameTo(new java.io.File(dir)))
    assert(Layout.boxProbe(spark, dir, "a", "b", 0L, 9L, 0L, 9L)
      .count() === 10L)
  }

  test("probe schema invariance over a streamed (layoutBatch-" +
    "maintained) layout: mixed release/appended file schemas read " +
    "merged, batch_id dropped - output columns equal the raw table's") {
    val dir = tmp("streamed-schema") + "/layout"
    val release = spark.range(100).select(col("id").as("a"),
      (col("id") * 7 % 100).as("b"), concat(lit("p"), col("id")).as("payload"))
    Layout.zorderWrite(release, "a", "b", dir, bits = 3, nBuckets = 4,
      envelope = Some((0L, 999L, 0L, 999L)))
    // streaming maintenance stamps batch_id onto appended files only —
    // the store now holds MIXED schemas
    val late = Seq((500L, 5L, "late")).toDF("a", "b", "payload")
    graft.streaming.EventStreams.layoutBatch(spark, late, 3L, dir, "a", "b")
    val probe = Layout.boxProbe(spark, dir, "a", "b", 0L, 600L, 0L, 10L)
    assert(probe.columns.toSeq === release.columns.toSeq,
      s"probe schema ${probe.columns.toSeq} leaked helper columns")
    val want = release.unionByName(late)
      .filter(col("a").between(0L, 600L) && col("b").between(0L, 10L))
    assert(probe.except(want).isEmpty && want.except(probe).isEmpty)
  }

  test("zorderRepair: out-of-envelope unindexed rows fail loudly " +
    "BEFORE any write (the widen-and-rewrite remedy)") {
    val base = spark.range(100).select(col("id"),
      col("id").as("a"), col("id").as("b"))
    val dir = tmp("repair-envelope")
    Layout.zorderWrite(base, "a", "b", dir, bits = 3, nBuckets = 4)
    val corpus = base.unionByName(
      Seq((1000L, 5000L, 5L)).toDF("id", "a", "b"))
    val e = intercept[IllegalArgumentException](
      Layout.zorderRepair(corpus, "a", "b", "id", dir))
    assert(e.getMessage.contains("envelope"), e.getMessage)
    assert(spark.read.parquet(s"$dir/data").count() === 100L)
  }

  test("guards: non-integral columns, bad bucket counts, empty input, " +
    "reserved batch_id column") {
    val df = Seq((1L, "x")).toDF("a", "s")
    val dir = tmp("guard")
    intercept[IllegalArgumentException](
      Layout.zorderWrite(df, "a", "s", dir))
    intercept[IllegalArgumentException](
      Layout.zorderWrite(df.withColumn("b", lit(1L)), "a", "b", dir,
        bits = 3, nBuckets = 7)) // 7 does not divide 64
    intercept[IllegalArgumentException](
      Layout.zorderWrite(df.withColumn("b", lit(1L)).filter(lit(false)),
        "a", "b", dir))
    // batch_id is the streaming maintenance stamp (probes DROP it), so
    // a release over a table carrying its OWN batch_id column would
    // silently strip user data from every probe — rejected loudly
    val e = intercept[IllegalArgumentException](
      Layout.zorderWrite(df.withColumn("b", lit(1L))
        .withColumn("batch_id", lit(7L)), "a", "b", dir))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // the APPEND side gates the same name: a user batch_id value would
    // read as a COMMIT MARKER to committedIn and silently skip the
    // colliding future micro-batch
    val good = spark.range(20).select(col("id").as("a"), col("id").as("b"))
    Layout.zorderWrite(good, "a", "b", dir, bits = 3, nBuckets = 4)
    val e2 = intercept[IllegalArgumentException](
      Layout.zorderAppend(good.withColumn("batch_id", lit(5L)),
        "a", "b", dir))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("zorderWiden refuses to swap while a legacy in-dir streaming " +
    "checkpoint exists (the whole-dir swap would destroy it and the " +
    "resumed stream would restart batch ids at 0)") {
    val dir = tmp("widen-legacy") + "/layout"
    val corpus = spark.range(50).select(col("id").as("a"), col("id").as("b"))
    Layout.zorderWrite(corpus, "a", "b", dir, bits = 3, nBuckets = 4)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/_checkpoint"))
    val e = intercept[IllegalStateException](
      Layout.zorderWidenStore(spark, dir, "a", "b", (0L, 999L, 0L, 999L)))
    assert(e.getMessage.contains("_checkpoint") &&
      e.getMessage.contains(".__checkpoint"), e.getMessage)
    // the layout is untouched by the refused widen
    assert(spark.read.parquet(s"$dir/data").count() === 50L)
  }
}
