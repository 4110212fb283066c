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

  test("guards: non-integral columns, bad bucket counts, empty input") {
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
  }
}
