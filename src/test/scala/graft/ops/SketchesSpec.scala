package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("kmvSketch: per-shard k smallest distinct hashes, duplicates collapse") {
    val df = Seq(
      (0, "a"), (0, "b"), (0, "c"), (0, "a"), (0, "a"), // dup values
      (1, "a"), (1, "x")) // "a" appears in BOTH shards — shard-local sets
      .toDF("shard", "v")
    val sk = Sketches.kmvSketch(df, "v", "shard", k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // shard 0 saw 3 distinct values but keeps only its 2 smallest hashes
    assert(sk.count(_._1 == 0) === 2)
    assert(sk.count(_._1 == 1) === 2)
    val h = (v: String) => spark.range(1)
      .select(Sketches.md5Hash60(lit(v))).head.getLong(0)
    val h0 = Seq("a", "b", "c").map(h).sorted.take(2).toSet
    assert(sk.filter(_._1 == 0).map(_._2).toSet === h0)
    assert(sk.filter(_._1 == 1).map(_._2).toSet === Set(h("a"), h("x")))
  }

  test("two-level salted rank equals the direct per-shard rank (differential)") {
    val df = spark.range(2000).select(
      (col("id") % 3).cast("int").as("shard"),
      concat(lit("v"), col("id") % 700).as("v")) // 700 distinct per shard-ish
    val fast = Sketches.kmvSketch(df, "v", "shard", k = 50, salts = 8)
    val direct = df
      .select(col("shard"), Sketches.md5Hash60(col("v")).as("h")).distinct()
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("h"))))
      .filter(col("rn") <= 50).select(col("shard"), col("h"))
    assert(fast.except(direct).isEmpty && direct.except(fast).isEmpty)
  }

  test("kmvMerge: k smallest of the union; cross-shard duplicates collapse") {
    val df = Seq.tabulate(40)(i => (i % 4, s"u$i")).toDF("shard", "v")
      .union(Seq((0, "shared"), (1, "shared"), (2, "shared")).toDF("shard", "v"))
    val sk = Sketches.kmvSketch(df, "v", "shard", k = 64)
    val merged = Sketches.kmvMerge(sk, k = 8).as[Long].collect()
    val all = df.select(Sketches.md5Hash60(col("v")).as("h"))
      .distinct().as[Long].collect().sorted.take(8)
    assert(merged.sorted.toSeq === all.toSeq)
  }

  test("kmvEstimate: exact when n < k, KMV formula when saturated") {
    // 5 distinct values, k = 8: the sketch IS the value set — est exact
    val small = Seq.tabulate(5)(i => (0, s"s$i")).toDF("shard", "v")
    val sSk = Sketches.kmvSketch(small, "v", "shard", k = 8)
    val sRow = Sketches.kmvEstimate(Sketches.kmvMerge(sSk, 8), 8).head
    assert(sRow.getLong(1) === 5L && sRow.getLong(3) === 5L)
    // saturated: est = (k-1) * 2^60 div kth_min, checked independently
    val big = spark.range(5000).select(lit(0).as("shard"),
      concat(lit("b"), col("id")).as("v"))
    val k = 64
    val row = Sketches.kmvEstimate(
      Sketches.kmvMerge(Sketches.kmvSketch(big, "v", "shard", k), k), k).head
    val kth = row.getLong(2)
    val want = (BigInt(k - 1) * BigInt("1152921504606846976") / BigInt(kth))
      .toLong
    assert(row.getLong(1) === k.toLong && row.getLong(3) === want)
    // and the estimate is in the right ballpark of the 5000 truth
    assert(row.getLong(3) > 2500L && row.getLong(3) < 10000L,
      s"est ${row.getLong(3)}")
  }

  test("merged estimate matches a single-shard sketch of the same data " +
    "(shard-merge moves no information)") {
    val df = spark.range(3000).select(
      (col("id") % 7).cast("int").as("shard"),
      concat(lit("w"), col("id") % 1100).as("v"))
    val k = 32
    val sharded = Sketches.kmvEstimate(
      Sketches.kmvMerge(Sketches.kmvSketch(df, "v", "shard", k), k), k).head
    val single = Sketches.kmvEstimate(
      Sketches.kmvMerge(
        Sketches.kmvSketch(df.withColumn("shard", lit(0)), "v", "shard", k),
        k), k).head
    assert(sharded.getLong(2) === single.getLong(2))
    assert(sharded.getLong(3) === single.getLong(3))
  }

  test("append = new shard rows: merge(old ∪ delta) ≡ sketch of the union") {
    val old = spark.range(1000).select(
      (col("id") % 2).cast("int").as("shard"),
      concat(lit("n"), col("id")).as("v"))
    val delta = spark.range(1000, 1500).select(
      lit(2).as("shard"), concat(lit("n"), col("id")).as("v"))
    val k = 16
    val stored = Sketches.kmvSketch(old, "v", "shard", k)
      .union(Sketches.kmvSketch(delta, "v", "shard", k)) // the append
    val viaAppend = Sketches.kmvEstimate(Sketches.kmvMerge(stored, k), k).head
    val rebuilt = Sketches.kmvEstimate(
      Sketches.kmvMerge(
        Sketches.kmvSketch(old.union(delta), "v", "shard", k), k), k).head
    assert(viaAppend.getLong(2) === rebuilt.getLong(2))
    assert(viaAppend.getLong(3) === rebuilt.getLong(3))
  }

  test("histSketch: hand-checked value-based bins, out-of-envelope " +
    "values clamp to the edges") {
    val df = spark.range(100).select(lit(0).as("shard"), col("id").as("v"))
    val sk = Sketches.histSketch(df, "v", "shard", 0L, 99L, 10)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(sk === (0 until 10).map(b => b -> 10L).toMap)
    val clamped = Sketches.histSketch(
      Seq((0, -50L), (0, 5L), (0, 500L)).toDF("shard", "v"),
      "v", "shard", 0L, 99L, 10)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(clamped === Map(0 -> 2L, 9 -> 1L)) // -50 clamps low, 500 high
  }

  test("histMerge: shard rows sum per bin — merge ≡ build over the union") {
    val df = spark.range(1000).select(
      (col("id") % 7).cast("int").as("shard"), (col("id") % 223).as("v"))
    val merged = Sketches.histMerge(
      Sketches.histSketch(df, "v", "shard", 0L, 222L, 16))
    val direct = Sketches.histMerge(Sketches.histSketch(
      df.withColumn("shard", lit(0)), "v", "shard", 0L, 222L, 16))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("histQuantiles: exact-integer ranks and bin lower bounds on a " +
    "uniform hand fixture") {
    val df = spark.range(100).select(lit(0).as("shard"), col("id").as("v"))
    val m = Sketches.histMerge(Sketches.histSketch(df, "v", "shard",
      0L, 99L, 10))
    val out = Sketches.histQuantiles(m, Seq(500000L, 990000L, 1000000L),
        0L, 99L, 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    // p50: rank ceil(.5*100)=50, cum reaches 50 at bin 4, est_lo 40
    assert(out(500000) === ((50L, 4, 40L, 100L)))
    // p99: rank 99 -> bin 9 (cum 90 < 99 at bin 8), est_lo 90
    assert(out(990000) === ((99L, 9, 90L, 100L)))
    // p100: rank 100 -> last bin
    assert(out(1000000) === ((100L, 9, 90L, 100L)))
    intercept[IllegalArgumentException](
      Sketches.histQuantiles(m, Seq(0L), 0L, 99L, 10))
    intercept[IllegalArgumentException](
      Sketches.histSketch(df, "v", "shard", 5L, 4L, 10))
    intercept[IllegalArgumentException](
      Sketches.histSketch(df, "v", "shard", 0L, 99L, 1))
  }

  test("NULL values are excluded, not mis-ranked: a null hash must " +
    "never enter the k-minimum set, a null metric never a bin") {
    val kmv = Sketches.kmvSketch(
      Seq((0, Some("a")), (0, Option.empty[String]), (0, Some("b")))
        .toDF("shard", "v"), "v", "shard", k = 8)
    assert(kmv.count() === 2L)
    assert(kmv.filter(col("h").isNull).count() === 0L)
    val hist = Sketches.histSketch(
      Seq((0, Some(5L)), (0, Option.empty[java.lang.Long].map(Long2long)),
        (0, Some(7L))).toDF("shard", "v"), "v", "shard", 0L, 9L, 10)
    assert(hist.agg(sum(col("n"))).head.getLong(0) === 2L)
    assert(hist.filter(col("bin").isNull).count() === 0L)
  }

  test("guards: k and salts lower bounds") {
    val df = Seq((0, "a")).toDF("shard", "v")
    intercept[IllegalArgumentException](Sketches.kmvSketch(df, "v", "shard", 1))
    intercept[IllegalArgumentException](
      Sketches.kmvSketch(df, "v", "shard", 2, salts = 0))
    intercept[IllegalArgumentException](Sketches.kmvMerge(df, 1))
    intercept[IllegalArgumentException](Sketches.kmvEstimate(df, 1))
  }
}
