package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSuite {
  import spark.implicits._

  test("no false negatives: every value that built the filter hits") {
    val corpus = spark.range(2000)
      .select(concat(lit("doc-"), col("id")).as("v"))
    val bloom = Bloom.bloomBuild(corpus, "v", nWords = 128, k = 4)
    val probe = Bloom.bloomProbe(bloom,
      corpus.withColumn("id", monotonically_increasing_id()),
      "v", nWords = 128, k = 4)
    assert(probe.filter(!col("bloom_hit")).count() === 0L)
  }

  test("false-positive rate is in the designed band, and misses are " +
    "real non-members") {
    // n = 480, m = 128*63 = 8064 bits, k = 4 -> fp ~ (1-e^-0.238)^4 ~ 0.2%
    val corpus = spark.range(480)
      .select(concat(lit("in-"), col("id")).as("v"))
    val bloom = Bloom.bloomBuild(corpus, "v", nWords = 128, k = 4)
    val outside = spark.range(5000)
      .select(col("id"), concat(lit("out-"), col("id")).as("v"))
    val hits = Bloom.bloomProbe(bloom, outside, "v",
      nWords = 128, k = 4).filter(col("bloom_hit")).count()
    // generous band: expected ~10 of 5000; anything near corpus-scale
    // means the arithmetic is broken
    assert(hits < 100L, s"false positives: $hits/5000")
  }

  test("merge ≡ build over the union (the mergeable-artifact property)") {
    val a = spark.range(300).select(concat(lit("a-"), col("id")).as("v"))
    val b = spark.range(300).select(concat(lit("b-"), col("id")).as("v"))
    val merged = Bloom.bloomMerge(
      Bloom.bloomBuild(a, "v", 64, 4).union(Bloom.bloomBuild(b, "v", 64, 4)))
    val direct = Bloom.bloomBuild(a.union(b), "v", 64, 4)
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("pre-filter composition: bloom-gated exact dedup equals plain " +
    "exact dedup (the contract the gate query certifies)") {
    val corpus = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("cid", "v")
    val delta = Seq((10L, "alpha"), (11L, "delta"), (12L, "beta"),
      (13L, "zzz")).toDF("id", "v")
    val bloom = Bloom.bloomBuild(corpus, "v", 16, 4)
    val probed = Bloom.bloomProbe(bloom, delta, "v", 16, 4)
    val viaBloom = probed.filter(col("bloom_hit"))
      .join(corpus, Seq("v")).groupBy(col("id"))
      .agg(min(col("cid")).as("dup_of"))
    val plain = delta.join(corpus, Seq("v")).groupBy(col("id"))
      .agg(min(col("cid")).as("dup_of"))
    assert(viaBloom.except(plain).isEmpty && plain.except(viaBloom).isEmpty)
    // and the true members were all bloom hits
    assert(probed.filter(col("id").isin(10L, 12L) && !col("bloom_hit"))
      .count() === 0L)
  }

  test("null value is handled symmetrically (build '' ≡ probe '')") {
    val corpus = Seq(Option.empty[String], Some("x")).toDF("v")
    val bloom = Bloom.bloomBuild(corpus, "v", 16, 2)
    val probe = Bloom.bloomProbe(bloom,
      Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Some("y")))
        .toDF("id", "v"), "v", 16, 2)
      .select(col("id"), col("bloom_hit")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probe(1L) && probe(2L))
  }

  test("probe broadcasts the filter (never a shuffle for the join)") {
    val corpus = spark.range(1000)
      .select(concat(lit("c-"), col("id")).as("v"))
    val bloom = Bloom.bloomBuild(corpus, "v", 256, 4)
    val probe = Bloom.bloomProbe(bloom,
      spark.range(100).select(col("id"), concat(lit("c-"), col("id"))
        .as("v")), "v", 256, 4)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("bloomBuildSharded ≡ per-shard bloomBuild (one corpus pass, " +
    "row-identical store)") {
    val df = spark.range(600).select((col("id") % 3).as("shard"),
      concat(lit("v-"), col("id")).as("v"))
    val sharded = Bloom.bloomBuildSharded(df, "v", "shard", 32, 4)
    val perShard = (0L to 2L).map { sh =>
        Bloom.bloomBuild(df.filter(col("shard") === sh), "v", 32, 4)
          .select(lit(sh).as("shard"), col("w"), col("bits"))
      }.reduce(_ unionByName _)
    assert(sharded.except(perShard).isEmpty &&
      perShard.except(sharded).isEmpty)
    // and the sharded store merges to the one-shot corpus filter
    val merged = Bloom.bloomMerge(sharded.select(col("w"), col("bits")))
    val direct = Bloom.bloomBuild(df, "v", 32, 4)
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("verdicts key on the VALUE: duplicate and null ids cannot " +
    "conflate distinct values (the r12 false-negative advisory)") {
    val corpus = Seq("present").toDF("v")
    val bloom = Bloom.bloomBuild(corpus, "v", 16, 4)
    // one id carries a member AND a (guaranteed-distinct) non-member;
    // a third row has a NULL id but a member value — under per-id
    // aggregation the member rows read false (a contract violation)
    val delta = Seq((Some(1L), "present"), (Some(1L), "absent-zq9"),
      (Option.empty[Long], "present")).toDF("id", "v")
    val got = Bloom.bloomProbe(bloom, delta, "v", 16, 4)
      .select(col("v"), col("bloom_hit")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("present"), "member value must hit regardless of id reuse")
    // rows sharing the id keep independent verdicts (the absent value
    // may rarely false-positive, but must never drag the member down)
  }

  test("guards: degenerate shapes rejected") {
    val df = Seq((1L, "a")).toDF("id", "v")
    intercept[IllegalArgumentException](Bloom.bloomBuild(df, "v", 0, 4))
    intercept[IllegalArgumentException](
      Bloom.bloomProbe(df, df, "v", 16, 0))
  }
}
