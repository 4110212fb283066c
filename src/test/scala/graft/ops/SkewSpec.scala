package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Salting must preserve join/aggregation semantics exactly while
  * splitting hot keys across partitions. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  // 10k rows, 90% on one hot key — the distribution that breaks a
  // hash-partitioned join
  private lazy val skewed = spark.range(0, 10000)
    .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
  private lazy val dim = Seq((1L, "hot"), (10L, "a"), (20L, "b"), (30L, "c"))
    .toDF("k", "name")

  test("saltedJoin equals the unsalted inner join, row for row") {
    val plain = skewed.join(dim, "k")
      .select("k", "payload", "name").collect().map(_.toSeq.toString).sorted
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8)
      .select("k", "payload", "name").collect().map(_.toSeq.toString).sorted
    assert(salted.length === plain.length)
    assert(salted === plain)
  }

  test("saltedAgg equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("payload").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val salted = Skew.saltedAgg(skewed, "k", saltFactor = 8)(
      Seq(sum("payload").as("s"), count(lit(1)).as("n")),
      Seq(sum("s").as("s"), sum("n").as("n")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted === direct)
  }

  test("salt actually splits the hot key across groups in phase 1") {
    val phase1Groups = skewed
      .withColumn("__salt", (rand(seed = 42) * 8).cast("int"))
      .filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(phase1Groups > 1, "hot key stayed in a single salt group")
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // one hot key owning 1/4 of rows, thresholds lowered so the fixture
    // triggers the same OptimizeSkewedJoin path a 100 TB hot key would.
    // The plan must be COLLECTED through its own QueryExecution — AQE
    // replans only the execution that actually runs (a .write uses a
    // separate QueryExecution and leaves this one's plan untouched).
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "100",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "800",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "800",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 1000, 1, 10).selectExpr(
        "CASE WHEN id < 250 THEN 249 WHEN id >= 750 THEN 1000 ELSE id END AS key1",
        "id AS value1")
      val right = spark.range(0, 1000, 1, 10).selectExpr(
        "CASE WHEN id < 250 THEN 249 ELSE id END AS key2", "id AS value2")
      val df = left.join(right, col("key1") === col("key2"))
      val n = df.collect().length
      assert(n == 63000) // 250*250 hot + 500 tail matches
      // the final plan nests the join inside a ResultQueryStageExec whose
      // inner plan is a member, not a child — collect() can't reach it, so
      // assert on the rendered plan (SMJ prints "SortMergeJoin(skew=true)")
      val rendered = df.queryExecution.executedPlan.toString
      assert(rendered.contains("SortMergeJoin(skew=true)"),
        s"expected OptimizeSkewedJoin to mark the join:\n$rendered")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
