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
}
