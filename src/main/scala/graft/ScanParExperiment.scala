package graft

import org.apache.spark.sql.functions._

/** r14 measurement scratch main (guide §1): is the heavy per-doc
  * expression work single-task because the fixture is one parquet file?
  * A/B: shingle+minhash projection as the ops build it today vs the same
  * projection computed after a round-robin widen. Deleted/ignored by the
  * driver contract. */
object ScanParExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.buildSession("32")
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.tables.Tables(spark, sfDir, "documents")

    def time(tag: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s runs=${runs.map(t => f"$t%.3f").mkString(", ")}")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val heavy = (d: org.apache.spark.sql.DataFrame) => d.select(
      col("doc_id").as("id"),
      graft.ops.Shingles.wordShinglesFast(col("text"), 3).as("sh"))
      .withColumn("sig", graft.functions.GraftFunctions.minHashSig(col("sh"), 128))

    println("scan partitions = " + docs.rdd.getNumPartitions)
    time("as-is (project pre-exch)") { noop(heavy(docs).repartition(col("id"))) }
    time("widen32 then project") { noop(heavy(docs.repartition(32)).repartition(col("id"))) }
    time("widen32 project no-2nd-exch") { noop(heavy(docs.repartition(32))) }
    time("as-is no-2nd-exch") { noop(heavy(docs)) }
    // winnowing fingerprints (t08/t29/t31 shape)
    val fps = (d: org.apache.spark.sql.DataFrame) => d.select(
      col("doc_id").as("cid"),
      explode(graft.functions.GraftFunctions.winnow(
        coalesce(col("text"), lit("")), 8, 4, "md5")).as("fp"))
    time("winnow md5 as-is") { noop(fps(docs)) }
    time("winnow md5 widen32") { noop(fps(docs.repartition(32))) }
    spark.stop()
  }
}
