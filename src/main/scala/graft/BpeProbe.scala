package graft

/**
 * BASELINE probe for the t27 BPE trainer at arbitrary `nMerges` — the
 * measurement behind COVERAGE.md's "linear-in-rounds at the enforced
 * nMerges <= 64 bound" claim (the t27 inventory entry runs 8 rounds;
 * the enforced bound is 64, and a claim without its artifact is worse
 * than no claim). Bench conventions: same session config, two warm-up
 * passes, GC between timed runs, noop-sink materialization, median of
 * 3, per-run block cleanup.
 *
 * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.BpeProbe [nMerges ...]
 * (default: 8 64). Prints one `GRAFT_TIME t27@<n> <median> <runs>`
 * line per configuration.
 */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mergeCounts = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(8, 64)
    val spark = Bench.buildSession(cpus)
    mergeCounts.foreach { m =>
      val fn = (s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ops.TextAnalysis.bpeTrain(
          graft.tables.Tables(s, d, "documents"), "text", "doc_id",
          nMerges = m)
      (1 to 2).foreach(_ => Bench.runOnce(spark, sfDir, fn))
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        Bench.runOnce(spark, sfDir, fn)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"GRAFT_TIME t27@$m ${ts(1)}%.4f " +
        ts.map(t => f"$t%.4f").mkString(" "))
    }
    spark.stop()
    sys.exit(0)
  }
}
