package graft

/**
 * BASELINE probe for the layout family's widen remedy
 * (`Layout.zorderWidenStore`) — the one r13-surface operator without a
 * measured scale row (VERDICT r13 ask #7). Measures the STORE-SIZED
 * rewrite: seed a release-provisioned layout over the events table
 * (the p18/p19 envelope shape), then time `zorderWidenStore` to a
 * strictly-containing envelope — the maintenance form that reads the
 * store itself with mergeSchema and swaps data + bounds by the
 * two-rename protocol. The seed rebuild between runs is untimed:
 * widen consumes its own input (the swapped store carries the NEW
 * envelope, so a second widen of the same store would not repeat the
 * same work).
 *
 * Bench conventions otherwise: same session config, two warm-up
 * passes, GC between timed runs, median of 3.
 *
 * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.WidenProbe
 * Prints one `GRAFT_TIME widen <median> <runs>` line.
 */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    import org.apache.spark.sql.functions._
    val ev = graft.tables.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val eb = ev.agg(
      min(col("user_id")).cast("long"), max(col("user_id")).cast("long"),
      min(col("event_id")).cast("long"),
      max(col("event_id")).cast("long")).head()
    val seedEnv = (eb.getLong(0), eb.getLong(1), eb.getLong(2), eb.getLong(3))
    val widerEnv = (seedEnv._1 - 1000L, seedEnv._2 + 1000L,
      seedEnv._3 - 1000L, seedEnv._4 + 1000L)
    val base = System.getProperty("java.io.tmpdir") + "/graft_widen_probe"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def seed(): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      graft.ops.Layout.zorderWrite(ev, "user_id", "event_id", base,
        envelope = Some(seedEnv))
    }
    def widen(): Unit =
      graft.ops.Layout.zorderWidenStore(spark, base, "user_id",
        "event_id", widerEnv)
    (1 to 2).foreach { _ => seed(); widen() }
    val ts = (1 to 3).map { _ =>
      seed()
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      widen()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"GRAFT_TIME widen ${ts(1)}%.4f " +
      ts.map(t => f"$t%.4f").mkString(" "))
    spark.stop()
    sys.exit(0)
  }
}
