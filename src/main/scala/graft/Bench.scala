package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main — runs every `SparkEntry.queries` entry on
 * `SPARK_GRAFT_SF_DIR` and prints one JSON line
 * `{"metric","value","unit","queries","sf"}` for the driver's BENCH gate.
 *
 * Methodology: a warm-up pass (session/codegen/JIT and parquet footer
 * caches) then, per query, MEDIAN OF 3 consecutive timed runs (a single
 * timed pass lets one GC pause pollute a query's number and makes
 * round-over-round comparison noise-dominated). Runs materialize every
 * column through the `noop` DSv2 sink — `count()` would let Catalyst prune
 * projections and under-measure; `collect()` would measure driver transfer
 * instead of the engine. 32 shuffle partitions to match local[32] (not the
 * 200 default — tiny-partition overhead dominates at bench scale; on a real
 * cluster this is cores-proportional, SURVEY §4).
 *
 * `SPARK_GRAFT_BENCH_ONLY=t01_token_counts,t02_quality_score` restricts the
 * run to a subset (diagnosis loop); unset = full inventory (driver gate).
 *
 * Output: stdout carries ONE JSON line whose `value` is the full-inventory
 * total and whose `queries` map is the HEADLINE subset (the driver records
 * only the last 2000 chars of stdout — see BASELINE.md "Stdout protocol");
 * the full per-query map is written to `SPARK_GRAFT_BENCH_OUT` (default
 * /root/repo/BENCH_FULL.json) and per-run 3-decimal timings to stderr.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The generated-class cache defaults to 100 entries; a 65-query
      // inventory compiles several codegen stages per query, so by the time
      // the timed pass reaches the alphabetical tail (t01/t02, q46-q48) the
      // warm-up's entries are evicted and each first run pays a full Janino
      // recompile — the round-2 "9× regression" was exactly this. 1000
      // entries keeps the whole inventory resident (a long-lived serving
      // engine wants the same setting).
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // The closure-heavy queries (d10/d12/d14, m04, x03/x04) localCheckpoint
      // intermediate pair sets; those RDD blocks outlive the query and, over
      // 160+ queries × 4 passes, fill the block manager until the heavy tail
      // measures GC/eviction churn instead of the query (full-inventory runs
      // showed m04 at 2.7× its isolated median). Dropping leftover blocks
      // between queries makes each measurement independent of inventory order.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Warm-up: whole inventory once (JIT, codegen cache, file listing).
    ordered.foreach { case (n, fn) =>
      try run(n, fn) catch { case _: Throwable => () }
    }

    val results = ordered.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try run(name, fn) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"bench $name%-24s runs=[${times.map(t => f"$t%.3f").mkString(", ")}]")
      name -> times(1)
    }
    // The driver records only the LAST 2000 characters of stdout and parses
    // the JSON line out of that window (BENCH_r01..r03 all show
    // `"parsed": null` — the full-precision line was ~2400 chars and lost
    // its opening brace to the window, with sbt's "[success] ..." trailer
    // (~75 chars) eating into the budget too), and the inventory grows
    // every round, so an all-queries map cannot fit forever (81 entries at
    // 2 decimals = 1908 chars — 18 chars of slack left). The stdout line
    // therefore carries `value` = the FULL-inventory total plus a
    // `queries` map of the HEADLINE queries (every pipeline/flagship op —
    // anything not named q*/s* — plus a fixed relational set); the full
    // per-query inventory is written to BENCH_FULL.json in the repo (and
    // 3-decimal timings to stderr above) for round-over-round comparison.
    def f3(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // At 147 queries even the every-pipeline-op map (~77 entries) no
    // longer fits the 2000-char window, so the stdout map is an explicit
    // per-family flagship set (~27 entries, ~750 chars — room to grow);
    // BENCH_FULL.json still records every query.
    val headline = Set(
      "q01_scan_filter", "q07_groupby_agg", "q13_window_rank",
      "q35_json_fns", "q49_interval_join", "q50_hll_union",
      "q51_apx_quantile", "q52_bloom_semi",                   // relational
      "d02_minhash_dedup", "d04_ngram_jaccard", "d10_transitive_clusters",
      "e01_cosine_topk", "e07_ivfpq_topk", "e12_hamming_topk",
      "t02_quality_score", "t08_contamination", "t14_bigram_lm",
      "p06_temperature_mix", "p08_shuffle_order", "p10_dsir",
      "x03_split_leakage", "x05_split_drift",
      "r01_resample_ffill", "r04_rolling_zscore",
      "m03_media_neardup", "m04_media_neardup_lsh",
      "g01_host_pagerank", "j01_asof_join")
    def isHeadline(n: String) = headline(n)
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1))
      .getOrElse("\"" + sfDir + "\"")
    val fullLine =
      s"""{"metric":"total","value":${"%.2f".formatLocal(java.util.Locale.ROOT, total)},"unit":"sec","queries":${jsonMap(results)},"sf":$sfNum}"""
    // only a FULL-inventory run may overwrite the committed record — a
    // SPARK_GRAFT_BENCH_ONLY diagnosis run would clobber it with a
    // partial map and a bogus one-query total
    if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_OUT")) {
      val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/root/repo/BENCH_FULL.json")
      try java.nio.file.Files.write(java.nio.file.Paths.get(benchOut),
        (fullLine + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"WARN could not write $benchOut: $e") }
    }
    val line =
      s"""{"metric":"total","value":${"%.2f".formatLocal(java.util.Locale.ROOT, total)},"unit":"sec","queries":${jsonMap(results.filter(r => isHeadline(r._1)))},"sf":$sfNum}"""
    if (line.length > 1900)
      System.err.println(s"WARN bench JSON line ${line.length} chars — " +
        "approaching the driver's 2000-char stdout tail window")
    println(line)
    spark.stop()
  }
}
