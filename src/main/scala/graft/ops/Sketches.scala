package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mergeable cardinality sketches: KMV (k-minimum-values) distinct-count
 * estimation with a stored, shard-mergeable artifact.
 *
 * Reference behavior: iceberg-explorer reports table-level metadata
 * (`api/routes/catalog.py` — snapshot row counts, schema) but has no
 * content-cardinality operator; a training-data pipeline needs one
 * constantly ("how many distinct n-grams / URLs / users does this
 * release hold?") and at 100 TB the exact answer — a count-distinct
 * shuffling every value — is the single most expensive statistic a
 * data card asks for. The classic fix is a MERGEABLE sketch computed
 * shard-locally and unioned: per shard, keep the k smallest distinct
 * hash values of the column; the union of per-shard sketches re-ranked
 * to its k smallest is EXACTLY the sketch of the union (each of the k
 * globally-smallest hashes is necessarily among the k smallest of its
 * own shard), so shards sketch independently — new shards append rows,
 * nothing rebuilds — and one tiny merge answers for the whole corpus
 * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
 * stream"; Beyer et al. 2007, "On synopses for distinct-value
 * estimation under multiset operations").
 *
 * Estimator: with hashes uniform on [0, M) (M = 2^60 here), the k-th
 * smallest of n distinct hashes sits near k·M/n, so
 * n̂ = (k−1)·M div h_(k) — the standard unbiased KMV form, computed in
 * exact integer arithmetic (DECIMAL(38,0) product, floor DIV) so the
 * estimate hash-verifies bit-for-bit against a DuckDB oracle running
 * the same formula in HUGEINT. When the merged sketch holds fewer than
 * k hashes the sketch saw EVERY value and the count is exact by
 * construction (n̂ = |sketch|) — small corpora degrade to truth, not
 * to noise.
 *
 * Hash space: [[md5Hash60]] — the 60-bit value of the first 15 hex
 * chars of md5 (the d02/d03/t04-established engine-reproducible
 * device, `('0x' || substr(md5(v), 1, 15))::BIGINT` in DuckDB), so an
 * index-blind oracle recomputes the identical sketch from the raw
 * table.
 *
 * Scale design (100 TB): the only corpus-sized stage is the
 * (shard, hash) distinct, which partial-aggregates map-side before one
 * keyed exchange. The per-shard top-k then runs as a TWO-LEVEL rank —
 * first within (shard, hash mod `salts`) salt groups, which bounds any
 * single window partition to the salt group's distinct hashes, then
 * within shard over the ≤ salts·k survivors — so no task ever ranks a
 * shard's full distinct-value set (the single-window-per-shard shape
 * would straggle exactly on the biggest shard). The k smallest of a
 * shard are each the k smallest of their salt group, so the two-level
 * result is identical to the direct rank (spec-pinned differentially).
 * Downstream of the sketch everything is O(shards·k): merge is a rank
 * over the stored sketch rows, the estimate is a one-row aggregate.
 */
object Sketches {

  /** 2^60 as a DECIMAL(38,0) literal — the md5Hash60 hash-space size. */
  private val M: String = "CAST(1152921504606846976 AS DECIMAL(38,0))"

  /** 60-bit md5 hash of a column's string value (DuckDB-reproducible:
    * `('0x' || substr(md5(v), 1, 15))::BIGINT`). */
  def md5Hash60(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** Word-trigram occurrences of a text column (array of space-joined
    * 3-word windows, t-series tokenization; < 3 words ⇒ empty) — the
    * x14 gate's sketch value and the streaming sketch maintenance's,
    * shared so the two sides cannot drift. */
  def wordTrigrams(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    Shingles.let(Shingles.words(text)) { w =>
      when(size(w) >= 3, transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", slice(w, i, lit(3)))))
        .otherwise(expr("array()").cast("array<string>"))
    }

  /**
   * Per-shard fixed-bin histogram sketch rows: (shard: int, bin: int,
   * n: long) — the mergeable QUANTILE synopsis, third member of the
   * synopsis trio (KMV = distinct count, Bloom = membership, this =
   * rank statistics): per shard, one bounded pass bins an integral
   * metric into `nBins` value-based cells over the release-time
   * [lo, hi] envelope (the Layout.zorderWrite quantization formula —
   * (v − lo)·nBins div (hi − lo + 1) in DECIMAL(38,0), full-BIGINT-
   * range safe), and quantiles fall out of the merged cumulative
   * counts. Bins are VALUE-based, not rank-based, so the artifact is
   * mergeable/appendable exactly like the KMV rows: new shards add
   * rows, [[histMerge]] sums per bin, nothing rebuilds (the
   * t25/perplexity-buckets two-phase device, turned into a STORED
   * artifact). Out-of-envelope values clamp to the edge bins — a
   * late-arriving outlier is counted, visibly at the boundary, rather
   * than dropped or scattered.
   */
  def histSketch(df: DataFrame, valueCol: String, shardCol: String,
                 lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(nBins >= 2, s"histSketch needs nBins >= 2, got $nBins")
    require(lo <= hi, s"histSketch needs lo <= hi, got [$lo, $hi]")
    val bin = expr(
      s"CAST(((CAST($valueCol AS DECIMAL(38,0)) - ($lo)) * $nBins)" +
        s" DIV ((CAST($hi AS DECIMAL(38,0))) - ($lo) + 1) AS BIGINT)")
    // a NULL metric has no rank: excluded (count-distinct semantics),
    // not binned - a null would otherwise form its own NULL-bin group
    // and silently corrupt every cumulative count downstream
    df.filter(col(valueCol).isNotNull)
      .select(col(shardCol).cast("int").as("shard"),
        greatest(lit(0L), least(lit(nBins - 1L), bin)).cast("int")
          .as("bin"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Merge stored histogram rows (any union of shards/appends) into
    * the global per-bin counts: (bin: int, n: long), ≤ nBins rows. */
  def histMerge(sketch: DataFrame): DataFrame =
    sketch.groupBy(col("bin")).agg(sum(col("n")).as("n"))

  /**
   * Quantile estimates from a merged histogram: one row per requested
   * ppm rank — (q_ppm, rank, bin, est_lo, n_total) ordered by q_ppm.
   * rank = ceil(q·N / 10^6) in exact integers; bin = the first bin
   * whose cumulative count reaches the rank; est_lo = the bin's lower
   * bound value, lo + (bin·(hi−lo+1)) div nBins — a deterministic
   * lower envelope of the true quantile, off by at most one bin width.
   * The cumulative window runs over ≤ nBins rows (never data), so the
   * answer side is O(nBins) regardless of corpus size.
   */
  def histQuantiles(merged: DataFrame, qsPpm: Seq[Long],
                    lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 1 && q <= 1000000),
      s"quantile ppms must be in [1, 1000000]: $qsPpm")
    val cum = merged
      .withColumn("cum",
        sum(col("n")).over(BoundedWindow.orderBy(col("bin"), col("bin"))))
      .crossJoin(broadcast(merged.agg(sum(col("n")).as("n_total"))))
    val qs = qsPpm.distinct.sorted
      .map(q => s"($q)").mkString("VALUES ", ", ", " AS q(q_ppm)")
    val ranks = merged.sparkSession.sql(s"SELECT q_ppm FROM ($qs)")
    cum.crossJoin(broadcast(ranks))
      .withColumn("rank", expr(
        "CAST((CAST(q_ppm AS DECIMAL(38,0)) * n_total + 999999)" +
          " DIV 1000000 AS BIGINT)"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("q_ppm"), col("rank"), col("n_total"))
      .agg(min(col("bin")).as("bin"))
      .withColumn("est_lo", expr(
        s"CAST(($lo) + (CAST(bin AS DECIMAL(38,0)) * ((CAST($hi AS " +
          s"DECIMAL(38,0))) - ($lo) + 1)) DIV $nBins AS BIGINT)"))
      .select(col("q_ppm"), col("rank"), col("bin"), col("est_lo"),
        col("n_total"))
      .orderBy(col("q_ppm"))
  }

  /**
   * Per-shard KMV sketch rows: for each shard, the `k` smallest
   * distinct [[md5Hash60]] hashes of `valueCol`. Output
   * (shard: int, h: long), ≤ k rows per shard, ordered nowhere — the
   * artifact is a SET; [[kmvMerge]] re-ranks.
   *
   * This is the stored, mergeable form: write it partitioned or flat,
   * append new shards' rows as they arrive (a shard's sketch never
   * changes retroactively), merge at query time.
   */
  def kmvSketch(df: DataFrame, valueCol: String, shardCol: String,
                k: Int, salts: Int = 64): DataFrame = {
    require(k >= 2, s"kmvSketch needs k >= 2, got $k")
    require(salts >= 1, s"kmvSketch needs salts >= 1, got $salts")
    // NULL values are excluded (count-distinct semantics) - their NULL
    // hash would otherwise sort as the smallest and pollute the
    // k-minimum set of every shard it appears in
    val hashed = df
      .filter(col(valueCol).isNotNull)
      .select(col(shardCol).cast("int").as("shard"),
        md5Hash60(col(valueCol)).as("h"))
      .distinct()
    // two-level bounded rank (see object scaladoc): salt-group top-k,
    // then shard top-k over the ≤ salts·k survivors
    val l1 = hashed
      .withColumn("salt", pmod(col("h"), lit(salts.toLong)))
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("shard"), col("salt"))
          .orderBy(col("h"))))
      .filter(col("rn") <= k)
    l1.withColumn("rk", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("h"))))
      .filter(col("rk") <= k)
      .select(col("shard"), col("h"))
  }

  /**
   * Merge stored sketch rows (any union of per-shard sketches, any
   * number of appends) into the global k-minimum set: (h: long),
   * ≤ k rows. Input is sketch-sized by construction (≤ shards·k rows —
   * the artifact's whole point), so the single-partition rank window
   * here is over a bounded, tiny set, never over corpus data.
   */
  def kmvMerge(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"kmvMerge needs k >= 2, got $k")
    sketch.select(col("h")).distinct()
      .withColumn("rn",
        row_number().over(BoundedWindow.orderBy(col("h"), col("h"))))
      .filter(col("rn") <= k)
      .select(col("h"))
  }

  /**
   * One-row distinct-count estimate from a merged sketch:
   * (k: int, n_hashes: long, kth_min: long, est: long).
   * n_hashes < k ⇒ the sketch is the complete hash set and est is the
   * exact count; otherwise est = (k−1)·2^60 div max(h) in exact
   * DECIMAL(38,0) arithmetic (≤ ~3·10^20 at k = 256 — far inside the
   * 38-digit envelope; the quotient is ≤ 2^60, comfortably BIGINT).
   */
  def kmvEstimate(merged: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"kmvEstimate needs k >= 2, got $k")
    merged
      .agg(count(lit(1)).as("n_hashes"), max(col("h")).as("kth_min"))
      .select(lit(k).as("k"), col("n_hashes"), col("kth_min"),
        when(col("n_hashes") < k, col("n_hashes"))
          .otherwise(expr(
            s"CAST(($M * ${k - 1}) DIV kth_min AS BIGINT)"))
          .as("est"))
  }
}
