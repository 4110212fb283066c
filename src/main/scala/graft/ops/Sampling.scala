package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / splitting / packing operators for training-data
 * curation — the selection stage of an LLM data pipeline (after dedup and
 * quality filtering, before tokenization):
 *
 *  - [[hashSplit]]: reproducible k-way train/val/test assignment
 *  - [[stratifiedQuota]]: per-stratum caps (balance languages/sources)
 *  - [[packSequences]]: group documents into ~fixed-budget training bins
 *
 * Everything is DETERMINISTIC — re-running on the same corpus yields the
 * same assignment (the property curation pipelines need for resumability
 * and for train/test-leak audits). Randomness comes from md5 of the id,
 * not an RNG: md5 hex strings are engine-portable (any SQL engine can
 * recompute and audit the split), unlike seeded PRNG sampling which is
 * engine-private — that is what makes these operators oracle-checkable.
 *
 * Scale: hashSplit is map-only; stratifiedQuota and packSequences use
 * KEYED windows only (stratum / shard), so they scale horizontally —
 * there is no global sort or single-partition window anywhere.
 */
object Sampling {

  /** First-two-hex-digit bucket (0..255) of md5 of the id — the shared
    * deterministic "random" driver for all three operators. */
  private def md5Bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /**
   * Deterministic k-way split: `split = md5_bucket(id) % k` (0-based).
   * Fractions are uniform to within 1/256 per split; a doc's assignment
   * never changes as the corpus grows (unlike `randomSplit`, which
   * reshuffles with partition layout). Map-only — no shuffle at all.
   */
  def hashSplit(df: DataFrame, idCol: String, k: Int,
                splitCol: String = "split"): DataFrame = {
    // the md5 bucket has 256 values: k beyond that would leave splits
    // 256..k-1 permanently empty (and uniformity collapses well before)
    require(k >= 2 && k <= 256, s"hashSplit needs 2 <= k <= 256, got $k")
    df.withColumn(splitCol, pmod(md5Bucket(col(idCol)), lit(k)))
  }

  /**
   * Per-stratum quota: keep the `n` docs of each stratum that sort first
   * by (md5(id), id) — a reproducible uniform subsample that caps any
   * stratum (language, source domain) at `n` docs, the standard rebalance
   * step for skewed corpora. One keyed shuffle (the stratum window);
   * quota rank rides along as `rk`.
   */
  def stratifiedQuota(df: DataFrame, strataCol: String, idCol: String,
                      n: Int): DataFrame = {
    require(n >= 1, "stratifiedQuota needs n >= 1")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= n)
  }

  /**
   * Sequence packing: assign each document to a training bin of roughly
   * `budget` weight (tokens/chars). Documents are deterministically
   * sharded by md5 bucket (packing is SHARD-LOCAL — the classic
   * distributed approximation of the inherently-sequential greedy packer:
   * no global pass, each shard packs independently, so 100 TB packs with
   * shard-count parallelism); within a shard, docs are laid out in
   * (md5, id) order and `bin` = running-weight-before DIV budget, i.e.
   * a bin holds the docs whose preceding cumulative weight falls in the
   * same budget window. Bins can overflow by at most one document —
   * streaming next-fit semantics, the standard trade for one-pass packing.
   *
   * Output: (id, shard, bin, offset) where `offset` is the weight already
   * packed into the bin before this doc.
   */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
                    budget: Long, shards: Int = 16): DataFrame = {
    require(budget >= 1, s"packSequences needs budget >= 1, got $budget")
    // shards bounded by the 256-value md5 bucket (see hashSplit)
    require(shards >= 1 && shards <= 256,
      s"packSequences needs 1 <= shards <= 256, got $shards")
    val shard = pmod(md5Bucket(col(idCol)), lit(shards))
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("__before",
        coalesce(sum(col(weightCol).cast("long")).over(w), lit(0L)))
      // integer DIV, not floor(double /): exact at any cumulative weight
      .withColumn("bin", expr(s"__before DIV ${budget}L"))
      .withColumn("offset", col("__before") - col("bin") * budget)
      .select(col(idCol), col("shard"), col("bin"), col("offset"),
        col(weightCol))
  }

  /**
   * Packing-efficiency report over [[packSequences]]'s assignment — the
   * padding-waste number a data card publishes: per (shard, bin), how
   * many docs START in the bin and their weight total, plus the bin's
   * fill rate against the budget in exact ppm. The all-but-last bins of
   * each shard fill to ~budget by construction; the report quantifies
   * the tail waste and any pathological doc-length skew.
   *
   * Scale: one partial-combined aggregation keyed by (shard, bin) over
   * packSequences' map-side output — the exchange carries 4-long rows.
   */
  def packStats(df: DataFrame, idCol: String, weightCol: String,
                budget: Long, shards: Int = 16): DataFrame = {
    packSequences(df, idCol, weightCol, budget, shards)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol).cast("long")).as("w_total"))
      .withColumn("fill_ppm",
        expr(s"w_total * 1000000 DIV ${budget}L"))
      .orderBy(col("shard"), col("bin"))
  }

  /**
   * Deterministic weighted priority sampling: take `n` documents with
   * inclusion bias proportional to `weightCol` (e.g. upsample long or
   * high-quality docs). Each doc gets priority key
   * `md5_60bit(id) DIV weight` — a doc with twice the weight halves its
   * key's scale, so it wins the ascending-key race proportionally more
   * often (the integer-arithmetic analogue of A-Res exponential keys
   * `-ln(u)/w`, chosen over the float form because every bit is
   * engine-reproducible; the bias curve is documented as approximate,
   * the determinism is exact). Re-running on a grown corpus preserves
   * previously-drawn keys' priorities — stable, auditable sampling.
   *
   * Weights are INTEGER-granular: the weight casts to bigint (2.9
   * truncates to 2), and rows whose weight is below 1 are EXCLUDED from
   * the sample — a zero/negative-weight doc must never compete, not
   * compete at weight 1.
   *
   * Scale: the key is map-only; the global ascending-key top-n plans as
   * TakeOrderedAndProject — per-partition n then a driver merge, no
   * global sort.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n >= 1, s"weightedSample needs n >= 1, got $n")
    require(!df.columns.contains("__key"),
      "column name __key is produced by weightedSample — rename the " +
        "input column first")
    val key = expr(
      s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) " +
        s"as bigint) DIV cast($weightCol as bigint)")
    df.filter(col(weightCol).cast("bigint") >= 1)
      .withColumn("__key", key)
      .orderBy(col("__key"), col(idCol))
      .limit(n)
      .drop("__key")
  }

  /**
   * Deterministic fractional up/down-sampling by source — the corpus
   * MIXING step (training mixes specify per-source epoch weights, e.g.
   * wiki ×2.25, crawl ×0.75): each document is emitted `floor(w)` times,
   * plus one extra copy iff `md5_bucket(id) < round(frac(w)·256)` — so a
   * weight of 2.25 duplicates every doc twice and a deterministic ~25 %
   * of docs (granularity 1/256) a third time, while 0.75 keeps ~75 % of
   * docs once and 0 drops the source entirely. The same md5 driver as
   * [[hashSplit]]: assignment is per-id stable under corpus growth and
   * any SQL engine can recompute which copies exist (epoch-level
   * auditability that RNG sampling can't give).
   *
   * Output: input columns plus `copies` and `copy_ix` (1..copies), one
   * row per emitted copy. Map-only — weight lookup is a literal map,
   * the copy fan-out is an explode; no shuffle at any corpus size.
   */
  def upsampleMix(df: DataFrame, idCol: String, srcCol: String,
                  weights: Map[String, Double],
                  defaultWeight: Double = 1.0): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach { w =>
      require(w >= 0 && w <= 256, s"upsampleMix weights must be in [0, 256], got $w")
    }
    val reserved = Seq("copies", "copy_ix").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"column names $reserved are produced by upsampleMix — rename the " +
        "input columns first")
    def whole(w: Double): Long = math.floor(w).toLong
    def thresh(w: Double): Long = math.round((w - math.floor(w)) * 256)
    val wholeCol =
      if (weights.isEmpty) lit(whole(defaultWeight))
      else coalesce(
        element_at(typedLit(weights.map { case (s, w) => s -> whole(w) }),
          col(srcCol)),
        lit(whole(defaultWeight)))
    val threshCol =
      if (weights.isEmpty) lit(thresh(defaultWeight))
      else coalesce(
        element_at(typedLit(weights.map { case (s, w) => s -> thresh(w) }),
          col(srcCol)),
        lit(thresh(defaultWeight)))
    df.withColumn("copies",
        wholeCol + when(md5Bucket(col(idCol)) < threshCol, 1L).otherwise(0L))
      .filter(col("copies") >= 1)
      .withColumn("copy_ix", explode(sequence(lit(1L), col("copies"))))
  }

  /**
   * Temperature-scaled source mixing at α = 0.5 — the data-recipe
   * operator behind "sample low-resource sources up": a source's share
   * of the `budget` is proportional to sqrt(its doc count), the α = 0.5
   * point of the p(s) ∝ n_s^α family used for multilingual/multi-source
   * training mixes (e.g. the mBERT/XLM exponent-smoothed sampling). The
   * per-doc copy count then follows [[upsampleMix]]'s md5-fractional
   * rule, so the emitted epoch is deterministic and SQL-auditable.
   *
   * Everything after the one sqrt is EXACT integer arithmetic (sqrt is
   * IEEE correctly-rounded, so engines agree bit-for-bit; scaled to
   * integer micros before any summation, so no float-order drift):
   * `s_s = floor(sqrt(n_s)·1e6)`, `T = Σ s_s`,
   * `rate_256(s) = (budget·s_s·256) div (T·n_s)` — the per-doc emission
   * rate in 1/256ths — and `copies = rate_256 div 256 +
   * [md5_bucket(id) < rate_256 mod 256]`.
   *
   * Scale design: the per-source rate table is a tiny aggregate
   * (map-side-combined count per source) cross-joined as a broadcast;
   * the application side is map-only (lookup + explode) — the corpus
   * never shuffles.
   */
  def temperatureMix(df: DataFrame, idCol: String, srcCol: String,
                     budget: Long): DataFrame = {
    require(budget >= 1, s"temperatureMix budget must be >= 1, got $budget")
    val reserved = Seq("copies", "copy_ix", "rate_256").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"column names $reserved are produced by temperatureMix — rename " +
        "the input columns first")
    val counts = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("__n_src"))
      .withColumn("__s_scaled",
        floor(sqrt(col("__n_src").cast("double")) * 1e6).cast("long"))
    val total = counts.agg(sum(col("__s_scaled")).as("__t_scaled"))
    // DECIMAL(38,0) intermediates: budget × s_scaled × 256 overflows
    // 64 bits once budget·sqrt(n_s) passes ~3.6e16 (a plausible
    // corpus-scale product); DuckDB's same expression promotes to
    // HUGEINT, so both engines stay exact.
    val rates = counts.crossJoin(total)
      .withColumn("rate_256",
        expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * __s_scaled * 256) " +
          "div (CAST(__t_scaled AS DECIMAL(38,0)) * __n_src) AS BIGINT)"))
      .select(col(srcCol), col("rate_256"))

    // null-safe join: a NULL source forms its own group in the rate
    // table (like any other value), and must match back — a plain
    // equi-join would silently drop every null-source doc while its
    // count still inflated T
    df.join(broadcast(rates.withColumnRenamed(srcCol, "__mix_src")),
        col(srcCol) <=> col("__mix_src"))
      .drop("__mix_src")
      .withColumn("copies",
        expr("rate_256 div 256") +
          when(md5Bucket(col(idCol)) < col("rate_256") % 256, 1L)
            .otherwise(0L))
      .filter(col("copies") >= 1)
      .withColumn("copy_ix", explode(sequence(lit(1L), col("copies"))))
  }

  /**
   * Reproducible corpus shuffle with EXPLICIT positions: every row gets
   * its exact rank 0..n−1 in the order of `md5(seed || id)` — the
   * deterministic training-order shuffle (new epoch seed ⇒ new
   * permutation; same seed ⇒ byte-identical order on any engine, the
   * property reproducible-training runs need).
   *
   * Scale design — global rank WITHOUT a global window: the md5 key's
   * first byte buckets rows 0..255 uniformly; ranks are the bucket's
   * cumulative offset (a 256-row aggregate, trivially small) plus a
   * BUCKET-KEYED row_number. Bucket is a prefix of the key, so
   * (bucket, key, id) order ≡ (key, id) order and the composition is
   * the exact global rank — q13's single-partition-window anti-pattern
   * never appears; the only per-row shuffle is the 256-way keyed window
   * exchange. Output: (id, key, pos).
   */
  def shufflePositions(df: DataFrame, idCol: String,
                       seed: String): DataFrame =
    bucketOffsetPositions(df, idCol, seed, tierCols = Nil)
      .select(col("id"), col("key"), col("pos"))
      .orderBy(col("id"))

  /**
   * Shared bucket-offset device behind [[shufflePositions]] and
   * [[curriculumPositions]]: exact global rank over
   * (tierCols…, md5(seed‖id), id) composed from a (tier, bucket) COUNT
   * offset table (the one global window runs over ≤ |tiers|·256
   * aggregate rows) + bucket-keyed row_number windows — never a global
   * window over corpus rows. `tierCols` are (column, descending) leading
   * sort keys; empty = pure shuffle.
   */
  private def bucketOffsetPositions(df: DataFrame, idCol: String,
      seed: String, tierCols: Seq[(String, Boolean)]): DataFrame = {
    val keyed = df.select(Seq(col(idCol).as("id"),
        md5(concat(lit(seed + ":"), col(idCol).cast("string"))).as("key")) ++
        tierCols.map { case (c, _) => col(c) }: _*)
      .withColumn("bucket", conv(substring(col("key"), 1, 2), 16, 10)
        .cast("int"))
    val tiers = tierCols.map { case (c, _) => col(c) }
    val tierOrder = tierCols.map { case (c, desc) =>
      if (desc) col(c).desc else col(c).asc }
    val groupCols = tiers :+ col("bucket")
    // single-group window over the BOUNDED (tier, bucket) COUNT table
    // (≤ |distinct tiers|·256 rows — for the pure shuffle |tiers| = 1,
    // for curriculum the distinct fixed-point quality values, a range-
    // bounded constant), never over corpus rows
    val offsets = keyed.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("offset",
        sum(col("n")).over(
          BoundedWindow.orderBy(col("bucket"),
            tierOrder :+ col("bucket").asc: _*)) - col("n"))
      .select(groupCols :+ col("offset"): _*)
    keyed.join(broadcast(offsets),
        tierCols.map(_._1) :+ "bucket")
      .withColumn("pos",
        (col("offset") + row_number().over(
          Window.partitionBy(groupCols: _*)
            .orderBy(col("key"), col("id"))) - 1).cast("long"))
  }

  /**
   * Curriculum ordering: exact global training positions sorted by a
   * difficulty/quality signal DESCENDING, shuffled deterministically
   * within each quality tier (md5(seed‖id) — so same-quality docs are
   * not fed in storage order). The curriculum-learning data order:
   * easy/high-quality first, each tier internally shuffled, positions
   * stable under corpus growth of OTHER tiers' buckets.
   *
   * Same device as [[shufflePositions]]: the one global window runs
   * over the (quality, bucket) COUNT table (|tiers|·256 rows), never
   * over corpus rows; within-group ranks are bucket-keyed windows. The
   * composition equals `row_number() OVER (ORDER BY quality DESC, key,
   * id)` — which is the oracle — without a single-partition sort at any
   * scale.
   *
   * `qualityCol` must be equality-stable across engines (the fixture
   * feeds t02's fixed-point `quality`, hash-exact by construction).
   */
  def curriculumPositions(df: DataFrame, idCol: String,
                          qualityCol: String, seed: String): DataFrame =
    bucketOffsetPositions(
        df.select(col(idCol), col(qualityCol).as("__q")),
        idCol, seed, tierCols = Seq(("__q", true)))
      .select(col("id"), col("__q").as("quality"), col("pos"))
      .orderBy(col("id"))

  /**
   * DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169 —
   * "Data Selection for Language Models via Importance Resampling"):
   * score every raw document by how much its hashed-bigram feature
   * profile resembles a TARGET subcorpus relative to the raw corpus —
   * the domain-targeted selection signal ("pick crawl docs that look
   * like Wikipedia") used to build pretraining mixes.
   *
   * The paper's shape is kept exactly — hashed n-gram features, per-
   * feature target-vs-raw likelihood ratios under add-one smoothing,
   * per-document sum over feature occurrences — but the per-feature
   * term is the SCALED INTEGER ratio
   * `s(b) = ((n_t(b)+1)·(R+B)·10⁶) div ((n_r(b)+1)·(T+B))`
   * (≈ 10⁶·p_target(b)/p_raw(b)) instead of its logarithm: log is the
   * one non-exact step in DSIR, and a monotone per-feature surrogate
   * keeps every bit engine-reproducible (same trade as t11/t14, the
   * perplexity stand-ins). Features are word bigrams hashed to 256
   * md5 buckets (the paper uses 10⁴ hash buckets; the bucket count is
   * the only fidelity knob and 256 keeps the oracle's hex-digit md5
   * spelling). Docs with fewer than two words score 0 — present, not
   * dropped.
   *
   * Scale: feature extraction is map-only explode; the bucket table is
   * ≤ B rows (aggregated map-side, broadcast back); the per-doc sum is
   * one (id, bucket)-keyed partial-aggregated count then an id-keyed
   * sum — shuffles carry (id, bucket, count), never text. DECIMAL(38,0)
   * intermediates: n·R·10⁶ passes 2⁶³ at ~10⁴ × corpus-bigram scale,
   * DuckDB's HUGEINT promotes the same way, both stay exact.
   *
   * Output: (id, n_feats, dsir_score) — rank DESC and take the top
   * budget to select.
   */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  isTarget: Column): DataFrame = {
    val feats = df
      .select(col(idCol).as("id"), isTarget.as("__tgt"),
        split(lower(trim(col(textCol))), "\\s+").as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col("id"), col("__tgt"),
        explode(expr("transform(sequence(1, size(__w) - 1), " +
          "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"))
          .as("__f"))
      .select(col("id"), col("__tgt"), md5Bucket(col("__f")).as("__b"))
    val counts = feats.groupBy(col("__b"))
      .agg(count(lit(1)).as("__n_raw"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__n_tgt"))
    val totals = counts.agg(sum(col("__n_raw")).as("__r"),
      sum(col("__n_tgt")).as("__t"))
    val scores = counts.crossJoin(totals)
      .select(col("__b"),
        expr("CAST((CAST(__n_tgt + 1 AS DECIMAL(38,0)) * (__r + 256) " +
          "* 1000000) div (CAST(__n_raw + 1 AS DECIMAL(38,0)) " +
          "* (__t + 256)) AS BIGINT)").as("__s"))
    val perDoc = feats.groupBy(col("id"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .join(broadcast(scores), Seq("__b"))
      .groupBy(col("id"))
      .agg(sum(col("__c")).as("n_feats"),
        sum(col("__c") * col("__s")).as("dsir_score"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("dsir_score"), lit(0L)).as("dsir_score"))
  }

  /**
   * Split-drift audit: does each split's feature distribution match the
   * corpus? Total-variation distance (in ppm) between a split's
   * bucketed-feature histogram and the whole corpus's — the check run
   * after [[hashSplit]] before trusting val/test numbers (a length-
   * skewed test split silently shifts benchmark difficulty even with
   * zero leakage; this is [[splitLeakage]]'s distributional sibling).
   *
   * `TV(s) = (Σ_b |n_sb·N − n_b·N_s| · 10⁶) div (2·N_s·N)` — exact
   * integer arithmetic end-to-end (DECIMAL(38,0): n_sb·N passes 2⁶³ at
   * ~10¹⁰-doc corpora; DuckDB promotes to HUGEINT identically). Buckets
   * are `least(feature div width, nBuckets−1)` over a non-negative
   * feature (length, token count, quality tier).
   *
   * Scale: one (split, bucket)-keyed count with map-side partials; the
   * histogram table is k·nBuckets rows, everything after it is
   * broadcast-sized. Output: (split, n_docs, tv_ppm) per observed split.
   */
  def splitDrift(df: DataFrame, splitCol: String, featureCol: String,
                 bucketWidth: Long, nBuckets: Int): DataFrame = {
    require(bucketWidth >= 1, s"splitDrift needs bucketWidth >= 1, got $bucketWidth")
    require(nBuckets >= 2, s"splitDrift needs nBuckets >= 2, got $nBuckets")
    // integer DIV, not double /: exact at any feature magnitude
    val bucketed = df.select(col(splitCol).as("split"),
      expr(s"least(greatest(CAST($featureCol AS BIGINT), 0L) " +
        s"DIV ${bucketWidth}L, ${nBuckets - 1L}L)").as("bucket"))
    val sb = bucketed.groupBy(col("split"), col("bucket"))
      .agg(count(lit(1)).as("n_sb"))
    val b = sb.groupBy(col("bucket")).agg(sum(col("n_sb")).as("n_b"))
    val s = sb.groupBy(col("split")).agg(sum(col("n_sb")).as("n_s"))
    val n = sb.agg(sum(col("n_sb")).as("n"))
    // dense (split × bucket) grid: a bucket absent from one split still
    // contributes |0·N − n_b·N_s| — dropping it would understate drift
    val grid = s.crossJoin(b).crossJoin(n)
    grid.join(sb, Seq("split", "bucket"), "left")
      .select(col("split"), col("n_s"), col("n"),
        abs(coalesce(col("n_sb"), lit(0L)).cast("decimal(38,0)") * col("n")
          - col("n_b").cast("decimal(38,0)") * col("n_s")).as("__d"))
      .groupBy(col("split"))
      .agg(first(col("n_s")).as("n_docs"),
        expr("CAST((sum(__d) * 1000000) div " +
          "(2 * CAST(first(n_s) AS DECIMAL(38,0)) * first(n)) AS BIGINT)")
          .as("tv_ppm"))
      .orderBy(col("split"))
  }

  /**
   * Split-leakage audit: near-duplicate pairs that cross split
   * boundaries — the train/test contamination check a training pipeline
   * runs before shipping a split (a near-dup of an eval doc left in
   * train inflates the benchmark; deduplicating across the boundary is
   * the fix, and this report is the evidence).
   *
   * `pairs` is any verified similar-pair set (id_a, id_b) — e.g.
   * [[graft.ops.Dedup.ngramJaccardPairs]] — and `splits` any (id, split)
   * assignment ([[hashSplit]] or an external one). Output is the FIXED
   * k(k+1)/2-row audit matrix over the observed split values (diagonal
   * and zero rows included, so "no row" can never be misread as "no
   * leakage"): pair count and distinct documents involved per unordered
   * split pair. Nonzero off-diagonal = leakage. A pair id with no split
   * assignment is NOT silently dropped: it lands in the `unassignedSplit`
   * bucket (default -1), which joins the matrix axes when present — an
   * audit that discards unauditable rows would defeat itself.
   *
   * Scale: two id-keyed equi-joins of the pair set against the (id,
   * split) projection — the shuffles carry ids and one small int, never
   * text; the matrix itself is k(k+1)/2 rows. The distinct-doc count
   * dedups (split_lo, split_hi, doc) triples, which is bounded by
   * 2 × pairs, not by the corpus.
   */
  def splitLeakage(splits: DataFrame, idCol: String, splitCol: String,
                   pairs: DataFrame, unassignedSplit: Int = -1): DataFrame = {
    val s = splits.select(col(idCol), col(splitCol))
    val lab = pairs.select(col("id_a"), col("id_b"))
      .join(s.select(col(idCol).as("id_a"), col(splitCol).as("__sa")),
        Seq("id_a"), "left")
      .join(s.select(col(idCol).as("id_b"), col(splitCol).as("__sb")),
        Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("__sa"), lit(unassignedSplit)).as("__sa"),
        coalesce(col("__sb"), lit(unassignedSplit)).as("__sb"))
      .select(col("id_a"), col("id_b"),
        least(col("__sa"), col("__sb")).as("split_lo"),
        greatest(col("__sa"), col("__sb")).as("split_hi"))
      // four downstream references (pair counts, doc counts, both axis
      // unions) would otherwise re-run the caller's pair generation —
      // typically a full near-dup join — up to four times; the labeled
      // pair set is bounded by |pairs|, so materializing it is cheap
      .localCheckpoint(true)
    val nPairs = lab.groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = lab
      .select(col("split_lo"), col("split_hi"),
        explode(array(col("id_a"), col("id_b"))).as("doc"))
      .distinct()
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_docs"))
    // matrix axes: the observed split values, plus the unassigned bucket
    // whenever any pair landed in it
    val vals = s.select(col(splitCol).as("__v")).distinct()
      .union(lab.select(col("split_lo").as("__v")))
      .union(lab.select(col("split_hi").as("__v")))
      .distinct()
    val matrix = vals.as("a").crossJoin(vals.as("b"))
      .filter(col("a.__v") <= col("b.__v"))
      .select(col("a.__v").as("split_lo"), col("b.__v").as("split_hi"))
    matrix.join(nPairs, Seq("split_lo", "split_hi"), "left")
      .join(nDocs, Seq("split_lo", "split_hi"), "left")
      .select(col("split_lo"), col("split_hi"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy(col("split_lo"), col("split_hi"))
  }

  /**
   * Cross-split deduplication — the ACTION for [[splitLeakage]]'s audit:
   * remove from every non-protected split the documents that are
   * near-duplicates of a protected-split (eval/test) document, keeping
   * the protected side (a near-dup of an eval doc left in train inflates
   * the benchmark; this enforces the boundary). Output: one row per
   * assigned document (id, split, is_removed, linked_id) where
   * `linked_id` is the SMALLEST protected neighbor that caused the
   * removal (null when kept) — the provenance a reviewer spot-checks.
   *
   * Protected docs are never removed; within-split duplicates are
   * untouched (the d-family's job — this op only enforces the split
   * boundary). Pairs whose ids carry no split assignment are ignored
   * here; [[splitLeakage]]'s unassigned bucket is the audit for those.
   *
   * Scale: two id-keyed equi-joins of the pair set against the (id,
   * split) projection, one pair-bounded min-aggregation, one id-keyed
   * left join back — shuffles carry (id, int) rows, never text.
   */
  def crossSplitDedup(splits: DataFrame, idCol: String, splitCol: String,
                      pairs: DataFrame, protectedSplit: Long): DataFrame = {
    val s = splits.select(col(idCol).as("id"), col(splitCol).as("split"))
    val lab = pairs.select(col("id_a"), col("id_b"))
      .join(s.select(col("id").as("id_a"), col("split").as("__sa")),
        Seq("id_a"))
      .join(s.select(col("id").as("id_b"), col("split").as("__sb")),
        Seq("id_b"))
      // both direction filters read this — materialize the pair-bounded
      // set so the caller's pair generation runs once (splitLeakage's
      // lesson)
      .localCheckpoint(true)
    val hits = lab
      .filter(col("__sa") === protectedSplit &&
        col("__sb") =!= protectedSplit)
      .select(col("id_b").as("id"), col("id_a").as("linked"))
      .unionAll(lab
        .filter(col("__sb") === protectedSplit &&
          col("__sa") =!= protectedSplit)
        .select(col("id_a").as("id"), col("id_b").as("linked")))
      .groupBy(col("id")).agg(min(col("linked")).as("linked_id"))
    s.join(hits, Seq("id"), "left")
      .select(col("id"), col("split"),
        col("linked_id").isNotNull.as("is_removed"), col("linked_id"))
      .orderBy(col("id"))
  }

  /**
   * Epoch-plan realization of [[mixtureAllocation]]: per document, how
   * many copies enter the training mix so each domain spends exactly its
   * allocated weight — `full = alloc div avail` whole epochs for every
   * doc, plus ONE extra copy for the greedy md5-ordered prefix of docs
   * whose cumulative weight fits the fractional remainder
   * `alloc − full·avail` (docs are never split; the prefix stops at the
   * first doc that would overflow, next-fit semantics like [[packSequences]]).
   * Deterministic: the fractional tier is ordered by (md5(id), id) — the
   * same reproducible-uniform device as [[stratifiedQuota]], so WHICH
   * docs repeat is stable as the corpus grows.
   *
   * Scale design (100 TB): the allocation itself is domain-sized and
   * broadcast back; the only corpus-sized stage is the per-domain
   * cumulative-weight window ([[packSequences]]'s exact shape — keyed by
   * domain, no global sort). A single colossal domain serializes its own
   * window; shard it with the p08 bucket-offset composition if that ever
   * binds. Output: (id, domain, w, n_copies), id-ordered.
   */
  def epochPlan(df: DataFrame, domainCol: String, idCol: String,
                weightCol: String, capExpr: Column,
                budget: Long): DataFrame = {
    val alloc = mixtureAllocation(df, domainCol, weightCol, capExpr, budget)
      .select(col("domain"), col("avail"), col("alloc"))
      .withColumn("full_epochs",
        expr("CASE WHEN avail > 0 THEN alloc DIV avail ELSE 0L END"))
      .withColumn("frac_w",
        col("alloc") - col("full_epochs") * col("avail"))
    val w = Window.partitionBy(col("__dom"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(domainCol).as("__dom"),
        col(weightCol).cast("long").as("__w"))
      .withColumn("__before", coalesce(sum(col("__w")).over(w), lit(0L)))
      // null-safe: a NULL domain is a real group in mixtureAllocation
      // (groupBy keeps it, NULLS LAST rank order is pinned), so the
      // realization join must not silently drop its docs — every doc
      // the allocation counted gets a verdict row
      .join(broadcast(alloc), col("__dom") <=> col("domain"))
      .withColumn("n_copies", col("full_epochs") +
        when(col("__before") + col("__w") <= col("frac_w"), 1L).otherwise(0L))
      .select(col(idCol).as("id"), col("domain"), col("__w").as("w"),
        col("n_copies"))
      .orderBy(col("id"))
  }

  /**
   * Mixture-weight solver: allocate a token budget across domains under
   * per-domain repetition caps — the "how many tokens of each source
   * goes into the training mix" step (UniMax-style: equal shares,
   * capped at `cap = epochs × available`, excess redistributed to
   * uncapped domains — water-filling).
   *
   * Exact integer closed form (no iteration): with caps sorted
   * ascending, a domain at rank r is capped iff even a threshold equal
   * to its own cap cannot spend the budget —
   * `P_{r−1} + cap_r · (n − r + 1) ≤ T` (P = running cap prefix sum).
   * The uncapped u = n − R domains then share `rem = T − P_R` as
   * `t = rem div u` each, and the `rem − t·u < u` leftover tokens go
   * +1 apiece to the first uncapped domains in (cap, domain) order —
   * largest-remainder rounding with a deterministic tie order, so
   * `Σ alloc = min(T, Σ cap)` EXACTLY. If every domain caps
   * (Σ cap ≤ T), alloc = cap and the shortfall is visible as
   * Σ alloc < T. All divisions are single floor divisions on BIGINT —
   * bit-identical in DuckDB.
   *
   * `capExpr` is evaluated per domain against columns (domain, avail) —
   * e.g. `expr("avail * 4")` for a flat 4-epoch cap, or a per-domain
   * epoch schedule keyed off the domain name.
   *
   * Scale design (100 TB): the only corpus-sized stage is the
   * per-domain `sum(weight)` with map-side partial aggregation; domain
   * cardinality is small by construction (sources/languages, 10s–1000s),
   * so the sort window and prefix sums run on a domain-count-sized
   * single partition and everything downstream is broadcast-sized.
   * Output: (domain, avail, cap, alloc, epochs_ppm = 1e6·alloc div
   * avail), ordered by domain.
   */
  def mixtureAllocation(df: DataFrame, domainCol: String,
                        weightCol: String, capExpr: Column,
                        budget: Long): DataFrame = {
    require(budget >= 0, s"mixtureAllocation needs budget >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window

    // cast("long") up front: callers may pass double/decimal weight
    // columns (the HTTP route admits any NumericType) — the DIVs below
    // and the route's getLong both need BIGINT, and the oracle casts the
    // same sum to BIGINT
    val avail = df.groupBy(col(domainCol).as("domain"))
      .agg(sum(col(weightCol)).cast("long").as("avail"))
      .select(col("domain"), col("avail"), capExpr.cast("long").as("cap"))
    // domain-count-sized from here down: a tiny single-partition window
    // over (cap, domain) — unique, hence a total order. NULLS LAST
    // pinned explicitly: Spark's asc default is NULLS FIRST but the
    // DuckDB oracle's is NULLS LAST, and a null domain must rank the
    // same on both sides
    val w = BoundedWindow.orderBy(col("avail"),
      col("cap").asc_nulls_last, col("domain").asc_nulls_last)
    // one SELECT so all three window expressions land in one analyzer
    // pass: the shared constant partition key extracts to a single
    // alias and the Window operators collapse onto one exchange+sort
    // (sequential withColumns would each extract their own key and
    // defeat CollapseWindow)
    val ranked = avail.select(col("domain"), col("avail"), col("cap"),
      row_number().over(w).as("r"),
      sum(col("cap")).over(w).as("p"),                 // P_r inclusive
      count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("n"))
    // capped iff P_{r-1} + cap_r·(n−r+1) ≤ T  (P_{r-1} = p − cap)
    val flagged = ranked.withColumn("capped",
      col("p") - col("cap") + col("cap") * (col("n") - col("r") + 1) <= lit(budget))
    val caps = flagged.agg(
      sum(when(col("capped"), 1L).otherwise(0L)).as("big_r"),
      sum(when(col("capped"), col("cap")).otherwise(0L)).as("p_r"))
    flagged.crossJoin(broadcast(caps))
      .withColumn("u", col("n") - col("big_r"))
      .withColumn("t", when(col("u") > 0,
        expr(s"(${budget}L - p_r) DIV u")).otherwise(lit(0L)))
      .withColumn("rem", lit(budget) - col("p_r") - col("t") * col("u"))
      .withColumn("alloc", when(col("capped"), col("cap"))
        .otherwise(col("t") +
          when(col("r") - col("big_r") <= col("rem"), 1L).otherwise(0L)))
      .select(col("domain"), col("avail"), col("cap"), col("alloc"),
        expr("CASE WHEN avail > 0 THEN (1000000L * alloc) DIV avail " +
          "ELSE 0L END").as("epochs_ppm"))
      .orderBy(col("domain").asc_nulls_last)
  }

  /**
   * Release-shard manifest — the last step of a corpus build: cut the
   * [[shufflePositions]] training order into contiguous shards of
   * roughly `shardBudget` weight (tokens/chars) and publish one manifest
   * row per shard, the WebDataset/tar-shard release convention (a
   * training job opens shard k and reads docs in order; the manifest is
   * the index it trusts). Shards are next-fit in GLOBAL shuffle order —
   * `shard = cumulative-weight-before DIV budget`, the [[packSequences]]
   * rule but over the md5(seed‖id) permutation instead of shard-local
   * (md5, id) order, because release shards must preserve the exact
   * training order p08 published. A shard overflows by at most one doc
   * (streaming next-fit; same trade as p03).
   *
   * Manifest row: (shard, n_docs, w_total, first_pos, last_pos, etag,
   * fill_ppm) with `etag` = BIT_XOR of the 60-bit md5 prefix of each
   * member id — an order-independent, engine-portable content
   * fingerprint any SQL engine can recompute to audit a shard without
   * reading it. `first_pos`/`last_pos` are p08's exact global positions;
   * contiguity (first_pos of shard k = last_pos of k−1 + 1) is the
   * spec-pinned invariant. Null/negative weights count as 0 (the doc
   * still occupies its position).
   *
   * Scale design: the same bucket-offset device as [[shufflePositions]]
   * — the md5 key's first byte buckets rows 0..255; ONE 256-row
   * aggregate carries both count and weight offsets (its window runs
   * over 256 rows, never corpus rows); positions and cumulative weights
   * are bucket-keyed windows; the manifest is a keyed aggregation with
   * map-side partials (bit_xor is associative). At 100 TB: one 256-way
   * exchange + one shard-keyed exchange of 5-long rows.
   */
  def shardManifest(df: DataFrame, idCol: String, weightCol: String,
                    seed: String, shardBudget: Long): DataFrame = {
    require(shardBudget >= 1,
      s"shardManifest needs shardBudget >= 1, got $shardBudget")
    val keyed = df.select(col(idCol).as("id"),
        greatest(coalesce(col(weightCol).cast("long"), lit(0L)), lit(0L))
          .as("w"))
      .withColumn("key",
        md5(concat(lit(seed + ":"), col("id").cast("string"))))
      .withColumn("bucket",
        conv(substring(col("key"), 1, 2), 16, 10).cast("int"))
    // 256-row offset table: positions AND weights cumulated before each
    // bucket — the one global window runs over bucket aggregates only
    val wOff = BoundedWindow.orderBy(col("bucket"), col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one SELECT for both cumulations: the shared constant partition
    // key extracts once and the two window sums stay in ONE Window
    // operator over one exchange (sequential withColumns would split
    // them)
    val offsets = keyed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("bw"))
      .select(col("bucket"),
        coalesce(sum(col("n")).over(wOff), lit(0L)).as("pos_off"),
        coalesce(sum(col("bw")).over(wOff), lit(0L)).as("w_off"))
    val wb = Window.partitionBy(col("bucket"))
      .orderBy(col("key"), col("id"))
    val assigned = keyed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("pos",
        (col("pos_off") + row_number().over(wb) - 1).cast("long"))
      .withColumn("__before", col("w_off") + coalesce(
        sum(col("w")).over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("shard", expr(s"__before DIV ${shardBudget}L"))
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("w_total"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        expr("bit_xor(cast(conv(substring(md5(cast(id as string)), 1, " +
          "15), 16, 10) as bigint))").as("etag"))
      .withColumn("fill_ppm",
        expr(s"(w_total * 1000000L) DIV ${shardBudget}L"))
      .select(col("shard"), col("n_docs"), col("w_total"),
        col("first_pos"), col("last_pos"), col("etag"), col("fill_ppm"))
      .orderBy(col("shard"))
  }
}
