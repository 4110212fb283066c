package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Document deduplication operators for large-scale training-data pipelines.
 *
 * Four families, in increasing fuzziness: exact (content hash), MinHash+LSH
 * (set-similarity), SimHash (bitwise fingerprint), and n-gram Jaccard via an
 * inverted shingle index. Each returns one row per input document with its
 * cluster representative (`keep_id`) and an `is_dup` flag, so downstream
 * pipelines can either filter survivors (`!is_dup`) or audit clusters.
 *
 * Scale design (the part that matters at 100 TB):
 *  - Exact dedup groups on a 256-bit content digest, never on the raw text:
 *    the shuffle moves 32-byte keys, not documents.
 *  - MinHash/SimHash shuffle only fixed-width signatures; candidate
 *    generation is a self-equi-join on (band_id, band_hash) — Catalyst
 *    plans it as a shuffled hash/sort-merge join keyed on the bucket, so
 *    work is proportional to colliding candidates, not to n².
 *  - Verification (exact Jaccard / Hamming) happens only on candidate
 *    pairs, joined back to per-doc signatures.
 *  - Signature math (minhash, simhash) runs through native Catalyst
 *    expressions (graft.functions.MinHashSig / SimHash64 — one JVM loop
 *    per document instead of hashes × shingles interpreted lambda
 *    evaluations; the higher-order-function forms below are kept as the
 *    executable reference semantics and are equivalence-tested against
 *    the native ones). No UDFs, no driver collects, no Python boundary.
 */
object Dedup {

  /** Large prime < 2^31 for the (a*x+b) mod p MinHash family; products
    * stay < 2^62 so 64-bit arithmetic never overflows. */
  private val MinHashPrime = 2147483647L

  /** SplitMix64 — deterministic coefficient generator (public-domain
    * algorithm; same constants as java.util.SplittableRandom). */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /**
   * Exact deduplication by content digest — the baseline every pipeline
   * runs first. Returns (id, keep_id, n_copies, is_dup) for every doc;
   * `keep_id` = min id among docs with byte-identical text.
   */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val digest = sha2(col(textCol), 256)
    val w = Window.partitionBy(digest)
    docs
      .withColumn("keep_id", min(col(idCol)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col(idCol), col("keep_id"), col("n_copies"),
        (col(idCol) =!= col("keep_id")).as("is_dup"))
      .orderBy(col(idCol))
  }

  /**
   * MinHash signature column: `numHashes` permutation-mins over the shingle
   * set, one pass over the shingles with an array accumulator
   * (`aggregate` + `zip_with(least)`).
   */
  def minHashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    val as = array((0 until numHashes).map(i =>
      lit(math.abs(splitmix64(seed + 2L * i)) % (MinHashPrime - 1) + 1)): _*)
    val bs = array((0 until numHashes).map(i =>
      lit(math.abs(splitmix64(seed + 2L * i + 1)) % MinHashPrime)): _*)
    val init = array_repeat(lit(MinHashPrime), numHashes)
    aggregate(shingles, init, (acc, s) =>
      zip_with(acc, zip_with(as, bs, (a, b) => pmod(a * pmod(s, lit(MinHashPrime)) + b, lit(MinHashPrime))), least(_, _)))
  }

  /**
   * MinHash + LSH near-duplicate detection.
   *
   * shingle → minhash(numHashes) → split signature into `bands` bands of
   * numHashes/bands rows → candidate pairs = docs sharing any band hash →
   * verify exact shingle-set Jaccard >= `threshold` → cluster rep = min id
   * over verified neighbors (one-hop, deterministic).
   */
  def minHashLSH(
      docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    clusterReps(docs, idCol, minHashPairs(docs, textCol, idCol,
      shingleLen, numHashes, bands, threshold))
  }

  /**
   * The verified near-dup PAIR set behind [[minHashLSH]], exposed for
   * composition (transitive clustering, pipeline audits): banded
   * candidate generation, then exact shingle-Jaccard verification —
   * output (id_a, id_b, sim) with id_a < id_b. Same recall argument as
   * [[minHashLSH]]: every pair at/above the threshold shares a band on
   * the gate fixture, and every emitted pair is exactly verified.
   */
  def minHashPairs(
      docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rows = numHashes / bands
    val sigs = minHashSigs(docs, textCol, idCol, shingleLen, numHashes)
    val banded = bandedIndex(sigs, bands, rows)

    val cand = banded.as("l").join(banded.as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    val bySh = sigs.select(col("id"), col("sh"))
    cand
      .join(bySh.as("a"), col("id_a") === col("a.id"))
      .join(bySh.as("b"), col("id_b") === col("b.id"))
      .select(col("id_a"), col("id_b"),
        Shingles.jaccard(col("a.sh"), col("b.sh")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /**
   * The full corpus-dedup pipeline in one call — what a user actually
   * runs before training: exact dedup (sha-256 digest), MinHash+LSH
   * fuzzy pairs over the exact survivors, TRANSITIVE clustering
   * (connected components, not one-hop), then canonical selection
   * (longest doc per cluster, ties to min id). Output one row per
   * input doc: (id, exact_rep, cluster_rep, canonical_id, is_kept) —
   * `is_kept` marks exactly the docs a training run would retain.
   *
   * Scale: digest window is a 32-byte-keyed exchange (d01); the fuzzy
   * tier shuffles signatures only (d02); components run pointer-jumping
   * rounds over the verified PAIR set, which is orders of magnitude
   * smaller than the corpus (d10); canonical selection is one keyed
   * window over survivor ids. Nothing all-pairs, nothing collected.
   */
  def dedupPipeline(
      docs: DataFrame, textCol: String, idCol: String, lengthCol: String,
      shingleLen: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    // materialize the digest tier once: er feeds the survivor filter AND
    // the final join, and survivors feed the signature build, the
    // component closure, and the canonical window — without the
    // checkpoint the corpus-sized sha2 scan + 32-byte exchange re-execute
    // once per consumer (the same waste minhashEstimate pins down)
    val er = docs.select(col(idCol).as("id"),
        sha2(col(textCol), 256).as("__dig"))
      .select(col("id"),
        min(col("id")).over(Window.partitionBy(col("__dig")))
          .as("exact_rep"))
      .localCheckpoint(true)
    val survivors = docs.join(
      er.filter(col("id") === col("exact_rep"))
        .select(col("id").as(idCol)), Seq(idCol))
      .localCheckpoint(true)
    val pairs = minHashPairs(survivors, textCol, idCol,
      shingleLen, numHashes, bands, threshold)
    val reps = graft.ops.ConnectedComponents.clusterReps(
      survivors.select(col(idCol)), idCol, pairs)
    val canon = canonicalize(reps, survivors, idCol, lengthCol)
    er.join(canon.select(col("id").as("exact_rep"),
        col("keep_id").as("cluster_rep"), col("canonical_id")),
        Seq("exact_rep"))
      .select(col("id"), col("exact_rep"), col("cluster_rep"),
        col("canonical_id"), (col("id") === col("canonical_id")).as("is_kept"))
      .orderBy(col("id"))
  }

  /**
   * 64-bit SimHash fingerprint of a token array: per bit j, sum +1/-1 over
   * token hashes' bit j, then take the sign bit. Computed as one
   * `aggregate` with a 64-int array accumulator.
   */
  def simHashBits(tokens: Column): Column = {
    val bitIdx = sequence(lit(0), lit(63))
    val counts = aggregate(
      transform(tokens, t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, transform(bitIdx, j =>
        when(call_function("shiftright", h, j.cast("int"))
          .bitwiseAND(1L) === 1L, 1L).otherwise(-1L)),
        _ + _))
    // Recombine sign bits into one BIGINT fingerprint.
    aggregate(
      zip_with(counts, bitIdx, (c, j) =>
        when(c > 0, call_function("shiftleft", lit(1L), j.cast("int")))
          .otherwise(0L)),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /**
   * SimHash near-duplicate detection: fingerprint → 4 x 16-bit chunks →
   * candidates share any chunk (pigeonhole: Hamming distance <= 3 implies
   * at least one identical chunk) → verify `bit_count(a XOR b) <= maxHamming`.
   */
  def simHash(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, hashMode: String = "xx"): DataFrame = {
    // exchange barrier: fingerprints are computed once, the chunk explode
    // and both self-join sides reuse the exchange (see minHashLSH note).
    // hashMode "md5" (Md5Hash60 token hashes) makes the whole fingerprint
    // reproducible in DuckDB SQL — the d03 gate runs that mode so the
    // Hamming-verified output carries a real oracle; "xx" (xxhash64) is
    // the default scale path.
    GraftFunctions.register(docs.sparkSession)
    val fps = docs.select(col(idCol).as("id"),
      GraftFunctions.simHash64(Shingles.words(col(textCol)), hashMode).as("fp"))
      .repartition(col("id"))

    val chunked = fps.select(col("id"), col("fp"),
        posexplode(transform(sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("fp"), c.cast("int") * 16)
            .bitwiseAND(0xFFFFL))))
      .toDF("id", "fp", "chunk_id", "chunk")

    // Verify BEFORE de-duplicating candidates: the Hamming gate is one
    // xor+popcount per joined row, so running it on the raw chunk
    // collisions (≤4× multiplicity) costs almost nothing, while the
    // distinct() then shuffles only the VERIFIED pairs — a set bounded by
    // the true near-dup count — instead of the full candidate explosion
    // with two 64-bit fingerprints per row. (The old distinct-then-verify
    // order made this exchange the operator's memory-pressure amplifier
    // inside long benchmark runs: 1.5 s isolated, 26 s under heap churn.)
    // `ham` is a function of the pair, so it rides through distinct().
    val verified = chunked.as("l").join(chunked.as("r"),
        col("l.chunk_id") === col("r.chunk_id") &&
        col("l.chunk") === col("r.chunk") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.fp").bitwiseXOR(col("r.fp"))).as("ham"))
      .filter(col("ham") <= maxHamming)
      .distinct()
      .select(col("id_a"), col("id_b"), col("ham").cast("double").as("sim"))

    clusterReps(docs, idCol, verified)
  }

  /**
   * N-gram Jaccard similarity join via a prefix-filtered inverted index
   * (the SSJoin/PPJoin principle): order every doc's shingles by a global
   * (df asc, shingle) total order and index only the first
   * |A| - ceil(t*|A|) + 1 — any pair with jaccard >= t MUST collide inside
   * both prefixes, so recall is exactly 1 while the index (and the
   * quadratic candidate join behind it) keeps only ~(1-t) of each doc.
   * Candidate pairs are further pruned by PPJoin's length filter
   * (t*|A| <= |B| <= |A|/t for any qualifying pair) and positional filter
   * (the overlap still reachable after the colliding prefix positions must
   * cover the required t/(1+t)*(|A|+|B|)) — both are implications of
   * jaccard >= t, so recall stays exactly 1 while the candidate set
   * shrinks ~6x on homogeneous corpora. Surviving candidates are verified
   * with exact jaccard on the full shingle sets. Hot shingles
   * (df > `maxShingleFreq`) are additionally dropped from the index —
   * they sort last (df order) so they rarely reach a prefix, and a pair
   * whose only shared signal is ultra-common shingles carries ~no
   * similarity information (documented approximation).
   */
  def ngramJaccard(
      docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, threshold: Double = 0.8,
      maxShingleFreq: Int = 1000): DataFrame =
    clusterReps(docs, idCol,
      ngramJaccardPairs(docs, textCol, idCol, shingleLen, threshold,
        maxShingleFreq))

  /** The verified similar-pair set behind [[ngramJaccard]] —
    * (id_a, id_b, sim) with id_a < id_b and exact Jaccard >= threshold.
    * Exposed so transitive clustering (ConnectedComponents.clusterReps)
    * and audit queries can consume the raw pairs. */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, threshold: Double = 0.8,
      maxShingleFreq: Int = 1000): DataFrame =
    ngramJaccardPairsSized(docs, textCol, idCol, shingleLen, threshold,
        maxShingleFreq)
      .select(col("id_a"), col("id_b"), col("sim"))

  /** [[ngramJaccardPairs]] plus the exact integer set sizes the verify
    * join already holds — (id_a, id_b, sim, inter, ma, mb). Consumers
    * that need exact-integer jaccard (lshPlan's j_ppm) read it from
    * here instead of re-joining the pair set against a second shingle
    * projection (which re-scanned and re-shingled the corpus once per
    * join side — profiled as the single largest job in d17/x10). The
    * plain form projects these columns away, so its plan is unchanged
    * after column pruning. */
  private[ops] def ngramJaccardPairsSized(
      docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, threshold: Double = 0.8,
      maxShingleFreq: Int = 1000): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    ngramJaccardPairsFromShingles(
      docs.select(col(idCol).as("id"),
        Shingles.wordShinglesFast(col(textCol), shingleLen).as("sh")),
      threshold, maxShingleFreq)
  }

  /** The PPJoin machine over a PREPARED (id, sh) shingle table — the
    * composition point the r15 shared-artifact builds use: corpusBuild /
    * incrementalBuild shingle each document ONCE into a checkpointed
    * artifact table and run every pair machine over id-selected subsets
    * of it, instead of re-scanning and re-shingling the corpus text per
    * machine. The df ordering, prefix filter, hot-shingle cap and exact
    * verification all run over THIS table's rows — so a machine fed a
    * per-corpus subset computes exactly the pair set the text form
    * would (per-corpus df and cap; VERDICT r14's recall-safety
    * condition). */
  private[ops] def ngramJaccardPairsFromShingles(
      sh0: DataFrame, threshold: Double,
      maxShingleFreq: Int): DataFrame = {
    val sh = sh0.select(col("id"), col("sh"))
      .repartition(col("id"))   // one shingle computation, reused below
    // set size rides the explode — no second (unordered) window pass is
    // needed to recover it per shingle row
    val inverted = sh.select(col("id"), size(col("sh")).as("m"),
      explode(col("sh")).as("s"))
    val df_ = inverted.groupBy(col("s")).agg(count(lit(1)).as("df"))

    // ceil over a 6-dp pre-round: plain ceil(m * t) in doubles overshoots
    // when the product lands one ulp above the exact integer (e.g.
    // 100 * 0.07 = 7.000000000000001 → 8), which would shorten the
    // prefix below the safe bound and silently drop qualifying pairs.
    def ceilT(c: Column): Column = ceil(round(c * threshold, 6))

    // Prefix positions are computed over the FULL (df asc, shingle asc)
    // order — positions stay truthful when the hot-shingle cap then drops
    // index rows; m is the true set size so the length filter below is an
    // exact implication of full-set jaccard.
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("s"))
    val prefix = inverted.join(df_, "s")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("m") - ceilT(col("m")) + 1 &&
        col("df") <= maxShingleFreq)
      .select(col("id"), col("s"), col("__rk").as("rk"), col("m"))

    val cand = prefix.as("l").join(prefix.as("r"),
        col("l.s") === col("r.s") && col("l.id") < col("r.id") &&
        // length filter: jaccard >= t ⇒ t*|A| <= |B| (both directions)
        col("r.m") >= ceilT(col("l.m")) && col("l.m") >= ceilT(col("r.m")) &&
        // positional filter: past positions (rk_l, rk_r) at the colliding
        // shingle, at most min(m_l - rk_l, m_r - rk_r) + 1 overlap remains;
        // a qualifying pair needs >= t/(1+t) * (m_l + m_r). The first
        // collision of any qualifying pair satisfies this, so it survives.
        least(col("l.m") - col("l.rk"), col("r.m") - col("r.rk")) + 1 >=
          ceil(round((col("l.m") + col("r.m")) *
            (threshold / (1 + threshold)), 6)))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    // exact verification on the full shingle sets of surviving pairs;
    // the integer set sizes ride along for exact-ppm consumers
    cand
      .join(sh.as("a"), col("id_a") === col("a.id"))
      .join(sh.as("b"), col("id_b") === col("b.id"))
      .select(col("id_a"), col("id_b"),
        Shingles.jaccard(col("a.sh"), col("b.sh")).as("sim"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long")
          .as("inter"),
        size(col("a.sh")).cast("long").as("ma"),
        size(col("b.sh")).cast("long").as("mb"))
      .filter(col("sim") >= threshold)
  }

  /**
   * Dedup-threshold sensitivity sweep — the audit a pipeline runs BEFORE
   * committing to a similarity threshold: one row per candidate
   * threshold with the qualifying pair count, the documents any pair
   * touches, the documents one-hop min-id dedup would drop, and the drop
   * rate (ppm of the corpus). Threshold tuning is table stakes in
   * curation papers (Gopher/RefinedWeb both report sweeps); without this
   * view the threshold is picked blind.
   *
   * Dropped = distinct `id_b`: pairs are emitted id_a < id_b, so a doc
   * is dropped by min-id dedup exactly when it appears on the b side of
   * some qualifying pair — no rep computation needed per threshold.
   *
   * Scale design: the similarity join runs ONCE, at the LOWEST candidate
   * threshold (the verified pair set at t_min contains every higher
   * threshold's set — `sim` is a per-pair scalar, so each sweep row is a
   * filter over the same pairs, not a re-join). The checkpointed pair
   * set is bounded by the true near-dup mass at t_min; the sweep
   * replicates only PAIR rows (24 bytes) × |thresholds| through a
   * broadcast-thresholds theta join, never the corpus, and collapses
   * immediately in keyed aggregates.
   */
  def thresholdSweep(
      docs: DataFrame, textCol: String, idCol: String,
      thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9),
      shingleLen: Int = 3, maxShingleFreq: Int = 1000): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep needs >= 1 threshold")
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = ngramJaccardPairs(docs, textCol, idCol, shingleLen,
      thresholds.min, maxShingleFreq).localCheckpoint(true)
    val total = math.max(docs.select(col(idCol)).count(), 1L) // ANSI div-0
    val tDf = thresholds.sorted.toDF("threshold")
    val byPair = pairs
      .join(broadcast(tDf), col("sim") >= col("threshold"))
      .groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    val byDoc = pairs
      .select(col("sim"), explode(array(
        struct(col("id_a").as("id"), lit(false).as("is_b")),
        struct(col("id_b").as("id"), lit(true).as("is_b")))).as("e"))
      .select(col("sim"), col("e.id").as("id"), col("e.is_b").as("is_b"))
      .join(broadcast(tDf), col("sim") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(countDistinct(col("id")).as("n_docs_touched"),
        countDistinct(when(col("is_b"), col("id"))).as("n_dropped"))
    tDf.join(byPair, Seq("threshold"), "left")
      .join(byDoc, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_touched"), lit(0L)).as("n_docs_touched"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        expr(s"1000000L * coalesce(n_dropped, 0L) div ${total}L")
          .as("drop_ppm"))
      .orderBy(col("threshold"))
  }

  /**
   * MinHash-LSH parameter planner — the informed-knob companion to
   * [[thresholdSweep]]: x08 tells you what a Jaccard THRESHOLD removes;
   * x10 tells you what recall each (bands, rows-per-band) factorization
   * of the signature actually buys ON THIS CORPUS's own near-duplicate
   * population, before you commit d02's index shape. For every
   * factorization b·r = `numHashes` and every VERIFIED similar pair
   * (exact Jaccard ≥ `floorThreshold`), the detect probability under
   * banded MinHash is p = 1 − (1 − j^r)^b (the standard S-curve,
   * Leskovec et al., Mining of Massive Datasets ch. 3) — evaluated in
   * exact fixed-point: j in ppm, both powers as iterated
   * `acc·x DIV 1e6` floors, so every engine reproduces the same
   * integers bit-for-bit (a float pow would hinge on libm parity; the
   * t11/t14 device).
   *
   * Output, one row per factorization: (bands, rows_per_band,
   * index_rows = bands·n_docs — the index-size cost of the config,
   * n_pairs, exp_found_ppm = Σp — expected detected pairs in ppm units,
   * mean_p_ppm, min_p_ppm — the worst verified pair's detection odds).
   * Read it as: fewer rows per band ⇒ higher recall, bands× the index.
   *
   * Scale design: ONE similarity join at the floor threshold builds the
   * verified pair set (the x08 shape — bounded by the true near-dup
   * mass); exact-integer jaccard comes out of that machine's own verify
   * join (ngramJaccardPairsSized — no second shingle scan); the pair
   * set crosses only the ≤ d(numHashes) factorizations (a broadcast of
   * divisor-count rows, not corpus rows); the S-curve folds are per-row
   * codegen'd HOFs over ≤ numHashes-step sequences; everything
   * collapses in one keyed aggregate. The corpus is scanned once,
   * shuffled never.
   */
  def lshPlan(docs: DataFrame, textCol: String, idCol: String,
              numHashes: Int = 128, floorThreshold: Double = 0.5,
              shingleLen: Int = 3, maxShingleFreq: Int = 1000): DataFrame = {
    require(numHashes >= 1 && numHashes <= 1024,
      s"lshPlan needs 1 <= numHashes <= 1024, got $numHashes")
    val spark = docs.sparkSession
    GraftFunctions.register(spark) // the shingle projection needs it
    import spark.implicits._
    val configs = (1 to numHashes).filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
      .toDF("bands", "rows_per_band")
    // verified pairs once at the floor; j as exact integer ppm (the
    // double `sim` is one correctly-rounded division away from the true
    // rational — floor(sim·1e6) can land one ulp low) computed FROM THE
    // MACHINE'S OWN VERIFY JOIN (ngramJaccardPairsSized): the r14 form
    // re-joined the pair ids against a second, un-barriered shingle
    // projection, re-scanning and re-shingling the corpus once per join
    // side — profiled as the largest single job in d17 (1.45 s) and
    // x10. Same integer arithmetic, two corpus scans and two joins
    // removed (guide §2.4).
    val jp = ngramJaccardPairsSized(docs, textCol, idCol, shingleLen,
        floorThreshold, maxShingleFreq)
      .select(col("id_a"), col("id_b"),
        expr("(1000000L * inter) DIV (ma + mb - inter)").as("j_ppm"))
      .localCheckpoint(true)
    // pair set × divisor table: the only "cross" is a broadcast of
    // d(numHashes) config rows against the bounded verified-pair set
    val scored = jp.crossJoin(broadcast(configs))
      .withColumn("s_r", expr("aggregate(sequence(1, rows_per_band), " +
        "1000000L, (acc, i) -> (acc * j_ppm) DIV 1000000L)"))
      .withColumn("p_ppm", lit(1000000L) -
        expr("aggregate(sequence(1, bands), 1000000L, " +
          "(acc, i) -> (acc * (1000000L - s_r)) DIV 1000000L)"))
    val agg = scored.groupBy(col("bands"), col("rows_per_band"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("p_ppm")).as("exp_found_ppm"),
        min(col("p_ppm")).as("min_p_ppm"))
      .withColumn("mean_p_ppm", expr("exp_found_ppm DIV n_pairs"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    configs.crossJoin(broadcast(nd)) // one-row scalar
      .join(agg, Seq("bands", "rows_per_band"), "left")
      .select(col("bands"), col("rows_per_band"),
        (col("bands").cast("long") * col("n_docs")).as("index_rows"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("exp_found_ppm"), lit(0L)).as("exp_found_ppm"),
        coalesce(col("mean_p_ppm"), lit(0L)).as("mean_p_ppm"),
        coalesce(col("min_p_ppm"), lit(0L)).as("min_p_ppm"))
      .orderBy(col("bands"))
  }

  /**
   * The planner's CONSUMER half: pick the index shape [[minHashLSH]]
   * should run with. From [[lshPlan]]'s surface, choose the CHEAPEST
   * factorization — fewest bands, since index_rows = bands·n_docs is
   * the monotone cost axis — whose WORST verified pair is still
   * detected with `min_p_ppm >= targetMinPpm`. If no factorization
   * meets the target (or the floor sample found no pairs to price),
   * fall back to the highest-recall shape (max bands): paying index
   * size beats silently under-detecting. Returns (bands, rowsPerBand).
   *
   * Scale: the decision collects only the d(numHashes)-row plan table;
   * everything corpus-sized happened inside [[lshPlan]]'s bounded
   * pair-set design.
   */
  def planLsh(docs: DataFrame, textCol: String, idCol: String,
              targetMinPpm: Long = 950000L, numHashes: Int = 128,
              floorThreshold: Double = 0.5, shingleLen: Int = 3,
              maxShingleFreq: Int = 1000): (Int, Int) = {
    require(targetMinPpm >= 0 && targetMinPpm <= 1000000L,
      s"planLsh needs 0 <= targetMinPpm <= 1000000, got $targetMinPpm")
    pickLsh(lshPlan(docs, textCol, idCol, numHashes, floorThreshold,
        shingleLen, maxShingleFreq)
      .select(col("bands"), col("rows_per_band"), col("n_pairs"),
        col("min_p_ppm"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq, targetMinPpm)
  }

  /** The pick rule alone, over an ALREADY-COLLECTED plan surface
    * `(bands, rows_per_band, n_pairs, min_p_ppm)` — split out of
    * [[planLsh]] so a caller that also serves the surface (the HTTP
    * lsh-plan route) prices the corpus ONCE instead of running
    * [[lshPlan]]'s pair join twice. Same decision: cheapest (fewest
    * bands) factorization whose worst verified pair still meets
    * `targetMinPpm`; highest-recall shape when nothing qualifies or no
    * pairs were found to price. */
  def pickLsh(plan: Seq[(Int, Int, Long, Long)],
              targetMinPpm: Long): (Int, Int) = {
    require(plan.nonEmpty, "pickLsh needs a non-empty plan surface")
    val priced = plan.filter(_._3 > 0)
    val qualifying = priced.filter(_._4 >= targetMinPpm)
    val pick =
      if (priced.isEmpty || qualifying.isEmpty) plan.maxBy(_._1)
      else qualifying.minBy(_._1)
    (pick._1, pick._2)
  }

  /**
   * [[minHashLSH]] with the factorization made EXPLICIT — the form
   * [[planLsh]]'s answer plugs into: `bands` bands of `rowsPerBand`
   * hashes each (signature length = bands·rowsPerBand). Same recall
   * argument, same output shape; only the candidate-generation
   * geometry moves. Extra candidates from a higher-recall shape are
   * harmless for correctness (every candidate is exactly verified) —
   * the factorization is purely a cost/recall knob.
   */
  def minHashLSHWith(docs: DataFrame, textCol: String, idCol: String,
                     bands: Int, rowsPerBand: Int, shingleLen: Int = 3,
                     threshold: Double = 0.8): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1,
      s"minHashLSHWith needs bands, rowsPerBand >= 1, got ($bands, $rowsPerBand)")
    minHashLSH(docs, textCol, idCol, shingleLen,
      numHashes = bands * rowsPerBand, bands = bands, threshold = threshold)
  }

  /**
   * One row per doc with its one-hop cluster representative: keep_id = min
   * id among {self} ∪ verified neighbors. Deterministic, single extra
   * aggregation over the (small) verified-pair set. For TRANSITIVE
   * clusters (duplicate chains a~b~c where a and c never matched
   * directly), run the verified pairs through
   * [[ConnectedComponents.clusterReps]] instead — same output shape,
   * component-wide keep_id.
   */
  /**
   * Canonical-document selection per dedup cluster: given a dedup result
   * `(id, keep_id, ...)` (any of the family's outputs — keep_id is the
   * cluster key) and the source docs, pick each cluster's canonical
   * document as the LONGEST one (ties: min id) — the usual curation rule
   * ("keep the most complete copy"), vs. keep_id's arbitrary min-id. One
   * window over the cluster key; the shuffle moves (id, keep_id, length)
   * triples, never text.
   */
  def canonicalize(
      dedup: DataFrame, docs: DataFrame,
      idCol: String, lengthCol: String): DataFrame = {
    val lens = docs.select(col(idCol).as("id"), col(lengthCol).as("__len"))
    val w = Window.partitionBy(col("keep_id"))
      .orderBy(col("__len").desc, col("id"))
    dedup.select(col("id"), col("keep_id"))
      .join(lens, Seq("id"))
      .withColumn("canonical_id", first(col("id")).over(w))
      .select(col("id"), col("keep_id"), col("canonical_id"),
        (col("id") =!= col("canonical_id")).as("is_dup"))
      .orderBy(col("id"))
  }

  /**
   * Incremental deduplication: flag which DELTA documents duplicate the
   * existing CORPUS — the daily-increment shape (yesterday's corpus is
   * already deduped; only the new batch needs checking). Two layers:
   * `exact_dup_of` = min corpus id with byte-identical text (sha2-256
   * digest join), `fuzzy_dup_of` = min corpus id with shingle-set
   * Jaccard >= `threshold` (MinHash bands, delta side joined against
   * corpus side); `is_new` = neither matched.
   *
   * Scale: the corpus — the big side — is never exchanged. The exact
   * layer filters corpus digests by the delta's digest set BEFORE
   * aggregating (broadcast when the delta is small), so the
   * (digest, min id) rollup runs over a delta-sized remainder. The
   * fuzzy layer reuses the d02 band index CROSS-SET: delta bands probe
   * corpus bands, so candidate generation costs |delta| x band-collision
   * rate, never corpus² — the corpus index is exactly what a production
   * pipeline keeps materialized between increments. Each side is
   * scanned per consumer (signatures for the band index; shingles only
   * for the verify join) rather than exchange-reused — the consumers
   * need different columns, so the d02 barrier never actually reuses
   * here, and on the big side of a cross-set probe a second
   * column-pruned scan beats shuffling (id, shingles, sig) corpus-wide.
   * Candidate recall is
   * 1 under the same band-threshold argument as [[minHashLSH]] (pairs
   * >= threshold share a band on the gate fixture), which is what makes
   * the brute-force cross-set oracle valid.
   */
  def incremental(
      corpus: DataFrame, delta: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame =
    incrementalProbe(
      incrementalIndex(corpus, textCol, idCol, shingleLen, numHashes),
      delta, textCol, idCol, shingleLen, numHashes, bands, threshold)

  /**
   * Materialized corpus-side state for [[incrementalProbe]] — one row
   * per corpus document carrying every artifact the probe needs:
   * `cid`, `dig` (sha2-256 exact-dup digest), `csh` (distinct
   * shingle-hash set for exact Jaccard verification), `sig` (the
   * numHashes-long MinHash signature). This is the table a production
   * pipeline writes ONCE per corpus release and keeps between
   * increments — the scaladocs' "corpus band index kept materialized"
   * made executable: daily deltas probe the stored index instead of
   * rescanning 100 TB of text. All four columns are parquet-native
   * (long, hex string, two long arrays), and because the probe's three
   * corpus-side consumers each select a different column subset, a
   * columnar store serves each as a pruned read (d18 pins the stored
   * ReadSchemas). As a LIVE plan (the [[incremental]] composition) the
   * same pruning specializes each consumer's corpus scan to just its
   * artifact.
   */
  def incrementalIndex(
      corpus: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, numHashes: Int = 128): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol).as("cid"),
        sha2(col(textCol), 256).as("dig"),
        Shingles.wordShinglesFast(col(textCol), shingleLen).as("csh"))
      .withColumn("sig", GraftFunctions.minHashSig(col("csh"), numHashes))
  }

  /** [[incrementalIndex]] from a PREPARED (id, dig, sh) artifact table
    * (the r15 shared-artifact device): same four columns, the sha2 and
    * shingle expressions read from the artifact instead of re-scanning
    * text. */
  private[graft] def incrementalIndexFromArtifacts(
      art: DataFrame, numHashes: Int = 128): DataFrame = {
    GraftFunctions.register(art.sparkSession)
    art.select(col("id").as("cid"), col("dig"), col("sh").as("csh"))
      .withColumn("sig", GraftFunctions.minHashSig(col("csh"), numHashes))
  }

  /** [[incrementalProbe]] with the DELTA side read from a PREPARED
    * (id, dig, sh) artifact table — same dataflow: exact digest layer,
    * band probe (delta side broadcast), shingle verification; the delta
    * text is never re-scanned. */
  private[graft] def incrementalProbeFromArtifacts(
      index: DataFrame, deltaArt: DataFrame,
      numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rows = numHashes / bands
    GraftFunctions.register(deltaArt.sparkSession)
    val deltaDigs = deltaArt.select(col("id"), col("dig").as("__dig"))
    val corpusDigests = index
      .select(col("dig").as("__dig"), col("cid"))
      .join(deltaDigs.select(col("__dig")).distinct(), Seq("__dig"))
      .groupBy(col("__dig")).agg(min(col("cid")).as("exact_dup_of"))
    val exact = deltaDigs
      .join(corpusDigests, Seq("__dig"), "left")
      .select(col("id"), col("exact_dup_of"))
    val deltaSigs = deltaArt
      .select(col("id"),
        GraftFunctions.minHashSig(col("sh"), numHashes).as("sig"))
    val cand = bandedIndex(deltaSigs, bands, rows).as("l")
      .join(bandedIndex(index.select(col("cid").as("id"), col("sig")),
          bands, rows).as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash"))
      .select(col("l.id").as("did"), col("r.id").as("cid"))
      .distinct()
    val fuzzy = cand
      .join(deltaArt.select(col("id").as("did"), col("sh").as("dsh")),
        Seq("did"))
      .join(index.select(col("cid"), col("csh")), Seq("cid"))
      .filter(Shingles.jaccard(col("dsh"), col("csh")) >= threshold)
      .groupBy(col("did")).agg(min(col("cid")).as("fuzzy_dup_of"))
      .withColumnRenamed("did", "id")
    exact.join(fuzzy, Seq("id"), "left")
      .select(col("id"), col("exact_dup_of"), col("fuzzy_dup_of"),
        (col("exact_dup_of").isNull && col("fuzzy_dup_of").isNull).as("is_new"))
      .orderBy(col("id"))
  }

  /**
   * Probe DELTA documents against a prebuilt [[incrementalIndex]] —
   * [[incremental]]'s dataflow with the corpus side read from the
   * index's columns instead of recomputed from text. `shingleLen` and
   * `numHashes` must match the index's build parameters (they shape
   * the delta side of the digest/band/verify joins).
   */
  def incrementalProbe(
      index: DataFrame, delta: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rows = numHashes / bands

    // Exact pass: only digests PRESENT IN THE DELTA can affect the
    // output, so filter the index's digest column by the delta's
    // (distinct) digest set BEFORE aggregating — with a daily-sized
    // delta the filter is a broadcast join and the min(cid) aggregate
    // runs over a delta-sized remainder. (Aggregating min over EVERY
    // corpus digest first would be a corpus-wide shuffle computing
    // answers nobody asked for.)
    val deltaDigs = delta
      .select(col(idCol).as("id"), sha2(col(textCol), 256).as("__dig"))
    val corpusDigests = index
      .select(col("dig").as("__dig"), col("cid"))
      .join(deltaDigs.select(col("__dig")).distinct(), Seq("__dig"))
      .groupBy(col("__dig")).agg(min(col("cid")).as("exact_dup_of"))
    val exact = deltaDigs
      .join(corpusDigests, Seq("__dig"), "left")
      .select(col("id"), col("exact_dup_of"))

    // Fuzzy pass. NEITHER side rides minHashSigs' exchange barrier
    // (d02's reuse device): the band index consumes (id, sig) and the
    // verify join consumes (id, sh), so column pruning pushes DIFFERENT
    // projections below the barrier and the exchange is never actually
    // reused — in the cross-set shape the repartition buys nothing and,
    // on the corpus side, would shuffle (id, shingle set, 128-int sig)
    // corpus-wide: several times the corpus's text bytes over the wire.
    // (The self-join operators keep the barrier — there both join sides
    // need the SAME columns and ReusedExchange fires.) Each consumer
    // instead selects just its index columns / scans the delta with no
    // exchange at all: signatures for the band join (AQE broadcasts the
    // delta's bands when the delta is small, so the corpus side never
    // shuffles), shingle sets ONLY for the verify join against the
    // delta-driven candidate set. At 100 TB a second column-pruned read
    // is cheap; a corpus-wide exchange is the bottleneck.
    GraftFunctions.register(delta.sparkSession)
    val deltaSigs = delta
      .select(col(idCol).as("id"),
        Shingles.wordShinglesFast(col(textCol), shingleLen).as("sh"))
      .withColumn("sig", GraftFunctions.minHashSig(col("sh"), numHashes))
      .select(col("id"), col("sig"))
    val cand = bandedIndex(deltaSigs, bands, rows).as("l")
      .join(bandedIndex(index.select(col("cid").as("id"), col("sig")),
          bands, rows).as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash"))
      .select(col("l.id").as("did"), col("r.id").as("cid"))
      .distinct()
    val fuzzy = cand
      .join(delta.select(col(idCol).as("did"),
        Shingles.wordShinglesFast(col(textCol), shingleLen).as("dsh")),
        Seq("did"))
      .join(index.select(col("cid"), col("csh")), Seq("cid"))
      .filter(Shingles.jaccard(col("dsh"), col("csh")) >= threshold)
      .groupBy(col("did")).agg(min(col("cid")).as("fuzzy_dup_of"))
      .withColumnRenamed("did", "id")

    exact.join(fuzzy, Seq("id"), "left")
      .select(col("id"), col("exact_dup_of"), col("fuzzy_dup_of"),
        (col("exact_dup_of").isNull && col("fuzzy_dup_of").isNull).as("is_new"))
      .orderBy(col("id"))
  }

  /**
   * Shared MinHash machinery for [[minHashLSH]] (self-join clustering)
   * and [[incremental]] (cross-set probe) — ONE construction so the
   * band-recall argument proven for d02 transfers to d07 by identity,
   * not by parallel maintenance of two copies.
   *
   * The `repartition(id)` is an explicit exchange barrier: the signature
   * projection is computed ONCE below it, and every consumer (self-join
   * sides, band explode, verify joins) reuses the exchange
   * (ReusedExchange) instead of re-evaluating the expensive minhash
   * expression per reference.
   */
  private def minHashSigs(docs: DataFrame, textCol: String, idCol: String,
                          shingleLen: Int, numHashes: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    minHashSigsFromShingles(
      docs.select(col(idCol).as("id"),
        Shingles.wordShinglesFast(col(textCol), shingleLen).as("sh")),
      numHashes)
  }

  /** [[minHashSigs]] over a PREPARED (id, sh) table (the r15 shared-
    * artifact device — see [[ngramJaccardPairsFromShingles]]); same
    * exchange barrier, same signature expression. */
  private def minHashSigsFromShingles(sh: DataFrame,
                                      numHashes: Int): DataFrame = {
    GraftFunctions.register(sh.sparkSession)
    sh.select(col("id"), col("sh"))
      .withColumn("sig", GraftFunctions.minHashSig(col("sh"), numHashes))
      .repartition(col("id"))
  }

  /** [[minHashPairs]] over a PREPARED (id, sh) table. */
  private[ops] def minHashPairsFromShingles(
      sh0: DataFrame, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rows = numHashes / bands
    val sigs = minHashSigsFromShingles(sh0, numHashes)
    val banded = bandedIndex(sigs, bands, rows)
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val bySh = sigs.select(col("id"), col("sh"))
    cand
      .join(bySh.as("a"), col("id_a") === col("a.id"))
      .join(bySh.as("b"), col("id_b") === col("b.id"))
      .select(col("id_a"), col("id_b"),
        Shingles.jaccard(col("a.sh"), col("b.sh")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** [[dedupPipeline]] over a PREPARED (id, dig, sh) artifact table plus
    * a (id, __len) length table — the r15 shared-artifact form: the
    * digest tier reads the precomputed sha2 column, the fuzzy tier's
    * signatures derive from the precomputed shingle sets, and the text
    * is never re-scanned. Same stages, same checkpoints, same output as
    * [[dedupPipeline]] (the expressions are identical per row). */
  private[graft] def dedupPipelineFromArtifacts(
      art: DataFrame, lens: DataFrame,
      numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val er = art.select(col("id"), col("dig").as("__dig"))
      .select(col("id"),
        min(col("id")).over(Window.partitionBy(col("__dig")))
          .as("exact_rep"))
      .localCheckpoint(true)
    val survivors = art.join(
      er.filter(col("id") === col("exact_rep")).select(col("id")),
      Seq("id"))
      .localCheckpoint(true)
    val pairs = minHashPairsFromShingles(
      survivors.select(col("id"), col("sh")), numHashes, bands, threshold)
    val reps = graft.ops.ConnectedComponents.clusterReps(
      survivors.select(col("id")), "id", pairs)
    val canon = canonicalize(reps,
      lens.select(col("id"), col("__len").as("__graft_len")),
      "id", "__graft_len")
    er.join(canon.select(col("id").as("exact_rep"),
        col("keep_id").as("cluster_rep"), col("canonical_id")),
        Seq("exact_rep"))
      .select(col("id"), col("exact_rep"), col("cluster_rep"),
        col("canonical_id"), (col("id") === col("canonical_id")).as("is_kept"))
      .orderBy(col("id"))
  }

  /** (id, band_id, band_hash): hash() over the band slice + band id keeps
    * bands from colliding across positions. */
  private def bandedIndex(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .toDF("id", "band_id", "band_hash")

  /**
   * Sub-document (chunk-level) deduplication, CCNet/RefinedWeb-style
   * (Wenzek et al. 2020 dedupe paragraphs by hash; Penedo et al. 2023
   * drop exact substrings repeated across the crawl): split every
   * document into consecutive `chunkWords`-word chunks, count each
   * chunk's document frequency across the corpus, drop chunks appearing
   * in more than `maxDocFreq` distinct documents (boilerplate /
   * cross-document repetition), and reassemble the surviving chunks in
   * order. Output per doc: (id, kept_text, n_chunks, n_dropped).
   *
   * Scale design: the frequency pass aggregates (chunk, id) pairs — a
   * keyed shuffle with map-side combine; the *hot-chunk set* (df >
   * maxDocFreq) is then tiny by a heavy-hitter bound (at most
   * total_chunks / (maxDocFreq+1) entries, and in real crawls orders of
   * magnitude smaller), so the filtering join is a broadcast left-anti —
   * document text never rides a second shuffle. Per-doc totals come
   * map-side from `size(chunk array)` (no aggregation pass at all), and
   * reassembly groups by doc id with collect_list over (pos, chunk),
   * sorted in-place per doc. The chunk table is evaluated twice (hot-set
   * pass + filter pass) — both map-side from the scan; a production
   * pipeline at 100 TB materializes it once between the passes.
   */
  def chunkDedup(docs: DataFrame, textCol: String, idCol: String,
                 chunkWords: Int = 8, maxDocFreq: Int = 1): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val (base, chunks) = chunkTable(docs, textCol, idCol, chunkWords)

    val hot = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("chunk"))

    reportKept(base,
      reassemble(chunks.join(broadcast(hot), Seq("chunk"), "left_anti")))
  }

  /**
   * Intra-document repetition removal (the within-doc counterpart of
   * [[chunkDedup]], and the scalable stand-in for Gopher's "duplicate
   * line fraction" REMOVAL step rather than its filter): a chunk that
   * repeats inside one document keeps only its first occurrence; order
   * is otherwise preserved. Output matches chunkDedup:
   * (id, kept_text, n_chunks, n_dropped).
   *
   * Scale design: fully doc-local semantics, so the whole operator is
   * ONE map-side projection — no explode, no shuffle, no join. Per doc:
   * index the chunk array, array_sort by (chunk, pos) so duplicates are
   * adjacent, keep each run's head (= pos-minimal occurrence), sort the
   * survivors back by pos, rejoin. Two O(c log c) local sorts per doc
   * (c = chunk count); every intermediate is bound once via
   * [[Shingles.let]] so nothing re-evaluates per array element. The
   * exploded groupBy((id, chunk)) form this replaced shuffled every
   * chunk of the corpus twice for identical output.
   *
   * Contract: one output row PER INPUT ROW — `idCol` is assumed unique
   * (it is a document key). A caller feeding duplicate ids gets per-row
   * dedup, not the old exploded form's cross-row (id, chunk) merge;
   * dedupe rows first if ids can repeat.
   */
  def intraDocDedup(docs: DataFrame, textCol: String, idCol: String,
                    chunkWords: Int = 8): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    val out = Shingles.let(chunkArray(textCol, chunkWords)) { ch =>
      Shingles.let(array_sort(
          transform(ch, (c, i) => struct(c.as("c"), i.as("i"))))) { byChunk =>
        val runHeads = filter(byChunk, (s, j) =>
          (j === 0) || element_at(byChunk, j).getField("c") =!= s.getField("c"))
        Shingles.let(array_sort(transform(runHeads,
            s => struct(s.getField("i").as("i"), s.getField("c").as("c"))))) {
          inOrder =>
            struct(
              array_join(transform(inOrder, s => s.getField("c")), " ")
                .as("kept_text"),
              size(ch).cast("long").as("n_chunks"),
              (size(ch) - size(inOrder)).cast("long").as("n_dropped"))
        }
      }
    }
    // widen below the projection (r14, guide §2.5 input parallelism):
    // this operator is ONE map projection — the doc-local sort/filter
    // array algebra is its entire cost — and on a single-split fixture
    // scan it ran whole-corpus in one task. The widen exchange moves
    // raw (id, text) rows once and the final orderBy re-exchanges
    // anyway, so no downstream shuffle gains map-task count. Measured
    // (solo in-proc pair, sf0.1): 0.86 s -> 0.74 s. The same widen was
    // MEASURED A LOSS for every shuffle-bound dedup op (24.1 -> 35.0 s
    // over the 14-query family: each widened map side multiplies every
    // downstream exchange's block count 32x, and at bench scale that
    // overhead dwarfs the parallelized compute), so it is deliberately
    // applied only to map-only shapes like this one.
    Par.widen(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"), out.as("__r"))
      .select(col("id"), col("__r.kept_text"), col("__r.n_chunks"),
        col("__r.n_dropped"))
      .orderBy(col("id"))
  }

  /**
   * Substring-level exact deduplication — the Lee et al. 2022
   * ("Deduplicating Training Data Makes Language Models Better",
   * ExactSubstr) family member [[chunkDedup]]'s FIXED windows provably
   * miss: a span repeated across documents at non-chunk-aligned offsets
   * never equals any fixed chunk, so d08 keeps it. Here every SLIDING
   * `anchorWords`-word window is an anchor; a maximal repeated span of
   * length L >= anchorWords yields L − anchorWords + 1 repeated anchors
   * whose windows cover exactly the span's words — so excising every
   * word covered by a cross-document-repeated anchor removes repeated
   * spans at ANY offset, with detection granularity `anchorWords`
   * (spans shorter than the anchor survive; Lee et al.'s suffix-array
   * threshold of 50 tokens plays the same role). Approximation vs the
   * suffix array: each anchor's document frequency is counted
   * independently, so adjacent anchors repeated in DIFFERENT partner
   * docs still merge into one excised span — conservative
   * over-removal of boilerplate, never under-removal.
   *
   * Output per doc: (id, kept_text, n_words, n_dropped, n_spans) —
   * kept_text is the surviving words in order, n_spans the count of
   * maximal excised runs.
   *
   * Scale design (100 TB): anchors ride the shuffle as 60-bit md5
   * prefixes (15 hex chars — the d03 device, DuckDB-recomputable), id +
   * int position: corpus-token-scale rows but NARROW ones, never text.
   * Three keyed exchanges: the anchor-df aggregation (two-level distinct
   * with map-side partials), the hot-anchor semi join (keyed on the
   * anchor hash — the hot set scales with corpus boilerplate, so no
   * broadcast is forced; AQE may still pick one when it fits), and the
   * per-doc hit collection (id-keyed, int positions only). Interval
   * merging, excision, and reassembly are doc-local array algebra in one
   * projection (the d09 let-bound device) — the document text never
   * leaves its original row.
   */
  def substringDedup(docs: DataFrame, textCol: String, idCol: String,
                     anchorWords: Int = 5, maxDocFreq: Int = 1): DataFrame = {
    require(anchorWords >= 1, s"anchorWords must be >= 1, got $anchorWords")
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val k = anchorWords

    // (id, pos, ah): one row per sliding window; docs shorter than the
    // anchor emit nothing (and can never be excised from). The native
    // anchor_hashes expression computes all window hashes in one JVM
    // loop per doc (60-bit md5 prefixes as longs — the '0x'||substr
    // (md5,1,15) oracle device); the HOF form it replaced walked the
    // interpreted lambda path once per window.
    GraftFunctions.register(docs.sparkSession)
    val anchors = docs.select(col(idCol).as("id"),
        posexplode(GraftFunctions.anchorHashes(
          coalesce(col(textCol), lit("")), k)))
      .toDF("id", "pos", "ah")

    val hot = anchors.groupBy(col("ah"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("ah"))

    // hit start positions per doc, sorted — the input to interval merge
    val hits = anchors.join(hot, Seq("ah"), "left_semi")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("hits"))

    // doc-local: merge hit windows [p, p+k-1] into maximal intervals,
    // excise covered words, reassemble survivors in order
    val emptyIvs = expr("CAST(array() AS array<struct<s:int,e:int>>)")
    val report = Shingles.let(
        Shingles.words(coalesce(col(textCol), lit("")))) { wds =>
      Shingles.let(aggregate(
          coalesce(col("__hits"), expr("CAST(array() AS array<int>)")),
          emptyIvs,
          (acc, h) => when(
            size(acc) === 0 ||
              h > element_at(acc, -1).getField("e") + 1,
            concat(acc, array(struct(h.as("s"), (h + k - 1).as("e")))))
            .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
              array(struct(element_at(acc, -1).getField("s").as("s"),
                (h + k - 1).as("e")))))
        )) { ivs =>
        Shingles.let(filter(sequence(lit(0), size(wds) - 1), i =>
            !exists(ivs, iv => i >= iv.getField("s") &&
              i <= iv.getField("e")))) { keptIdx =>
          struct(
            array_join(transform(keptIdx, i => element_at(wds, i + 1)), " ")
              .as("kept_text"),
            size(wds).cast("long").as("n_words"),
            aggregate(ivs, lit(0L), (a, iv) =>
              a + (iv.getField("e") - iv.getField("s") + 1))
              .as("n_dropped"),
            size(ivs).cast("long").as("n_spans"))
        }
      }
    }

    docs.select(col(idCol).as("id"), col(textCol))
      .join(hits.withColumnRenamed("hits", "__hits"), Seq("id"), "left")
      .select(col("id"), report.as("__r"))
      .select(col("id"), col("__r.kept_text"), col("__r.n_words"),
        col("__r.n_dropped"), col("__r.n_spans"))
      .orderBy(col("id"))
  }

  /** Per-doc reassembly of surviving (id, pos, chunk) rows: survivor
    * count + position-ordered re-concatenation. Must stay in lockstep
    * with the d08/d09 oracles' `string_agg(chunk, ' ' ORDER BY pos)`. */
  private def reassemble(survivors: DataFrame): DataFrame =
    survivors.groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
            s => s.getField("chunk")), " ").as("kept_text"))

  /** Consecutive `w`-word chunk array of a text column (last chunk may be
    * shorter). NULL text coalesces to "" (one empty chunk, same as an
    * empty string) — without it `size(null) = -1` feeds `sequence(0, -2)`,
    * whose descending-range semantics would fabricate phantom chunks.
    * The word array is let-bound so the split runs once per row, not once
    * per generated chunk. */
  private def chunkArray(textCol: String, w: Int): Column =
    Shingles.let(Shingles.words(coalesce(col(textCol), lit("")))) { wds =>
      transform(
        sequence(lit(0),
          ceil(size(wds) / lit(w.toDouble)).cast("int") - 1),
        i => array_join(slice(wds, i * w + 1, lit(w)), " "))
    }

  /** (per-doc totals, exploded chunk table) for the chunk-dedup family:
    * totals taken map-side from the chunk array so no counting pass runs
    * later. */
  private def chunkTable(docs: DataFrame, textCol: String, idCol: String,
                         w: Int): (DataFrame, DataFrame) = {
    val withChunks = docs
      .select(col(idCol).as("id"), chunkArray(textCol, w).as("ch"))
    val base = withChunks.select(col("id"),
      size(col("ch")).cast("long").as("n_chunks"))
    val chunks = withChunks
      .select(col("id"), posexplode(col("ch")))
      .toDF("id", "pos", "chunk")
    (base, chunks)
  }

  /** Join surviving-chunk aggregates back to the per-doc totals;
    * fully-dropped docs surface with empty text, not missing rows. */
  private def reportKept(base: DataFrame, reassembled: DataFrame): DataFrame =
    base.join(reassembled, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("kept_text"), lit("")).as("kept_text"),
        col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      .orderBy(col("id"))

  private def clusterReps(
      docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    minNeighborReps(docs.select(col(idCol).as("id")), pairs)

  /** One-hop min-id cluster representative per id over an (id_a, id_b)
    * pair set — THE shared output contract of the whole dedup family
    * (text: minHashLSH/simHash/ngramJaccard; embedding:
    * cosineNearDup/semDedup): (id, keep_id, is_dup), keep_id = the
    * smallest id among self ∪ neighbors. One definition so a tie-break
    * change can never diverge the families. */
  private[ops] def minNeighborReps(ids: DataFrame,
                                   pairs: DataFrame): DataFrame = {
    val neighborMin = pairs
      .select(col("id_b").as("id"), col("id_a").as("nb"))
      .union(pairs.select(col("id_a").as("id"), col("id_b").as("nb")))
      .groupBy(col("id")).agg(min(col("nb")).as("nb_min"))
    ids
      .join(neighborMin, Seq("id"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("nb_min"), col("id"))).as("keep_id"))
      .withColumn("is_dup", col("id") =!= col("keep_id"))
      .orderBy(col("id"))
  }

  /**
   * MinHash estimator-quality harness — the sketch-side sibling of the
   * ANN recall report (Similarity.annRecall): for every verified
   * similar pair, the k-permutation MinHash agreement count next to the
   * EXACT Jaccard, both in ppm fixed point. This is the number that
   * justifies d02's banding parameters (E[n_agree/k] = jaccard; the
   * spread at a given k is the false-negative budget).
   *
   * Permutations hash in ENGINE-REPRODUCIBLE md5 space: h_i(s) = the
   * 60-bit value of the first 15 hex chars of md5("i:" ‖ shingle) — the
   * [[graft.functions.Md5Hash60]] construction spelled in portable SQL
   * (`conv(substring(md5(..),1,15),16,10)`), so a DuckDB oracle
   * recomputes every signature bit-for-bit. Production sketches use the
   * xxhash64 mode (~5× faster, engine-private); the ESTIMATOR QUALITY
   * measured here transfers — both are uniform 60+-bit hash families
   * over the same shingle sets.
   *
   * Scale: signatures are one map-side pass (k·|shingles| md5s per
   * doc — k stays small, this is a diagnostic, not the dedup path);
   * the pair join carries signatures + shingle sets only for the
   * verified-pair ids, bounded by the pair set, not the corpus.
   */
  def minhashEstimate(
      docs: DataFrame, textCol: String, idCol: String, pairs: DataFrame,
      k: Int = 16, shingleLen: Int = 3): DataFrame = {
    require(k >= 1 && k <= 64, s"minhashEstimate needs 1 <= k <= 64, got $k")
    val n = shingleLen
    // raw STRING shingles (wordShingles hashes them; the estimator needs
    // the strings so each permutation can re-hash) — same fallback rule:
    // docs shorter than n words shingle to the whole normalized text
    val sh = Shingles.let(Shingles.words(col(textCol))) { w =>
      val grams = transform(
        sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))
      array_distinct(
        when(size(w) >= n, grams)
          .otherwise(array(lower(trim(col(textCol))))))
    }
    val sig = expr(
      s"""transform(sequence(0, ${k - 1}), i ->
        array_min(transform(__sh, s ->
          CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', s)),
            1, 15), 16, 10) AS BIGINT))))""")
    // signatures only for docs that appear in some pair: the estimator
    // is per-PAIR, so hashing the whole corpus (k md5s per shingle per
    // doc, and twice — once under each join side's subtree) is pure
    // waste; the semi-join keeps the k·|shingles| md5 work proportional
    // to the pair set, and the checkpoint computes it once
    // materialize the pair set first: it is consumed twice (ids below,
    // then the estimator join) and is typically the output of the whole
    // PPJoin verify machinery — without the checkpoint that subtree
    // executes once per consumer
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val pairIds = p
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val sigs = docs
      .select(col(idCol).as("id"), sh.as("__sh"))
      .join(pairIds, Seq("id"), "left_semi")
      .select(col("id"), col("__sh"), sig.as("__sig"))
      .localCheckpoint(true)
    p
      .join(sigs.select(col("id").as("id_a"), col("__sh").as("__sha"),
        col("__sig").as("__siga")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("__sh").as("__shb"),
        col("__sig").as("__sigb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(filter(zip_with(col("__siga"), col("__sigb"), _ === _),
          x => x)).cast("long").as("n_agree"),
        size(array_intersect(col("__sha"), col("__shb"))).cast("long")
          .as("__i"),
        size(col("__sha")).cast("long").as("__ma"),
        size(col("__shb")).cast("long").as("__mb"))
      .select(col("id_a"), col("id_b"), col("n_agree"),
        expr(s"CAST(n_agree * 1000000 DIV $k AS BIGINT)").as("est_ppm"),
        expr("CAST(__i * 1000000 DIV (__ma + __mb - __i) AS BIGINT)")
          .as("exact_ppm"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
