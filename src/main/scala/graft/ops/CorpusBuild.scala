package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-build capstone (p14) — the shipped verdicts composed end-to-end
 * the way a real training-data run executes them, one call from raw
 * documents to a training-order realization. Every stage is an
 * individually oracle-checked operator; the composition is what catches
 * interface drift between them (a dedup keep flag feeding the mixture's
 * domain masses, a token-count verdict feeding the packer's weights).
 *
 * Stage order (and why it differs from a naive filter→dedup→split):
 *   1. t24 `TextAnalysis.filterChain` — quality/repetition/encoding/
 *      language gates, first-failing-gate triage.
 *   2. p01 `Sampling.hashSplit` over the filter survivors — split
 *      assignment BEFORE any similarity work, so the eval holdout is
 *      fixed by document identity alone.
 *   3. d15 `Sampling.crossSplitDedup` at the DECONTAMINATION threshold
 *      (lower than the dedup threshold — eval protection wants near
 *      misses too): train docs near-duplicate to an eval doc are
 *      removed first. Running decontamination BEFORE within-corpus
 *      dedup is load-bearing: dedup collapses each near-dup cluster to
 *      one canonical, and if it ran first, a cluster spanning the split
 *      boundary would surface only its canonical — the cross-split
 *      evidence (the pair) would already be gone.
 *   4. d14 `Dedup.dedupPipeline` within the decontaminated TRAIN
 *      partition — exact digests, fuzzy pairs, transitive clusters,
 *      longest-doc canonicals. Eval docs are held out, not deduped:
 *      within-eval duplicates never enter the mix, and eval-vs-train
 *      similarity was already enforced in stage 3.
 *   5. p12/p13 `Sampling.epochPlan` over the train canonicals — domain
 *      = the corpus `lang` column, weight = t26 `TextAnalysis.bpeSegment`
 *      token counts (a REAL vocabulary's token mass, not the whitespace
 *      proxy), water-filled against `budget` under `epochCap`-epoch caps.
 *   6. copies exploded per `n_copies`, then p03 `Sampling.packSequences`
 *      (shard-local next-fit bins) and p08 `Sampling.shufflePositions`
 *      (exact global training order, bucket-offset device) over the
 *      copy units.
 *
 * Output, one row per (doc, copy) in the mix and one row per doc not in
 * it: `(id, kept, reason, split, w, copy, pack_shard, pack_bin, pos)`.
 * `kept` = survived curation (filter + decontamination + dedup);
 * `reason` = why the row carries no training copies — a filter gate
 * name, `duplicate`, `cross_split`, `eval_holdout` (kept but never
 * trained on), `budget` (survived, but the water-filling allocated it
 * zero copies) — NULL exactly on mix rows. `w` is the t26 token count
 * for every doc, so the data card can price rejections in tokens.
 *
 * Scale: the corpus text is touched by exactly three operator families
 * (verdict expressions, the pair generators, the token counter), each a
 * proven one-pass/keyed-exchange design; everything after stage 4 moves
 * only (id, long) rows. The stage outputs that fan out to multiple
 * consumers (verdicts, splits, plan, units) are localCheckpointed once —
 * no stage re-materializes the corpus.
 */
object CorpusBuild {

  /** The composed per-row build plan. Parameters default to the p14
    * gate configuration; the DuckDB oracle replays the identical chain
    * (PipelineOps `p14_corpus_build`). */
  def corpusBuild(
      docs: DataFrame, textCol: String, idCol: String, langCol: String,
      lengthCol: String,
      allowedLangs: Seq[String] = Seq("en", "de", "fr"),
      minQuality: Double = 0.6,
      kSplits: Int = 3, protectedSplit: Long = 0L,
      crossThreshold: Double = 0.5, dedupThreshold: Double = 0.7,
      merges: Seq[(String, String)] = TextAnalysis.DefaultMerges,
      epochCap: Int = 2, budget: Long = 70000L,
      packBudget: Long = 1024L, packShards: Int = 8,
      shuffleSeed: String = "p14"): DataFrame = {

    // ---- stage 1: filter verdicts (consumed by survivors + report) ----
    val fc = TextAnalysis.filterChain(docs, textCol, idCol,
        allowedLangs, minQuality)
      .select(col("id"), col("keep"), col("reject_reason"))
      .localCheckpoint(true)
    // t26 token weights for EVERY doc — the report prices every
    // rejection in tokens, not only the mix
    val wts = TextAnalysis.bpeSegment(docs, textCol, idCol, merges)
      .select(col("id"), col("n_tokens").as("w"))
      .localCheckpoint(true)

    // ---- stage 2: split assignment over filter survivors ----
    val fsurv = fc.filter(col("keep")).select(col("id"))
    val sp = Sampling.hashSplit(fsurv, "id", kSplits)

    // ---- stage 3: cross-split decontamination (protect the eval split) ----
    val fsDocs = docs.join(fsurv.withColumnRenamed("id", idCol), Seq(idCol))
    val crossPairs = Dedup.ngramJaccardPairs(fsDocs, textCol, idCol,
      shingleLen = 3, threshold = crossThreshold)
    val cs = Sampling.crossSplitDedup(sp, "id", "split",
        crossPairs, protectedSplit)
      .select(col("id"), col("split"), col("is_removed"))
      .localCheckpoint(true)

    // ---- stage 4: within-train dedup pipeline ----
    val trainIds = cs.filter(!col("is_removed") &&
      col("split") =!= protectedSplit).select(col("id"))
    val trainDocs = docs.join(trainIds.withColumnRenamed("id", idCol),
      Seq(idCol))
    val dd = Dedup.dedupPipeline(trainDocs, textCol, idCol, lengthCol,
        threshold = dedupThreshold)
      .select(col("id"), col("is_kept"))
      .localCheckpoint(true)

    // ---- stage 5: mixture + epoch plan over train canonicals ----
    val tr = dd.filter(col("is_kept")).select(col("id"))
      .join(docs.select(col(idCol).as("id"), col(langCol).as("domain0")),
        Seq("id"))
      .join(wts, Seq("id"))
    val plan = Sampling.epochPlan(tr, "domain0", "id", "w",
        expr(s"avail * $epochCap"), budget)
      .select(col("id"), col("w"), col("n_copies"))
      .localCheckpoint(true)

    // ---- stage 6: copies -> pack -> positions ----
    val units = plan.filter(col("n_copies") > 0)
      .select(col("id"), col("w"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .withColumn("uid", concat(col("id").cast("string"), lit("#"),
        col("copy").cast("string")))
      .localCheckpoint(true)
    val packed = Sampling.packSequences(units, "uid", "w",
        packBudget, packShards)
      .select(col("uid"), col("shard").as("pack_shard"),
        col("bin").as("pack_bin"))
    val pos = Sampling.shufflePositions(units.select(col("uid")), "uid",
        shuffleSeed)
      .select(col("id").as("uid"), col("pos"))
    val splitOf = cs.select(col("id"), col("split"))
    val mix = units.select(col("id"), col("copy"), col("uid"))
      .join(packed, Seq("uid")).join(pos, Seq("uid"))
      .join(splitOf, Seq("id"))

    // ---- report assembly ----
    val nullI = lit(null).cast("int")
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    def shape(id: org.apache.spark.sql.Column,
              kept: org.apache.spark.sql.Column,
              reason: org.apache.spark.sql.Column,
              split: org.apache.spark.sql.Column,
              copy: org.apache.spark.sql.Column,
              shard: org.apache.spark.sql.Column,
              bin: org.apache.spark.sql.Column,
              p: org.apache.spark.sql.Column) =
      Seq(id.as("id"), kept.as("kept"), reason.as("reason"),
        split.as("split"), copy.as("copy"), shard.as("pack_shard"),
        bin.as("pack_bin"), p.as("pos"))
    val rej = fc.filter(!col("keep")).select(shape(col("id"), lit(false),
      col("reject_reason"), nullI, nullL, nullI, nullL, nullL): _*)
    val crossRm = cs.filter(col("is_removed")).select(shape(col("id"),
      lit(false), lit("cross_split"), col("split"),
      nullL, nullI, nullL, nullL): _*)
    val evalRows = cs.filter(!col("is_removed") &&
      col("split") === protectedSplit).select(shape(col("id"), lit(true),
      lit("eval_holdout"), col("split"), nullL, nullI, nullL, nullL): _*)
    val dup = dd.filter(!col("is_kept")).select(shape(col("id"),
      lit(false), lit("duplicate"), nullI, nullL, nullI, nullL, nullL): _*)
    val bud = plan.filter(col("n_copies") === 0).join(splitOf, Seq("id"))
      .select(shape(col("id"), lit(true), lit("budget"), col("split"),
        nullL, nullI, nullL, nullL): _*)
    val mixRows = mix.select(shape(col("id"), lit(true), nullS,
      col("split"), col("copy"), col("pack_shard"), col("pack_bin"),
      col("pos")): _*)

    rej.unionAll(dup).unionAll(crossRm).unionAll(evalRows)
      .unionAll(bud).unionAll(mixRows)
      .join(wts, Seq("id"))
      .select(col("id"), col("kept"), col("reason"), col("split"),
        col("w"), col("copy"), col("pack_shard"), col("pack_bin"),
        col("pos"))
      .orderBy(col("id"), col("copy"))
  }

  /**
   * One-row data card over a [[corpusBuild]] result (x09) — the rollup a
   * dataset release publishes: corpus size, survivors, per-reason
   * rejection counts, mix realization totals (docs, copies, tokens,
   * bins, max training position). All exact integers from one
   * partial-aggregated pass over the (already narrow) build rows.
   */
  def dataCard(build: DataFrame): DataFrame = {
    def reasonCount(r: String) =
      count(when(col("reason") === r, 1)).as(s"n_$r")
    build.agg(
      countDistinct(col("id")).as("n_docs"),
      countDistinct(when(col("kept"), col("id"))).as("n_kept_docs"),
      reasonCount("quality"), reasonCount("repetition"),
      reasonCount("encoding"), reasonCount("language"),
      reasonCount("duplicate"), reasonCount("cross_split"),
      reasonCount("eval_holdout"), reasonCount("budget"),
      countDistinct(when(col("copy").isNotNull, col("id")))
        .as("n_mix_docs"),
      count(when(col("copy").isNotNull, 1)).as("total_copies"),
      coalesce(sum(when(col("copy").isNotNull, col("w"))), lit(0L))
        .as("mix_tokens"),
      countDistinct(when(col("copy").isNotNull,
        struct(col("pack_shard"), col("pack_bin")))).as("n_bins"),
      coalesce(max(col("pos")), lit(-1L)).as("max_pos"))
  }
}
