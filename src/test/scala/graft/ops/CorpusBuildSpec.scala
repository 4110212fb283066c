package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The p14 capstone composition: cross-stage invariants on the real
  * corpus, and the plan property the composition exists to prove — no
  * stage re-materializes the corpus. */
class CorpusBuildSpec extends SparkSuite {

  private lazy val build = {
    val docs = graft.tables.Tables(spark, sf, "documents")
    CorpusBuild.corpusBuild(docs, "text", "doc_id", "lang", "n_chars")
      .cache()
  }

  test("every doc appears exactly once as verdict XOR once per copy") {
    val perDoc = build.groupBy("id").agg(
      count(lit(1)).as("n_rows"),
      count(col("copy")).as("n_copies"),
      count(col("reason")).as("n_reasons")).collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (rows, copies, reasons) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // mix docs: every row is a copy row, no reason; others: one
      // reason row, no copies
      assert(if (copies > 0) rows == copies && reasons == 0
             else rows == 1L && reasons == 1L, r.toString)
    }
    // the union covers the whole corpus, no doc dropped silently
    val n = graft.tables.Tables(spark, sf, "documents").count()
    assert(perDoc.length.toLong == n)
  }

  test("verdict semantics: reasons partition the corpus; eval never packs") {
    val byReason = build.groupBy("reason", "kept")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => Option(r.getString(0)) -> r.getBoolean(1)).toMap
    // kept is determined by the reason class
    byReason.foreach { case (reason, kept) =>
      reason match {
        case None | Some("eval_holdout") | Some("budget") => assert(kept)
        case _ => assert(!kept, s"$reason should imply kept=false")
      }
    }
    // eval rows and reject rows never carry pack/pos columns
    assert(build.filter(col("reason").isNotNull &&
      (col("pack_bin").isNotNull || col("pos").isNotNull)).count() == 0L)
    // mix rows carry ALL realization columns
    assert(build.filter(col("copy").isNotNull &&
      (col("pack_shard").isNull || col("pack_bin").isNull ||
        col("pos").isNull || col("split").isNull)).count() == 0L)
    // eval docs sit in the protected split only
    assert(build.filter(col("reason") === "eval_holdout" &&
      col("split") =!= 0).count() == 0L)
    assert(build.filter(col("copy").isNotNull && col("split") === 0)
      .count() == 0L)
  }

  test("positions are an exact permutation; bins respect next-fit overflow") {
    val mix = build.filter(col("copy").isNotNull).cache()
    try {
      val n = mix.count()
      val posAgg = mix.agg(min("pos"), max("pos"),
        countDistinct("pos")).collect()(0)
      assert(posAgg.getLong(0) == 0L && posAgg.getLong(1) == n - 1 &&
        posAgg.getLong(2) == n)
      // next-fit: a bin's token mass is < budget + its last doc's weight;
      // with budget 1024 and max doc w bounded by the corpus max, every
      // bin must stay under 1024 + max(w)
      val maxW = mix.agg(max("w")).collect()(0).getLong(0)
      val overfull = mix.groupBy("pack_shard", "pack_bin")
        .agg(sum("w").as("mass"))
        .filter(col("mass") >= lit(1024L + maxW)).count()
      assert(overfull == 0L)
    } finally mix.unpersist()
  }

  test("data card reconciles with the build rows") {
    val card = CorpusBuild.dataCard(build).collect()(0)
    val idx = card.schema.fieldNames.zipWithIndex.toMap
    def lg(f: String): Long = card.getLong(idx(f))
    assert(lg("n_docs") ==
      graft.tables.Tables(spark, sf, "documents").count())
    assert(lg("n_kept_docs") ==
      build.filter(col("kept")).select("id").distinct().count())
    assert(lg("total_copies") ==
      build.filter(col("copy").isNotNull).count())
    assert(lg("max_pos") == lg("total_copies") - 1)
    val reasonSum = Seq("n_quality", "n_repetition", "n_encoding",
      "n_language", "n_duplicate", "n_cross_split", "n_eval_holdout",
      "n_budget").map(lg).sum
    assert(reasonSum + lg("n_mix_docs") == lg("n_docs"))
  }

  test("null-lang docs keep their verdict rows end to end") {
    // the mixture domain comes from the lang COLUMN (filter gates use
    // the text-predicted language) — null out a stripe of real docs'
    // langs and the one-row-per-doc contract must still hold: before
    // epochPlan's null-safe domain join, null-domain train canonicals
    // silently vanished from the report
    val docs = graft.tables.Tables(spark, sf, "documents")
      .withColumn("lang",
        when(col("doc_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("lang")))
    val out = CorpusBuild.corpusBuild(docs, "text", "doc_id", "lang",
      "n_chars").cache()
    try {
      val n = docs.count()
      assert(out.select("id").distinct().count() === n,
        "every doc (null lang included) gets at least one row")
      // and null-lang docs reach the MIX (the null domain is allocated
      // like any other), not only the rejection rows
      assert(out.filter(col("id") % 5 === 0 && col("copy").isNotNull)
        .count() > 0L, "null-lang docs never reached the mix")
    } finally out.unpersist()
  }

  test("final plan never re-scans the corpus (stages checkpoint once)") {
    val df = CorpusBuild.corpusBuild(
      graft.tables.Tables(spark, sf, "documents"),
      "text", "doc_id", "lang", "n_chars")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // every stage output was localCheckpointed during construction: the
    // report plan reads checkpointed RDDs and must contain NO parquet
    // scan — a regression here means some stage re-materializes the
    // corpus per consumer
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
      plan)
  }

  // ---- p16 incremental build -------------------------------------------

  /** The engine's split assignment, recomputed locally so the fixture
    * can CHOOSE ids by split: first-two-hex-digit md5 bucket mod 3. */
  private def split3(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 2), 16) % 3
  }

  /** Filter-chain-passing English doc: a 10-stopword prefix (language
    * id) + 30 unique filler words (distinct/top/mean-length Gopher
    * gates). Docs with different salts share only the prefix shingles
    * (Jaccard ~0.15, below every threshold). */
  private def mkText(salt: String): String =
    "the a of and to in is that it for " +
      (0 until 30).map(i => s"${salt}word$i").mkString(" ")

  /** One filler word replaced -> ~0.8 shingle Jaccard to the base:
    * above the 0.7 dedup and 0.5 decon thresholds, below nothing. */
  private def nearDupText(base: String): String = {
    val w = base.split(" ")
    w.updated(20, "changedword").mkString(" ")
  }

  test("p16 incremental build: delta near-dup of an existing train doc " +
      "drops as duplicate, a fresh doc appends after the existing max " +
      "position into fresh shards") {
    import spark.implicits._
    // corpus: 5 train docs + 1 eval doc, pairwise dissimilar
    val corpusTrainIds = (1L to 200L).filter(split3(_) != 0).take(5)
    val corpusEvalId = (1L to 200L).find(split3(_) == 0).get
    val corpusRows = corpusTrainIds.map(i => (i, mkText(s"c$i"))) :+
      ((corpusEvalId, mkText("ev")))
    val corpusDocs = corpusRows.map { case (i, t) => (i, t, "en", t.length) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val existing = CorpusBuild.corpusBuild(corpusDocs, "text", "doc_id",
      "lang", "n_chars").cache()
    val existingMaxPos = existing.agg(max(col("pos"))).collect()(0).getLong(0)
    val existingUnits = existing.filter(col("copy").isNotNull).count()
    assert(existingUnits > 0, "fixture needs a non-empty existing mix")
    assert(existing.filter(col("reason") === "eval_holdout").count() === 1L)

    // delta: a near-dup of a train canonical, a near-dup of the eval
    // doc, a fresh doc (all train-split ids), a new eval-split doc, and
    // an eval-split doc near-dupping a DIFFERENT existing train
    // canonical (stage 3b contamination — distinct base so it forms no
    // unintended within-delta pair with dupTrainId)
    val deltaTrainIds = (1000L to 1300L).filter(split3(_) != 0)
    val (dupTrainId, dupEvalId, freshId) =
      (deltaTrainIds(0), deltaTrainIds(1), deltaTrainIds(2))
    val deltaEvalIds = (1000L to 1300L).filter(split3(_) == 0)
    val (deltaEvalId, contamEvalId) = (deltaEvalIds(0), deltaEvalIds(1))
    val trainCanonText = mkText(s"c${corpusTrainIds.head}")
    val deltaRows = Seq(
      (dupTrainId, nearDupText(trainCanonText)),
      (dupEvalId, nearDupText(mkText("ev"))),
      (freshId, mkText("fresh")),
      (deltaEvalId, mkText("nv")),
      (contamEvalId, nearDupText(mkText(s"c${corpusTrainIds(1)}"))))
    val deltaDocs = deltaRows.map { case (i, t) => (i, t, "en", t.length) }
      .toDF("doc_id", "text", "lang", "n_chars")

    val out = CorpusBuild.incrementalBuild(existing, corpusDocs, deltaDocs,
      "text", "doc_id", "lang", "n_chars").cache()
    try {
      // output covers exactly the delta: shipped artifacts untouched
      assert(out.select("id").distinct().collect().map(_.getLong(0)).sorted
        === deltaRows.map(_._1).sorted.toArray)
      // the VERDICT criteria: near-dup of an existing TRAIN doc drops
      // as duplicate; near-dup of the existing EVAL doc is
      // decontaminated as cross_split (decon runs BEFORE dedup)
      val dupRow = out.filter(col("id") === dupTrainId).collect()
      assert(dupRow.length === 1 && !dupRow(0).getBoolean(1) &&
        dupRow(0).getString(2) === "duplicate", dupRow.mkString)
      val evRow = out.filter(col("id") === dupEvalId).collect()
      assert(evRow.length === 1 && !evRow(0).getBoolean(1) &&
        evRow(0).getString(2) === "cross_split", evRow.mkString)
      // the new eval-split doc extends the holdout
      val newEv = out.filter(col("id") === deltaEvalId).collect()
      assert(newEv.length === 1 && newEv(0).getBoolean(1) &&
        newEv(0).getString(2) === "eval_holdout", newEv.mkString)
      // stage 3b: an eval-split delta doc near-dupping an existing
      // TRAIN canonical would evaluate the model on its own training
      // data — it drops as cross_split, never ships as eval_holdout
      val contamEv = out.filter(col("id") === contamEvalId).collect()
      assert(contamEv.length === 1 && !contamEv(0).getBoolean(1) &&
        contamEv(0).getString(2) === "cross_split", contamEv.mkString)
      // the fresh doc lands in the mix STRICTLY AFTER the existing max
      // position, in a fresh shard (ids offset by packShards = 8)
      val freshRows = out.filter(col("id") === freshId).collect()
      assert(freshRows.nonEmpty && freshRows.forall(_.getString(2) == null),
        freshRows.mkString)
      assert(freshRows.forall(_.getLong(8) > existingMaxPos),
        s"positions must append after $existingMaxPos: " +
          freshRows.mkString)
      assert(freshRows.forall(r => r.getInt(6) >= 8 && r.getInt(6) < 16),
        freshRows.mkString)
      // delta positions are the EXACT contiguous extension
      // [existingUnits, existingUnits + deltaUnits)
      val deltaPos = out.filter(col("pos").isNotNull)
        .select("pos").collect().map(_.getLong(0)).sorted
      assert(deltaPos === (existingUnits until
        existingUnits + deltaPos.length).toArray)
      // every delta doc appears exactly once as verdict XOR per copy
      val perDoc = out.groupBy("id").agg(count(lit(1)).as("n"),
        count(col("copy")).as("c"), count(col("reason")).as("r")).collect()
      perDoc.foreach { r =>
        assert(if (r.getLong(2) > 0) r.getLong(1) == r.getLong(2) &&
          r.getLong(3) == 0 else r.getLong(1) == 1 && r.getLong(3) == 1,
          r.toString)
      }
    } finally { out.unpersist(); existing.unpersist() }
  }
}
