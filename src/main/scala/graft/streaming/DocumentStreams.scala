package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Dedup

/**
 * Streaming document ingestion with incremental deduplication — the
 * production shape of the dedup family: documents arrive as a stream
 * (file drops on object storage, a queue), each micro-batch is deduped
 * WITHIN itself (MinHash LSH reps) and then AGAINST the accumulated
 * corpus's STORED dedup index ([[graft.ops.Dedup.incrementalProbe]] —
 * exact digest join + MinHash band probe over the persisted
 * [[graft.ops.Dedup.incrementalIndex]] columns), survivors append to
 * the corpus store AND their index rows to the index store, and every
 * decision lands in an audit log.
 *
 * State lives in three parquet directories under `stateDir`: `corpus/`
 * (accepted docs, full input schema plus `batch_id` — the product),
 * `index/` (the derived dedup state: cid, digest, shingle set,
 * signature, `batch_id` — one row per accepted doc, appended
 * batch-sized), and `decisions/` (one audit row per arriving doc —
 * id, exact_dup_of, fuzzy_dup_of, contaminated_vs, is_new — plus
 * `batch_id`; stores written before the decontamination gate existed
 * read contaminated_vs as null through mergeSchema), written through
 * `foreachBatch` — the Structured Streaming hook for batch-only
 * operations (multi-pass joins, appends to non-streaming sinks) per
 * micro-batch. With `evalIndexDir` set, each batch is additionally
 * DECONTAMINATED against a stored eval-set fingerprint index — the one
 * curation gate a streaming corpus otherwise misses until a batch
 * decontamination sweep, made per-batch-cheap by the t29 index (see
 * [[dedupeStep]]). With `lexical` set, two more stores join them —
 * `postings/` and the `lexstats/` ledger — and ingestion keeps the t28
 * BM25 serving index fresh batch by batch; with `fingerprints` set, the
 * fpb-partitioned `fps/` store joins too and ingestion keeps the t29
 * contamination serving index fresh (see [[processBatch]]).
 *
 * Replay contract (foreachBatch is at-least-once: the checkpoint
 * commits AFTER the batch body returns, so a crash mid-body replays the
 * whole batch under the same `batchId`): every store is stamped with
 * `batch_id` and every append is skip-if-present, which upgrades the
 * three plain-parquet appends to exactly-once. The pieces: (a) each
 * single append is atomic at job granularity (the parquet committer
 * publishes task files at job commit — a crash mid-job leaves only
 * uncommitted temporaries), so "this store has rows with this
 * batch_id" is a reliable commit marker; (b) the probe EXCLUDES index
 * rows stamped with the current batch id — leftovers of a crashed
 * attempt — so a survivor can never exact-match its own half-written
 * index row and the batch's verdicts are identical on every attempt;
 * (c) given (b), the three appends commute, so any crash point between
 * them replays to the same final state. The per-store commit probe
 * reads one pruned column with LIMIT 1; its file-listing cost is the
 * small-files pressure [[compactState]] exists to relieve.
 *
 * Why the index store exists: probing with the live
 * [[graft.ops.Dedup.incremental]] would recompute digests, shingle sets
 * and signatures over the ENTIRE accumulated corpus text EVERY
 * micro-batch — per-batch cost grows with corpus TEXT size forever. The
 * stored index makes each batch's work: artifact computation for the
 * batch only, plus column-pruned reads of the index (the band join
 * fetches (cid, sig); shingle sets move only for band-collision
 * candidates) — at 100 TB the difference between re-tokenizing the
 * corpus per batch and reading a signature column.
 *
 * Contract: ids must be integral (they ride the dedup family's long
 * min-aggregations); the text column must be non-null-or-coalesced
 * upstream, same as the batch operators.
 */
object DocumentStreams {

  /**
   * One micro-batch step, exposed for direct testing and backfills.
   * Within-batch first: MinHash-LSH reps flag intra-batch duplicates
   * (recorded with `fuzzy_dup_of` = the kept doc, like the batch family's
   * one-hop reps). Survivors then probe the STORED corpus index
   * ([[graft.ops.Dedup.incrementalIndex]] rows — None on the first
   * batch). With `evalIndex` set (a stored
   * [[graft.ops.TextAnalysis.contaminationIndex]] of the EVAL/benchmark
   * holdout, built with that op's default k/window/hashMode/buckets —
   * the probe's bucket validation catches a modulus drift), the batch is
   * additionally DECONTAMINATED: reps are fingerprinted and DPP-probe
   * the eval index ([[graft.ops.TextAnalysis.contaminationProbe]] — the
   * batch side broadcasts, bounded by micro-batch size by definition),
   * and a rep sharing >= `evalMinShared` fingerprints with any eval doc
   * is REJECTED with `contaminated_vs` = the smallest matching eval id.
   * Gate order: dedup verdicts win first — `contaminated_vs` is
   * recorded only for docs that would otherwise have entered the corpus
   * (a duplicate is already rejected; its eval overlap adds nothing).
   *
   * Returns (decisions, survivors): decisions has one row per arriving
   * doc — (id, exact_dup_of, fuzzy_dup_of, contaminated_vs, is_new) —
   * and survivors derive from DECISIONS (not the probe subplan), so one
   * persist of `decisions` in [[processBatch]] serves every downstream
   * action: the LSH + stored-index probe executes ONCE per micro-batch
   * instead of once per sink.
   */
  def dedupeStep(index: Option[DataFrame], batch: DataFrame,
                 textCol: String, idCol: String,
                 threshold: Double,
                 evalIndex: Option[DataFrame] = None,
                 evalMinShared: Int = 2): (DataFrame, DataFrame) = {
    val idT = batch.schema(idCol).dataType
    val within = Dedup.minHashLSH(batch, textCol, idCol,
      threshold = threshold)
    val withinDups = within.filter(col("is_dup"))
      .select(col("id"), col("keep_id"))
    val batchReps = batch.join(
      within.filter(!col("is_dup")).select(col("id").as(idCol)), idCol)

    val repDecisions0 = index match {
      case Some(ix) =>
        Dedup.incrementalProbe(ix, batchReps, textCol, idCol,
          threshold = threshold)
      case None =>
        batchReps.select(col(idCol).as("id"),
          lit(null).cast(idT).as("exact_dup_of"),
          lit(null).cast(idT).as("fuzzy_dup_of"),
          lit(true).as("is_new"))
    }
    val repDecisions = evalIndex match {
      case Some(ei) =>
        // probe ALL reps (not just post-dedup survivors): joining the
        // survivor cut back in would embed the dedup-probe subtree
        // TWICE in one plan (Catalyst does not CSE across join inputs);
        // probing the few extra dup reps is cheaper than re-running the
        // probe. The witness is the smallest matching eval id —
        // deterministic, the audit row a triage dashboard pivots on
        val hits = graft.ops.TextAnalysis.contaminationProbe(ei,
            batchReps, textCol, idCol, minShared = evalMinShared)
          .groupBy(col("probe_id"))
          .agg(min(col("id")).cast("long").as("contaminated_vs"))
          .select(col("probe_id").as("id"), col("contaminated_vs"))
        repDecisions0.join(hits, Seq("id"), "left")
          .select(col("id"), col("exact_dup_of"), col("fuzzy_dup_of"),
            when(col("is_new"), col("contaminated_vs"))
              .otherwise(lit(null).cast("long")).as("contaminated_vs"),
            (col("is_new") && col("contaminated_vs").isNull).as("is_new"))
      case None =>
        repDecisions0.select(col("id"), col("exact_dup_of"),
          col("fuzzy_dup_of"),
          lit(null).cast("long").as("contaminated_vs"), col("is_new"))
    }
    // no orderBy: decisions feed an unordered parquet append — a sort
    // here would add a range exchange to every micro-batch for nothing
    val decisions = repDecisions.unionByName(
      withinDups.select(col("id"),
        lit(null).cast(idT).as("exact_dup_of"),
        col("keep_id").cast(idT).as("fuzzy_dup_of"),
        lit(null).cast("long").as("contaminated_vs"),
        lit(false).as("is_new")))
    // within-batch dups carry is_new = false, so filtering DECISIONS on
    // is_new selects exactly the probe's surviving reps — and routes
    // the survivors plan through the one subtree processBatch persists
    val survivors = batch.join(
      decisions.filter(col("is_new")).select(col("id").as(idCol)), idCol)
    (decisions, survivors)
  }

  /** The foreachBatch body: load the stored dedup index (absent on the
    * first batch), run [[dedupeStep]], append decisions + survivors +
    * the survivors' index rows (computed from the batch only — the
    * accumulated corpus is never re-read as text). `evalIndexDir`
    * (optional) points at a stored eval-set
    * [[graft.ops.TextAnalysis.contaminationIndex]] — a RELEASE artifact
    * like VectorStreams' centroids, written by the benchmark owner and
    * read here as a precondition (a missing path fails the batch
    * loudly: silently skipping the decontamination gate would admit
    * eval overlap while the operator believes it is checked).
    *
    * With `lexical` set, ingestion ALSO keeps the t28 BM25 serving
    * index fresh: each batch's survivors emit their posting rows
    * ([[graft.ops.Retrieval.bm25Index]] over the BATCH text only — the
    * corpus is never re-tokenized) into `postings/`, and the batch's
    * (n_docs, total_tokens) contribution appends to a `lexstats/`
    * LEDGER. The ledger is the one deliberate departure from
    * [[graft.ops.Retrieval.bm25IndexAppend]]'s derived 1-row REWRITE:
    * under foreachBatch's at-least-once replay an overwrite cannot be
    * made idempotent (a crash after the overwrite but before the
    * checkpoint commit replays the batch and folds the delta in TWICE —
    * silent double counting in every later score), while a ledger row
    * stamped `batch_id` gets the same skip-if-present exactly-once
    * guard as every other store. Probes fold the ledger with
    * [[bm25Stats]] — one tiny aggregate over #batches rows (compacted
    * by [[compactState]]) whose output is exactly the 1-row broadcast
    * [[graft.ops.Retrieval.bm25Probe]] expects, so the probe contract
    * is unchanged. Posting rows are per-document facts and both ledger
    * quantities are additive, so the accumulated stores equal a
    * from-scratch [[graft.ops.Retrieval.bm25Index]] over the corpus
    * store (spec-pinned) — df falls out of the posting rows, moving
    * WITH each append.
    *
    * With `fingerprints` set, ingestion ALSO keeps the t29 contamination
    * serving index fresh — the store a benchmark owner's
    * contamination-search probes ("is this new eval set in our
    * corpus?"), which otherwise staleness-drifts with every accepted
    * batch: survivors' inverted winnowing fingerprints (per-document
    * facts, the t31 contract) append partition-wise into the
    * fpb-partitioned `fps/` store — first batch creates the layout via
    * [[graft.ops.TextAnalysis.contaminationIndex]], later batches go
    * through [[graft.ops.TextAnalysis.contaminationIndexAppend]], whose
    * stored-sample bucket validation catches a modulus drift BEFORE
    * rows scatter into wrong partitions permanently. Same batch-stamped
    * exactly-once guard, same empty-append guard, one fingerprinting
    * pass per batch (the delta rows are persisted around the guard
    * probe and the write). Note the direction: this is the CORPUS-side
    * index eval sets probe; `evalIndexDir` above is the converse gate
    * (the EVAL-side index this batch probes).
    *
    * With `sketch` set, ingestion ALSO maintains the x14 mergeable
    * cardinality sketch (`sketches/` — one ≤ `sketchK`-row KMV sketch
    * per batch, shard = batch_id), so "how many distinct trigrams does
    * the corpus hold" is answerable at any time from the stored rows
    * alone (the distinct-sketch HTTP route's read) without ever
    * re-tokenizing the corpus — see the body comment for the
    * merge ≡ rebuild argument.
    *
    * With `bloom` set, ingestion ALSO maintains the d19 membership
    * filter (`bloomf/` — per-batch word rows that union by bit_or, so
    * the accumulated store merges to EXACTLY the filter a one-shot
    * build over the corpus would produce), the "seen this text
    * before?" pre-filter an ingest front-end probes without touching
    * the corpus. `bloomWords`/`bloomK` must stay fixed for the store's
    * lifetime (they define the hash geometry — changing them mid-store
    * corrupts membership silently, the d19 contract).
    *
    * With `hist` set, ingestion ALSO maintains the x15 mergeable
    * quantile synopsis (`hists/` — one per-batch fixed-bin histogram of
    * the survivors' text length, shard = batch_id), completing the
    * synopsis trio's streaming maintenance (KMV = distinct count,
    * Bloom = membership, this = rank statistics): "what does the
    * corpus's length distribution look like" is answerable at any time
    * from the merged per-bin counts (the quantile-sketch HTTP route's
    * read) without scanning the corpus. Bins are value-based over the
    * FIXED [`histLo`, `histHi`] envelope — envelope constants are the
    * store's geometry, like the Bloom nWords/k: fixed for the store's
    * lifetime (out-of-envelope lengths clamp to the edge bins,
    * visibly). Merge ≡ rebuild: counts are additive per value-based
    * bin, so the accumulated store merges to exactly what one
    * [[graft.ops.Sketches.histSketch]] over the corpus store's lengths
    * would produce (spec-pinned — including null-text survivors, which
    * contribute no bin on EITHER path: a NULL length has no rank).
    * Migration note: a `hists/` store written BEFORE the null
    * exclusion (r14) binned null-text survivors at length 0, so for
    * such corpora the stored low bins sit above the rebuild's; the
    * remedy is the synopsis-family staleness remedy — rebuild the
    * store once (histSketch over the corpus store, shard = batch
    * column) — since per-bin counts cannot be subtracted.
    *
    * With `nbLabel` set (a boolean Column over the batch's columns —
    * the teacher being distilled, e.g. the t33 lang-id verdict),
    * ingestion ALSO maintains the t34 appendable classifier model:
    * each batch's survivors train their own
    * [[graft.ops.Classifier.nbTrain]] delta — counts rows append into
    * `nbcounts/`, the 1-row totals appends into the `nbtotals/` LEDGER
    * (additive dp/dn; the non-additive joint vocabulary size is
    * recomputed at read time) — and [[nbModel]] folds the stores back
    * into the (counts, totals) pair [[graft.ops.Classifier.nbScore]]
    * expects, equal to retraining from scratch over the corpus store
    * (the t34 fold ≡ retrain contract, spec-pinned). A batch whose
    * survivors are all rejected appends nothing; a NULL teacher
    * verdict fails the batch loudly (nbTrain's label gate). */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   stateDir: String, textCol: String, idCol: String,
                   threshold: Double,
                   evalIndexDir: Option[String] = None,
                   evalMinShared: Int = 2,
                   lexical: Boolean = false,
                   fingerprints: Boolean = false,
                   sketch: Boolean = false,
                   sketchK: Int = 256,
                   bloom: Boolean = false,
                   bloomWords: Int = 1 << 12,
                   bloomK: Int = 4,
                   hist: Boolean = false,
                   histLo: Long = 0L,
                   histHi: Long = (1L << 20) - 1,
                   histBins: Int = 64,
                   nbLabel: Option[org.apache.spark.sql.Column] = None): Unit = {
    val persisted = batch.persist()
    try {
      // each store is LOADED ONCE per batch (loadStore does the
      // explicit existence probe, NOT a catch on the read — a transient
      // read failure must FAIL the batch; swallowing it as "first
      // batch" would silently reset the index and re-admit every past
      // duplicate) and that one read serves every consumer: the probe,
      // the migration guard, and the commit markers. The mergeSchema
      // footer merge is O(store files) — paying it once per store per
      // batch instead of once per CHECK is what keeps the per-batch
      // fixed cost at three listings, with compactState bounding the
      // file count each listing walks
      val indexStore = loadStore(spark, s"$stateDir/index")
      val corpusStore = loadStore(spark, s"$stateDir/corpus")
      val decisionsStore = loadStore(spark, s"$stateDir/decisions")
      // migration guard: a stateDir written before the index store
      // existed has corpus/ but no index/ — treating that as "first
      // batch" would make the whole accumulated corpus invisible to
      // dedup and re-admit every past duplicate. Fail loudly; the
      // operator backfills once with Dedup.incrementalIndex(corpus)
      if (indexStore.isEmpty && corpusStore.isDefined)
        throw new IllegalStateException(
          s"$stateDir has a corpus store but no index store - backfill " +
            s"it once (Dedup.incrementalIndex over $stateDir/corpus -> " +
            s"$stateDir/index) before resuming ingestion")
      // replay hygiene: index rows stamped with THIS batch id are
      // leftovers of a crashed prior attempt of the same micro-batch —
      // excluded, so the probe's verdicts are identical on every
      // attempt (a survivor must never exact-match its own
      // half-committed index row). Null/absent batch_id = rows written
      // before stamping existed or by an incrementalIndex backfill —
      // always prior corpus, always probed.
      val index = indexStore.map { ix =>
        if (ix.columns.contains("batch_id"))
          ix.filter(col("batch_id").isNull ||
            col("batch_id") =!= batchId).drop("batch_id")
        else ix
      }
      val evalIndex = evalIndexDir.map(p => spark.read.parquet(p))
      val (decisions, survivors) =
        dedupeStep(index, persisted, textCol, idCol, threshold,
          evalIndex, evalMinShared)
      // ONE execution of the LSH + stored-index probe per micro-batch:
      // decisions embeds that whole subplan and every other action
      // (survivors' materialization below) now derives from decisions,
      // so persisting it here means the first action computes the probe
      // and the rest read cache — previously the decisions write and
      // the survivors join each re-ran minHashLSH + incrementalProbe
      // (the r11 verdict's constant-factor-2 on exactly the work the
      // stored index exists to minimize)
      decisions.persist()
      try {
        // exactly-once appends: each store's rows with this batch_id are
        // its commit marker (a single parquet append publishes atomically
        // at job commit) — present means a prior attempt committed this
        // store, so skip. Each check reads ONE pruned column with LIMIT 1
        // off the already-loaded store.
        if (!committedIn(decisionsStore, batchId))
          decisions.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$stateDir/decisions")
        // survivors enter the corpus AND the index; persist so the two
        // sinks don't re-run the batch-side join (its decisions input
        // reads the cache above)
        val surv = survivors.persist()
        try {
          if (!committedIn(indexStore, batchId))
            graft.ops.Dedup.incrementalIndex(surv, textCol, idCol)
              .withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(s"$stateDir/index")
          if (!committedIn(corpusStore, batchId))
            surv.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(s"$stateDir/corpus")
          if (lexical) {
            val postingsStore = loadStore(spark, s"$stateDir/postings")
            val lexstatsStore = loadStore(spark, s"$stateDir/lexstats")
            // ONE tokenize/count pass per batch: the posting rows are
            // persisted and BOTH the ledger row and the empty-append
            // probe derive from them — dl is denormalized onto every
            // posting and is functional in id, so distinct (id, dl)
            // re-derives exactly bm25Index's stats aggregate (n_docs
            // counts docs with >= 1 token on both paths). Without this
            // the guard probe and the two writes would each re-run the
            // batch tokenization (the r11 constant-factor class).
            val deltaPost = graft.ops.Retrieval
              .bm25Index(surv, textCol, idCol)._1.persist()
            try {
              // same empty-append guard as VectorStreams: a batch whose
              // survivors carry no tokenizable text (null text rows
              // emit zero dl/posting rows — matching what a
              // from-scratch rebuild over the corpus store would count)
              // must not CREATE a schema-less postings directory, and
              // its (0, null) stats row would be ledger noise
              val hasRows = deltaPost.limit(1).count() > 0L
              if (hasRows && !committedIn(postingsStore, batchId))
                deltaPost.withColumn("batch_id", lit(batchId))
                  .write.mode("append").parquet(s"$stateDir/postings")
              if (hasRows && !committedIn(lexstatsStore, batchId))
                deltaPost.select(col("id"), col("dl")).distinct()
                  .agg(count(lit(1)).as("n_docs"),
                    sum(col("dl")).as("total_tokens"))
                  .withColumn("batch_id", lit(batchId))
                  .write.mode("append").parquet(s"$stateDir/lexstats")
            } finally { deltaPost.unpersist(); () }
          }
          if (sketch) {
            val sketchStore = loadStore(spark, s"$stateDir/sketches")
            // the x14 mergeable-cardinality artifact, maintained at
            // ingestion: each batch IS a shard (shard = batch_id — a
            // shard's sketch never changes retroactively, which is
            // exactly what a batch gives us), so the store accumulates
            // one ≤ k-row sketch per batch and the release's distinct-
            // trigram count is a merge over the stored rows — the
            // distinct-sketch route reads it directly. Merge-of-shards
            // ≡ sketch-of-union (each of the k globally-smallest hashes
            // is among its own shard's k smallest), so per-batch
            // sharding loses nothing vs a from-scratch corpus sketch
            // (spec-pinned). Same guards as the other stores: the
            // trigram distinct here is BATCH-sized (the corpus is never
            // re-tokenized — the whole point of maintaining the sketch
            // incrementally), empty batches must not create a
            // schema-less directory, and the batch_id stamp makes the
            // append exactly-once under replay.
            val deltaSk = graft.ops.Sketches.kmvSketch(
              surv.select(lit(batchId).cast("int").as("shard"),
                explode(graft.ops.Sketches.wordTrigrams(
                  coalesce(col(textCol), lit("")))).as("v")),
              "v", "shard", sketchK).persist()
            try {
              val hasSk = deltaSk.limit(1).count() > 0L
              if (hasSk && !committedIn(sketchStore, batchId))
                deltaSk.withColumn("batch_id", lit(batchId))
                  .write.mode("append").parquet(s"$stateDir/sketches")
            } finally { deltaSk.unpersist(); () }
          }
          if (bloom) {
            val bloomStore = loadStore(spark, s"$stateDir/bloomf")
            // the d19 membership artifact, maintained at ingestion:
            // each batch appends its survivors' filter WORDS (bit_or
            // is idempotent and associative, so per-batch word rows
            // union losslessly — the serving read is bloomMerge over
            // the accumulated rows, bit-identical to a filter built
            // from the corpus store in one shot, spec-pinned). The
            // external consumer is a crawler/ingest front-end asking
            // "seen this text (URL, digest) before?" without touching
            // the corpus. Same exactly-once and empty-append guards;
            // the k-md5 pass runs over the BATCH only.
            val deltaBloom = graft.ops.Bloom.bloomBuild(
              surv.select(col(textCol)), textCol,
              nWords = bloomWords, k = bloomK).persist()
            try {
              val hasWords = deltaBloom.limit(1).count() > 0L
              if (hasWords && !committedIn(bloomStore, batchId))
                deltaBloom.withColumn("batch_id", lit(batchId))
                  .write.mode("append").parquet(s"$stateDir/bloomf")
            } finally { deltaBloom.unpersist(); () }
          }
          if (hist) {
            val histStore = loadStore(spark, s"$stateDir/hists")
            // the x15 quantile synopsis at ingestion: each batch IS a
            // shard; binning runs over the BATCH survivors' lengths
            // only (the corpus is never re-read — the maintenance
            // point), into the store-lifetime [histLo, histHi]
            // envelope. Same exactly-once and empty-append guards.
            // Null-text survivors contribute NO bin (histSketch's own
            // null filter — length(NULL) is NULL), matching the pinned
            // rebuild form (histSketch over the corpus store's
            // lengths): a coalesce-to-0 here would silently shift the
            // streamed quantiles off the rebuild's for any corpus
            // holding null-text survivors.
            val deltaHist = graft.ops.Sketches.histSketch(
              surv.select(lit(batchId).cast("int").as("shard"),
                length(col(textCol)).cast("long").as("len")),
              "len", "shard", histLo, histHi, histBins).persist()
            try {
              val hasH = deltaHist.limit(1).count() > 0L
              if (hasH && !committedIn(histStore, batchId))
                deltaHist.withColumn("batch_id", lit(batchId))
                  .write.mode("append").parquet(s"$stateDir/hists")
            } finally { deltaHist.unpersist(); () }
          }
          nbLabel.foreach { label =>
            val cntStore = loadStore(spark, s"$stateDir/nbcounts")
            val totStore = loadStore(spark, s"$stateDir/nbtotals")
            // the t34 appendable model at ingestion: the batch's own
            // nbTrain delta appends — counts rows as-is, totals as a
            // ledger row. The ledger row must append whenever ANY
            // survivor exists (a token-less survivor still moves the
            // dp/dn priors in a from-scratch retrain — skipping it
            // would break fold ≡ retrain), counts only when non-empty.
            val (dCnt, dTot) = graft.ops.Classifier.nbTrain(
              surv, textCol, idCol, label)
            val dCntP = dCnt.persist()
            try {
              val tRow = dTot.head()
              val nSurvivors = tRow.getAs[Long]("dp") + tRow.getAs[Long]("dn")
              if (nSurvivors > 0L) {
                if (dCntP.limit(1).count() > 0L &&
                    !committedIn(cntStore, batchId))
                  dCntP.withColumn("batch_id", lit(batchId))
                    .write.mode("append").parquet(s"$stateDir/nbcounts")
                if (!committedIn(totStore, batchId))
                  dTot.coalesce(1).withColumn("batch_id", lit(batchId))
                    .write.mode("append").parquet(s"$stateDir/nbtotals")
              }
            } finally { dCntP.unpersist(); () }
          }
          if (fingerprints) {
            val fpsStore = loadStore(spark, s"$stateDir/fps")
            // first batch creates the fpb layout; later batches append
            // through the bucket-validated path — an append-side
            // modulus mismatch would scatter the newest rows into wrong
            // partitions PERMANENTLY, so it must fail before writing
            val deltaFps = (fpsStore match {
              case Some(ix) => graft.ops.TextAnalysis
                .contaminationIndexAppend(ix.drop("batch_id"), surv,
                  textCol, idCol)
              case None => graft.ops.TextAnalysis
                .contaminationIndex(surv, textCol, idCol)
            }).persist()
            try {
              // one fingerprinting pass per batch: the guard probe and
              // the write both read the persisted delta rows
              val hasFps = deltaFps.limit(1).count() > 0L
              if (hasFps && !committedIn(fpsStore, batchId))
                deltaFps.withColumn("batch_id", lit(batchId))
                  .write.mode("append").partitionBy("fpb")
                  .parquet(s"$stateDir/fps")
            } finally { deltaFps.unpersist(); () }
          }
        } finally { surv.unpersist(); () }
      } finally { decisions.unpersist(); () }
    } finally { persisted.unpersist(); () }
  }

  /** Load a state store if it exists (None otherwise) — mergeSchema so
    * a store written before batch_id stamping existed surfaces the
    * column as null on old files instead of letting a single arbitrary
    * footer decide the schema (compactState normalizes the layout back
    * to uniform files). Callers load each store ONCE per batch and
    * reuse the read for every consumer — the footer merge is O(store
    * files), so per-check reloads would multiply the one cost that
    * grows between compactions. */
  private[streaming] def loadStore(spark: SparkSession,
      dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p))
      Some(spark.read.option("mergeSchema", "true").parquet(dir))
    else None
  }

  /** The per-store exactly-once commit marker shared by the ingestion
    * sinks ([[processBatch]], [[VectorStreams.processBatch]]): an
    * already-loaded store (None = absent) holds rows stamped with
    * `batchId` iff a prior attempt of this micro-batch committed that
    * store's append. One pruned-column scan with LIMIT 1. */
  private[streaming] def committedIn(store: Option[DataFrame],
      batchId: Long): Boolean =
    store.exists { df =>
      df.columns.contains("batch_id") &&
        df.filter(col("batch_id") === batchId).limit(1).count() > 0L
    }

  /** Fold the `lexstats/` ledger a `lexical` ingestion maintains into
    * the 1-row (n_docs, total_tokens) table
    * [[graft.ops.Retrieval.bm25Probe]] broadcasts — one aggregate over
    * #batches tiny rows ([[compactState]] bounds the file count). The
    * folded row equals what a from-scratch
    * [[graft.ops.Retrieval.bm25Index]] over the corpus store derives:
    * both quantities are additive over batches. */
  def bm25Stats(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(s"$stateDir/lexstats")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"))

  /** Fold the `nbcounts/` + `nbtotals/` stores an `nbLabel` ingestion
    * maintains into the (counts, totals) pair
    * [[graft.ops.Classifier.nbScore]] expects —
    * [[graft.ops.Classifier.nbModelFold]] over the accumulated rows,
    * equal to retraining from scratch over the corpus store (the t34
    * contract; [[compactState]] bounds the file count both reads
    * walk). */
  def nbModel(spark: SparkSession, stateDir: String)
      : (DataFrame, DataFrame) =
    graft.ops.Classifier.nbModelFold(
      spark.read.option("mergeSchema", "true")
        .parquet(s"$stateDir/nbcounts"),
      spark.read.option("mergeSchema", "true")
        .parquet(s"$stateDir/nbtotals"))

  /** Start the ingestion query over any streaming DataFrame with
    * (idCol, textCol) columns. Caller owns the query lifecycle.
    * `evalIndexDir` arms the per-batch decontamination gate and
    * `lexical` the BM25 serving-index maintenance — see
    * [[processBatch]]. */
  def incrementalDedupQuery(stream: DataFrame, stateDir: String,
                            textCol: String, idCol: String,
                            threshold: Double = 0.8,
                            evalIndexDir: Option[String] = None,
                            evalMinShared: Int = 2,
                            lexical: Boolean = false,
                            fingerprints: Boolean = false): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, stateDir,
          textCol, idCol, threshold, evalIndexDir, evalMinShared,
          lexical, fingerprints)
      }
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .start()

  /** Rewrite one parquet state store into `ceil(bytes/targetFileBytes)`
    * range-clustered files — the maintenance pass that keeps an
    * append-per-micro-batch store readable. Every [[processBatch]]
    * appends one small file set to each store, so at production batch
    * cadence (a batch a minute = half a million files a year) the index
    * probe's cost stops being the signature column and becomes the
    * FILE LISTING + per-file footer reads — the classic streaming-
    * ingestion failure mode. Compaction rewrites the accumulated rows
    * into target-sized files, range-partitioned AND sorted by
    * `sortCols` (stable layout; per-file and row-group min/max stats on
    * the sort key), and normalizes a mixed pre/post-`batch_id` schema
    * into uniform files (old rows read as null batch_id).
    *
    * Swap protocol: write to `<dir>.__compact`, verify the row count
    * matches the source, then rename source aside, rename the rewrite
    * in, delete the original — two renames, each atomic on HDFS-like
    * filesystems (an object-store deployment would land this behind a
    * table format's commit instead). MUST run while ingestion is
    * stopped: an append landing between the read and the swap would be
    * silently dropped by the directory replacement.
    *
    * Returns (files before, files after). */
  def compactStore(spark: SparkSession, dir: String,
                   sortCols: Seq[String],
                   targetFileBytes: Long = 128L * 1024 * 1024,
                   partitionCols: Seq[String] = Nil): (Int, Int) = {
    require(sortCols.nonEmpty, "compactStore needs at least one sort column")
    require(targetFileBytes >= 1, "targetFileBytes must be >= 1")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(path), s"no store at $dir")
    // recursive data-file census (a partitioned store nests its files
    // one directory level per partition column)
    def census(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq
        .filter(s => !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .flatMap(s => if (s.isFile) Seq(s) else census(s.getPath))
    val dataFiles = census(path)
    val bytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue.toLong).toInt
    val src = spark.read.option("mergeSchema", "true").parquet(dir)
    val tmp = dir + ".__compact"
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true) // crashed prior run
    // flat store: nFiles range-clustered files on the sort key.
    // Partitioned store (e.g. the IVF index's cid layout): range-cluster
    // by (partition cols, sort cols) into the same byte-derived nFiles —
    // the partitionBy write still lands every row in its value's
    // directory (preserving the layout and its dynamic-partition-pruning
    // reads), but an OVERSIZED value (a hot inverted list, a skewed
    // fingerprint bucket) now spans multiple range slices and therefore
    // multiple tasks and files of ~targetFileBytes each, instead of one
    // straggler task writing one multi-GB file that later reads as a
    // single split (the r11 verdict's skew failure mode). Small values
    // share a task; the per-task dynamic-partition writer opens one file
    // per value it holds, so the directory count — not the task count —
    // stays the layout's.
    val clustered =
      if (partitionCols.isEmpty)
        src.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else
        src.repartitionByRange(nFiles, (partitionCols ++ sortCols).map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    val writer = clustered.write.mode("overwrite")
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*)).parquet(tmp)
    // destructive-swap gate: the rewrite must account for every row
    val (nSrc, nTmp) = (src.count(), spark.read.parquet(tmp).count())
    require(nTmp == nSrc,
      s"compaction rewrite of $dir has $nTmp rows, source has $nSrc")
    val old = new org.apache.hadoop.fs.Path(dir + ".__old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(path, old), s"could not move $dir aside")
    require(fs.rename(tmpPath, path), s"could not move $tmp into place")
    fs.delete(old, true)
    (dataFiles.size, census(path).size)
  }

  /** Compact every store under a [[processBatch]] `stateDir` that
    * exists: `index/` clustered by cid (one contiguous artifact row
    * range per corpus id span), `decisions/` by (batch_id, id) (the
    * audit log's natural read order), `corpus/` by `idCol`, and — for a
    * `lexical` ingestion — `postings/` by TERM (restoring the t28
    * release layout's In(t) row-group pruning that per-batch appends
    * degrade toward file-level min/max, the LSM-style append/compact
    * split [[graft.ops.Retrieval.bm25IndexAppend]] documents) plus the
    * `lexstats/` ledger by batch_id. Probe decisions are
    * layout-independent (the spec pins identical verdicts pre/post);
    * the win is the listing/footer cost — and for postings, the
    * restored term clustering. Run with ingestion STOPPED — see
    * [[compactStore]]. Returns per-store (files before, files
    * after). */
  def compactState(spark: SparkSession, stateDir: String, idCol: String,
                   targetFileBytes: Long = 128L * 1024 * 1024)
      : Map[String, (Int, Int)] = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // (store, sort keys, partition cols) — `fps/` keeps its fpb layout
    // through compaction (a flat rewrite would silently destroy the
    // probe's dynamic partition pruning), sorted by fp within buckets
    // so the (fpb, fp) join reads tight row groups
    Seq(("index", Seq("cid"), Nil), ("decisions", Seq("batch_id", "id"), Nil),
        ("corpus", Seq(idCol), Nil), ("postings", Seq("t"), Nil),
        ("lexstats", Seq("batch_id"), Nil), ("fps", Seq("fp"), Seq("fpb")),
        ("sketches", Seq("shard", "h"), Nil), ("bloomf", Seq("w"), Nil),
        ("hists", Seq("shard", "bin"), Nil), ("nbcounts", Seq("t"), Nil),
        ("nbtotals", Seq("batch_id"), Nil))
      .filter { case (s, _, _) =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/$s")) }
      .map { case (s, keys, parts) =>
        s -> compactStore(spark, s"$stateDir/$s", keys, targetFileBytes,
          partitionCols = parts) }
      .toMap
  }
}
