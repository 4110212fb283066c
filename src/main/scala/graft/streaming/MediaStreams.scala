package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Multimodal

/**
 * Streaming media ingestion with signature-index-probed deduplication —
 * the multimodal symmetric of [[DocumentStreams]]/[[VectorStreams]],
 * closing the media family's streaming-maintenance checklist entry
 * (build / probe / append / repair / audit / compaction / streaming /
 * HTTP — the convention every stored family here carries): media items
 * (id, payload BINARY, meta struct — the [[Multimodal.mediaSchema]]
 * shape) arrive as a stream, each micro-batch is perceptually
 * near-dup-gated WITHIN itself ([[Multimodal.mediaNearDup]] reps — the
 * m03 exact-integer gate) and then AGAINST the accumulated corpus's
 * STORED signature index ([[Multimodal.mediaSignatureProbe]] over the
 * sb-partitioned grid signature store — payloads of the corpus are
 * never re-read), survivors append their signature rows via
 * [[Multimodal.mediaSignatureAppend]], and every decision lands in an
 * audit log.
 *
 * State lives under `stateDir`: `meta/` (the RELEASED 1-row signature
 * geometry — bins, threshold, buckets — written by the release job,
 * never by this stream: probes and appends derive cells BY it, the
 * [[VectorStreams]] centroid/codebook precedent), `sigs/` (the
 * accumulated signature store, PARTITIONED BY sb), and `decisions/`
 * (one audit row per arriving item: id, index_dup_of, batch_dup_of,
 * is_new). A missing meta release fails the batch loudly — silently
 * inventing geometry from the first batch would scatter every later
 * append.
 *
 * Replay contract: identical to the sibling streams — every store is
 * stamped `batch_id`, appends are skip-if-present
 * ([[DocumentStreams.committedIn]]), and the probe EXCLUDES index rows
 * stamped with the current batch id, so a crashed attempt replays to
 * the same final state (exactly-once for sigs/decisions).
 *
 * Scale: per batch, one histogram pass over the BATCH payloads (the
 * m03 gate + the probe side + the append rows all derive from it),
 * one broadcast probe against the store (DPP-pruned to the batch's
 * cells' sb buckets), one partition-wise append. The corpus's payloads
 * are read exactly once ever — at its own ingestion.
 */
object MediaStreams {

  /**
   * One micro-batch step, exposed for direct testing and backfills.
   * Within-batch first: the m03 exact gate flags intra-batch near-dups
   * (`batch_dup_of` = the kept item). Survivor reps then probe the
   * STORED signature index (None on the first batch): any stored item
   * within the release threshold records `index_dup_of` = the smallest
   * matching stored id. Returns (decisions, survivors) — survivors
   * derive from decisions, the one-subtree-persisted device of the
   * sibling streams.
   */
  def dedupeStep(index: Option[DataFrame], meta: DataFrame,
                 batch: DataFrame): (DataFrame, DataFrame) = {
    val (decisions, _) = dedupeStepHists(index, meta, batch)
    (decisions,
      batch.join(decisions.filter(col("is_new")).select(col("id")), "id"))
  }

  /** The hist-level step [[processBatch]] composes on: returns
    * (decisions, batch histograms) — the histograms are the ONE
    * payload pass of the batch ([[Multimodal.mediaHists]],
    * checkpointed), reused by the within-batch gate, the stored-index
    * probe, AND the caller's append-row derivation. Three separate
    * histsOf calls here would quietly triple the cost the module's
    * scaladoc names as dominant at media scale. */
  private def dedupeStepHists(index: Option[DataFrame], meta: DataFrame,
                              batch: DataFrame): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val thresholdPpm =
      meta.select(col("threshold_ppm").cast("int")).head().getInt(0)
    val hists = Multimodal.mediaHists(batch)
    val within = Multimodal.nearDupFromHists(spark, hists, thresholdPpm)
    val withinDups = within.filter(col("is_dup"))
      .select(col("id"), col("keep_id"))
    val repHists = hists.join(
      within.filter(!col("is_dup")).select(col("id")), "id")

    val repDecisions = index match {
      case Some(ix) =>
        val hits = Multimodal
          .probeFromHists(ix, meta, repHists, broadcastProbe = true)
          .groupBy(col("probe_id"))
          .agg(min(col("id")).as("index_dup_of"))
          .select(col("probe_id").as("id"), col("index_dup_of"))
        repHists.select(col("id")).join(hits, Seq("id"), "left")
          .select(col("id"), col("index_dup_of"),
            lit(null).cast("long").as("batch_dup_of"),
            col("index_dup_of").isNull.as("is_new"))
      case None =>
        repHists.select(col("id"),
          lit(null).cast("long").as("index_dup_of"),
          lit(null).cast("long").as("batch_dup_of"),
          lit(true).as("is_new"))
    }
    // no orderBy: decisions feed an unordered parquet append (the
    // sibling streams' convention)
    val decisions = repDecisions.unionByName(
      withinDups.select(col("id"),
        lit(null).cast("long").as("index_dup_of"),
        col("keep_id").as("batch_dup_of"),
        lit(false).as("is_new")))
    (decisions, hists)
  }

  /** The foreachBatch body: require the released meta geometry, load
    * the stored signature index (absent only before the first
    * committed batch of a meta-only release), run [[dedupeStep]],
    * append decisions + the survivors' signature rows (partition-wise —
    * only touched sb buckets gain files; derived from the BATCH
    * payloads only, bucket-validated against the stored rows through
    * [[Multimodal.mediaSignatureAppend]] so a drifted meta cannot
    * scatter rows into wrong partitions permanently). */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   batchId: Long, stateDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val metaPath = new org.apache.hadoop.fs.Path(s"$stateDir/meta")
    val fs = metaPath.getFileSystem(conf)
    if (!fs.exists(metaPath))
      throw new IllegalStateException(
        s"$stateDir has no signature-geometry release - write the 1-row " +
          s"meta table (Multimodal.mediaSignatureIndex's second element) " +
          s"to $stateDir/meta before starting media ingestion")
    val meta = spark.read.parquet(s"$stateDir/meta")
    if (batch.isEmpty) return
    val persisted = batch.persist()
    try {
      val sigsStore = DocumentStreams.loadStore(spark, s"$stateDir/sigs")
      val decisionsStore =
        DocumentStreams.loadStore(spark, s"$stateDir/decisions")
      // replay hygiene: same-batch leftover signature rows are excluded
      // so a survivor can never match its own half-committed row
      val index = sigsStore.map { ix =>
        if (ix.columns.contains("batch_id"))
          ix.filter(col("batch_id").isNull ||
            col("batch_id") =!= batchId).drop("batch_id")
        else ix
      }
      val (decisions, hists) = dedupeStepHists(index, meta, persisted)
      decisions.persist()
      try {
        if (!DocumentStreams.committedIn(decisionsStore, batchId))
          decisions.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$stateDir/decisions")
        // survivors' signature rows derive from the SAME checkpointed
        // batch histograms the gate and probe read — the payloads are
        // histogrammed exactly once per micro-batch
        val survHists = hists.join(
          decisions.filter(col("is_new")).select(col("id")), "id")
        val deltaSigs = (index match {
          case Some(ix) => Multimodal.appendFromHists(ix, meta, survHists)
          case None => Multimodal.rowsFromHists(meta, survHists)
        }).persist()
        try {
          // empty-append guard (the sibling streams' rule): an
          // all-duplicates batch must not create a schema-less dir
          val hasRows = deltaSigs.limit(1).count() > 0L
          if (hasRows && !DocumentStreams.committedIn(sigsStore, batchId))
            deltaSigs.withColumn("batch_id", lit(batchId))
              .write.mode("append").partitionBy("sb")
              .parquet(s"$stateDir/sigs")
        } finally { deltaSigs.unpersist(); () }
      } finally { decisions.unpersist(); () }
    } finally { persisted.unpersist(); () }
  }

  /** Start the ingestion query over any streaming DataFrame with the
    * media schema. Caller owns the query lifecycle. */
  def incrementalMediaQuery(stream: DataFrame,
                            stateDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, stateDir)
      }
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .start()

  /** Compact the media stores: `sigs/` keeps its sb partitioning (DPP
    * survives the rewrite), `decisions/` range-clusters flat. Run with
    * ingestion STOPPED — see [[DocumentStreams.compactStore]]. */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFileBytes: Long = 128L * 1024 * 1024)
      : Map[String, (Int, Int)] = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def exists(s: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/$s"))
    (if (exists("sigs"))
       Map("sigs" -> DocumentStreams.compactStore(spark,
         s"$stateDir/sigs", Seq("id"), targetFileBytes,
         partitionCols = Seq("sb")))
     else Map.empty[String, (Int, Int)]) ++
    (if (exists("decisions"))
       Map("decisions" -> DocumentStreams.compactStore(spark,
         s"$stateDir/decisions", Seq("batch_id", "id"), targetFileBytes))
     else Map.empty[String, (Int, Int)])
  }
}
