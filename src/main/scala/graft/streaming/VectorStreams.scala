package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Similarity

/**
 * Streaming vector ingestion with index-probed deduplication — the
 * embedding symmetric of [[DocumentStreams]]: vectors arrive as a
 * stream, each micro-batch is near-dup-gated WITHIN itself
 * ([[graft.ops.Similarity.cosineNearDup]] reps) and then AGAINST the
 * accumulated corpus's STORED IVF index (a k=1
 * [[graft.ops.Similarity.ivfTopKPartitioned]] probe — the nearest
 * already-indexed vector, read through the cid-partitioned layout's
 * dynamic partition pruning), survivors append their assignment rows
 * into the index via [[graft.ops.Similarity.ivfIndexAppend]], and every
 * decision lands in an audit log.
 *
 * State lives under `stateDir`: `cent/` (the RELEASED centroid set —
 * written by the release job, never by this stream: queries probe BY
 * it, so ingestion assigns against it and re-training waits for the
 * next release), `index/` (the accumulated (id, vec, cid, batch_id)
 * assignment rows, PARTITIONED BY cid — for vectors the index IS the
 * corpus), and `decisions/` (one audit row per arriving vector). With
 * `pq` set, two more join them: `codebook/` (the released (code, sub,
 * cvec) quantization geometry — a release artifact like the centroids)
 * and `codes/` (the accumulated compressed tier, PARTITIONED BY cid —
 * see [[processBatch]]).
 *
 * The cross-batch gate is deliberately the SERVING read, not a full
 * scan: the probe checks the `nprobe` nearest inverted lists, so a
 * near-dup hiding in an unprobed list is missed — the standard
 * approximate-dedup tradeoff of a vector-ingestion pipeline (recall is
 * the e10/e13 harnesses' number; the exact alternative is d05's full
 * pair join, which re-reads the whole index per batch and is exactly
 * what the stored index exists to avoid). Raise `nprobe` to buy recall
 * with read amplification.
 *
 * Replay contract: identical to [[DocumentStreams]] — every store is
 * stamped with `batch_id`, appends are skip-if-present
 * ([[DocumentStreams.committedIn]] over the once-per-batch store
 * reads), and the probe EXCLUDES index rows stamped with the current
 * batch id, so a crashed attempt replays to the same final state
 * (exactly-once for index/decisions).
 *
 * Maintenance: [[compactState]] — the index keeps its cid layout
 * through compaction ([[DocumentStreams.compactStore]]'s partitioned
 * form), so DPP survives the rewrite.
 *
 * Contract: ids must be integral (they ride the rank aggregations) and
 * the vector column must be non-null-or-coalesced upstream, the same
 * contract as [[DocumentStreams]]' text column — a null vector cannot
 * be near-dup-gated or assigned, so it is recorded `is_new` in the
 * audit log but never enters the index (the batch step is defensive
 * about it; honoring the contract upstream is what keeps the decision
 * log meaning what it says).
 */
object VectorStreams {

  /**
   * One micro-batch step, exposed for direct testing and backfills.
   * Within-batch first: hyperplane-LSH near-dup reps flag intra-batch
   * duplicates (`batch_dup_of` = the kept vector). Survivor reps then
   * probe the STORED index (None on the first batch): a top-1 neighbor
   * at cosine >= `threshold` records `index_dup_of`. Returns
   * (decisions, survivors): decisions has one row per arriving vector —
   * (id, index_dup_of, batch_dup_of, is_new); survivors are the batch
   * rows (full schema) whose vectors enter the index.
   */
  def dedupeStep(index: Option[DataFrame], centroids: DataFrame,
                 batch: DataFrame, vecCol: String, idCol: String,
                 dim: Int, threshold: Double,
                 nprobe: Int): (DataFrame, DataFrame) = {
    val idT = batch.schema(idCol).dataType
    val within = Similarity.cosineNearDup(batch, vecCol, idCol, dim,
      threshold)
    val withinDups = within.filter(col("is_dup"))
      .select(col("id"), col("keep_id"))
    val reps = batch.join(
      within.filter(!col("is_dup")).select(col("id").as(idCol)), idCol)

    val repDecisions = index match {
      case Some(ix) =>
        val dup = Similarity.ivfTopKPartitioned(ix, "vec", "id", "cid",
            reps, vecCol, idCol, centroids, "cvec", "cid",
            k = 1, nprobe = nprobe)
          .filter(col("sim") >= threshold)
          .select(col("query_id").as("id"),
            col("id").cast(idT).as("index_dup_of"))
        reps.select(col(idCol).as("id")).join(dup, Seq("id"), "left")
          .select(col("id"), col("index_dup_of"),
            lit(null).cast(idT).as("batch_dup_of"),
            col("index_dup_of").isNull.as("is_new"))
      case None =>
        reps.select(col(idCol).as("id"),
          lit(null).cast(idT).as("index_dup_of"),
          lit(null).cast(idT).as("batch_dup_of"),
          lit(true).as("is_new"))
    }
    // no orderBy: decisions feed an unordered parquet append (the
    // DocumentStreams convention)
    val decisions = repDecisions.unionByName(
      withinDups.select(col("id"),
        lit(null).cast(idT).as("index_dup_of"),
        col("keep_id").cast(idT).as("batch_dup_of"),
        lit(false).as("is_new")))
    // within-batch dups carry is_new = false, so filtering DECISIONS on
    // is_new selects exactly the probe's surviving reps — and routes
    // the survivors plan through the one subtree processBatch persists
    // (the DocumentStreams device: the within-batch LSH and the k=1
    // stored-index probe execute ONCE per micro-batch, not per sink)
    val survivors = batch.join(
      decisions.filter(col("is_new")).select(col("id").as(idCol)), idCol)
    (decisions, survivors)
  }

  /** The foreachBatch body: load the released centroids and the stored
    * index (absent on the first batch), run [[dedupeStep]], append
    * decisions + the survivors' assignment rows (partition-wise — only
    * touched lists gain files).
    *
    * With `pq` set, ingestion ALSO keeps the compressed serving tier
    * fresh (the e23/e24 codes family — [[DocumentStreams]]' `lexical`
    * symmetric): survivors code against the RELEASED `codebook/`
    * artifact ([[graft.ops.Similarity.ivfPqCodesFromAssigned]] over the
    * batch's already-argmaxed (id, vec, cid) rows — one coding pass and
    * one argmax per batch, never two) and their (id, sub, code, cid)
    * rows append partition-wise into `codes/` under the same
    * batch-stamped exactly-once guard. Codes are per-vector facts of
    * the fixed codebook and the lists are the same argmax as the raw
    * index rows, so the codes store stays row-set-equal to
    * ivfPqIndex over the accumulated index store (spec-pinned: an ADC
    * probe of the streamed codes equals one over the rebuild). */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   stateDir: String, vecCol: String, idCol: String,
                   dim: Int, threshold: Double, nprobe: Int,
                   pq: Boolean = false, m: Int = 4): Unit = {
    val persisted = batch.persist()
    try {
      val conf = spark.sessionState.newHadoopConf()
      val centPath = new org.apache.hadoop.fs.Path(s"$stateDir/cent")
      val fs = centPath.getFileSystem(conf)
      // the centroid release is a precondition, not something ingestion
      // invents: assigning against ad-hoc centroids would scatter the
      // same list across releases and break every probe's geometry
      if (!fs.exists(centPath))
        throw new IllegalStateException(
          s"$stateDir has no centroid release - write the released " +
            s"centroid set (Similarity.ivfIndex or a k-means run) to " +
            s"$stateDir/cent before starting ingestion")
      val cent = spark.read.parquet(s"$stateDir/cent")
      // each store loaded ONCE per batch and reused by the probe + the
      // commit markers (the DocumentStreams discipline); replay hygiene
      // identical — same-batch leftover index rows excluded
      val indexStore = DocumentStreams.loadStore(spark, s"$stateDir/index")
      val decisionsStore =
        DocumentStreams.loadStore(spark, s"$stateDir/decisions")
      val index = indexStore.map { ix =>
        if (ix.columns.contains("batch_id"))
          ix.filter(col("batch_id").isNull ||
            col("batch_id") =!= batchId).drop("batch_id")
        else ix
      }
      val (decisions, survivors) =
        dedupeStep(index, cent, persisted, vecCol, idCol, dim,
          threshold, nprobe)
      // ONE execution of the LSH + stored-index probe per micro-batch:
      // decisions embeds that whole subplan and the survivors plan
      // derives from decisions, so the first action computes the probe
      // and the append-rows materialization reads cache (the
      // DocumentStreams fix for the r11 verdict's constant-factor-2)
      decisions.persist()
      try {
        if (!DocumentStreams.committedIn(decisionsStore, batchId))
          decisions.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$stateDir/decisions")
        val appendRows = Similarity.ivfIndexAppend(survivors, vecCol,
            idCol, cent, "cvec", "cid")
          .persist()
        try {
          // a batch that contributes no index rows appends nothing — and
          // must not CREATE an empty index directory (a dir holding only
          // _SUCCESS fails schema inference on the next batch's read).
          // Guard on the APPEND ROWS, not the survivors: a null-vector
          // survivor (an upstream-contract violation — see the class doc)
          // is dropped by the argmax's null filter, so an all-null first
          // batch would otherwise write the schema-less dir and wedge
          // every later batch
          val hasRows = appendRows.limit(1).count() > 0L
          if (hasRows &&
              !DocumentStreams.committedIn(indexStore, batchId))
            appendRows.withColumn("batch_id", lit(batchId))
              .write.mode("append").partitionBy("cid")
              .parquet(s"$stateDir/index")
          if (pq) {
            // the codebook is a release artifact exactly like the
            // centroids: queries build ADC tables BY it, so ingestion
            // codes against it and never invents quantization geometry
            val cbPath = new org.apache.hadoop.fs.Path(s"$stateDir/codebook")
            if (!fs.exists(cbPath))
              throw new IllegalStateException(
                s"$stateDir has no codebook release - write the " +
                  s"released (code, sub, cvec) table (ivfPqIndex's " +
                  s"second element) to $stateDir/codebook before " +
                  s"starting pq ingestion")
            val codebook = spark.read.parquet(s"$stateDir/codebook")
            val codesStore =
              DocumentStreams.loadStore(spark, s"$stateDir/codes")
            // the argmax already ran for appendRows (persisted above);
            // the PQ rows join that (id, cid) instead of re-assigning —
            // one coding pass, one argmax per batch
            val pqRows = Similarity.ivfPqCodesFromAssigned(appendRows,
              "vec", "id", "cid", codebook, m, dim)
            if (hasRows &&
                !DocumentStreams.committedIn(codesStore, batchId))
              pqRows.withColumn("batch_id", lit(batchId))
                .write.mode("append").partitionBy("cid")
                .parquet(s"$stateDir/codes")
          }
        } finally { appendRows.unpersist(); () }
      } finally { decisions.unpersist(); () }
    } finally { persisted.unpersist(); () }
  }

  /** Start the ingestion query over any streaming DataFrame with
    * (idCol, vecCol) columns. Caller owns the query lifecycle. `pq`
    * arms the compressed-tier maintenance — see [[processBatch]]. */
  def incrementalIndexQuery(stream: DataFrame, stateDir: String,
                            vecCol: String, idCol: String, dim: Int,
                            threshold: Double = 0.95,
                            nprobe: Int = 2,
                            pq: Boolean = false,
                            m: Int = 4): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, stateDir,
          vecCol, idCol, dim, threshold, nprobe, pq, m)
      }
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .start()

  /** Compact the vector stores: `index/` and — for a `pq` ingestion —
    * `codes/` keep their cid partitioning (one file set per inverted
    * list — DPP survives the rewrite, spec-pinned), `decisions/`
    * range-clusters flat. Run with ingestion STOPPED — see
    * [[DocumentStreams.compactStore]]. */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFileBytes: Long = 128L * 1024 * 1024)
      : Map[String, (Int, Int)] = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def exists(s: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/$s"))
    (if (exists("index"))
       Map("index" -> DocumentStreams.compactStore(spark,
         s"$stateDir/index", Seq("id"), targetFileBytes,
         partitionCols = Seq("cid")))
     else Map.empty[String, (Int, Int)]) ++
    (if (exists("codes"))
       Map("codes" -> DocumentStreams.compactStore(spark,
         s"$stateDir/codes", Seq("id", "sub"), targetFileBytes,
         partitionCols = Seq("cid")))
     else Map.empty[String, (Int, Int)]) ++
    (if (exists("decisions"))
       Map("decisions" -> DocumentStreams.compactStore(spark,
         s"$stateDir/decisions", Seq("batch_id", "id"), targetFileBytes))
     else Map.empty[String, (Int, Int)])
  }
}
