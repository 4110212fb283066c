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
 * (accepted docs, full input schema — the product), `index/` (the
 * derived dedup state: cid, digest, shingle set, signature — one row
 * per accepted doc, appended batch-sized), and `decisions/` (one audit
 * row per arriving doc), written through `foreachBatch` — the
 * Structured Streaming hook for batch-only operations (multi-pass
 * joins, appends to non-streaming sinks) per micro-batch. Decision rows
 * carry `batch_id` so an at-least-once replay reconciles instead of
 * double-counting.
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
   * batch). Returns (decisions, survivors): decisions has one row per
   * arriving doc — (id, exact_dup_of, fuzzy_dup_of, is_new); survivors
   * are the batch rows (full schema) that enter the corpus.
   */
  def dedupeStep(index: Option[DataFrame], batch: DataFrame,
                 textCol: String, idCol: String,
                 threshold: Double): (DataFrame, DataFrame) = {
    val idT = batch.schema(idCol).dataType
    val within = Dedup.minHashLSH(batch, textCol, idCol,
      threshold = threshold)
    val withinDups = within.filter(col("is_dup"))
      .select(col("id"), col("keep_id"))
    val batchReps = batch.join(
      within.filter(!col("is_dup")).select(col("id").as(idCol)), idCol)

    val repDecisions = index match {
      case Some(ix) =>
        Dedup.incrementalProbe(ix, batchReps, textCol, idCol,
          threshold = threshold)
      case None =>
        batchReps.select(col(idCol).as("id"),
          lit(null).cast(idT).as("exact_dup_of"),
          lit(null).cast(idT).as("fuzzy_dup_of"),
          lit(true).as("is_new"))
    }
    // no orderBy: decisions feed an unordered parquet append — a sort
    // here would add a range exchange to every micro-batch for nothing
    val decisions = repDecisions.unionByName(
      withinDups.select(col("id"),
        lit(null).cast(idT).as("exact_dup_of"),
        col("keep_id").cast(idT).as("fuzzy_dup_of"),
        lit(false).as("is_new")))
    val survivors = batch.join(
      repDecisions.filter(col("is_new")).select(col("id").as(idCol)), idCol)
    (decisions, survivors)
  }

  /** The foreachBatch body: load the stored dedup index (absent on the
    * first batch), run [[dedupeStep]], append decisions + survivors +
    * the survivors' index rows (computed from the batch only — the
    * accumulated corpus is never re-read as text). */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   stateDir: String, textCol: String, idCol: String,
                   threshold: Double): Unit = {
    val persisted = batch.persist()
    try {
      // explicit existence probe, NOT a catch on the read: a transient
      // read failure (listing error, schema inference on a gutted dir)
      // must FAIL the batch — swallowing it as "first batch" would
      // silently reset the index and re-admit every past duplicate
      val indexPath = new org.apache.hadoop.fs.Path(s"$stateDir/index")
      val corpusPath = new org.apache.hadoop.fs.Path(s"$stateDir/corpus")
      val fs = indexPath.getFileSystem(
        spark.sessionState.newHadoopConf())
      // migration guard: a stateDir written before the index store
      // existed has corpus/ but no index/ — treating that as "first
      // batch" would make the whole accumulated corpus invisible to
      // dedup and re-admit every past duplicate. Fail loudly; the
      // operator backfills once with Dedup.incrementalIndex(corpus)
      if (!fs.exists(indexPath) && fs.exists(corpusPath))
        throw new IllegalStateException(
          s"$stateDir has a corpus store but no index store - backfill " +
            s"it once (Dedup.incrementalIndex over $stateDir/corpus -> " +
            s"$stateDir/index) before resuming ingestion")
      val index =
        if (fs.exists(indexPath)) Some(spark.read.parquet(s"$stateDir/index"))
        else None
      val (decisions, survivors) =
        dedupeStep(index, persisted, textCol, idCol, threshold)
      decisions.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(s"$stateDir/decisions")
      // survivors enter the corpus AND the index; persist so the two
      // sinks don't re-run the dedup joins
      val surv = survivors.persist()
      try {
        surv.write.mode("append").parquet(s"$stateDir/corpus")
        graft.ops.Dedup.incrementalIndex(surv, textCol, idCol)
          .write.mode("append").parquet(s"$stateDir/index")
      } finally { surv.unpersist(); () }
    } finally { persisted.unpersist(); () }
  }

  /** Start the ingestion query over any streaming DataFrame with
    * (idCol, textCol) columns. Caller owns the query lifecycle. */
  def incrementalDedupQuery(stream: DataFrame, stateDir: String,
                            textCol: String, idCol: String,
                            threshold: Double = 0.8): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, stateDir,
          textCol, idCol, threshold)
      }
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .start()
}
