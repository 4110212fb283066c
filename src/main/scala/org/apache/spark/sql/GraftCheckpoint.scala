package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Eager local checkpoint with the plan statistics REBASED to the
 * materialized blocks. Lives in `org.apache.spark.sql` solely to reach
 * the `private[sql]` `LogicalRDD` constructor (the GraftArrow pattern);
 * everything referenced is Spark's own public-source code.
 *
 * Why this exists: `Dataset.localCheckpoint` carries the ORIGINAL
 * plan's estimated statistics onto the checkpoint's `LogicalRDD`
 * (`originStats`), so a pipeline that checkpoints stage outputs and
 * keeps composing inherits estimates instead of facts. The size
 * estimator multiplies `sizeInBytes` through joins
 * (`SizeInBytesOnlyStatsPlanVisitor`), so across k checkpointed
 * GENERATIONS the estimate's bit-length roughly doubles per stage —
 * after the ~16 stages of the incremental corpus build the driver was
 * measured spending 80+ s inside `BigInteger.multiply` on
 * million-bit "sizes" while executing a 30-row plan. Rebasing each
 * checkpoint to its ACTUAL storage footprint both kills that
 * compounding (facts don't multiply) and improves downstream planning:
 * a genuinely small stage output becomes broadcast-eligible because
 * the optimizer sees its real size, not an inflated estimate.
 *
 * Semantics are unchanged from `localCheckpoint(eager = true)`: same
 * RDD, same output, same partitioning/ordering; constraints are kept.
 * Only `originStats` is replaced — by the block manager's measured
 * memory+disk size of the just-materialized RDD (summed over
 * executors; exact for the local-mode single block manager, and the
 * right order of magnitude under compression on a cluster). If the
 * storage info is not visible (already evicted, or the probe raced
 * block registration), the checkpoint is returned with its ORIGINAL
 * stats: an absent measurement is not evidence of smallness, and a
 * tiny synthetic fallback would make a genuinely large stage output
 * broadcast-eligible — a multi-GB broadcast build is a driver OOM,
 * a much worse failure than the stat compounding this helper removes
 * (which only recurs in the rare unmeasurable case).
 */
object GraftCheckpoint {

  def freshStats(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    cp.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val ds = cp.asInstanceOf[ClassicDataset[Row]]
        val session = ds.sparkSession
        val measured = session.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize)).filter(_ > 0)
        measured match {
          case None => cp // unmeasurable: keep the original stats
          case Some(size) =>
            val stats = Statistics(sizeInBytes = size)
            val fresh = new LogicalRDD(lr.output, lr.rdd,
              lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
              lr.stream)(session, Some(stats), Some(lr.constraints))
            ClassicDataset.ofRows(session, fresh)
        }
      case _ => cp
    }
  }
}
