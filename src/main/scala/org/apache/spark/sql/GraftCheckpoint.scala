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
 * storage info is not visible (already evicted), the fallback is a
 * deliberately SMALL per-partition constant — for a checkpointed stage
 * output, under-estimating degrades to an extra broadcast, while
 * over-estimating re-opens the compounding this helper removes.
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
        val stats = Statistics(sizeInBytes = measured.getOrElse(
          BigInt(64) * math.max(lr.rdd.getNumPartitions, 1)))
        val fresh = new LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(session, Some(stats), Some(lr.constraints))
        ClassicDataset.ofRows(session, fresh)
      case _ => cp
    }
  }
}
