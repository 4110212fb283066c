package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Bounded-memory discipline for iterative operators (connected
 * components, PageRank, HITS, power iteration): each round
 * `localCheckpoint`s its state to keep the logical plan flat, but an
 * eager local checkpoint PINS its blocks in the block manager until
 * something unpersists them — so a k-round loop holds k generations of
 * state live even though only the newest is ever read again. Across a
 * long-running session (or a bench run of many iterative queries) that
 * superseded-block accumulation is the memory leak; at cluster scale it
 * is executor storage memory stolen from shuffle/execution.
 *
 * The device: as soon as round t+1's checkpoint is MATERIALIZED (eager
 * checkpoints materialize at the call), round t's blocks are released
 * here. Only current-round state is ever live, so a loop's storage
 * footprint is O(state size), not O(rounds × state size).
 *
 * Safety: a released checkpoint is unrecomputable (local checkpoints
 * truncate lineage by design), so callers must release ONLY state that
 * no returned plan references — superseded rounds, and loop-constant
 * inputs (edge lists) once the final state is checkpointed and the
 * output plan reads nothing else.
 */
object IterativeMemory {

  /**
   * Release the storage blocks behind an eagerly `localCheckpoint`ed
   * DataFrame. No-op for any other plan shape (e.g. the un-checkpointed
   * round-0 state of an iterative loop), so loops can call it
   * unconditionally on the superseded reference. Non-blocking: removal
   * proceeds asynchronously while the next round runs.
   */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
