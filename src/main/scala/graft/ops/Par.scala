package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * r14 optimization-round parallelism helpers (optimization guide §2.2,
 * §2.6) — two devices the profiled bench showed the composite operators
 * were missing:
 *
 *  1. [[widen]] — map-stage parallelism for narrow inputs. The fixture
 *     tables are single parquet files, so every "one-pass map-side"
 *     operator (shingling, MinHash signatures, winnowing fingerprints,
 *     BPE segmentation, histogram extraction) planned its heavy per-doc
 *     projection into a ONE-task scan stage: the whole corpus's text
 *     work ran on one core while 31 idled (measured: winnowing the sf0.1
 *     corpus 0.32 s single-task vs 0.12 s widened). At 100 TB the same
 *     operator reads thousands of splits and the guard is a no-op — the
 *     repartition only fires when the scan's parallelism is under half
 *     the cluster's, so this is the scale-ADAPTIVE form of "repartition
 *     immediately after the read" (guide §2.5, input skew / §6 input
 *     split sizing), not a local-mode constant.
 *
 *  2. [[inParallel]] — overlap INDEPENDENT driver-blocking stages
 *     (guide §2.6 "overlap independent jobs"). The store-building
 *     composite queries (x13's eleven artifact builds, the model/layout
 *     round trips, corpusBuild's filter-verdict and token-weight
 *     passes) are sequences of eager actions with no data dependency
 *     between neighbors; Spark's scheduler runs concurrent jobs happily
 *     (FIFO back-fill), the driver code just never submitted them
 *     together. Threads are created per call so Spark's inheritable
 *     thread-locals (job group, descriptions) propagate from the caller.
 *
 * Neither device changes any operator's OUTPUT — [[widen]] inserts a
 * deterministic round-robin exchange (sort-before-repartition is on, so
 * task retries reproduce assignments — SPARK-23207), [[inParallel]]
 * only reorders independent job submissions.
 */
object Par {

  /** Round-robin repartition `df` to the session's default parallelism
    * IF its current plan would read fewer than half that many
    * partitions; identity otherwise. Call it on the narrow (id, text …)
    * projection BELOW a heavy map expression, so the exchange moves raw
    * rows once and the expensive expression runs on every core. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd, not .rdd: the probe still plans df's subtree once (that is
    // the price of asking), but skips the external-Row encoder stage
    // .rdd would additionally bolt on. The count is the pre-AQE scan
    // split count — exactly the "how parallel is the input" question
    // this guard asks; AQE coalescing happens downstream of the widen.
    val current =
      try df.queryExecution.toRdd.getNumPartitions
      catch { case _: Exception => target } // unplannable: leave as-is
    if (current * 2 >= target) df else df.repartition(target)
  }

  /** Run independent driver-blocking thunks concurrently and return
    * their results in order; the first failure (if any) is rethrown
    * after all threads finish. Bounded by the caller's thunk count —
    * this is for a handful of independent store builds, not a task
    * pool. */
  /** Diagnostic kill-switch: SPARK_GRAFT_PAR_OFF=1 runs every
    * inParallel/both call sequentially — the A/B lever for measuring
    * what each overlap actually buys (guide §1: measure first). */
  private val parOff = sys.env.get("SPARK_GRAFT_PAR_OFF").contains("1")

  def inParallel[A](thunks: Seq[() => A]): Seq[A] = {
    if (parOff || thunks.sizeIs <= 1) return thunks.map(_())
    val results = new Array[Any](thunks.size)
    // every worker's failure is kept: the first is rethrown, the rest
    // ride as suppressed exceptions so a multi-build failure (e.g. two
    // of x13's eleven stores failing for different reasons) stays
    // diagnosable. NonFatal discrimination: a fatal VM error
    // (OutOfMemoryError, LinkageError) must not be downgraded to an
    // ordinary exception that surfaces only after all siblings finish.
    val errs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable])
    val threads = thunks.zipWithIndex.map { case (f, i) =>
      val t = new Thread(() => {
        try results(i) = f()
        catch { case e: Throwable => errs.add(e) }
      }, s"graft-par-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) {
      import scala.jdk.CollectionConverters._
      val all = errs.asScala.toSeq
      // fatal errors take precedence and propagate as themselves
      val primary = all.find(e => !scala.util.control.NonFatal(e))
        .getOrElse(all.head)
      all.filter(_ ne primary).foreach(primary.addSuppressed)
      throw primary
    }
    results.toSeq.map(_.asInstanceOf[A])
  }

  /** [[inParallel]] for exactly two heterogeneous stages. */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val r = inParallel[Any](Seq(() => a, () => b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
