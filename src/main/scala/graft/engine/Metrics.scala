package graft.engine

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.jdk.CollectionConverters._

/**
 * In-process metrics registry — operator A19.
 *
 * Keeps the reference's metric names and shapes
 * (reference: src/iceberg_explorer/observability.py:67-101 —
 * `query_duration_seconds` histogram with a status attribute,
 * `query_rows_returned` counter, `active_queries` up-down counter)
 * without an OTel dependency: counters/sums are enough for parity tests
 * and can be bridged to any exporter.
 */
object Metrics {
  private val active = new AtomicInteger(0)
  private val rowsReturned = new AtomicLong(0L)
  private val durations =
    new java.util.concurrent.ConcurrentHashMap[String, (AtomicLong, AtomicLong)]()

  def incrementActiveQueries(): Unit = active.incrementAndGet()
  def decrementActiveQueries(): Unit = active.decrementAndGet()
  def activeQueries: Int = active.get()

  def recordQueryRows(n: Long): Unit = rowsReturned.addAndGet(n)
  def totalRowsReturned: Long = rowsReturned.get()

  /** duration histogram stand-in: per-status (count, total millis) */
  def recordQueryDuration(seconds: Double, status: String): Unit = {
    val cell = durations.computeIfAbsent(
      status, _ => (new AtomicLong(0), new AtomicLong(0)))
    cell._1.incrementAndGet()
    cell._2.addAndGet((seconds * 1000).toLong)
  }

  def durationStats: Map[String, (Long, Double)] =
    durations.asScala.map { case (k, (c, ms)) =>
      k -> (c.get(), ms.get() / 1000.0)
    }.toMap

  def reset(): Unit = { active.set(0); rowsReturned.set(0); durations.clear() }
}
