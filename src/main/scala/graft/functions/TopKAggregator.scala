package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded top-k aggregation of (score, id) pairs — the scale-correct way
 * to compute per-group nearest neighbors.
 *
 * A window `row_number() ... <= k` shuffles EVERY scored row to the
 * group's partition before discarding all but k. This Aggregator keeps at
 * most k entries per group in each map task (partial aggregation), so the
 * exchange moves k rows per group per partition — at a 100 TB corpus the
 * shuffle shrinks from |corpus|×|queries| rows to |partitions|×k.
 *
 * Ordering: score descending, then id ascending (deterministic ties) —
 * identical to `Window.orderBy(desc(score), asc(id))`.
 */
object TopKAggregator {

  type Pair = (Double, Long)          // (score, id)
  type Buf = List[(Double, Long)]     // sorted best-first, length <= k

  /** Insert keeping the buffer sorted best-first and bounded at k. */
  private def insert(buf: Buf, p: Pair, k: Int): Buf = {
    def better(a: Pair, b: Pair): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    if (buf.sizeIs >= k && !better(p, buf.last)) buf
    else {
      val (before, after) = buf.span(better(_, p))
      (before ::: p :: after).take(k)
    }
  }

  /** Column form: `topK(k)(scoreCol, idCol)` → array<struct<_1,_2>> of the
    * k best (score, id) pairs, best first. */
  def topK(k: Int)(score: Column, id: Column): Column = {
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    val agg = new Aggregator[Pair, Buf, Seq[Pair]] {
      override def zero: Buf = Nil
      override def reduce(b: Buf, a: Pair): Buf = insert(b, a, k)
      override def merge(b1: Buf, b2: Buf): Buf =
        b2.foldLeft(b1)((acc, p) => insert(acc, p, k))
      override def finish(r: Buf): Seq[Pair] = r
      override def bufferEncoder: Encoder[Buf] = enc
      override def outputEncoder: Encoder[Seq[Pair]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
    }
    udaf(agg).apply(score, id)
  }
}
