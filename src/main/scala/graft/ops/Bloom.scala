package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Stored, mergeable, engine-portable Bloom filter — the membership
 * pre-filter in front of an expensive probe ("has this URL been
 * crawled? is this exact text already in the corpus?"), the standard
 * 100 TB device for cutting a corpus-sized join down to the candidate
 * set: a Bloom miss is a GUARANTEED non-member (no false negatives),
 * so only hits pay the exact join, and the filter itself is
 * nWords·8 bytes regardless of corpus size.
 *
 * Spark's own `bloom_filter_agg`/`might_contain` (q52's device) is the
 * right tool for IN-PLAN semi-join pruning, but its sketch is an
 * opaque binary blob — not hash-checkable by an index-blind oracle,
 * not appendable, not portable across engines. This filter is a plain
 * TABLE of (w, bits) words: the k hash positions of a value are
 * engine-reproducible md5-60 arithmetic
 * (pos_i = md5_60(i ‖ ':' ‖ v) mod m, the d02/t04 device), each word
 * keeps 63 usable bits (bit = pos mod 63 — deliberately NOT 64: the
 * sign bit stays clear so `1 << bit` is positive on every engine and
 * a DuckDB oracle reruns the identical shifts without overflow), and
 * the artifact merges/appends by `bit_or` per word — two shards' (or
 * two releases') filters union losslessly, the x14 mergeable-artifact
 * property in OR-algebra.
 *
 * Scale design: the build is one map-side pass (k md5s per value) into
 * a word-keyed `bit_or` aggregate with map-side combine — at most
 * nWords rows cross the exchange per partition. The probe explodes k
 * position rows per CANDIDATE value (batch-sized, never corpus-sized)
 * and joins them against the nWords-row filter — always a broadcast —
 * then verdicts per value with an all-bits-set aggregate. Size m and k
 * for the corpus: false-positive rate ≈ (1 − e^(−k·n/m))^k with
 * m = nWords·63 bits.
 */
object Bloom {

  private def positions(v: Column, nWords: Int, k: Int): Column = {
    val m = nWords * 63L
    array((0 until k).map { i =>
      pmod(Sketches.md5Hash60(
        concat(lit(s"$i:"), coalesce(v.cast("string"), lit("")))), lit(m))
    }: _*)
  }

  /**
   * Build the filter table from a corpus column: (w: long, bits: long),
   * ≤ nWords rows — the stored artifact. `k` hash functions; the value
   * column is stringified (null ⇒ "" — same as the probe side, so a
   * null can never be a false negative against a null).
   */
  def bloomBuild(df: DataFrame, valueCol: String,
                 nWords: Int = 1 << 16, k: Int = 4): DataFrame = {
    require(nWords >= 1 && k >= 1, s"bad bloom shape ($nWords, $k)")
    df.select(explode(positions(col(valueCol), nWords, k)).as("p"))
      .select(expr("p DIV 63").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
  }

  /** Per-shard build in ONE pass: (shard, w, bits) — row-identical to
    * running [[bloomBuild]] once per shard and stamping the shard id
    * (spec-pinned differentially), but the corpus is scanned once with
    * the word aggregation keyed by (shard, w) instead of once per
    * shard. The shape a batch-sharded `bloomf/` store accumulates
    * (DocumentStreams stamps batch_id per append; a bulk backfill
    * builds all shards here in one job) and the x13 batch-ledger audit
    * reads. */
  def bloomBuildSharded(df: DataFrame, valueCol: String, shardCol: String,
                        nWords: Int = 1 << 16, k: Int = 4): DataFrame = {
    require(nWords >= 1 && k >= 1, s"bad bloom shape ($nWords, $k)")
    df.select(col(shardCol).cast("long").as("shard"),
        explode(positions(col(valueCol), nWords, k)).as("p"))
      .select(col("shard"), expr("p DIV 63").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").as("b"))
      .groupBy(col("shard"), col("w")).agg(expr("bit_or(b)").as("bits"))
  }

  /** Merge filter tables built with the SAME (nWords, k) — shard
    * sketches, release + delta appends: `bit_or` per word, the
    * lossless union of the underlying sets' filters. */
  def bloomMerge(filters: DataFrame): DataFrame =
    filters.groupBy(col("w")).agg(expr("bit_or(bits)").as("bits"))

  /**
   * Probe: every row of `df` plus a `bloom_hit` boolean — true iff ALL
   * k positions of `valueCol` are set in the stored filter. A false
   * `bloom_hit` is a guaranteed non-member (the no-false-negative
   * contract the pre-filter composition relies on); a true one still
   * needs the exact check. `nWords`/`k` MUST match the build (a
   * mismatch silently yields false negatives — pass them from the same
   * config that built the filter, or store them beside it).
   *
   * Membership is a property of the VALUE alone, so verdicts are
   * computed once per distinct value digest and joined back by digest
   * (md5 of the stringified value — the d01 exact-identity convention).
   * The r12-advised alternative — aggregating hit bits per caller id —
   * conflated distinct values sharing an id (or NULL ids, which never
   * survived the join-back) into a spurious false NEGATIVE, the one
   * verdict this filter must never emit; keying by digest makes the
   * contract hold for ANY probe table, duplicate or null ids included.
   */
  def bloomProbe(bloom: DataFrame, df: DataFrame, valueCol: String,
                 nWords: Int = 1 << 16, k: Int = 4): DataFrame = {
    require(nWords >= 1 && k >= 1, s"bad bloom shape ($nWords, $k)")
    def dig(c: Column): Column = md5(coalesce(c.cast("string"), lit("")))
    val vals = df.select(dig(col(valueCol)).as("__bd"),
      coalesce(col(valueCol).cast("string"), lit("")).as("__bv")).distinct()
    val pos = vals
      .select(col("__bd"), explode(positions(col("__bv"), nWords, k)).as("p"))
      .select(col("__bd"), expr("p DIV 63").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").as("b"))
    val verdict = pos
      .join(broadcast(bloom), Seq("w"), "left")
      .select(col("__bd"),
        (col("bits").isNotNull &&
          col("bits").bitwiseAND(col("b")) =!= 0L).as("hit"))
      .groupBy(col("__bd"))
      .agg(min(when(col("hit"), 1).otherwise(0)).as("__allhit"))
    df.withColumn("__bd", dig(col(valueCol)))
      .join(verdict, Seq("__bd"), "left")
      .drop("__bd")
      .withColumn("bloom_hit", coalesce(col("__allhit") === 1, lit(false)))
      .drop("__allhit")
  }
}
