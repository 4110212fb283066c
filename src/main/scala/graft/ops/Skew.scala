package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for joins whose key distribution breaks the
 * uniform-partition assumption (the classic 100 TB failure mode: one hot
 * key lands an entire partition on one executor).
 *
 * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
 * default here) splits oversized SORT-MERGE partitions at runtime and is
 * the first line of defense. Salting is the explicit fallback for cases
 * AQE can't fix: aggregations on a hot key, or joins where the skewed
 * side must hash-partition (e.g. a shuffled hash join forced by hints).
 */
object Skew {

  /**
   * Salted equi-join: the skewed (large) side gets a random salt in
   * [0, saltFactor); the small side is replicated `saltFactor`× with every
   * salt value; the join key becomes (key, salt), splitting each hot key
   * across `saltFactor` partitions. Row multiplicity is preserved exactly
   * — every left row joins the one replica matching its salt.
   *
   * Use when `right` is too big to broadcast but small enough to
   * replicate `saltFactor`×; result columns = left ++ right (like an
   * unsalted inner equi-join on `key`).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Two-phase (partial/final) aggregation with an explicit salt — for hot
   * GROUP BY keys where map-side combine alone still leaves one reducer
   * with the hot key's whole partial set. Phase 1 aggregates (key, salt);
   * phase 2 merges the `saltFactor` partials per key.
   *
   * `partialAggs` and `finalAggs` must be an associative pair, e.g.
   * partial `sum(x) as s` / final `sum(s) as s`.
   */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int)(
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    require(saltFactor >= 1)
    df.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
