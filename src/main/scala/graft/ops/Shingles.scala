package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shared text-shingling expressions for the dedup/similarity operators.
 *
 * All of these are built from Spark higher-order functions over an array
 * column, so they run distributed per-row with no UDF serialization and no
 * driver involvement — the shape that survives a 100 TB corpus: each doc is
 * processed where it lives, and only fixed-width signatures/hashes shuffle.
 */
object Shingles {

  /** Lowercased whitespace tokens of a text column. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /**
   * Let-binding for column expressions: evaluate `e` ONCE per row and pass
   * the result to `body` as a higher-order-function lambda variable.
   *
   * Why this exists: an expression referenced inside a `transform`/
   * `aggregate` lambda is re-evaluated for EVERY array element (Catalyst
   * inlines the subtree; there is no common-subexpression elimination in
   * the interpreted HOF path). A `regexp_replace` referenced inside a
   * 500-element transform runs 500 regexes per row. Binding it to a lambda
   * variable via a single-element `transform` makes inner references cheap
   * variable lookups.
   */
  def let(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)

  /**
   * Distinct 64-bit-hashed word n-grams ("shingles") of a text column.
   *
   * `xxhash64` is Spark's built-in codegen'd 64-bit hash; each shingle is
   * the hash of the n-word window joined by a single space. Documents
   * shorter than n words fall back to hashing the whole text, so every doc
   * has >=1 shingle and joins/aggregations never silently drop rows.
   */
  def wordShingles(text: Column, n: Int): Column = let(words(text)) { w =>
    val ngrams = transform(
      sequence(lit(1), size(w) - lit(n - 1)),
      i => xxhash64(concat_ws(" ", slice(w, i, lit(n)))))
    array_distinct(
      when(size(w) >= n, ngrams).otherwise(array(xxhash64(lower(trim(text))))))
  }

  /** Jaccard similarity of two distinct-element array columns, as a
    * fraction computed from exact integer set sizes. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Native-expression form of [[wordShingles]] — one JVM loop per doc via
    * graft.functions.WordShingleHash (caller must have registered
    * GraftFunctions on the session; the dedup operators do). Identical
    * output including first-occurrence distinct order — equivalence-tested
    * over the documents fixture in VectorExpressionsSpec. */
  def wordShinglesFast(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.wordShingles(lower(trim(text)), n)
}
