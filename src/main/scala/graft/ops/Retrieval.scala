package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval over the document corpus: BM25 term-weighted top-k.
 *
 * The reference's query surface is SQL-shaped (iceberg-explorer
 * `query/executor.py` executes arbitrary SELECTs); a training-data
 * pipeline additionally needs keyword retrieval over the corpus itself —
 * "find the documents most about X" — for targeted curation, eval-set
 * mining, and contamination triage (the lexical complement of
 * [[Similarity.cosineTopK]]'s dense retrieval).
 *
 * Scoring is Robertson/Spärck-Jones BM25 (k1 = 1.2, b = 0.75) with one
 * deliberate, documented twist: every factor is computed in exact integer
 * fixed point (the t14/e14-established cross-engine determinism device) so
 * results hash-verify bit-for-bit against the DuckDB oracle.
 * Specifically, the logarithmic idf is replaced by its log-free rational
 * core — idf_rat = (2·(N−df)+1) / (2·df+1), i.e. the argument of
 * Robertson's log((N−df+0.5)/(df+0.5)) — scaled by 1e6 and floor-divided.
 * The ln is monotone, so per-term document ordering is IDENTICAL to
 * textbook BM25; only the relative weighting of different query terms in
 * the sum changes (rarer terms weigh heavier than with the log damping —
 * a defensible retrieval variant, and deterministic).
 *
 * Per (doc, term):
 *   dlr   = (9000 · dl · N) div total_tokens          -- k1·b·dl/avgdl, ×1e4
 *   denom = 10000·tf + 3000 + dlr                     -- tf + k1(1−b+b·dl/avgdl), ×1e4
 *   term  = (idf_rat · tf · 22000) div denom          -- idf · tf·(k1+1)/denom, ×1e6
 * score = Σ term over matched query terms; top-k by (score desc, id asc).
 *
 * Scale design (100 TB): the token explode is the only corpus-sized
 * stage and it partial-aggregates map-side into (id, term) counts before
 * the shuffle; df and the corpus stats are tiny aggregates broadcast onto
 * the tf rows (|query terms| + 1 rows — never a corpus-sized join build);
 * the final top-k is TakeOrderedAndProject (per-partition heaps, k rows
 * per partition to the driver), never a global sort. Magnitudes: the two
 * row-level products (idf_rat·tf·22000 ≈ 1.5e10·N·tf at df = 1, and
 * 9000·dl·N) would overflow BIGINT on corpora past N·tf ≈ 6e8 — under
 * ANSI mode that aborts the job, under non-ANSI it silently wraps to
 * wrong scores — so both run in DECIMAL(38,0) unconditionally (the
 * floor-division contract is unchanged: `DIV` on decimal operands still
 * yields the exact integral quotient as BIGINT). 38 digits hold to
 * ~1e38, far past any corpus; the one remaining envelope is the final
 * per-term quotient itself, ≤ ~4.4e6·N, which fits BIGINT to N ≈ 2e12
 * docs.
 */
object Retrieval {

  /**
   * BM25 top-k: the k highest-scoring documents for a bag of query
   * terms. Output: (id, n_terms_hit, score_scaled), score descending,
   * ties broken by id ascending (total order — deterministic top-k).
   *
   * Tokenization matches the t-series convention exactly (lower, trim,
   * split on whitespace runs) so dl here equals t01's token count.
   */
  def bm25TopK(
      docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, "bm25TopK needs k > 0")

    val tok = docs.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("t"))

    // Per-doc length (every token, not just query terms) + corpus stats.
    val dl = tok.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))

    val qTok = tok.filter(col("t").isInCollection(queryTerms))
    // Document frequency per query term: tiny result (≤ |queryTerms|).
    val df = qTok.groupBy(col("t"))
      .agg(count_distinct(col("id")).as("df"))
    // Term frequency per (doc, term): map-side partial agg before shuffle.
    val tf = qTok.groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf"))

    val scored = tf
      .join(dl, "id")
      .join(broadcast(df), "t")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        expr("(1000000L * (2L * (n_docs - df) + 1L)) DIV (2L * df + 1L)")
          .as("idf_rat"),
        col("tf"), col("dl"), col("n_docs"), col("total_tokens"))
      .select(col("id"),
        expr("""(CAST(idf_rat AS DECIMAL(38,0)) * tf * 22000) DIV
                (10000L * tf + 3000L +
                 (CAST(9000 AS DECIMAL(38,0)) * dl * n_docs) DIV total_tokens)""")
          .as("term"))

    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("term")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("id"))
      .limit(k)
  }

  /**
   * Reciprocal-rank fusion of named rank lists (hybrid retrieval:
   * lexical BM25 + dense cosine is the canonical pair, but any number
   * of lists fuse). Cormack/Clarke/Buettcher RRF with the usual c = 60:
   *
   *   rrf(id) = Σ_lists 1e9 div (c + rank_list(id))
   *
   * — the 1/(c+r) weight in exact ×1e9 fixed point (one floor division
   * per membership, t14/t20's determinism device), summed over the lists
   * the id appears in. Absent-from-list contributes nothing (standard
   * RRF; no imputed rank). Output: one row per id seen in any list, with
   * per-list rank columns (`rank_<name>`, null when absent), `n_lists`,
   * and `rrf_scaled`; top-k by (rrf_scaled desc, id asc) — a total
   * order, so the cut is deterministic.
   *
   * Scale design (100 TB): the inputs are already top-k lists (each k
   * rows, produced by engines with their own bounded-exchange designs —
   * [[bm25TopK]]'s TakeOrderedAndProject, [[Similarity.cosineTopK]]'s
   * bounded-heap aggregator), so everything here operates on |lists|·k
   * rows regardless of corpus size: the union + groupBy is a
   * few-hundred-row exchange and the final sort is a top-k over ≤
   * |lists|·k rows. Nothing corpus-sized enters this operator.
   */
  def rrfFusion(
      lists: Seq[(String, DataFrame)], idCol: String, rankCol: String,
      c: Int = 60, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFusion needs at least one rank list")
    require(lists.map(_._1).distinct.size == lists.size,
      "rrfFusion list names must be distinct")
    require(c >= 0 && k > 0, "rrfFusion needs c >= 0 and k > 0")
    // same contract as Similarity.rankTopK: a non-integral id would be
    // silently nulled by the cast below and every row would collapse
    // into one fused group
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      lists.foreach { case (name, df) =>
        val dt = df.schema(idCol).dataType
        require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
          s"rrfFusion id column must be an integral type, got $dt in " +
            s"list '$name' — string ids would cast to null and fuse " +
            "into a single group")
      }
    }

    val tagged = lists.map { case (name, df) =>
      df.select(col(idCol).cast("long").as("id"),
        col(rankCol).cast("long").as("rank"), lit(name).as("src"))
    }.reduce(_ unionAll _)

    val rankCols = lists.map { case (name, _) =>
      max(when(col("src") === name, col("rank"))).as(s"rank_$name")
    }
    val aggs =
      rankCols :+ count(lit(1)).as("n_lists") :+
        sum(expr(s"1000000000L DIV ($c + rank)")).as("rrf_scaled")
    tagged.groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("rrf_scaled").desc, col("id"))
      .limit(k)
  }
}
