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
    val (postings, stats) = bm25Index(docs, textCol, idCol)
    bm25Probe(postings, stats, queryTerms, k)
    // the live composition IS the probe over the live index — one
    // construction (the d02/d07 device), so t28's stored-path hash gate
    // certifies this operator's scoring by identity, and the query-term
    // filter pushes below the postings aggregate (grouping-key
    // predicate), keeping the live plan's aggregated work
    // query-term-sized exactly as the pre-index form
  }

  /**
   * Materializable BM25 index state — the postings table a lexical
   * serving stack writes ONCE per corpus release and queries many
   * times (the d18/e21 compute-once/store/probe pattern completed for
   * the retrieval family): `postings` = (t, id, tf, dl), one row per
   * distinct (term, doc) with the document LENGTH DENORMALIZED onto
   * every posting — the Lucene norms device, +8 bytes per posting at
   * rest so a probe needs NO doc-length join: after the term filter,
   * every scoring input except the 1-row `stats` (n_docs,
   * total_tokens) is already in the pruned rows. Write postings
   * range-clustered by term (`repartitionByRange(col("t")) .
   * sortWithinPartitions(col("t"))`, the t28 entry's layout) so every
   * file and row group carries tight min/max stats on `t` — the
   * probe's IN filter then reads the query terms' row groups, never
   * the corpus.
   *
   * Scale: the token explode + (t, id) count is the one corpus-sized
   * keyed exchange (map-side combine); the dl join is id-keyed build
   * cost paid once per release. Tokenization matches the t-series
   * convention (lower, trim, split on whitespace runs), so dl equals
   * t01's token count.
   */
  def bm25Index(docs: DataFrame, textCol: String,
                idCol: String): (DataFrame, DataFrame) = {
    val tok = docs.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("t"))
    // Per-doc length (every token, not just query terms) + corpus stats.
    val dl = tok.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    // Term frequency per (term, doc): map-side partial agg before shuffle.
    val tf = tok.groupBy(col("t"), col("id")).agg(count(lit(1)).as("tf"))
    (tf.join(dl, "id").select(col("t"), col("id"), col("tf"), col("dl")),
      stats)
  }

  /**
   * Incremental maintenance for a stored [[bm25Index]] — the append path
   * that keeps the t28 lexical serving index fresh between releases (the
   * [[Similarity.ivfIndexAppend]] contract for the postings family): a
   * new corpus batch emits its (t, id, tf, dl) posting rows — computed
   * from the BATCH text only, the released corpus is never re-tokenized —
   * ready to `write.mode("append")` into the released layout, plus the
   * REWRITTEN 1-row stats table.
   *
   * The stats decision (the one real design choice an append path must
   * make — both BM25 globals go stale the moment a doc arrives):
   * (n_docs, total_tokens) are ADDITIVE, so the new row is derived as
   * released ⊕ delta without any corpus re-scan, and the caller
   * OVERWRITES the stats table with it — a 1-row rewrite whose job
   * commit is the natural atomic commit point. The alternative (an
   * append-only ledger of per-batch delta rows, folded at probe time)
   * was rejected: it would change [[bm25Probe]]'s broadcast-one-row
   * contract for every caller to save rewriting 16 bytes. Order the two
   * writes postings-first: a crash between them leaves scores computed
   * under slightly-stale globals (rankings shift marginally), never a
   * df > n_docs inconsistency — df comes from the posting rows
   * themselves, so it moves WITH the postings append.
   *
   * Equivalence contract (spec-pinned, t30 hash gate): posting rows are
   * per-document facts (tf and dl depend only on that doc's text), so
   * append(postings, delta) ∪-equals the postings rebuilt from scratch
   * over corpus ∪ delta, and the derived stats row equals the rebuild's
   * — a probe over the appended index returns exactly what the rebuild
   * would. Caller contract: delta ids must be NEW (the d07/e22
   * convention; [[graft.ops.Profile.indexAudit]] is the drift check) —
   * a re-ingested id would double its df weight at probe time.
   *
   * Scale: delta-sized throughout — the token explode and (t, id) count
   * run over the batch only; the stats update reads one stored row and
   * one delta-sized aggregate. The append lands unsorted files next to
   * the release's term-range-clustered ones, so In(t) row-group pruning
   * on the delta files degrades toward file-level min/max until the next
   * [[graft.streaming.DocumentStreams.compactStore]] restores the
   * clustering — the probe stays CORRECT either way (the predicate
   * simply prunes less), the standard LSM-style append/compact split.
   */
  def bm25IndexAppend(newDocs: DataFrame, textCol: String, idCol: String,
                      stats: DataFrame): (DataFrame, DataFrame) = {
    val (deltaPostings, deltaStats) = bm25Index(newDocs, textCol, idCol)
    val newStats = stats.select(col("n_docs"), col("total_tokens"))
      .unionAll(deltaStats)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"))
    (deltaPostings, newStats)
  }

  /**
   * Probe a stored [[bm25Index]]: BM25 top-k over the postings table
   * without touching corpus text. The term filter is an `In` predicate
   * that reaches the parquet scan (PlanSpec-pinned on the t28 entry) —
   * on the range-clustered layout a query fetches its terms' row
   * groups; document frequency falls out of the pruned rows themselves
   * (one postings row per (term, doc), so df = the per-term row count —
   * no separate df table to keep consistent); `stats` is one broadcast
   * row. Output: (id, n_terms_hit, score_scaled), score descending,
   * ties by id ascending, via TakeOrderedAndProject — identical to
   * [[bm25TopK]] by construction.
   */
  def bm25Probe(
      postings: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Probe needs at least one query term")
    require(k > 0, "bm25Probe needs k > 0")
    // distinct AFTER the term filter: a double-run release job that
    // re-appended the postings would otherwise double every df count
    // and score every posting twice — silently wrong top-k. The
    // distinct runs over query-term rows only (cheap), and on the live
    // composition's already-distinct aggregate output it is a no-op
    // semantically. A corrupted index carrying CONFLICTING tf/dl for
    // one (t, id) is beyond repair here — that is x11/compaction
    // territory, not scoring's.
    val p = postings.filter(col("t").isInCollection(queryTerms)).distinct()
    // Document frequency per query term: tiny result (≤ |queryTerms|);
    // one row per (term, doc) after the distinct, so the row count IS df.
    val df = p.groupBy(col("t")).agg(count(lit(1)).as("df"))

    val scored = p
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
