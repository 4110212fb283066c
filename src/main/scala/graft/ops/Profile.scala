package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus data-quality profiling: per-column summary statistics in one
 * aggregation pass — the "is this table what I think it is" report every
 * curation pipeline runs before and after each stage (row counts, null
 * rates, cardinalities, value ranges).
 *
 * Reference behavior: iceberg-explorer exposes table schema/metadata
 * introspection (`api/routes/catalog.py`) but leaves content profiling to
 * ad-hoc SQL; this makes the profile a first-class relational operator.
 *
 * Scale design: ONE aggregation over the table computes every column's
 * metrics together (Catalyst plans the distinct counts via Expand — the
 * standard multi-count-distinct shape — with partial aggregation map-side),
 * then a literal-array explode pivots the single result row into one row
 * per column. No joins, no second scan, no driver-side loop; the exchange
 * carries one row per (grouping-set × partition).
 *
 * All metrics are exact integers or strings — deliberately no averages:
 * integer metrics hash-compare bit-exactly across engines, float division
 * would not. min/max are computed on the NATIVE type (so `499 > 99` for a
 * bigint column) and cast to string only for the schema-stable output.
 */
object Profile {

  /** One row per requested column: (col_name, n_rows, n_nulls,
    * n_distinct, min_val, max_val, sum_len) where sum_len totals the
    * string-rendered length (code points) of non-null values.
    * Duplicate column requests collapse to one row each.
    *
    * `approximate = true` swaps the exact `count_distinct` for
    * `approx_count_distinct` (HLL++, default ~5 % relative error) — the
    * 100 TB path: exact distinct counts are the only metric here that
    * shuffles per-VALUE state (via Expand), everything else partial-
    * aggregates to one row per partition. The x01 gate query runs the
    * exact form (oracle-checkable); the HTTP profile route and any
    * warehouse-scale caller should pass approximate. */
  def profile(df: DataFrame, cols: Seq[String],
              approximate: Boolean = false): DataFrame = {
    val colsU = checked(df, cols)
    df.agg(count(lit(1)).as("__n"), metricAggs(colsU, approximate): _*)
      .select(explode(array(pivotRows(colsU): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** [[profile]] per group: one row per (group value, column) — the
    * per-stratum data-card report (e.g. per-language corpus stats).
    * The group value renders as a string (`group_val`, NULL group = its
    * own row) for a schema-stable output. Same single-aggregation-pass
    * shape: the only difference is that the pass is keyed, so partial
    * aggregation and the Expand-based distinct counts now shuffle per
    * (group × metric) instead of once. */
  def profileBy(df: DataFrame, groupCol: String, cols: Seq[String],
                approximate: Boolean = false): DataFrame = {
    require(df.columns.contains(groupCol),
      s"profileBy: group column $groupCol not in schema")
    val colsU = checked(df, cols)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), metricAggs(colsU, approximate): _*)
      .select(col(groupCol).cast("string").as("group_val"),
        explode(array(pivotRows(colsU): _*)).as("p"))
      .select(col("group_val"), col("p.*"))
      .orderBy(col("group_val"), col("col_name"))
  }

  private def checked(df: DataFrame, cols: Seq[String]): Seq[String] = {
    val colsU = cols.distinct
    require(colsU.nonEmpty, "profile needs at least one column")
    val missing = colsU.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: columns not in schema: $missing")
    colsU
  }

  /** The five metric aggregates per profiled column. */
  private def metricAggs(colsU: Seq[String],
                         approximate: Boolean): Seq[org.apache.spark.sql.Column] =
    colsU.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__cnt"),
        (if (approximate) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"__${c}__nd"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"),
        sum(length(col(c).cast("string")).cast("long")).as(s"__${c}__len"))
    }

  /** Pivot the wide aggregate row into one struct per profiled column. */
  private def pivotRows(colsU: Seq[String]): Seq[org.apache.spark.sql.Column] =
    colsU.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}__cnt")).as("n_nulls"),
        col(s"__${c}__nd").as("n_distinct"),
        col(s"__${c}__min").as("min_val"),
        col(s"__${c}__max").as("max_val"),
        col(s"__${c}__len").as("sum_len"))
    }

  /**
   * Class-balance report — the label-distribution check run before
   * training a classifier (or weighting a mixture) on labeled data: one
   * row per label with its count and corpus share, plus the corpus-level
   * Gini impurity `1 − Σ (n_i/N)²` repeated on every row (the standard
   * one-number imbalance summary: 0 = one class holds everything,
   * (k−1)/k = perfectly balanced over k classes).
   *
   * Exact integer arithmetic throughout: shares and the Gini are
   * truncating ppm fixed point, the squared-count sum runs in
   * DECIMAL(38,0) (n_i² passes 2⁶³ at ~3·10⁹ rows per label; DuckDB's
   * HUGEINT promotes identically). NULL labels form their own row —
   * an imbalance report that silently dropped unlabeled rows would
   * understate the problem.
   *
   * Scale: one label-keyed count with map-side partials; everything
   * downstream runs over the k-row label table (broadcast-sized).
   */
  def classBalance(df: DataFrame, labelCol: String): DataFrame = {
    val counts = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      sum(col("n")).as("__t"),
      sum(col("n").cast("decimal(38,0)") * col("n")).as("__sq"))
    counts.crossJoin(broadcast(tot))
      .select(col("label"), col("n"),
        expr("CAST(n * 1000000 DIV __t AS BIGINT)").as("share_ppm"),
        expr("CAST((CAST(__t AS DECIMAL(38,0)) * __t - __sq) * 1000000 " +
          "DIV (CAST(__t AS DECIMAL(38,0)) * __t) AS BIGINT)")
          .as("gini_ppm"))
      .orderBy(col("label"))
  }

  /**
   * Stored-index freshness audit (x11) — the consistency check a
   * pipeline runs before trusting any of its materialized index tables
   * (the d18 dedup index, the e21/e22 IVF assignments, the t28
   * postings): compare the corpus's id set against the index's and
   * report, in one row, `n_corpus`, `n_indexed` (distinct ids the index
   * covers), `n_unindexed` (corpus docs the index misses — the
   * append-lag signal that triggers an ivfIndexAppend /
   * incrementalIndex backfill), `n_orphaned` (index ids whose corpus
   * row is gone — the delete-lag signal that triggers a compaction
   * rewrite), and `fresh_ppm` = 1e6·covered/corpus (truncating — 1e6
   * means every corpus doc is indexed).
   *
   * Scale: the audit deliberately reads ONE pruned id column per side
   * (never vectors, signatures, or postings payloads), distinct-
   * aggregates each (map-side partials), and full-outer-joins the two
   * id sets — narrow 8-byte rows end to end, the cheapest possible
   * statement about a 100 TB index's health. An index with multiple
   * rows per doc (postings) audits identically through the distinct.
   */
  def indexAudit(corpus: DataFrame, idCol: String,
                 index: DataFrame, indexIdCol: String): DataFrame = {
    requireIntegralIds(corpus, idCol, index, indexIdCol, "indexAudit")
    val c = corpus.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("__in_c", lit(1))
    val i = index.select(col(indexIdCol).cast("long").as("id")).distinct()
      .withColumn("__in_i", lit(1))
    c.join(i, Seq("id"), "full_outer")
      .agg(count(col("__in_c")).as("n_corpus"),
        count(col("__in_i")).as("n_indexed"),
        count(when(col("__in_c").isNotNull && col("__in_i").isNotNull, 1))
          .as("n_covered"),
        count(when(col("__in_c").isNotNull && col("__in_i").isNull, 1))
          .as("n_unindexed"),
        count(when(col("__in_c").isNull && col("__in_i").isNotNull, 1))
          .as("n_orphaned"))
      .select(col("n_corpus"), col("n_indexed"), col("n_covered"),
        col("n_unindexed"), col("n_orphaned"),
        expr("CASE WHEN n_corpus = 0 THEN 1000000L " +
          "ELSE n_covered * 1000000L DIV n_corpus END").as("fresh_ppm"))
  }

  /**
   * Release-wide freshness audit — ONE statement about the health of
   * every stored index family a corpus release ships (x13): each
   * (family, corpus, corpusIdCol, index, indexIdCol) entry contributes
   * its [[indexAudit]] row tagged with the family name, ordered by
   * family — the dashboard row set a release job checks before
   * declaring the release servable, and the trigger table for
   * [[indexRepair]] (any row with n_unindexed > 0 backfills, with
   * n_orphaned > 0 compacts). Entries carry their OWN corpus because a
   * release audits across modalities — the document families (dedup,
   * postings, fingerprints) against the document corpus, the vector
   * families (IVF assignments, PQ codes) against the embedding corpus;
   * a many-rows-per-doc index (postings' (t, id), codes' (id, sub))
   * audits identically through [[indexAudit]]'s distinct.
   *
   * The audited ID is the family's OWN freshness dimension — three
   * classes (the x13 ten-row form):
   *  - per-document index families (dedup/postings/fingerprints/IVF/
   *    PQ): document or vector ids — coverage means "every corpus doc
   *    has its index rows";
   *  - SYNOPSIS and MODEL families (KMV sketch, Bloom words, quantile
   *    histogram, the NB totals ledger): their rows are per-shard/
   *    per-batch AGGREGATES, not per-doc facts, so the sharpest
   *    id-level statement is batch-LEDGER coverage — corpus batch ids
   *    vs the shard/batch_id column the store stamps (n_unindexed =
   *    batches of append lag, n_orphaned = ledger shards whose source
   *    batch was deleted — a signal to rebuild, since synopsis rows
   *    cannot be subtracted);
   *  - the LAYOUT family (p17/p18): the store holds the corpus rows
   *    THEMSELVES, so freshness IS row reconciliation on the row id —
   *    and [[graft.ops.Layout.zorderAppend]]'s envelope gate means a
   *    stale-bounds store can only ever manifest as missing rows here,
   *    never as silently-misfiled ones.
   *
   * Scale: |families| independent two-pruned-id-column audits (each the
   * x11 cost — two narrow column reads, one 8-byte-row full-outer
   * join) unioned into |families| rows; nothing cross-family joins, so
   * the release audit costs exactly the sum of its members and
   * parallelizes across them.
   */
  def releaseAudit(
      families: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(families.nonEmpty, "releaseAudit needs at least one family")
    require(families.map(_._1).distinct.size == families.size,
      "releaseAudit family names must be distinct")
    families.map { case (family, corpus, idCol, index, indexIdCol) =>
      indexAudit(corpus, idCol, index, indexIdCol)
        .select(lit(family).as("family"), col("n_corpus"),
          col("n_indexed"), col("n_covered"), col("n_unindexed"),
          col("n_orphaned"), col("fresh_ppm"))
    }.reduce(_ unionAll _).orderBy(col("family"))
  }

  /**
   * Act on an [[indexAudit]]'s two signals — the repair op that closes
   * the audit loop (x12): given the corpus, a stale stored index, and
   * the index family's own row builder (`buildRows`: docs → index rows,
   * e.g. [[graft.ops.Dedup.incrementalIndex]],
   * [[graft.ops.Retrieval.bm25IndexAppend]]'s postings half,
   * [[graft.ops.TextAnalysis.contaminationIndexAppend]], or a
   * fixed-centroid [[graft.ops.Similarity.ivfIndexAppend]] closure),
   * return the REPAIRED index rows: orphaned rows dropped (index rows
   * whose corpus doc is gone — the delete-lag remedy) and unindexed
   * corpus docs backfilled through `buildRows` (the append-lag remedy).
   * The caller writes the result over the stored index with the
   * family's layout (the [[graft.streaming.DocumentStreams
   * .compactStore]] swap protocol is the safe overwrite).
   *
   * Contract (spec-pinned): because every supported family's index rows
   * are per-document facts built by a deterministic rule, repair(stale
   * index) row-set-equals the index REBUILT from scratch over the
   * corpus — but computed by touching only |unindexed| docs' text plus
   * one pruned id column per side, never re-deriving the covered rows.
   * After repair, `indexAudit(corpus, repaired)` reads
   * n_unindexed = n_orphaned = 0 and fresh_ppm = 1e6. A `batch_id`
   * column on the stored rows (the streaming stores') survives on kept
   * rows and reads null on backfill rows (`allowMissingColumns` — the
   * pre-stamping convention).
   *
   * Scale: the orphan drop is a semi-join whose corpus side reads ONE
   * pruned id column, and the backfill anti-join prunes the INDEX side
   * to its id column the same way (both PlanSpec-pinned); the corpus's
   * payload columns ride the anti-join once, but the expensive work —
   * `buildRows`' artifact derivation (fingerprints, signatures,
   * postings) — runs over the |unindexed| surviving rows only. Nothing
   * here derives artifacts corpus-wide unless the audit says most of
   * the corpus is unindexed — at which point the repair IS the rebuild,
   * as it should be.
   */
  def indexRepair(corpus: DataFrame, idCol: String,
                  index: DataFrame, indexIdCol: String,
                  buildRows: DataFrame => DataFrame): DataFrame = {
    requireIntegralIds(corpus, idCol, index, indexIdCol, "indexRepair")
    val corpusIds = corpus.select(col(idCol))
    val kept = index.join(corpusIds.withColumnRenamed(idCol, indexIdCol),
      Seq(indexIdCol), "left_semi")
    val unindexed = corpus.join(
      index.select(col(indexIdCol).as(idCol)), Seq(idCol), "left_anti")
    kept.unionByName(buildRows(unindexed), allowMissingColumns = true)
  }

  /** The integral-id gate shared by [[indexAudit]] and [[indexRepair]]
    * (the rankTopK/rrfFusion contract): a non-integral id would cast to
    * null, both sides would collapse to one never-matching null row,
    * and the audit would report a fully-stale index for a perfectly
    * fresh one — reject up front instead. */
  private def requireIntegralIds(corpus: DataFrame, idCol: String,
      index: DataFrame, indexIdCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    for ((df, c, side) <- Seq((corpus, idCol, "corpus"),
                              (index, indexIdCol, "index"))) {
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"$op id columns must be integral, got $dt on the " +
          s"$side side — non-numeric ids would cast to null and " +
          "report a fresh index as fully stale")
    }
  }
}
