package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/**
 * Physical-plan quality gates — the properties that decide whether a query
 * survives a 100× scale-up, asserted so a regression in plan shape fails
 * CI, not a production run:
 *  - filters/projections reach the parquet scan (PushedFilters/ReadSchema);
 *  - dimension joins broadcast instead of shuffling the fact side;
 *  - ORDER BY + LIMIT plans as TakeOrderedAndProject (distributed top-k),
 *    never a global sort;
 *  - aggregations run partial (map-side) before the exchange.
 */
class PlanSpec extends SparkSuite {

  private def planOf(name: String): String = {
    val df: DataFrame = Inventory.queries(name)(spark, sf)
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("q01: predicate pushdown and column pruning reach the scan") {
    val plan = planOf("q01_scan_filter")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_quantity"), plan)
    // PushedFilters renders truncated in the plan string — prefix match
    assert(plan.contains("EqualTo(l_returnfl"), plan)
    // pruned read schema: only the 4 referenced columns, not all 16
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_extendedprice"), readSchema)
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  test("q06: dimension tables broadcast; fact side never shuffles for the join") {
    val plan = planOf("q06_three_way_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q15: ORDER BY + LIMIT is distributed top-k, not a global sort") {
    val plan = planOf("q15_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q07: aggregation is partial before the exchange (map-side combine)") {
    val plan = planOf("q07_groupby_agg")
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial_")), aggLines.mkString("\n"))
    assert(aggLines.size >= 2, aggLines.mkString("\n"))
  }

  test("q02: filter on orders is pushed below the join") {
    val plan = planOf("q02_inner_join")
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(o_orderstatus"), plan)
  }

  test("whole-stage codegen spans cover the scan-filter-project pipeline") {
    // AQE nests stages, so look for the codegen stage markers ("*(n)") in
    // the final plan string rather than collecting exec nodes
    val plan = planOf("q01_scan_filter")
    assert(plan.contains("*(1)"), plan)
  }

  test("q48: max_by/min_by aggregate with partial map-side combine") {
    val plan = planOf("q48_conditional_aggs")
    val aggLines = plan.linesIterator.filter(_.contains("Aggregate")).toSeq
    assert(aggLines.exists(_.contains("partial_")), aggLines.mkString("\n"))
    // max_by/min_by are declarative aggregates — they must stay in
    // HashAggregate, not fall back to ObjectHashAggregate
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }

  test("q44: statistical aggregates stay in HashAggregate with partials") {
    val plan = planOf("q44_stat_aggs")
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("Aggregate") && l.contains("partial_")), plan)
  }

  test("q46: one keyed window pass computes all distribution functions") {
    val plan = planOf("q46_window_distribution")
    // all three distribution functions must land in ONE Window node (its
    // rendered line carries all of them) over one hashpartitioning
    // exchange on the window key. The AQE plan string renders Final +
    // Initial, so assert per-line, not by node count.
    assert(plan.linesIterator.exists(l => l.contains("Window [") &&
      l.contains("ntile(4)") && l.contains("percent_rank") &&
      l.contains("cume_dist")), plan)
    assert(plan.contains("hashpartitioning(c_nationkey"), plan)
  }

  test("t02: quality score is a single text_stats projection (map-only)") {
    val df = graft.queries.PipelineOps.queries("t02_quality_score")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // no join/aggregate exchanges — the only exchange is the declared
    // total-order ORDER BY
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"), plan)
    assert(plan.contains("text_stats"), plan)
  }

  test("r01: resample grid + fill use only keyed exchanges (no global sort before ORDER BY)") {
    val df = graft.queries.PipelineOps.queries("r01_resample_ffill")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // observation agg, lag window, and fill window all key on user_id;
    // the single rangepartitioning is the declared total-order ORDER BY
    assert(plan.contains("hashpartitioning(user_id"), plan)
    assert(plan.linesIterator.count(_.contains("rangepartitioning")) <= 2, plan)
    // gap generation is a Generate (explode of the per-run sequence),
    // not a join, and the whole operator reads the source ONCE
    assert(plan.contains("Generate explode"), plan)
    assert(!plan.contains("Join"), plan)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(finalPlan).size <= 1, finalPlan)
    // the fill window inherits the lag window's key partitioning: only
    // the two aggregate/window exchanges plus the presentation sort
    assert(finalPlan.linesIterator
      .count(_.contains("Exchange hashpartitioning")) <= 2, finalPlan)
  }

  test("t06/e03: native-expression ops are map-only single projections") {
    for ((name, exprName) <- Seq("t06_gopher" -> "gopher_stats",
                                 "e03_quantize" -> "quantize_int8")) {
      val df = graft.queries.PipelineOps.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
        s"$name:\n$plan")
      assert(plan.contains(exprName), s"$name:\n$plan")
    }
  }

  test("t07: bigram top-k is partial-agg + TakeOrderedAndProject") {
    val df = graft.queries.PipelineOps.queries("t07_ngrams")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("q49: interval join is an equi-key join with the range in the condition") {
    val plan = planOf("q49_interval_join")
    // never a cartesian/broadcast-nested-loop — the user_id equi key
    // carries the join, the time bound rides the condition
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q52: bloom prefilter evaluates on the fact side before the semi join") {
    val plan = planOf("q52_bloom_semi")
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("p04: weighted sample is a map-only key + distributed top-n") {
    val df = graft.queries.PipelineOps.queries("p04_weighted_sample")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      plan)
  }

  test("t10: recount joins broadcast candidates; token stream never sort-merges") {
    val df = graft.queries.PipelineOps.queries("t10_heavy_hitters")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("d08: hot-chunk filter is a broadcast anti-join; chunk table reused") {
    val df = graft.queries.PipelineOps.queries("d08_chunk_dedup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the (small) hot-chunk set broadcasts — doc chunks never shuffle for
    // the filtering join
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan)
    // per-doc totals are map-side size(chunk array) — no count-only
    // aggregation pass over the exploded chunks
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"), plan)
  }

  test("d09: intra-doc dedup is map-only — no keyed exchange of chunks") {
    val df = graft.queries.PipelineOps.queries("d09_intradoc_dedup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // fully doc-local: no explode, no aggregation, no join — the r14
    // widen adds ONE round-robin exchange of raw (id, text) rows below
    // the projection (scan parallelism, Par.widen; no-op on a parallel
    // scan), but chunk rows still never shuffle KEYED: the only other
    // exchange is the rangepartitioning for the declared ORDER BY
    assert(!plan.contains("HashAggregate") && !plan.contains("Join") &&
      !plan.contains("Generate"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.linesIterator.count(_.contains("Exchange")) <= 2, plan)
  }

  test("t25: bucket assignment is a map-side compare against literal " +
      "boundaries — no corpus window, join, or global sort") {
    val df = graft.queries.PipelineOps.queries("t25_perplexity_buckets")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the two-phase quantile runs driver-side against bounded aggregates
    // BEFORE this plan exists; the returned corpus-sized plan must be:
    // checkpointed scores -> Project(CASE vs two literals) -> output sort.
    // Any Window/Join/Aggregate here would mean the boundary search
    // leaked into the corpus-sized plan.
    assert(!plan.contains("Window") && !plan.contains("Join") &&
      !plan.contains("HashAggregate") && !plan.contains("Generate"), plan)
    // AQE prints the initial plan below the final one — count the final
    // section only, else the one range-partitioning exchange doubles
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.linesIterator.count(_.contains("Exchange")) <= 1, plan)
  }

  test("d11: semdedup pairs join equi-keyed on the cluster column") {
    val df = graft.queries.PipelineOps.queries("d11_semdedup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // within-cluster pairs only: an equi-join ON the cluster key (the
    // id< and cosine predicates ride in the join condition), never a
    // cartesian over the corpus — the property that bounds the operator
    // at Σ cluster_size². (At spec scale AQE broadcasts one self-join
    // side, so the repartition(cl) exchange shows reuse only at real
    // scale — the join keying is the scale-invariant to pin.)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("(BroadcastHash|SortMerge|ShuffledHash)Join \\[cl#".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("p07: sliding chunks are map-only + one Generate, no shuffle") {
    val df = graft.queries.PipelineOps.queries("p07_chunk_windows")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"), plan)
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2, plan)
  }

  test("e07: ADC tables broadcast; candidate distance sum partial-aggregates") {
    val df = graft.queries.PipelineOps.queries("e07_ivfpq_topk")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the per-query distance tables and probe set join broadcast — the
    // coded corpus never rides a join exchange it doesn't need
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the m-term ADC sum combines map-side before any exchange
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("e05: centroids broadcast; top-1 aggregates partially before exchange") {
    val df = graft.queries.PipelineOps.queries("e05_kmeans_assign")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // bounded-heap udaf keeps partial aggregation: one candidate row per
    // (vector, partition) rides the exchange, not the 8x score matrix
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_(") && plan.contains("TopKAggregator"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("t12: PII redaction is map-only — no exchange below the output sort") {
    val df = graft.queries.PipelineOps.queries("t12_pii_redact")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"), plan)
    // exactly one exchange: the rangepartitioning for the declared ORDER BY
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2, plan)
  }

  test("q54: interval-range frame is one keyed window pass") {
    val plan = planOf("q54_range_frame")
    assert(plan.contains("Window"), plan)
    assert(plan.contains("hashpartitioning(user_id"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q55: correlated lateral top-n decorrelates — no per-row re-execution") {
    val plan = planOf("q55_lateral_subquery")
    // Catalyst rewrites the LATERAL ... ORDER BY ... LIMIT into a
    // window/rank over a single join — never a cartesian or a
    // nested-loop re-run of the subquery per outer row
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window") || plan.contains("TakeOrdered"), plan)
  }

  test("p06: temperature mix applies as a broadcast lookup — corpus never shuffles") {
    val df = graft.queries.PipelineOps.queries("p06_temperature_mix")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the only non-broadcast exchanges: the tiny per-source count
    // aggregate (+ its single-row total) and the presentation ORDER BY —
    // never a corpus-wide hash shuffle of the documents side
    assert(!plan.contains("hashpartitioning(doc_id"), plan)
  }

  test("p05: upsample mix is map-only — no exchange below the output sort") {
    val df = graft.queries.PipelineOps.queries("p05_upsample_mix")(spark, sf)
    df.collect()
    // the inventory entry adds a presentation ORDER BY (one range
    // exchange); the operator itself must contribute zero exchanges
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.linesIterator
      .count(_.contains("Exchange hashpartitioning")) === 0, plan)
    assert(plan.linesIterator
      .count(_.contains("Exchange rangepartitioning")) <= 1, plan)
    assert(plan.contains("Generate"), plan)     // the copy fan-out explode
    assert(!plan.contains("Join"), plan)
  }

  test("x01: profile is one aggregation — Expand, no join, single scan") {
    val df = graft.queries.PipelineOps.queries("x01_profile")(spark, sf)
    df.collect()
    // AQE prints Final + Initial plans; count scans in the final one only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Join"), plan)
    assert("FileScan parquet".r.findAllIn(plan).size <= 1, plan)
  }

  test("p03: packing is one keyed window over the shard exchange") {
    val df = graft.queries.PipelineOps.queries("p03_pack_sequences")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q71/q72/q75: subquery predicates decorrelate to hash joins") {
    // NOT IN over a nullable column still plans as a single null-aware
    // broadcast join (one pass over customer), EXISTS/NOT EXISTS become
    // semi/anti hash joins, and the tuple IN is a two-key semi join —
    // none may fall back to a per-row nested-loop re-execution
    val q71 = planOf("q71_null_aware_anti")
    assert(!q71.contains("CartesianProduct"), q71)
    val q72 = planOf("q72_exists_subquery")
    assert(q72.contains("LeftSemi"), q72)
    assert(q72.contains("LeftAnti"), q72)
    assert(!q72.contains("CartesianProduct"), q72)
    val q75 = planOf("q75_tuple_in")
    assert(q75.contains("LeftSemi"), q75)
    assert(!q75.contains("CartesianProduct"), q75)
    assert(!q75.contains("BroadcastNestedLoop"), q75)
  }

  test("q74: inline VALUES dimension broadcasts — fact side never shuffles") {
    val plan = planOf("q74_values_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("bucketed tables co-locate the join: no exchange between them") {
    import org.apache.spark.sql.functions._
    // bucket both sides on the join key — the 100 TB pattern for repeated
    // large-large joins: pre-shuffle once at write time, never at read
    val wh = java.nio.file.Files.createTempDirectory("bucketed_wh")
    graft.tables.Tables(spark, sf, "orders").write
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_bkt")
      .mode("overwrite").saveAsTable("orders_bkt")
    graft.tables.Tables(spark, sf, "customer").write
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_bkt")
      .mode("overwrite").saveAsTable("customer_bkt")
    val joined = spark.table("orders_bkt")
      .join(spark.table("customer_bkt"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // SMJ reads both bucketed sides directly; the only exchange allowed is
    // the (tiny) post-aggregation one — none may feed the join itself
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").last
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"join sides were re-shuffled despite bucketing:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
  }

  /** A REAL runtime prune. AQE silently degrades a dynamic-partition-
    * pruning filter whose broadcast cannot be stage-cache-reused to
    * dynamicpruningexpression(true) — the SAME substring, but a full
    * store scan (measured on the m05 probe before its probe-key
    * checkpoint; the object-plan probe side broke canonicalized
    * exchange reuse). Every DPP pin therefore excludes the degenerate
    * form instead of matching the bare substring. */
  private def reallyPruned(scanLine: String): Boolean =
    scanLine.contains("dynamicpruningexpression") &&
      !scanLine.contains("dynamicpruningexpression(true)")

  private def pipelinePlan(name: String): String = {
    val df = graft.queries.PipelineOps.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("m05: the stored media signature probe is payload-free on the " +
      "corpus side and hash-joins the grid keys — no sort-merge, no " +
      "cartesian, no corpus-side payload read") {
    val plan = pipelinePlan("m05_indexed_media_neardup")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // the corpus side reads the STORED signature table (narrow rows),
    // never the media payloads: the only documents scan in the probe
    // plan is the probe side's own (batch) histogram pass
    val sigScans = finalPlan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_m05_index_")).toSeq
    assert(sigScans.nonEmpty, plan)
    // the grid-key pair stage is an EQUI-join on the narrow signature
    // rows (exchange keyed on the cells; SMJ-vs-SHJ on 8-byte keys is
    // not the load-bearing property) — a cartesian here would be the
    // brute tier's quadratic shape and would not survive a 100x corpus
    assert(!finalPlan.contains("CartesianProduct"), finalPlan)
    // exactly-1-replication check: the pair stage must come from the
    // 3x3 probe explode, not a distinct over an LSH band explosion
    // (checked on the whole plan string: AQE prints materialized
    // broadcast stages abbreviated in the final-plan section)
    assert(plan.contains("Generate explode"), plan.take(4000))
  }

  test("t21: fusion never sort-merge joins; final cut is distributed top-k") {
    val plan = pipelinePlan("t21_rrf_fusion")
    // both input lists are k-row; the dense scoring side broadcasts its
    // query and the fusion group-by runs on |lists|*k rows
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("t22: BPE pairs partial-aggregate; exchanges keyed by pair, never by doc") {
    val plan = pipelinePlan("t22_bpe_merges")
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial_")), aggLines.mkString("\n"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the corpus row set must never shuffle by document id — only the
    // (pair[, id-distinct]) aggregation exchanges are allowed
    assert(!plan.contains("hashpartitioning(id"), plan)
  }

  test("e17: gram drift partial-aggregates; no corpus-keyed exchange") {
    val plan = pipelinePlan("e17_gram_drift")
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial_")), aggLines.mkString("\n"))
    // products are generated in-row: the only exchanges carry the fixed
    // d^2 partial sums (dim keys) and the d^2-row full-outer join —
    // nothing keyed by vec_id
    assert(!plan.contains("hashpartitioning(vec_id"), plan)
    assert(!plan.contains("hashpartitioning(id"), plan)
  }

  test("p13: allocation broadcasts back; corpus window keyed by domain") {
    val plan = pipelinePlan("p13_epoch_plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the one corpus-sized exchange is the domain-keyed window
    assert(plan.contains("hashpartitioning(__dom"), plan)
  }

  test("p15: the only global window runs over the 256-row bucket " +
      "aggregate; manifest agg is partial; offsets broadcast back") {
    val plan = pipelinePlan("p15_shard_manifest")
    // corpus rows exchange keyed by the md5 bucket, never globally
    assert(plan.contains("hashpartitioning(bucket"), plan)
    // the offset table's ordering window is the r15 BoundedWindow
    // device: an explicit constant-key single-group exchange
    // (hashpartitioning(0, n)) over the ≤256-row bucket aggregate —
    // never a bare SinglePartition (whose WindowExec warning is
    // reserved for REAL unpartitioned-window regressions), and never
    // above corpus rows
    // (count in the FINAL plan only; AQE toString repeats the tree)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("Exchange SinglePartition"), plan)
    // the BoundedWindow constant key extracts to ONE `_w*` alias
    // feeding ONE Window operator that carries BOTH offset cumulations
    // (pos_off and w_off share the exchange; a split here would double
    // the offset table's exchanges — and a bare SinglePartition would
    // mean the constant key got folded away and the warning is back)
    val offsetWindows = finalPlan.linesIterator.filter(l =>
      l.contains("Window [") && l.contains("], [_w")).toSeq
    assert(offsetWindows.size === 1, plan)
    assert(offsetWindows.head.contains("sum(n#") &&
      offsetWindows.head.contains("sum(bw#"), plan)
    // the offsets join back as a broadcast; nothing sort-merges
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // manifest rollup combines map-side (bit_xor is associative)
    assert(plan.contains("partial_bit_xor"), plan)
    assert(plan.contains("hashpartitioning(shard"), plan)
  }

  test("d17: planner-driven dedup — the PLANNED factorization is the " +
      "EXECUTED geometry, and the dedup half keeps d02's reused-exchange " +
      "shape") {
    val plan = pipelinePlan("d17_planned_dedup")
    // the signature repartition(id) exchange is computed once and
    // reused by the self-join sides and the verification joins — the
    // d02 shape, unchanged by the planner (the factorization is purely
    // candidate-generation geometry)
    assert(plan.contains("ReusedExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // planned == executed: the pick is corpus-dependent ((64,2) on the
    // sf0.01 gate fixture; this sf0.001 corpus may qualify a cheaper
    // shape), so pin that the band projection's slice STRIDE in the
    // physical plan is exactly planLsh's rows_per_band — proof the
    // lshPlan -> pickLsh decision drives the executed geometry (its
    // plan-table collect is the only driver materialization; everything
    // in this plan is the dedup dataflow)
    val (_, er) = graft.ops.Dedup.planLsh(
      graft.tables.Tables(spark, sf, "documents"), "text", "doc_id",
      targetMinPpm = 999999L, numHashes = 128, floorThreshold = 0.5)
    val stride = (raw"slice\(sig#\d+, \(\(lambda [\w#]+ \* (\d+)\)").r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(stride === Some(er), s"stride=$stride planned rows=$er\n$plan")
  }

  test("d07: the corpus side is never exchanged — delta bands broadcast, " +
      "the only repartition barrier is the delta's") {
    val plan = pipelinePlan("d07_incremental")
    // ZERO explicit repartition barriers: the band index and the verify
    // join consume different columns, so d02's exchange-reuse device
    // never fires in the cross-set shape — each side reaches its join
    // by scan+project alone; shuffling (id, shingles, sig) corpus-wide
    // to reuse one computation is the wrong trade on the big side
    // (count in the FINAL plan only; AQE toString repeats the tree)
    val reparts = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(_.contains("REPARTITION_BY_COL")).toSeq
    assert(reparts.size === 0, plan)
    // the delta-derived sides are small at any real increment — the
    // corpus-facing joins (band probe, shingle verify) broadcast them.
    // The one sort-merge join allowed is the final delta-sized
    // exact-vs-fuzzy id join, whose sort IS the output ordering
    assert(plan.contains("BroadcastHashJoin"), plan)
    val smj = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(_.contains("SortMergeJoin")).toSeq
    assert(smj.size <= 1, plan)
  }

  test("d18: the stored index serves COLUMN-PRUNED probes — each " +
      "consumer reads only its artifact") {
    val plan = pipelinePlan("d18_indexed_incremental")
    // the probe's three corpus-side consumers select different index
    // columns, so the parquet reader must fetch a different subset per
    // scan: (cid, dig) for the exact rollup, (cid, sig) for the band
    // join, (cid, csh) for the verification join. A scan reading all
    // four columns would drag the shingle sets (the text-sized column)
    // through stages that only need 8-byte signatures
    val idxScans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_d18_index_")).toSeq
    // (the exact pass's (cid, dig) scan is absent from the FINAL plan
    // on this fixture: no digest collision crosses the 480 cut, so AQE
    // empty-relation propagation eliminates the whole branch — itself
    // a scale win; the two similarity scans below always survive)
    assert(idxScans.exists(s => s.contains("sig:") && !s.contains("csh")),
      idxScans.mkString("\n"))
    assert(idxScans.exists(s => s.contains("csh:") && !s.contains("sig:")),
      idxScans.mkString("\n"))
    // no scan reads the full four-column row
    assert(!idxScans.exists(s => s.contains("dig") && s.contains("csh") &&
      s.contains("sig")), idxScans.mkString("\n"))
    // and the same zero-repartition property as d07
    val reparts = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(_.contains("REPARTITION_BY_COL")).toSeq
    assert(reparts.size === 0, plan)
  }

  test("p16: the incremental build's report plan reads only checkpointed " +
      "stage boundaries — no corpus re-scan, no re-embedded corpusBuild " +
      "or pair-generator subtree") {
    val plan = pipelinePlan("p16_incremental_build")
    // every stage boundary (delta verdicts, splits, the d07 probe,
    // within-delta dedup, the epoch plan, units — AND the three
    // existing-build interface projections: eval ids, canonical ids,
    // the 1-row position offset) is an eager freshStats checkpoint, so
    // the report plan reads LogicalRDDs only. A FileScan here means a
    // stage re-materializes the corpus per consumer (the p14 invariant,
    // held across the incremental composition); a pair-generator
    // expression here means the existing corpusBuild subtree was
    // re-embedded into the report instead of read at the interface.
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
      plan)
    assert(plan.contains("Scan ExistingRDD"), plan)
    for (marker <- Seq("word_shingles", "minhash_sig", "sha2(",
        "text_stats", "gopher_stats"))
      assert(!plan.contains(marker),
        s"$marker leaked into the report plan:\n$plan")
    // the existing build's sole realization-side contribution is the
    // broadcast 1-row position offset onto delta units — a broadcast
    // nested loop over the checkpointed posOff, never a re-run of the
    // existing pipeline and never a real cartesian
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the realization windows keep p03's shard-keyed exchange shape
    assert(plan.split("== Initial Plan ==").head
      .contains("hashpartitioning(shard"), plan)
  }

  test("e21: the stored IVF index is DYNAMICALLY PARTITION-PRUNED — " +
      "queries read only the probed lists' files") {
    val plan = pipelinePlan("e21_indexed_ann")
    // the assignments were written partitionBy(cid); the probe joins on
    // cid against the (broadcast) probed-list set, so Spark inserts a
    // dynamic partition pruning subquery into the scan — at 100 TB the
    // index read touches nprobe lists' files, not the corpus
    val assignScans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_e21_index_")).toSeq
    val assign = assignScans.filter(_.contains("/assign"))
    assert(assign.nonEmpty, plan)
    assert(assign.forall(reallyPruned),
      assignScans.mkString("\n"))
  }

  test("t28: the term filter reaches the stored postings scan — a query " +
      "reads its terms' row groups, never re-tokenizing the corpus") {
    val plan = pipelinePlan("t28_indexed_bm25")
    // the probe plan must touch ONLY the stored index (postings + the
    // 1-row stats): any documents-parquet scan here means the probe
    // re-tokenized corpus text
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("graft_t28_index_")),
      scans.mkString("\n"))
    // the query-term IN predicate is pushed into the postings scan — on
    // the term-range-clustered layout that read prunes to the query
    // terms' row groups via column min/max stats
    val postings = scans.filter(_.contains("/postings"))
    assert(postings.nonEmpty, plan)
    assert(postings.forall(_.contains("In(t")), postings.mkString("\n"))
    // the cut is distributed top-k; nothing sort-merges in the probe
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("t29: the stored fingerprint index is bucket-partition-pruned — " +
      "a probe reads its buckets' files and never re-fingerprints the " +
      "corpus") {
    val plan = pipelinePlan("t29_indexed_contamination")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val idxScans = finalPlan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_t29_index_")).toSeq
    assert(idxScans.nonEmpty, plan)
    // the fpb join key is a partition column and the probe side
    // broadcasts, so the stored scan carries a DPP subquery — with a
    // realistic small probe the bucket set is sparse and the read
    // touches those buckets' files only
    assert(idxScans.forall(reallyPruned),
      idxScans.mkString("\n"))
    // the corpus text feeds only the index BUILD (before this plan
    // exists): the probe plan's documents scan is the 20-doc probe
    // side, filter pushed
    val docScans = finalPlan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("documents")).toSeq
    assert(docScans.forall(_.contains("LessThan(doc_id,20)")),
      docScans.mkString("\n"))
  }

  test("e22: the APPENDED stored index keeps dynamic partition pruning — " +
      "maintenance never degrades the serving read") {
    val plan = pipelinePlan("e22_ivf_append")
    // ivfIndexAppend writes delta rows into the released partitioned
    // layout; the probe over the appended directory must carry the same
    // DPP subquery as the freshly-built e21 index — if maintenance
    // degraded the scan to a full read, the serving win would silently
    // rot with every append
    val assignScans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_e22_index_")).toSeq
    val assign = assignScans.filter(_.contains("/assign"))
    assert(assign.nonEmpty, plan)
    assert(assign.forall(reallyPruned),
      assignScans.mkString("\n"))
  }

  test("x11: the audit reads ONE pruned id column per side — index " +
      "payload (digest/shingles/signature) and corpus text never scan") {
    val plan = pipelinePlan("x11_index_audit")
    val scans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    val idx = scans.filter(_.contains("graft_x11_index_"))
    assert(idx.nonEmpty, plan)
    // the stored d18 index carries (cid, dig, csh, sig); the audit's
    // scan must fetch cid alone — dragging the text-sized shingle
    // column through a coverage count is the failure this pin catches
    assert(idx.forall(_.contains("ReadSchema: struct<cid:")),
      idx.mkString("\n"))
    assert(!idx.exists(s => s.contains("dig") || s.contains("csh") ||
      s.contains("sig")), idx.mkString("\n"))
    val docScans = scans.filterNot(_.contains("graft_x11_index_"))
    assert(docScans.forall(!_.contains("text")), docScans.mkString("\n"))
  }

  test("x14: the stored sketch is read one narrow column per consumer — " +
      "merge scans h alone, the shard census scans shard alone") {
    val plan = pipelinePlan("x14_distinct_sketch")
    val scans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_x14_sketch_")).toSeq
    assert(scans.nonEmpty, plan)
    // the artifact is tiny, but the read discipline is the point: a
    // sketch consumer that drags both columns through every scan is the
    // shape that rots when the artifact grows columns (e.g. a per-shard
    // row-count ledger); each consumer must prune to its own column
    assert(scans.forall(s => s.contains("ReadSchema: struct<h:bigint>") ||
      s.contains("ReadSchema: struct<shard:int>")), scans.mkString("\n"))
    assert(scans.exists(_.contains("ReadSchema: struct<h:bigint>")) &&
      scans.exists(_.contains("ReadSchema: struct<shard:int>")),
      scans.mkString("\n"))
  }

  test("d19: the stored bloom filter broadcasts onto the probe's " +
      "position rows — the pre-filter never shuffles candidates") {
    val plan = pipelinePlan("d19_bloom_prefilter")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(_.contains("graft_d19_bloom_")), plan)
    // the nWords-row filter is always the broadcast side; a shuffle
    // here would move the batch's exploded position rows for a join
    // against a table that fits in one packet
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
    // the filter scan reads both its columns and nothing else
    val bloomScans = scans.filter(_.contains("graft_d19_bloom_"))
    assert(bloomScans.forall(_.contains(
      "ReadSchema: struct<w:bigint,bits:bigint>")),
      bloomScans.mkString("\n"))
  }

  test("t33: scoring reads the STORED model + the scored split only — " +
      "weights join broadcast, no train-side corpus rescan") {
    val plan = pipelinePlan("t33_classifier")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    val model = scans.filter(_.contains("graft_t33_model_"))
    assert(model.nonEmpty, plan)
    // the only documents read is the scored (held-out) split — the
    // training corpus must never rescan at serving time
    val docScans = scans.filterNot(_.contains("graft_t33_model_"))
    assert(docScans.nonEmpty &&
      docScans.forall(_.contains("GreaterThanOrEqual(doc_id,400)")),
      docScans.mkString("\n"))
    // the vocab-sized weights table broadcasts onto the token stream —
    // a sort-merge join here would shuffle the corpus's exploded tokens
    assert(!finalPlan.contains("SortMergeJoin"), finalPlan)
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
  }

  test("p17: the box probe is a statically partition-pruned scan of the " +
      "Z-order layout — zbucket candidates in PartitionFilters, the " +
      "residual box predicate pushed, no raw-events scan") {
    val plan = pipelinePlan("p17_zorder_layout")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    val store = scans.filter(_.contains("graft_p17_layout_"))
    val data = store.filter(_.contains("/data"))
    assert(data.nonEmpty, plan)
    // the candidate-bucket list must sit in PartitionFilters (static
    // pruning at planning time — the layout's whole point); the exact
    // box predicate must reach the scan as pushed data filters
    // the candidate set renders as `zbucket INSET …` inside
    // PartitionFilters; PushedFilters renders truncated in the plan
    // string, so assert the leading box predicate only (the q01 device)
    assert(data.forall(s => s.contains("PartitionFilters") &&
      s.contains("zbucket") && s.contains("INSET")), data.mkString("\n"))
    assert(data.forall(_.contains("GreaterThanOrEqual(user_id,3)")),
      data.mkString("\n"))
    // the probe answers from the stored layout alone — the only reads
    // are the layout's data and bounds directories
    assert(scans.forall(_.contains("graft_p17_layout_")),
      scans.mkString("\n"))
  }

  test("p18: the APPENDED layout's box probe prunes exactly like the " +
      "one-shot layout's — append files land inside the zbucket " +
      "partition scheme the planner statically filters") {
    val plan = pipelinePlan("p18_zorder_append")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    val data = scans.filter(s => s.contains("graft_p18_layout_") &&
      s.contains("/data"))
    assert(data.nonEmpty, plan)
    assert(data.forall(s => s.contains("PartitionFilters") &&
      s.contains("zbucket") && s.contains("INSET")), data.mkString("\n"))
    assert(data.forall(_.contains("GreaterThanOrEqual(user_id,3)")),
      data.mkString("\n"))
    assert(scans.forall(_.contains("graft_p18_layout_")),
      scans.mkString("\n"))
  }

  test("x15: the stored histogram is read column-pruned — the merge " +
      "fetches (bin, n), never the shard column") {
    val plan = pipelinePlan("x15_quantile_sketch")
    val scans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_x15_hist_")).toSeq
    assert(scans.nonEmpty, plan)
    assert(scans.forall(_.contains("ReadSchema: struct<bin:int,n:bigint>")),
      scans.mkString("\n"))
  }

  test("t30: the APPENDED postings layout keeps the probe's term " +
      "pushdown — lexical maintenance never degrades the serving read") {
    val plan = pipelinePlan("t30_bm25_append")
    // the probe over release-plus-delta files must touch ONLY the
    // stored index (postings + the rewritten stats generation) and
    // keep the In(t) predicate at the scan — delta files prune by
    // file-level min/max until compaction restores the clustering,
    // but the predicate must never lift off the scan
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("graft_t30_index_")),
      scans.mkString("\n"))
    val postings = scans.filter(_.contains("/postings"))
    assert(postings.nonEmpty, plan)
    assert(postings.forall(_.contains("In(t")), postings.mkString("\n"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("t31: the APPENDED fingerprint layout keeps dynamic partition " +
      "pruning — contamination maintenance never degrades the serving " +
      "read") {
    val plan = pipelinePlan("t31_contamination_append")
    // contaminationIndexAppend lands delta rows partition-wise into the
    // released fpb layout; the probe over the appended directory must
    // carry the same DPP subquery as the freshly-built t29 index
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val idxScans = finalPlan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_t31_index_")).toSeq
    assert(idxScans.nonEmpty, plan)
    assert(idxScans.forall(reallyPruned),
      idxScans.mkString("\n"))
    // the probe plan's only documents read is the 20-doc probe side
    val docScans = finalPlan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("documents")).toSeq
    assert(docScans.forall(_.contains("LessThan(doc_id,20)")),
      docScans.mkString("\n"))
  }

  test("e23: the stored PQ codes table is DYNAMICALLY PARTITION-PRUNED " +
      "and raw vectors never scan — the compressed tier's probe reads " +
      "m small ints per candidate from the probed lists' files") {
    val plan = pipelinePlan("e23_indexed_ivfpq")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val idxScans = finalPlan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_e23_index_")).toSeq
    val codeScans = idxScans.filter(_.contains("/codes"))
    assert(codeScans.nonEmpty, plan)
    // the list-membership join key is the partition column and the
    // probed set broadcasts, so the codes scan carries a DPP subquery
    assert(codeScans.forall(reallyPruned),
      codeScans.mkString("\n"))
    // the codes read is (id, sub, code) + the partition column — the
    // whole point of the tier: no vector column at rest on the probe
    assert(codeScans.forall(_.contains("ReadSchema: struct<id:")),
      codeScans.mkString("\n"))
    assert(!codeScans.exists(_.contains("vec")), codeScans.mkString("\n"))
    // the only embeddings read is the 10-query probe side, filter pushed
    val embScans = finalPlan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("embeddings")).toSeq
    assert(embScans.forall(_.contains("LessThan(vec_id,10)")),
      embScans.mkString("\n"))
  }

  test("e24: the APPENDED codes layout keeps dynamic partition " +
      "pruning — compressed-tier maintenance never degrades the " +
      "serving read") {
    val plan = pipelinePlan("e24_ivfpq_append")
    // ivfPqIndexAppend lands delta code rows into the released
    // partitioned layout; the probe over the appended directory must
    // carry the same DPP subquery as the freshly-built e23 index
    val codeScans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_e24_index_")).toSeq
      .filter(_.contains("/codes"))
    assert(codeScans.nonEmpty, plan)
    assert(codeScans.forall(reallyPruned),
      codeScans.mkString("\n"))
    assert(!codeScans.exists(_.contains("vec")), codeScans.mkString("\n"))
  }

  test("e26: the two-stage serving plan prunes BOTH tiers — vector-free " +
      "DPP read on the codes, DPP-pruned refinement read on the raw " +
      "store") {
    val plan = pipelinePlan("e26_pq_rerank")
    // the candidate stage rides a broadcast subquery whose adaptive
    // plan prints AFTER the outer plan's Initial marker — scan the
    // whole dump (every occurrence of a scan, initial or final, must
    // carry the property, so the global check is the stricter one)
    val idxScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("graft_e26_index_")).toSeq
    val codeScans = idxScans.filter(_.contains("/codes"))
    assert(codeScans.nonEmpty, plan)
    assert(codeScans.forall(reallyPruned),
      codeScans.mkString("\n"))
    assert(!codeScans.exists(_.contains("vec")), codeScans.mkString("\n"))
    // the refinement tier: the raw store is read ONLY through the
    // probed-lists DPP filter — the vector column is materialized for
    // probed partitions, never the whole corpus
    val rawScans = idxScans.filter(_.contains("/raw"))
    assert(rawScans.nonEmpty, plan)
    assert(rawScans.forall(reallyPruned),
      rawScans.mkString("\n"))
    assert(rawScans.forall(_.contains("vec")), rawScans.mkString("\n"))
    // the only embeddings read is the 10-query probe side
    val embScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        l.contains("embeddings")).toSeq
    assert(embScans.forall(_.contains("LessThan(vec_id,10)")),
      embScans.mkString("\n"))
  }

  test("t32: the hybrid probe serves from TWO stored indexes — term " +
      "pushdown on the postings, DPP on the IVF lists, and the corpus " +
      "is never re-read") {
    val plan = pipelinePlan("t32_indexed_hybrid")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    // the lexical side never re-tokenizes: zero documents scans in the
    // serving plan — both rank lists come from stored index files
    assert(!scans.exists(_.contains("documents")), scans.mkString("\n"))
    val postings = scans.filter(s =>
      s.contains("graft_t32_index_") && s.contains("/postings"))
    assert(postings.nonEmpty, plan)
    assert(postings.forall(_.contains("In(t")), postings.mkString("\n"))
    val assign = scans.filter(s =>
      s.contains("graft_t32_index_") && s.contains("/assign"))
    assert(assign.nonEmpty, plan)
    assert(assign.forall(reallyPruned),
      assign.mkString("\n"))
    // the dense side's only embeddings read is the single query vector
    val embScans = scans.filter(_.contains("embeddings"))
    assert(embScans.forall(_.contains("EqualTo(vec_id,0)")),
      embScans.mkString("\n"))
  }

  test("x12: the repair reads pruned id columns for its set arithmetic " +
      "— and the audits over stale/repaired stay id-column-narrow") {
    // the entry's OUTPUT plan is the before/after audit pair: every
    // stored-index scan must fetch cid alone (the x11 pin, held across
    // the repair round trip), and no audit-side documents scan may
    // drag text
    val plan = pipelinePlan("x12_index_repair")
    val scans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    val idx = scans.filter(_.contains("graft_x12_index_"))
    assert(idx.nonEmpty, plan)
    assert(idx.forall(_.contains("ReadSchema: struct<cid:")),
      idx.mkString("\n"))
    assert(scans.filterNot(_.contains("graft_x12_index_"))
      .forall(!_.contains("text")), scans.mkString("\n"))
    // the repair dataflow itself: the orphan-drop semi-join reads ONE
    // pruned corpus id column, and the backfill anti-join prunes the
    // index side to its id column — neither set operation drags payload
    val docs = graft.tables.Tables(spark, sf, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-x12-plan").toString
    graft.ops.Dedup.incrementalIndex(docs, "text", "doc_id")
      .write.mode("overwrite").parquet(dir)
    val repair = graft.ops.Profile.indexRepair(docs, "doc_id",
      spark.read.parquet(dir), "cid",
      u => graft.ops.Dedup.incrementalIndex(u, "text", "doc_id"))
    repair.collect()
    val rScans = repair.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0).linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    assert(rScans.exists(s => s.contains("documents") &&
      s.contains("ReadSchema: struct<doc_id:bigint>")),
      rScans.mkString("\n"))
    assert(rScans.exists(s => s.contains(dir.split("/").last) &&
      s.contains("ReadSchema: struct<cid:bigint>")),
      rScans.mkString("\n"))
  }

  test("x10: configs broadcast onto the checkpointed pair set — the " +
      "corpus is never crossed or shuffled") {
    val plan = pipelinePlan("x10_lsh_plan")
    // the verified pair set is a localCheckpoint (built by ONE
    // similarity join at the floor before this plan exists)
    assert(plan.contains("Scan ExistingRDD"), plan)
    // the only crosses are broadcast nested loops of the d(numHashes)
    // config table / the 1-row n_docs scalar — no real cartesian
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the corpus parquet appears ONLY under the n_docs count — the
    // pair join + jaccard re-derivation ran at checkpoint time
    // (count in the FINAL plan only; AQE toString repeats the tree)
    val scans = plan.split("== Initial Plan ==")(0).linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size === 1, plan)
    // S-curve folds collapse in one keyed aggregate with partials
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial_")), aggLines.mkString("\n"))
  }
}
