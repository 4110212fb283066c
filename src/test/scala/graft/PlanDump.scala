package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md — `explain("formatted")` dumps of headline queries for
  * plan review (run: `Test/runMain graft.PlanDump <outFile>`). */
object PlanDump {

  private val notes: Seq[(String, String)] = Seq(
    "q01_scan_filter" ->
      ("Filters and the 3-column projection reach the parquet scan " +
        "(PushedFilters / ReadSchema); the only exchange is the " +
        "rangepartitioning for the declared total-order ORDER BY."),
    "q06_three_way_join" ->
      ("Both dimension joins are BroadcastHashJoin — the customer fact " +
        "side is never shuffled for a join; the single hash exchange is " +
        "the final small group-by."),
    "q07_groupby_agg" ->
      ("Two HashAggregate nodes (partial_ then final): map-side combine " +
        "reduces the exchange to one row per (flag,status,partition)."),
    "q15_topk" ->
      ("TakeOrderedAndProject — per-partition top-10 then a driver merge; " +
        "no global sort at any scale."),
    "d02_minhash_dedup" ->
      ("The repartition(id) exchange below the signature projection is " +
        "computed once and reused (ReusedExchange) by both self-join " +
        "sides and the verification joins; only 24-byte (id,band) rows " +
        "and fixed-width signatures shuffle."),
    "d05_embedding_neardup" ->
      ("LSH band keys from the native LshBands expression; the candidate " +
        "self-join carries only (id, band_id, band_key) — embeddings " +
        "join back for exact cosine on candidates only."),
    "e01_cosine_topk" ->
      ("Query set broadcast; vec_cosine is a codegen expression inside " +
        "the scan-project stage; per-query top-k is the bounded-heap " +
        "udaf with partial aggregation — the exchange moves k rows per " +
        "(query, partition)."),
    "q21_correlated_subquery" ->
      ("Catalyst decorrelates the scalar count(*) subquery into a " +
        "left-outer aggregate join — one pass over orders, no per-row " +
        "re-execution."),
    "d04_ngram_jaccard" ->
      ("PPJoin candidate join: prefix index rows carry (rk, m) so the " +
        "length and positional filters prune inside the join; exact " +
        "jaccard verification touches only surviving pairs."),
    "q44_stat_aggs" ->
      ("stddev/var/corr/covar are declarative aggregates: partial_ " +
        "HashAggregate before the exchange, one moment-vector row per " +
        "(flag, partition) shuffles — never the raw 6M rows."),
    "q45_string_agg" ->
      ("collect_list keeps partial aggregation (ObjectHashAggregate with " +
        "partial_collect_list); sort_array makes the concatenation " +
        "deterministic without a global sort. Value lists are bounded by " +
        "group cardinality — the scale knob is the grouping key, not the " +
        "operator."),
    "q46_window_distribution" ->
      ("ntile/percent_rank/cume_dist share one Window node over a single " +
        "hashpartitioning(c_nationkey) exchange — keyed windows scale " +
        "horizontally (contrast q13's documented global-rank " +
        "anti-pattern demo)."),
    "q47_lateral_explode" ->
      ("posexplode is a Generate inside the scan's codegen stage — " +
        "row-local fan-out, no shuffle except the declared total-order " +
        "ORDER BY."),
    "q48_conditional_aggs" ->
      ("count_if/bool_and/bool_or/max_by/min_by all stay declarative in " +
        "partial+final HashAggregate (the round-2 2.9 s outlier was " +
        "codegen-cache eviction in the bench harness, not the plan — " +
        "fixed by spark.sql.codegen.cache.maxEntries=1000)."),
    "p03_pack_sequences" ->
      ("Shard assignment is a map-only md5 projection; the running-sum " +
        "window keys on shard, so packing parallelizes by shard count " +
        "with one hash exchange — the distributed form of the " +
        "inherently-sequential greedy packer."),
    "r01_resample_ffill" ->
      ("Gap rows come from ONE Generate: lag() hands each observation its " +
        "predecessor bucket and the run [prev+step .. bucket] explodes " +
        "row-locally (last element = the observation itself) — no grid " +
        "join, and the source scans ONCE (the earlier grid-join form " +
        "read it twice because per-branch column pruning kept the " +
        "exchanges from unifying). The fill window inherits the lag " +
        "window's hashpartitioning(user_id), so only two keyed exchanges " +
        "exist before the declared ORDER BY."),
    "t02_quality_score" ->
      ("All six curation signals come from ONE native text_stats " +
        "evaluation (ProjectExec subexpression elimination shares it " +
        "across the column extracts); map-only, zero shuffle beyond the " +
        "ORDER BY. The round-2 regexp_extract_all form re-evaluated its " +
        "regex subtrees under CollapseProject — replaced by the one-pass " +
        "expression."),
    "t06_gopher" ->
      ("All four repetition/diversity counts ride ONE native gopher_stats " +
        "hash-map pass (O(words), vs the HOF reference's O(words x " +
        "distinct) lambda sweep — measured 4x); map-only, the ratio layer " +
        "is arithmetic over the struct fields, zero shuffle beyond the " +
        "ORDER BY."),
    "t07_ngrams" ->
      ("Bigrams via zip_with over the shifted token list (no positional " +
        "element_at lambdas — 9x), Generate fans out in the scan stage, " +
        "partial_count combines map-side, and the top-20 is " +
        "TakeOrderedAndProject — the exchange carries (gram, partial " +
        "count) pairs, never the exploded stream."),
    "e03_quantize" ->
      ("One native quantize_int8 evaluation shared by all six column " +
        "extracts (fused max-abs + quantize loop); map-only — the 15x " +
        "over the four-sweep HOF form, and the operator shape that holds " +
        "at any corpus size."),
    "q49_interval_join" ->
      ("Equi-key user_id join with the time bound inside the join " +
        "condition: broadcast at fixture scale, one keyed shuffle per " +
        "side at 100 TB (never a cartesian — the range rides the hash " +
        "join). In streaming mode the identical code keys state by " +
        "user_id and the watermark + 1 h lookback bound state size."),
    "d06_canonical" ->
      ("Composes d02's banded MinHash clustering (ReusedExchange on the " +
        "signature projection) with one window over keep_id — the " +
        "canonical-selection shuffle carries (id, keep_id, n_chars) " +
        "triples, never text."),
    "t08_contamination" ->
      ("Both corpora reduce to inverted (fingerprint, id) pairs before " +
        "anything joins — the contamination join shuffles 16-byte rows " +
        "keyed by fingerprint (probe side broadcast at fixture scale), " +
        "text never moves; the count-shared aggregate is partial " +
        "map-side."),
    "q52_bloom_semi" ->
      ("The might_contain prefilter evaluates inside the fact scan's " +
        "codegen stage with the sketch as a plan literal — the shuffle " +
        "(and the exact semi join behind it) sees only the pruned " +
        "survivor fraction; sizing the filter wrong costs false-positive " +
        "rows, never correctness."),
    "p04_weighted_sample" ->
      ("Priority key is a map-only md5/weight projection; the global " +
        "ascending-key top-100 is TakeOrderedAndProject — per-partition " +
        "top-n then a driver merge, no global sort at any corpus size."),
    "t10_heavy_hitters" ->
      ("The naive form shuffles the whole token stream; here a one-pass " +
        "per-partition Misra-Gries summary (mapPartitions, k counters) " +
        "emits <= k candidates per partition — a provable superset of " +
        "every global heavy hitter — and the exact recount joins the " +
        "stream against the BROADCAST candidate set, so only candidate " +
        "tokens survive to the partial-aggregate exchange."),
    "p05_upsample_mix" ->
      ("Weight lookup is a literal map, the copy fan-out is " +
        "explode(sequence) — a Generate inside the scan's stage. The " +
        "operator is map-only (zero exchanges) at any corpus size; the " +
        "only shuffle in the inventory entry is its presentation " +
        "ORDER BY."),
    "x01_profile" ->
      ("Every column's count/nulls/distinct/min/max/sum-len computes in " +
        "ONE aggregation pass (Expand feeds the multi-count-distinct, " +
        "partials map-side); the per-column pivot is a literal-array " +
        "explode of the single result row — no join, no second scan."),
    "e04_matryoshka" ->
      ("Map-only per-vector pass; both sums of squares are let-bound " +
        "lambda variables so the conditional (when) branches re-use them " +
        "instead of re-running the fold — the t02 CollapseProject lesson " +
        "applied at design time."),
    "t11_token_rarity" ->
      ("Vocab is a partial-aggregated (token, freq) table (sublinear in " +
        "the corpus, Heaps' law); the join back is keyed by token " +
        "(broadcast at fixture scale) and the per-doc rollup keys on id " +
        "— two keyed shuffles, exact-integer outputs, no floats to " +
        "drift."),
    "d07_incremental" ->
      ("The increment shape: candidate generation joins DELTA bands " +
        "against CORPUS bands (cost ~ |delta| x collision rate, never " +
        "corpus²) and the exact layer filters corpus digests by the " +
        "delta's digest set BEFORE the min(cid) rollup, so the " +
        "aggregate runs over a delta-sized remainder; delta-derived " +
        "sides broadcast at fixture scale. ZERO repartition barriers " +
        "(PlanSpec-pinned): the band index and verify join need " +
        "different columns, so the d02 exchange-reuse device never " +
        "fires cross-set — each side is scanned per consumer instead " +
        "of shuffling (id, shingles, sig) corpus-wide. The corpus band " +
        "index is what a production pipeline keeps materialized " +
        "between increments."),
    "e21_indexed_ann" ->
      ("e02 through the STORED, cid-PARTITIONED IVF index: the probe " +
        "joins assignments on cid against the broadcast probed-list " +
        "set, so the scan carries a dynamicpruningexpression " +
        "(PlanSpec-pinned) — at scale each query's index read touches " +
        "nprobe lists' files, not the corpus. Centroids read whole " +
        "(nlist rows)."),
    "e22_ivf_append" ->
      ("Incremental index maintenance: ivfIndexAppend assigns the delta " +
        "to the RELEASED centroids (broadcast + bounded-heap argmax, " +
        "one (id,cid) row per delta vector on the exchange, the " +
        "embedding joins back id-keyed) and appends into the stored " +
        "cid-partitioned layout — only touched lists gain files. The " +
        "probe over the APPENDED directory still carries the " +
        "dynamicpruningexpression (PlanSpec-pinned): maintenance never " +
        "degrades the serving read to a full scan."),
    "e23_indexed_ivfpq" ->
      ("e07 through the STORED, cid-PARTITIONED codes table — the " +
        "compressed serving tier: the list-membership join carries a " +
        "dynamicpruningexpression on the codes scan and the ReadSchema " +
        "is (id, sub, code) + the partition column, never a vector " +
        "(both PlanSpec-pinned). The per-query ADC distance table " +
        "(|q|·m·|codebook| exact decimals) broadcasts; scoring is a " +
        "map-side join + one keyed partial-aggregated decimal sum per " +
        "(query, candidate); the cut is the bounded-heap top-k. At " +
        "rest the probe reads m small ints per candidate — memory and " +
        "I/O ∝ codes, not vectors."),
    "e24_ivfpq_append" ->
      ("Compressed-tier maintenance: ivfPqIndexAppend codes the delta " +
        "against the STORED codebook (broadcast; m bounded-heap " +
        "argmins per delta vector) and assigns lists by the released-" +
        "centroid argmax (one (id,cid) row per delta vector on the " +
        "exchange), appending schema-identical rows partition-wise. " +
        "The probe over the APPENDED directory still carries the " +
        "dynamicpruningexpression (PlanSpec-pinned)."),
    "t32_indexed_hybrid" ->
      ("ONE query, TWO stored index families, ZERO corpus scans " +
        "(PlanSpec pins all three on one plan): the lexical list keeps " +
        "In(t, ...) at the term-clustered postings scan, the dense " +
        "list keeps the dynamicpruningexpression on the cid-" +
        "partitioned assignments, and reciprocal-rank fusion folds the " +
        "two k-row lists — nothing corpus-sized enters the fusion."),
    "e26_pq_rerank" ->
      ("The production two-stage ANN plan: the compressed tier's " +
        "codes scan carries the DPP subquery and reads no vector " +
        "column; the refinement tier's raw-store scan carries the " +
        "SAME probed-lists DPP and materializes vectors only for " +
        "probed partitions, with the broadcast kCoarse candidate set " +
        "selecting rows map-side before any cosine runs. Exact-quality " +
        "top-k with the float32 tier cold."),
    "x13_release_audit" ->
      ("Release-wide freshness audit: five independent x11-shaped " +
        "audits — one per stored index family, each two pruned id " +
        "columns and one 8-byte-row full-outer join — unioned into " +
        "five tagged verdict rows. Nothing cross-family joins; the " +
        "release dashboard costs the sum of its members."),
    "x11_index_audit" ->
      ("Stored-index freshness audit: one pruned id column per side " +
        "(the index scan's ReadSchema is struct<cid> — never the " +
        "digest/shingle/signature payload; PlanSpec-pinned), distinct " +
        "aggregates with map-side partials, one full-outer join of " +
        "8-byte id rows, a 1-row verdict. The cheapest possible " +
        "statement about a 100 TB index's health."),
    "t29_indexed_contamination" ->
      ("t08 through the STORED inverted fingerprint table, PARTITIONED " +
        "BY fpb = pmod(fp, 64): the probe side (an eval set — small by " +
        "definition) broadcasts its fingerprints, the (fpb, fp) join " +
        "carries a dynamicpruningexpression on the stored scan " +
        "(PlanSpec-pinned), and the corpus text is never " +
        "re-fingerprinted at probe time — the contamination family's " +
        "compute-once/store/probe completion."),
    "t28_indexed_bm25" ->
      ("t20 through the STORED postings table: (t, id, tf, dl) rows — " +
        "doc length denormalized onto every posting, the Lucene norms " +
        "device — written range-clustered by term, so the probe's " +
        "In(t, ...) predicate is pushed into the scan (PlanSpec-pinned) " +
        "and reads the query terms' row groups. df falls out of the " +
        "pruned rows (one posting per (term, doc)); stats is one " +
        "broadcast row; the cut is TakeOrderedAndProject. The corpus " +
        "text is never re-tokenized at probe time."),
    "t30_bm25_append" ->
      ("Lexical index maintenance: bm25IndexAppend emits the delta " +
        "batch's posting rows (tokenize/count over the BATCH text only " +
        "— the released corpus is never re-tokenized) for a plain " +
        "append next to the release's term-clustered files, and " +
        "derived-rewrites the 1-row stats table as released ⊕ delta. " +
        "The probe over the APPENDED layout keeps In(t, ...) at the " +
        "scan (PlanSpec-pinned) — delta files prune by file-level " +
        "min/max until compaction restores the clustering."),
    "t31_contamination_append" ->
      ("Contamination index maintenance: contaminationIndexAppend " +
        "fingerprints the delta batch only (bucket modulus validated " +
        "against a stored 100-row sample — a mismatch would scatter " +
        "rows into wrong partitions permanently) and appends " +
        "partition-wise into the fpb layout — only touched buckets " +
        "gain files. The probe over the APPENDED directory still " +
        "carries the dynamicpruningexpression (PlanSpec-pinned)."),
    "x15_quantile_sketch" ->
      ("Mergeable rank statistics: one binning pass with map-side " +
        "combine builds the per-shard histogram rows; the stored " +
        "artifact reads back (bin, n)-pruned (PlanSpec-pinned), merges " +
        "by per-bin sums, and the quantile rule — exact-integer " +
        "ceil-rank over a cumulative window of ≤ nBins rows — never " +
        "touches data. The full-order exact column in the plan is the " +
        "oracle's gate device, not the production read."),
    "d19_bloom_prefilter" ->
      ("Membership pre-filter: the stored (w, bits) filter — 63 usable " +
        "bits per word so every shift is sign-safe on every engine — " +
        "broadcasts onto the batch's k-position rows (PlanSpec-pinned; " +
        "the filter fits in one packet, the candidates never shuffle " +
        "to meet it), the all-bits-set verdict aggregates per value, " +
        "and ONLY bloom hits enter the exact join. A miss is a " +
        "guaranteed non-member, so the composition equals the plain " +
        "corpus-wide join the oracle computes."),
    "x14_distinct_sketch" ->
      ("Mergeable cardinality: the only corpus-sized stage is the " +
        "(shard, hash) distinct with map-side partial aggregation; the " +
        "per-shard top-k runs as a two-level salted rank so no window " +
        "task ever ranks a shard's full hash set; downstream of the " +
        "stored artifact everything is O(shards·k) — the merge rank " +
        "and the 1-row estimate read one narrow column each " +
        "(PlanSpec-pinned single-column ReadSchemas)."),
    "p17_zorder_layout" ->
      ("The Z-order box probe: candidate buckets enumerate driver-side " +
        "from the 1-row bounds (closed-form Morton arithmetic — no " +
        "data read to plan), so the scan carries the zbucket INSET in " +
        "PartitionFilters (STATIC pruning at planning time, " +
        "PlanSpec-pinned) plus the pushed residual box predicate; " +
        "nothing but the layout's own directories is ever read."),
    "p18_zorder_append" ->
      ("The APPENDED layout's probe: delta rows clustered through the " +
        "STORED bounds land inside the same zbucket partition scheme, " +
        "so the box probe's plan is indistinguishable from p17's — " +
        "zbucket INSET in PartitionFilters (quadtree-enumerated, " +
        "O(nBuckets) driver work), pushed residual box predicate, and " +
        "only the layout's own directories read. Append ≡ rewrite is " +
        "the hash gate; this dump shows the PLAN is append-invariant " +
        "too."),
    "p19_zorder_repair" ->
      ("Probe over the REPAIRED layout: zorderRepair reconciled the " +
        "store with the corpus (orphans semi-joined out on one pruned " +
        "id column, unindexed rows clustered through the stored " +
        "bounds, write-verify-swap) — the probe plan is again the " +
        "p17 shape: zbucket INSET PartitionFilters, pushed residual " +
        "box predicate, only the layout's directories read."),
    "t34_model_append" ->
      ("Scoring from the FOLDED appended model: one token-keyed sum " +
        "over the counts store (map-side combined — same shape as an " +
        "un-appended model read), the totals ledger folds in two 1-row " +
        "aggregates, then t33's serving plan verbatim: broadcast " +
        "weights join, partial-aggregated per-doc sums, only the " +
        "held-out split read."),
    "t33_classifier" ->
      ("Stored-model scoring: the 26-step fixed-point binary-log runs " +
        "ONCE per vocabulary entry (aggregate-HOF folds — sequential " +
        "per-row state, no expression blowup), the vocab-sized weights " +
        "table broadcasts onto the corpus's exploded tokens " +
        "(PlanSpec-pinned: no SortMergeJoin), per-doc sums partial-" +
        "aggregate map-side, and the only documents read is the scored " +
        "split (pushed doc_id filter). The training corpus never " +
        "rescans at serving time."),
    "x12_index_repair" ->
      ("Acting on the x11 signals: indexRepair drops orphans by a " +
        "semi-join whose corpus side reads ONE pruned id column, " +
        "backfills unindexed docs through the family's own builder " +
        "(artifact derivation over the |unindexed| survivors only), " +
        "and the anti-join prunes the index side to struct<cid> " +
        "(PlanSpec-pinned both ways). Output plan = the before/after " +
        "audits, id-column-narrow like x11."),
    "d18_indexed_incremental" ->
      ("d07 through the STORED corpus index: the probe's three " +
        "corpus-side consumers read (cid,dig) / (cid,sig) / (cid,csh) " +
        "as separate column-pruned parquet scans (PlanSpec-pinned) — " +
        "the text-sized shingle column is fetched only by the verify " +
        "join, and the corpus text itself is never rescanned at probe " +
        "time. On this fixture AQE empty-relation propagation removes " +
        "the exact-digest branch outright (no digest crosses the cut)."),
    "d08_chunk_dedup" ->
      ("The hot-chunk set (doc-freq > threshold) is tiny by a " +
        "heavy-hitter bound, so the filtering join is a BROADCAST " +
        "left-anti — the exploded chunk stream never shuffles to be " +
        "filtered. Per-doc totals are size(chunk array) in the scan " +
        "projection (no count-only aggregation pass; AQE pushes joins " +
        "below repartition barriers, so the earlier ReusedExchange " +
        "design could not hold). The only keyed shuffles are the " +
        "frequency aggregate and the per-doc reassembly."),
    "e05_kmeans_assign" ->
      ("The Lloyd E-step at scale: centroids broadcast, vec_cosine " +
        "scores in the scan's codegen stage, and the argmax is the " +
        "bounded-heap aggregator with k=1 — ONE (id, cid, sim) row per " +
        "corpus vector rides the exchange; the embedding itself never " +
        "shuffles and the |corpus| x k score matrix never materializes."),
    "t12_pii_redact" ->
      ("Three codegen regexp_replace + three regexp_count per row in a " +
        "single projection — map-only, scan-bound at any corpus size; " +
        "the only exchange is the declared presentation ORDER BY."),
    "q53_stateful_totals" ->
      ("mapGroupsWithState in batch: one hashpartitioning(user_id) " +
        "exchange feeds MapGroups — state folding is per-group local. " +
        "In streaming mode the identical code keys state by user; " +
        "production pairs it with an event-time timeout to bound the " +
        "state store (scaladoc note in EventStreams)."),
    "d09_intradoc_dedup" ->
      ("Fully doc-local semantics, realized as a fully map-only plan: " +
        "first-occurrence selection runs INSIDE the row via two " +
        "let-bound local array sorts (by (chunk,pos), dedupe run heads, " +
        "back by pos) — no explode, no aggregation, no join; the only " +
        "exchange is the declared presentation ORDER BY. The cheapest " +
        "dedup-family member at any corpus size."),
    "p06_temperature_mix" ->
      ("The per-source rate table is one map-side-combined count " +
        "aggregate (rows = |sources|) broadcast back; the application " +
        "side is a broadcast-join lookup + explode — the corpus never " +
        "shuffles. All rate arithmetic is integer (DECIMAL(38,0) " +
        "intermediates) after one correctly-rounded sqrt, so the emitted " +
        "epoch is bit-identical on any engine."),
    "d10_transitive_clusters" ->
      ("d04's PPJoin pair generation feeds pointer-jumping label " +
        "propagation: each round is two id-keyed joins + one min-agg " +
        "over the PAIR set (tiny vs the corpus), label tables " +
        "localCheckpointed so lineage stays flat; O(log diameter) " +
        "rounds. The oracle is a DuckDB recursive reachability CTE — " +
        "23 gate docs differ from the one-hop assignment, so the " +
        "closure is genuinely exercised."),
    "t13_url_facts" ->
      ("URL parse + blocklist flag is one codegen regex projection per " +
        "row — map-only, scan-bound; the blocklist is a literal IN " +
        "(switch to a broadcast join past the literal threshold). The " +
        "only exchange is the declared presentation ORDER BY."),
    "d11_semdedup" ->
      ("SemDeDup: the pair join is equi-keyed on the cluster column " +
        "(id< and the cosine threshold ride in the join condition) — " +
        "the quadratic term is bounded by Σ cluster_size², the knob the " +
        "paper turns via k; embeddings ride one cluster-keyed exchange, " +
        "only sparse verified pairs move afterwards."),
    "p07_chunk_windows" ->
      ("Sliding-window chunking is chunk arithmetic over a let-bound " +
        "word array + one Generate (posexplode) — map-only, no shuffle " +
        "below the declared (id, chunk_ix) ORDER BY."),
    "e06_pq_assign" ->
      ("PQ assignment: codebooks broadcast; the corpus explodes m-fold " +
        "into dim/m subvectors scored map-side; the bounded-heap top-1 " +
        "aggregates partially, so the exchange moves one coded row per " +
        "subvector — never the |corpus|×|codebook| score matrix."),
    "t14_bigram_lm" ->
      ("Count-based LM scoring: unigram/bigram tables are keyed " +
        "partial-combined aggregations (deliberately NOT broadcast — " +
        "vocabulary grows with the corpus); the score joins are keyed " +
        "equi-joins on (w1) and (w1,w2); only the vocabulary-size " +
        "scalar broadcasts. Integer-only terms keep the result " +
        "hash-exact at any scale."),
    "e07_ivfpq_topk" ->
      ("IVF-PQ search: the probe set and per-query ADC distance tables " +
        "broadcast; the coded corpus (m small ints per vector) is the " +
        "only large input — scored by a map-side join, the m-term sum " +
        "partial-aggregates per (query, candidate), and the bounded-heap " +
        "top-k moves k rows per (query, partition). Memory ∝ codes, " +
        "never vectors — the billion-vector serving shape."),
    "m03_media_neardup" ->
      ("Histograms are map-side (payloads never shuffle). The pair join " +
        "deliberately does NOT key on format (4 distinct keys would " +
        "serialize the quadratic work onto 4 partitions): the probe side " +
        "hash-spreads on id with an EXPLICIT partition count — AQE's " +
        "input-size coalescing would fold the tiny pre-join exchange to " +
        "1 partition, which is wrong for a row-explosive join — and the " +
        "payload-free build side broadcasts. The double prescreen kills " +
        "~all pairs before the exact DECIMAL confirm."),
    "t16_readability" ->
      ("The three regex counts sit below a (id, 3 longs) repartition " +
        "exchange; the fixed-point ratio projection is above it — the " +
        "barrier stops CollapseProject from re-inlining the regex " +
        "subtrees into the CASE branches (the round-2 t02 hazard). Each " +
        "regex runs exactly once per document; the barrier rows are " +
        "~28 bytes/doc."),
    "e09_ivf_stats" ->
      ("Index introspection: the centroid set (nlist rows) broadcasts; " +
        "residuals are computed map-side and rounded to DECIMAL(18,9) " +
        "before the keyed aggregation, so the exchange moves (cid, " +
        "count, decimal) partials — full vectors never shuffle and the " +
        "decimal sums are order-free (hash-exact)."),
    "x03_split_leakage" ->
      ("Leakage audit: the verified pair set joins the (id, split) " +
        "projection twice — id-keyed shuffles of id+int rows, text " +
        "never moves; the k(k+1)/2 matrix is built from a distinct-" +
        "values cross join (k rows a side) and left-joins the counts " +
        "so zero rows survive."),
    "g01_host_pagerank" ->
      ("Iterative PageRank (final-round plan shown): each round is one " +
        "src-keyed join of the (node, long) rank table against the " +
        "checkpointed edge list + one dst-keyed partial-combined sum; " +
        "localCheckpoint per round keeps the lineage flat, so round N " +
        "plans over RDD scans, not an N-deep logical tree. Integer " +
        "fixed-point updates make the iterative result hash-exact."),
    "t17_novelty" ->
      ("Novelty is the PPJoin inverted-index shape: shingle rows are " +
        "(id, hash64) behind one repartition(id) exchange reused by the " +
        "df aggregation and the recount join; text never shuffles and " +
        "the df aggregation partial-combines map-side."),
    "e11_outliers" ->
      ("Outlier drill-down: centroids broadcast, residuals scored " +
        "map-side, and the bounded-heap top-k aggregates partially — " +
        "the exchange moves k rows per (list, partition), never the " +
        "corpus."),
    "q70_stream_sliding" ->
      ("Sliding windows expand each event to windowLength/slide state " +
        "rows INSIDE the aggregation operator (one keyed exchange, same " +
        "as tumbling) — the overlap multiplies state, not shuffles."),
    "r03_gap_report" ->
      ("Gap islands come straight from lag() pairs: one keyed " +
        "aggregation (distinct observed buckets) + one keyed window; no " +
        "Generate, nothing global — a key with years of downtime emits " +
        "one row."),
    "p09_curriculum" ->
      ("Curriculum positions reuse the bucket-offset device: the only " +
        "global window runs over the (quality, bucket) count table " +
        "(~tiers*256 rows); corpus rows see bucket-keyed windows and a " +
        "broadcast offset join only."),
    "q68_salted_join" ->
      ("Salted join: the salt column splits every hot key saltFactor " +
        "ways before the exchange; the replicated build side is " +
        "generated by an explode, and the final rollup restores " +
        "plain-join values exactly."),
    "m04_media_neardup_lsh" ->
      ("Media near-dup, AUTO-TIERED three ways by candidate-mass " +
        "probes: grid blocking on the two highest-CONDITIONAL-variance " +
        "normalized histogram coordinates (recall exactly 1 by the " +
        "per-coordinate √(2(1−t)) bound — the tier that fixed the " +
        "round-6 10×-data blowup), hyperplane LSH for angularly-diverse " +
        "features, broadcast brute when neither index cuts half the " +
        "pair work. The probes are bounded aggregates (cell counts, " +
        "band counts, format counts); the LSH mass is only computed " +
        "when the grid doesn't already win. Every tier verifies through " +
        "the identical exact decimal gate, so the probe changes cost, " +
        "never the answer. The plan below shows whichever tier the " +
        "fixture's data routed to."),
    "m05_indexed_media_neardup" ->
      ("Media near-dup through the STORED grid signature index: the " +
        "corpus side scans the sb-partitioned signature store (narrow " +
        "rows — payloads are read once ever, at release/ingestion), " +
        "the probe side histograms its own payloads map-side, 3×3-" +
        "replicates its cells (recall exactly 1) and equi-joins the " +
        "store on (sb, format, c1, c2); a batch-sized probe broadcasts " +
        "and arms sb dynamic partition pruning, the gate's corpus-" +
        "sized self-probe takes the explicitly-repartitioned shuffle " +
        "join (the AQE-coalesce exemption — narrow input, pair-" +
        "explosive output). The identical exact decimal gate decides " +
        "survivors, so storage moves cost, never the answer."),
    "d16_substring_dedup" ->
      ("Substring-level exact dedup: sliding 5-word anchors hash-join " +
        "on md5-60 prefixes (an equi-join on anchor keys — candidates " +
        "scale with true repeats, not corpus²), then doc-local interval " +
        "merge and reassembly ride let-bound array algebra inside one " +
        "projection per doc; the only corpus exchanges are the anchor " +
        "keyed join and the final ORDER BY."),
    "e19_lloyd_trace" ->
      ("Full Lloyd loop: each round is one narrow assignment pass " +
        "(broadcast centroids, bounded-heap argmax) + keyed partial-agg " +
        "update; centroid state lives driver-side (O(k·dim)) between " +
        "rounds, each round persists one generation and unpersists the " +
        "last, so the loop's lineage and memory stay flat. The plan " +
        "shows the final round's assignment shape."),
    "t25_perplexity_buckets" ->
      ("CCNet terciles: the corpus-sized plan is just checkpointed " +
        "scores → literal-CASE projection → output sort (pinned in " +
        "PlanSpec) — the two-phase histogram quantile that found the " +
        "boundary literals ran on bounded aggregates BEFORE this plan " +
        "exists, so no Window/Join/Aggregate can appear here."),
    "x08_threshold_sweep" ->
      ("Threshold sweep: ONE similarity join at the lowest candidate " +
        "threshold (checkpointed verified pairs), then a 5-row " +
        "broadcast theta join replicates PAIR rows — never the corpus — " +
        "and collapses into keyed aggregates; zero-pair thresholds " +
        "survive via the left joins."),
    "e20_nprobe_sweep" ->
      ("nprobe sweep: per-query centroid ranks from one bounded-heap " +
        "pass over the broadcast centroid table, one corpus scoring " +
        "pass at max(nprobes) (checkpointed), then each sweep row is a " +
        "crank filter + KEYED (nprobe, query) window re-rank; the brute " +
        "baseline runs once through the same TopKAggregator heap."),
    "g05_communities" ->
      ("Label propagation: the plan shows the final round's shape — one " +
        "dst-keyed join of the checkpointed label table against the " +
        "symmetrized edge list, a (node, label) count with map-side " +
        "partials, and a per-node min over (−count, label) structs (no " +
        "per-node window); superseded label generations are released " +
        "each round so the loop holds one generation live."),
    "q61_variant" ->
      ("parse_json evaluates ONCE per row: the extraction sits behind a " +
        "single-element explode, and predicates on a generator output " +
        "cannot be pushed below the Generate — written plainly, the " +
        "filter and projection each re-parse (PushDownPredicates + " +
        "CollapseProject re-inline any deterministic alias). Expect " +
        "Generate(explode) above the scan, Filter(k >= 50) above it, " +
        "and NO variant_get in the scan node."),
    "e12_hamming_topk" ->
      ("1-bit tier: signatures pack in the scan-project stage (SQL-HOF " +
        "arithmetic, whole-stage codegen); query signatures broadcast; " +
        "XOR+popcount scoring is map-side and the bounded-heap top-k " +
        "moves k rows per (query, partition) — the corpus side reads " +
        "two longs per row, never the float vector."),
    "p10_dsir" ->
      ("Feature explode is map-only; the bucket score table is <=256 " +
        "rows (map-side-combined counts, broadcast back); the per-doc " +
        "sum is one (id,bucket)-keyed partial aggregation then an " +
        "id-keyed sum — shuffles carry (id, bucket, count), never text."),
    "r04_rolling_zscore" ->
      ("One keyed window (user, ordered by ts+id) computes count/sum/" +
        "sumsq in a single Window node; the anomaly test is scalar " +
        "decimal algebra in the following project — key-count " +
        "parallelism, no global sort below the output ORDER BY."),
    "g02_degree_stats" ->
      ("Degree counts are node-keyed partial-aggregated counts; " +
        "reciprocity is one self-equi-join on the reversed (src,dst) " +
        "key — every shuffle carries 2-column edge rows; nothing " +
        "iterative, nothing global."),
    "x05_split_drift" ->
      ("One (split,bucket)-keyed count with map-side partials; the " +
        "histogram table (k x nBuckets rows) drives everything " +
        "downstream at broadcast size — corpus rows shuffle once, as " +
        "2-int rows."),
    "x06_class_balance" ->
      ("One label-keyed count with map-side partials; the k-row label " +
        "table cross-joins the single-row total as a broadcast — " +
        "shares and Gini are scalar decimal projections."),
    "q71_null_aware_anti" ->
      ("NOT IN over a nullable-schema column: plans as a null-aware " +
        "anti join in one pass over customer — no per-row subquery " +
        "re-execution."),
    "q73_agg_filter" ->
      ("FILTER (WHERE) aggregates stay in HashAggregate with partial_ " +
        "combine; the filtered count(DISTINCT) plans via Expand over " +
        "the single scan — no self-joins for the conditional branches."),
    "r05_sessionize" ->
      ("Gaps-and-islands sessionization: lag + running sum share ONE " +
        "Window node over one partition-by-user exchange — per-event " +
        "session ids with key-count parallelism, no generate, no join."),
    "r06_funnel" ->
      ("Per-step min-aggregations (map-side partial) chained by keyed " +
        "left joins with the strict-after predicate in the join " +
        "condition — k-1 key-sized joins, the event scan filtered to " +
        "one step before each aggregation."),
    "r07_cohort_retention" ->
      ("Integer epoch-week bucketing is map-only; first-week min, " +
        "(key,week) distinct and the (cohort,offset) count are all " +
        "partial-aggregated keyed exchanges of (long,long) rows."),
    "d12_minhash_quality" ->
      ("Signatures are one map-side HOF pass (k md5s per shingle); the " +
        "verified-pair joins carry signatures only for pair ids — " +
        "bounded by the pair set, not the corpus; estimator and exact " +
        "jaccard are computed in the same projection."),
    "x07_dedup_impact" ->
      ("d01's digest window feeds a source-keyed aggregation with " +
        "map-side partials — the only shuffles are the digest window's " +
        "hash exchange and the 20-row source rollup."),
    "g03_triangles" ->
      ("Degree-ordered orientation (compact-forward): every node's " +
        "out-degree is O(sqrt m), so the wedge self-join is O(m^1.5) on " +
        "any graph — hubs cannot blow up the intermediate; all shuffles " +
        "carry 2-3 column id tuples, the closing check is one equi-join."),
    "e14_kmeans_update" ->
      ("Assignment reuses e05's broadcast + bounded-heap top-1; the " +
        "M-step explodes vectors to (cid,dim,decimal) NARROW rows " +
        "feeding one partial-combined aggregation — the exchange " +
        "carries nlist*dim partials, never vectors."),
    "q77_distinct_on" ->
      ("One Window node (row_number) over one hash exchange keyed by " +
        "o_custkey, filter rk=1 — and Spark inserts WindowGroupLimit " +
        "on BOTH sides of the exchange, so each partition ships only " +
        "its per-key top row instead of the whole table."),
    "q79_interval_join_outer" ->
      ("Left-outer SortMergeJoin keyed on user_id with the interval " +
        "bound as join condition; count(non-null right key) makes the " +
        "null-joined row a 0 — in streaming the same shape bounds " +
        "state by watermark + lookback."),
    "d13_url_dedup" ->
      ("Canonicalization is a pure codegen expression chain (regex + " +
        "split/array_sort) in the scan stage; the only shuffles are " +
        "the canonical-key min-aggregation and its rejoin."),
    "d14_dedup_pipeline" ->
      ("The flagship composition: digest-window exchange (32-byte " +
        "keys), signature-only MinHash band join over exact survivors, " +
        "pointer-jumping rounds on the verified pair set only, one " +
        "keyed canonical window — nothing all-pairs, nothing collected."),
    "p11_pack_stats" ->
      ("packSequences' per-shard window feeds a (shard,bin)-keyed " +
        "HashAggregate with map-side partials — the report exchange " +
        "carries 4-long rows."),
    "t19_mojibake" ->
      ("Map-only: replace+length counting in one codegen projection " +
        "over the scan; the ppm arithmetic is exact integer DIV — no " +
        "shuffle except the presentation sort."),
    "t20_bm25_topk" ->
      ("The token explode partial-aggregates map-side into (id,term) " +
        "counts; df and corpus stats are broadcast (|terms|+1 rows) onto " +
        "the tf rows — the corpus never sits on a join build side; the " +
        "final top-k is TakeOrderedAndProject, never a global sort."),
    "e15_gram_matrix" ->
      ("All d(d+1)/2 products generate INSIDE each row (nested " +
        "transform over the quantized array — no self-join), so the " +
        "only exchange is the partial-aggregated d^2 running sums per " +
        "partition: fixed-size, independent of corpus row count."),
    "e16_pca_power" ->
      ("Only the LAST power step appears here — the mirrored Gram and " +
        "every earlier iterate are localCheckpointed (d^2-row " +
        "materializations that cut the corpus scan out of the 8-step " +
        "lineage); each step is a d^2-row join + d-row aggregate + a " +
        "broadcast single-row max. Nothing after the Gram accumulation " +
        "scales with the corpus."),
    "e17_gram_drift" ->
      ("Two independent e15-shaped Gram accumulations (in-row product " +
        "generation, partial aggregation); the full-outer diff join and " +
        "top-k run on <= d^2 rows — the sort-merge join this plan shows " +
        "joins two 2k-row aggregates, never corpus rows."),
    "t21_rrf_fusion" ->
      ("Both inputs are k-row lists before fusion: BM25's " +
        "TakeOrderedAndProject and the bounded-heap cosine top-k. The " +
        "fusion union/group-by/top-k moves |lists|*k rows; the one " +
        "single-partition window ranks 20 post-limit rows."),
    "t22_bpe_merges" ->
      ("Character pairs generate in-row (shifted zip inside the word " +
        "transform); the exchanges carry (pair) and (pair,id) partial " +
        "aggregates only — the corpus text never shuffles; the final " +
        "cut is TakeOrderedAndProject."),
    "t23_quote_containment" ->
      ("The probe side reduces to distinct (shingle, probe, size) rows " +
        "and broadcasts, so corpus shingles are consumed MAP-SIDE (no " +
        "corpus shuffle at all); the only exchange aggregates matched " +
        "(probe,doc) partial counts."),
    "p12_mixture_alloc" ->
      ("The only corpus-sized stage is the per-domain weight sum with " +
        "map-side combine; the water-filling closed form runs on a " +
        "domain-count-sized single-partition window and a broadcast " +
        "scalar join."),
    "t26_bpe_apply" ->
      ("BPE apply is one codegen'd bpe_segment projection per doc — " +
        "map-only, zero exchange below the declared output ORDER BY; " +
        "the merge table is baked into the expression, so nothing " +
        "broadcasts."),
    "p14_corpus_build" ->
      ("The capstone composition. Every fan-out stage output (verdicts, " +
        "token weights, split labels, dedup flags, the epoch plan, the " +
        "copy units) is localCheckpointed ONCE at build time, so this " +
        "final plan contains NO parquet re-scan of the corpus — the " +
        "report assembly unions narrow checkpointed (id, long) rows and " +
        "joins them id-keyed. The corpus text itself was touched by " +
        "exactly three operator families (verdict expressions, pair " +
        "generators, token counter), each during its own checkpoint " +
        "evaluation."),
    "x09_data_card" ->
      ("The data card is one partial-aggregated pass over the build " +
        "rows — count/sum/distinct with map-side combine, one exchange " +
        "of a single aggregate row."),
    "p13_epoch_plan" ->
      ("The allocation (domain-sized) broadcasts back onto the corpus; " +
        "the one corpus-sized exchange is the domain-keyed cumulative " +
        "window — packSequences' exact shape, no global sort."),
    "p15_shard_manifest" ->
      ("Release-shard manifest: p08's bucket-offset device — corpus " +
        "rows exchange ONCE keyed by the 256-value md5 bucket; the " +
        "only unkeyed window sorts the 256-row (count, weight) offset " +
        "aggregate, which then broadcasts back; positions and " +
        "cumulative weights are bucket-keyed windows, and the manifest " +
        "itself is a shard-keyed aggregation with map-side partials " +
        "(bit_xor is associative). No corpus-sized global sort exists " +
        "anywhere below the shard-count-sized output ORDER BY."),
    "x10_lsh_plan" ->
      ("LSH parameter planner: ONE similarity join at the floor " +
        "threshold builds the checkpointed verified-pair set (the x08 " +
        "shape); the only 'cross' is the broadcast divisor-count config " +
        "table replicated onto PAIR rows, never corpus rows; both " +
        "S-curve powers fold per-row inside codegen (iterated integer " +
        "floors over <= numHashes-step sequences) and collapse in one " +
        "keyed aggregate. The corpus is scanned for shingles and " +
        "pairs, shuffled never."),
    "p16_incremental_build" ->
      ("Incremental corpus build: every stage boundary is an eager " +
        "checkpoint with stats REBASED to the materialized blocks " +
        "(GraftCheckpoint.freshStats — inherited estimates compound " +
        "doubly-exponentially across checkpointed generations; facts " +
        "don't), so the report plan below reads ~14 small LogicalRDDs " +
        "and joins the delta-sized realization windows — no corpus " +
        "scan, no existing-build re-read beyond the three checkpointed " +
        "interface projections (eval ids, canonical ids, the 1-row " +
        "position offset that broadcasts onto delta units)."),
    "d17_planned_dedup" ->
      ("Planner-driven dedup: the x10 lshPlan surface is collected " +
        "(divisor-count rows — the only driver materialization) and " +
        "pickLsh's cheapest qualifying factorization plugs into " +
        "minHashLSHWith, so the plan below is d02's exact dataflow with " +
        "the band geometry chosen by the corpus's own verified pairs: " +
        "the repartition(id) signature exchange computed once and " +
        "reused by self-join sides and verification joins, band rows " +
        "and fixed-width signatures the only shuffled payloads. A " +
        "higher-recall shape only adds candidates, every candidate is " +
        "exactly verified — the planner moves cost, never answers."),
    "t27_bpe_train" ->
      ("The BPE trainer is driver-coordinated: per round, ONE native " +
        "wrapped_token_pairs projection over the checkpointed " +
        "wrapped-string state feeds a pair-keyed partial aggregation " +
        "whose argmax is a 1-row TakeOrdered collect; the adopted merge " +
        "rewrites the state in a literal-replace projection " +
        "(checkpointed, previous generation released). The plan below " +
        "is the returned merge TABLE (driver-built, O(nMerges) rows) — " +
        "the per-round corpus work never appears in one static plan by " +
        "construction, which is exactly the bounded-lineage design."))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/PLANS.md")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries (sf0.001, AQE on)\n\n")
    sb.append("Generated by `Test/runMain graft.PlanDump`. Each section: why\n")
    sb.append("this is the plan we want at 100 TB, then the formatted plan.\n")
    notes.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
