package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TopKAggregator}

/**
 * Approximate-nearest-neighbor search and embedding near-dup over an
 * `Array[Float]` embedding column.
 *
 * Three tiers:
 *  - `cosineTopK` — exact brute force: broadcast the (small) query set,
 *    one map-side pass over the corpus, per-query top-k via a bounded-heap
 *    Aggregator (map-side combine). The correctness baseline;
 *    O(|corpus| * |queries| * dim) but embarrassingly parallel and the
 *    exchange only ever moves k rows per (query, partition).
 *  - `ivfTopK` — inverted-file ANN: cluster corpus vectors by nearest
 *    centroid once, probe only the `nprobe` closest centroids per query,
 *    exact re-rank inside probed clusters. The 100 TB path: the scan cost
 *    drops by ~(nprobe/nlist) and centroid assignment is a broadcast join.
 *  - `cosineNearDup` — random-hyperplane LSH bucketing, then exact cosine
 *    verification inside buckets (embedding-space near-duplicate dedup).
 *
 * Vector math on the hot paths runs through native codegen Catalyst
 * expressions (graft.functions.VecCosine / LshBands — one JVM loop per
 * row); the `dot`/`norm`/`cosine` higher-order-function forms below are
 * kept as the reference semantics they were derived from (and for callers
 * without a session to register functions on). No UDFs, no driver collect.
 */
object Similarity {

  /** Dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0d), _ + _)

  /** L2 norm of an array column. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), _ + _))

  /** Cosine similarity of two array columns (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0d))
  }

  /**
   * Exact cosine top-k: for every query vector, the k most similar corpus
   * vectors. `queries` must be small enough to broadcast (it is hinted).
   */
  def cosineTopK(
      corpus: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      k: Int = 10): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("id"),
        GraftFunctions.vecCosine(col("vec"), col("qvec")).as("sim"))
    rankTopK(scored, k)
  }

  /** Per-query top-k via the bounded-heap Aggregator: partial aggregation
    * keeps k candidates per map task, so the exchange moves k rows per
    * (query, partition) — never the full |corpus|×|queries| score matrix
    * (a row_number window would shuffle every scored row). Output matches
    * the window form exactly: rk 1..k by (sim desc, id asc).
    *
    * Contract: the id column must be integral (it rides the aggregator's
    * (double, long) buffer; the output id is cast back to the input
    * width). Null sims — e.g. a null embedding on either side — are
    * dropped before aggregation, like the window form's implicit
    * NULLS LAST beyond rank k. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = scored.schema("id").dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"top-k id column must be an integral type, got $idType — the " +
        "bounded-heap aggregator buffers (score: double, id: long) pairs")
    heapRank(
      scored.filter(col("sim").isNotNull)
        .select(col("query_id"), col("id").cast(LongType).as("id"),
          col("sim").cast("double").as("score")),
      k, "sim", negateOut = false)
      .select(col("query_id"), col("rk"),
        col("id").cast(idType).as("id"), col("sim"))
  }

  /** Shared heap-rank tail for [[rankTopK]] and [[ivfPqTopK]]: rank a
    * (query_id, id: long, score: double) table DESC by score (ties id
    * asc) into (query_id, rk, id, `valCol`); `negateOut` restores the
    * sign when the caller negated a distance for the max-heap. */
  private def heapRank(scored: DataFrame, k: Int, valCol: String,
                       negateOut: Boolean): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(TopKAggregator.topK(k)(col("score"), col("id")).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .toDF("query_id", "__pos", "__pair")
      .select(col("query_id"),
        (col("__pos") + 1).cast("int").as("rk"),
        col("__pair._2").as("id"),
        (if (negateOut) col("__pair._1") * -1 else col("__pair._1"))
          .as(valCol))
      .orderBy(col("query_id"), col("rk"))

  /**
   * Hard-negative mining for contrastive/embedding training (the
   * in-batch-negatives upgrade used by DPR/SimCSE-style pipelines): for
   * every query vector, the k most-similar corpus vectors with a
   * DIFFERENT label — maximally confusable non-matches, the examples a
   * contrastive loss learns most from. Same engine as [[cosineTopK]]
   * (broadcast queries, codegen cosine, bounded-heap top-k — the
   * exchange moves k rows per (query, partition)); the label-exclusion
   * predicate rides in the join condition so excluded pairs are never
   * scored.
   */
  def hardNegatives(
      corpus: DataFrame, vecCol: String, idCol: String, labelCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      qLabelCol: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      col(labelCol).as("lbl"))
    val q = queries.select(col(qIdCol).as("query_id"),
      col(qVecCol).as("qvec"), col(qLabelCol).as("qlbl"))
    val scored = c.join(broadcast(q), col("lbl") =!= col("qlbl"))
      .select(col("query_id"), col("id"),
        GraftFunctions.vecCosine(col("vec"), col("qvec")).as("sim"))
    rankTopK(scored, k)
  }

  /**
   * IVF-style ANN. `centroids`: (centroid_id, centroid vector) — typically
   * k-means output; any deterministic partitioner works (the fixtures use
   * per-label means). Corpus vectors are assigned to their nearest centroid
   * (broadcast join, one pass); each query probes its `nprobe` nearest
   * centroids and re-ranks exactly within those lists.
   */
  def ivfTopK(
      corpus: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cent = centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"))

    val assigned = nearestCentroids(cent,
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
        col(idCol).as("__rid")), "vec", 1)
      .select(col("id"), col("vec"), col("cid"))

    probeAndRank(cent, assigned, queries, qVecCol, qIdCol, k, nprobe)
  }

  /**
   * IVF top-k over a corpus whose inverted-list assignment already exists
   * as a column (`listCol` — e.g. a clustering label computed upstream, the
   * common shape when the index is built once and queried many times).
   * Only the (few) query vectors do nearest-centroid probing; the corpus
   * side is a plain projection, which also makes the whole operator
   * deterministic end-to-end when the centroids are (see
   * [[minIdCentroids]]) — corpus assignment by nearest-centroid has
   * float-tie sensitivity at cluster boundaries that a precomputed label
   * does not.
   */
  def ivfTopKPartitioned(
      corpus: DataFrame, vecCol: String, idCol: String, listCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cent = centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"))
    val assigned = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      col(listCol).as("cid"))
    probeAndRank(cent, assigned, queries, qVecCol, qIdCol, k, nprobe)
  }

  /** Nearest-n centroid assignment as a bounded-heap aggregation: the
    * shuffle moves one aggregated row per input row (payload + n centroid
    * ids), not the |df| x |centroids| scored cross product a window
    * ranking would exchange — and the payload vector rides the shuffle
    * once, not once per centroid. Ties break by centroid id ascending
    * (TopKAggregator ordering). */
  private def nearestCentroids(
      cent: DataFrame, df: DataFrame, vc: String, n: Int): DataFrame = {
    val payload = df.columns.filter(_ != "__rid").toSeq
    val scored = df.crossJoin(broadcast(cent))
      .withColumn("csim", GraftFunctions.vecCosine(col(vc), col("cvec")))
    val aggs = payload.map(c => first(col(c)).as(c)) :+
      TopKAggregator.topK(n)(col("csim"), col("cid")).as("__top")
    scored.groupBy(col("__rid"))
      .agg(aggs.head, aggs.tail: _*)
      .select(payload.map(col) :+ explode(col("__top._2")).as("cid"): _*)
  }

  /** Probe `nprobe` nearest centroids per query, exact re-rank within the
    * probed inverted lists. */
  private def probeAndRank(
      cent: DataFrame, assigned: DataFrame,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val probed = nearestCentroids(cent,
      queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"),
        col(qIdCol).as("__rid")), "qvec", nprobe)
      .select(col("query_id"), col("qvec"), col("cid"))

    val scored = assigned.join(broadcast(probed), Seq("cid"))
      .select(col("query_id"), col("id"),
        GraftFunctions.vecCosine(col("vec"), col("qvec")).as("sim"))
    rankTopK(scored, k)
  }

  /**
   * Symmetric int8 quantization of an embedding column — the standard
   * storage/bandwidth lever for vector search at corpus scale (4x smaller
   * than float32, SIMD-friendly dot products). Per vector:
   * `scale = 127 / max|x|`, `q_i = floor(x_i * scale + 0.5)` (half-up,
   * spelled as floor(v+0.5) because SQL round() rounding modes differ
   * across engines while floor does not), all-zero vectors quantize to
   * zeros with scale 0. Map-only; emits the quantized array plus summary
   * scalars (min/max/sum/saturation count) that are exact integers — the
   * oracle-checkable projection.
   */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"),
        GraftFunctions.quantizeInt8(col(vecCol)).as("s"))
      .select(col("id"), col("s.scale").as("scale"), col("s.qvec").as("qvec"),
        col("s.q_min").as("q_min"), col("s.q_max").as("q_max"),
        col("s.q_sum").as("q_sum"), col("s.n_sat").as("n_sat"))
  }

  /**
   * Matryoshka truncation report (Kusupati et al., "Matryoshka
   * Representation Learning", NeurIPS'22): for each vector, the L2 norm
   * of its first `m` dimensions, the energy fraction the head retains
   * vs the full vector, and the first coordinate after renormalizing
   * the head — the quality check run before shipping truncated
   * embeddings to a cheaper index tier.
   *
   * Map-only, one pass per row; the two sums of squares are let-bound
   * (Shingles.let) so the `when` branches reference lambda variables
   * instead of re-evaluating the fold (conditional branches are outside
   * codegen subexpression elimination). Values round through
   * DECIMAL(12,6) — the e01-established cross-engine float parity path.
   */
  def matryoshka(df: DataFrame, vecCol: String, idCol: String,
                 m: Int): DataFrame = {
    require(m >= 1, s"matryoshka needs m >= 1, got $m")
    def sumSq(v: Column): Column =
      aggregate(v, lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
    def dec6(c: Column): Column = c.cast("decimal(12,6)").cast("double")
    val vc = col(vecCol)
    val s = Shingles.let(sumSq(slice(vc, 1, m))) { ssm =>
      Shingles.let(sumSq(vc)) { ssf =>
        struct(
          dec6(sqrt(ssm)).as("norm_m"),
          dec6(when(ssf > 0, ssm / ssf).otherwise(lit(0.0d))).as("energy"),
          dec6(when(ssm > 0,
            element_at(vc, 1).cast("double") / sqrt(ssm))
            .otherwise(lit(0.0d))).as("q1"))
      }
    }
    df.select(col(idCol).as("id"), s.as("s"))
      .select(col("id"), col("s.norm_m").as("norm_m"),
        col("s.energy").as("energy"), col("s.q1").as("q1"))
      .orderBy(col("id"))
  }

  /** HOF reference form of [[quantizeInt8]] — four lambda sweeps per
    * vector vs. the native expression's one fused loop; kept as the
    * equivalence oracle for QuantizeInt8Expr. */
  def quantizeInt8Hof(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val v = col(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    df.select(col(idCol).as("id"), v.as("vec"),
        when(maxAbs > 0, lit(127.0) / maxAbs).otherwise(lit(0.0)).as("scale"))
      .select(col("id"), col("scale"),
        transform(col("vec"),
          x => floor(x.cast("double") * col("scale") + 0.5).cast("int"))
          .as("qvec"))
      .select(col("id"), col("scale"), col("qvec"),
        array_min(col("qvec")).as("q_min"),
        array_max(col("qvec")).as("q_max"),
        aggregate(col("qvec"), lit(0L), (acc, q) => acc + q).as("q_sum"),
        size(filter(col("qvec"), q => abs(q) === 127)).as("n_sat"))
  }

  /**
   * K-means assignment step: every corpus vector mapped to its
   * nearest centroid by cosine (the Lloyd-iteration E-step, and the
   * partitioner used when sharding an embedding corpus across index
   * shards). Output: one row per corpus vector — (id, cid, sim), ties
   * broken by centroid id ascending.
   *
   * Scale design: the centroid set is broadcast (k is small by
   * construction); scoring is map-side codegen (`VecCosine`), and the
   * argmax runs through the bounded-heap Aggregator with k=1, so the
   * exchange moves one (id, cid, sim) row per corpus vector — never the
   * |corpus| x k scored matrix a row_number window would shuffle, and the
   * embedding itself never rides the shuffle at all.
   */
  def assignCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cent = centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"))
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(cent))
      .select(col("id"), col("cid"),
        GraftFunctions.vecCosine(col("vec"), col("cvec")).as("csim"))
      .filter(col("csim").isNotNull)
      .groupBy(col("id"))
      .agg(TopKAggregator.topK(1)(col("csim"), col("cid")).as("__top"))
      .select(col("id"),
        col("__top").getItem(0).getField("_2").as("cid"),
        col("__top").getItem(0).getField("_1").as("sim"))
  }

  /**
   * Lloyd M-step — the other half of the k-means iteration
   * [[assignCentroids]] starts: per (centroid, dimension), the member
   * count and coordinate mean of the assigned vectors. One
   * assign-update round is the training loop's unit of work; a caller
   * iterates assign→update to convergence.
   *
   * Engine parity: each coordinate casts float→double (exact) and
   * rounds to DECIMAL(18,9) BEFORE the order-free decimal SUM; the mean
   * is truncating 9-dp fixed point (`sum·1e9 DIV n`) — the e09 device,
   * so the update hash-verifies bit-for-bit where a float mean would
   * depend on summation order.
   *
   * Scale: assignment is the broadcast+bounded-heap e05 path; the
   * update explodes each vector to (cid, dim, decimal) rows — a dim×
   * fan-out of NARROW rows feeding one keyed aggregation with map-side
   * partials, so the exchange carries nlist×dim partial rows, not
   * vectors. No iteration inside the operator, no driver collects.
   */
  def kmeansUpdate(
      corpus: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame = {
    val assigned = assignCentroids(corpus, vecCol, idCol,
      centroids, cVecCol, cIdCol)
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    updateFromAssigned(assigned, vecs)
      .orderBy(col("cid"), col("dim"))
  }

  /** Shared M-step body behind [[kmeansUpdate]] and [[lloydTrace]]:
    * per-(cid, dim) member count + truncating 9-dp fixed-point mean over
    * an (id, cid) assignment joined back to (id, vec) coordinates.
    * Unordered (callers order). */
  private def updateFromAssigned(
      assigned: DataFrame, vecs: DataFrame): DataFrame =
    assigned.join(vecs, "id")
      .select(col("cid"), posexplode(col("vec")).as(Seq("dim", "x")))
      .select(col("cid"), col("dim"),
        col("x").cast("double").cast("decimal(18,9)").as("x9"))
      .groupBy(col("cid"), col("dim"))
      .agg(count(lit(1)).as("n_assigned"), sum(col("x9")).as("s9"))
      .select(col("cid"), col("dim"), col("n_assigned"),
        (expr("CAST(s9 * 1000000000 AS BIGINT) DIV n_assigned")
          .cast("double") / lit(1e9)).as("mean"))

  /**
   * Product-quantization assignment step (Jégou et al. 2011, "Product
   * Quantization for Nearest Neighbor Search", IEEE TPAMI): split each
   * vector into `m` contiguous subvectors and code each against a
   * per-subspace codebook by squared-L2 argmin. Output: one row per
   * (vector, subspace) — (id, sub, code, dist2) with ties broken by
   * code ascending; dist2 rounds through DECIMAL(10,4) (the
   * e01/e05-established cross-engine float parity path — the argmin
   * itself compares full-precision doubles computed with identical
   * arithmetic on both engines). Codebooks derive from `seeds`'
   * subvectors — deterministic and engine-reproducible for the same
   * reason as [[minIdCentroids]] (member vectors, no float
   * accumulation); a production index trains them with per-subspace
   * k-means instead.
   *
   * Scale design: the codebook broadcasts (m × |seeds| entries); the
   * corpus explodes m-fold but each exploded row carries only a dim/m
   * subvector, the scored cross product never shuffles (map-side
   * codegen + bounded-heap top-1 with partial aggregation), and the
   * exchange moves one (id, sub, code, dist2) row per subvector. PQ
   * codes cut vector storage from dim×4 bytes to m bytes — the
   * standard memory lever for billion-vector indexes.
   */
  def pqAssign(
      corpus: DataFrame, vecCol: String, idCol: String,
      seeds: DataFrame, sVecCol: String, sIdCol: String,
      m: Int, dim: Int): DataFrame =
    pqCodes(corpus, vecCol, idCol, seeds, sVecCol, sIdCol, m, dim)
      .select(col("id"), col("sub"), col("code"),
        col("d2").cast("decimal(10,4)").cast("double").as("dist2"))
      .orderBy(col("id"), col("sub"))

  /** Subvector explosion: (pos, slice) rows for `m` contiguous `sub`-dim
    * slices of an array column. */
  private def subvecs(vc: String, m: Int, sub: Int): Column =
    posexplode(transform(sequence(lit(0), lit(m - 1)),
      i => slice(col(vc), i * sub + 1, lit(sub))))

  /** Squared L2 distance of two array columns, accumulated in double with
    * (x−y)·(x−y) — not pow(·,2) — so the oracle can spell the identical
    * arithmetic and argmins stay engine-stable. */
  private def sumSqDiff(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0d), _ + _)

  /** Shared PQ coding pass behind [[pqAssign]] and [[ivfPqTopK]]:
    * (id, sub, code, d2) — the argmin codeword per (vector, subspace),
    * unordered. */
  private def pqCodes(
      corpus: DataFrame, vecCol: String, idCol: String,
      seeds: DataFrame, sVecCol: String, sIdCol: String,
      m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must split into m=$m equal subspaces")
    val sub = dim / m
    val cb = seeds
      .select(col(sIdCol).cast("long").as("code"), subvecs(sVecCol, m, sub))
      .toDF("code", "sub", "cvec")
    pqCodesFromBook(corpus, vecCol, idCol, cb, m, sub)
  }

  /** The coding core behind [[pqCodes]] and [[ivfPqIndexAppend]]: argmin
    * codeword per (vector, subspace) against an ALREADY-EXPLODED
    * codebook (code, sub, cvec) — the form a stored [[ivfPqIndex]]
    * codebook arrives in, so the append path codes against the release
    * artifact without re-deriving it from seed vectors. */
  private def pqCodesFromBook(
      corpus: DataFrame, vecCol: String, idCol: String,
      cb: DataFrame, m: Int, sub: Int): DataFrame = {
    val parts = corpus.select(col(idCol).as("id"), subvecs(vecCol, m, sub))
      .toDF("id", "sub", "svec")
    // negated squared L2 so the max-heap aggregator yields the argmin
    parts.join(broadcast(cb), Seq("sub"))
      .select(col("id"), col("sub"), col("code"),
        (sumSqDiff(col("svec"), col("cvec")) * -1).as("score"))
      // null scores (null embedding, or a vector shorter than `dim` —
      // zip_with pads the short side with nulls) drop before the
      // aggregation, same contract as rankTopK/assignCentroids
      .filter(col("score").isNotNull)
      .groupBy(col("id"), col("sub"))
      .agg(TopKAggregator.topK(1)(col("score"), col("code")).as("__top"))
      .select(col("id"), col("sub").cast("long").as("sub"),
        col("__top").getItem(0).getField("_2").as("code"),
        (col("__top").getItem(0).getField("_1") * -1).as("d2"))
  }

  /**
   * IVF-PQ top-k search (Jégou et al. 2011 §IV): the full modern ANN
   * serving stack — a coarse quantizer prunes the corpus to `nprobe`
   * inverted lists ([[ivfTopKPartitioned]]'s probe), and candidates are
   * scored by ASYMMETRIC DISTANCE (ADC): per query, a distance table of
   * squared L2 from each query subvector to every codeword is
   * precomputed, and a candidate's distance is the sum of m table
   * lookups over its PQ codes — the original vectors are never read
   * after coding. Output: (query_id, rk, id, dist) — approximated
   * squared L2, ascending, ties by id.
   *
   * Determinism/oracle parity: each distance-table entry rounds through
   * DECIMAL(18,9) BEFORE the per-candidate sum, so the m-term sum is
   * exact decimal arithmetic — order-independent and engine-identical
   * (a double sum's order would be scheduler-dependent); at this value
   * scale distinct decimals stay distinct as doubles, so the rank
   * comparison is stable too.
   *
   * Scale design: the coded corpus (m small ints per vector) is the
   * only large input; the probe set and the |queries|·m·|codebook|
   * distance tables broadcast; scoring is a map-side join + one keyed
   * partial-aggregated sum per (query, candidate); the bounded-heap
   * top-k moves k rows per (query, partition). This is the shape that
   * serves billion-vector indexes: memory ∝ codes, not vectors.
   */
  def ivfPqTopK(
      corpus: DataFrame, vecCol: String, idCol: String, listCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      seeds: DataFrame, sVecCol: String, sIdCol: String,
      m: Int, dim: Int, k: Int = 10, nprobe: Int = 2): DataFrame = {
    val (codes, codebook) =
      ivfPqIndex(corpus, vecCol, idCol, listCol, seeds, sVecCol, sIdCol,
        m, dim)
    ivfPqProbe(codes, centroids, cVecCol, cIdCol, codebook,
      queries, qVecCol, qIdCol, m, dim, k, nprobe)
    // the live composition IS the probe over the live index — one
    // construction (the d02/d07/t20 device), so e23's stored-path hash
    // gate certifies this operator's ADC arithmetic by identity
  }

  /**
   * Materializable IVF-PQ index state — the compressed serving tier of
   * the stored-index family (d18 dedup / e21 raw-vector IVF / t28 BM25 /
   * t29 contamination), and the layout that actually holds at 100 TB:
   * a billion float32×1024 vectors are ~4 TB hot, their PQ codes at
   * m = 4 are ~32 GB — the memory-∝-codes property that lets the probe
   * tier keep the WHOLE index in cluster memory while raw vectors stay
   * cold. Artifacts: `codes` = (id, sub, code, cid) — m rows per corpus
   * vector, each subspace's argmin codeword, with the coarse list id
   * DENORMALIZED onto every row (the t28 norms device: persisted
   * PARTITIONED BY cid, a probe prunes to its lists' files and needs no
   * corpus join at all — the raw vectors are never read after coding);
   * `codebook` = (code, sub, cvec) — the |seeds|·m codeword subvectors,
   * tiny and broadcast at probe time. Coarse centroids are the shared
   * IVF-family artifact ([[minIdCentroids]] / [[ivfIndex]]'s second
   * element), not duplicated here.
   *
   * Build cost (once per release): the PQ coding pass (broadcast
   * codebook argmin, one keyed exchange per (id, sub)) plus one
   * id-keyed join attaching the list id. Deterministic end to end —
   * seed codebooks and precomputed lists, no trained state — so the
   * stored index is bit-reproducible from the corpus.
   */
  def ivfPqIndex(
      corpus: DataFrame, vecCol: String, idCol: String, listCol: String,
      seeds: DataFrame, sVecCol: String, sIdCol: String,
      m: Int, dim: Int): (DataFrame, DataFrame) = {
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must split into m=$m equal subspaces")
    val sub = dim / m
    val codebook = seeds
      .select(col(sIdCol).cast("long").as("code"), subvecs(sVecCol, m, sub))
      .toDF("code", "sub", "cvec")
    (ivfPqCodesFromAssigned(corpus, vecCol, idCol, listCol, codebook,
      m, dim), codebook)
  }

  /**
   * Code an ALREADY-ASSIGNED vector set against a stored codebook into
   * (id, sub, code, cid) index rows — the composition device for
   * pipelines that computed the coarse assignment once and need the PQ
   * rows for the SAME vectors without a second argmax (e.g.
   * [[graft.streaming.VectorStreams]] appends a batch's raw IVF rows
   * AND its PQ codes: the centroid argmax runs once in
   * [[ivfIndexAppend]], and the codes here just join that output's
   * (id, cid)). [[ivfPqIndex]] is this applied to a release corpus
   * whose lists are a precomputed column.
   */
  def ivfPqCodesFromAssigned(
      assigned: DataFrame, vecCol: String, idCol: String, listCol: String,
      codebook: DataFrame, m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must split into m=$m equal subspaces")
    val sub = dim / m
    pqCodesFromBook(assigned, vecCol, idCol,
        codebook.select(col("code"), col("sub"), col("cvec")), m, sub)
      .select(col("id"), col("sub"), col("code"))
      .join(assigned.select(col(idCol).as("id"), col(listCol).as("cid")),
        Seq("id"))
      .select(col("id"), col("sub"), col("code"), col("cid"))
  }

  /**
   * Probe a stored [[ivfPqIndex]]: IVF-PQ top-k over the codes table
   * without touching raw vectors — the serving read of the compressed
   * tier. Per query: nearest-`nprobe` coarse centroids (broadcast
   * cosine argmax), the |query|·m·|codebook| ADC distance table
   * (broadcast, each entry rounded to DECIMAL(18,9) before summation —
   * the e07 exactness device), then the probed lists' code rows join
   * the broadcast table and partial-aggregate map-side into one decimal
   * sum per (query, candidate). Against a cid-partitioned codes table
   * the list-membership join carries a dynamic-partition-pruning
   * subquery (PlanSpec-pinned on the e23 entry), so a query reads its
   * `nprobe` lists' code FILES — at rest the read is m small ints per
   * candidate, never a vector. Output: (query_id, rk, id, dist) —
   * approximated squared L2 ascending, ties by id — identical to
   * [[ivfPqTopK]] by construction.
   */
  def ivfPqProbe(
      codes: DataFrame, centroids: DataFrame, cVecCol: String,
      cIdCol: String, codebook: DataFrame,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      m: Int, dim: Int, k: Int = 10, nprobe: Int = 2): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must split into m=$m equal subspaces")
    val sub = dim / m
    val cent = centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"))
    val probed = nearestCentroids(cent,
      queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"),
        col(qIdCol).as("__rid")), "qvec", nprobe)
      .select(col("query_id"), col("cid"))
    val qparts = queries
      .select(col(qIdCol).as("query_id"), subvecs(qVecCol, m, sub))
      .toDF("query_id", "sub", "qsvec")
    val dt = qparts
      .join(codebook.select(col("code"), col("sub"), col("cvec")),
        Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        sumSqDiff(col("qsvec"), col("cvec"))
          .cast("decimal(18,9)").as("d"))
    val dist = codes.join(broadcast(probed), Seq("cid"))
      .select(col("query_id"), col("id"), col("sub"), col("code"))
      .join(broadcast(dt), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d")).as("dist"))
    heapRank(
      dist.select(col("query_id"), col("id").cast("long").as("id"),
          (col("dist").cast("double") * -1).as("score"))
        .filter(col("score").isNotNull),
      k, "dist", negateOut = true)
  }

  /**
   * Two-stage compressed search — the production ANN serving shape
   * (Jégou et al. 2011 §V's re-ranking stage; what vector stores ship
   * as "PQ + refine"): the COMPRESSED tier ([[ivfPqProbe]]) nominates
   * `kCoarse` candidates per query from the stored codes — reading m
   * small ints per candidate, never a vector — and only those
   * candidates' RAW vectors are fetched for an exact-cosine re-rank to
   * the final `k`. This is how a 100 TB corpus serves exact-quality
   * top-k while keeping float32 vectors cold: the raw tier is touched
   * for |queries|·kCoarse rows per batch, not per-corpus.
   *
   * `raw` is the e21 assignment layout (id, vec, cid) — stored
   * PARTITIONED BY cid, so the refinement read is ALSO pruned: the raw
   * scan carries the probed-lists DPP subquery (candidates only come
   * from probed lists, so the filter loses nothing) and the broadcast
   * candidate join selects the kCoarse rows map-side — the raw
   * vector column is materialized only for probed-list rows and
   * cosine runs only on candidate matches. Output: (query_id, rk, id,
   * sim), cosine descending, ties by id — [[cosineTopK]]'s shape over
   * the candidate pool.
   *
   * Determinism: the candidate CUT is exact (ADC distances are exact
   * decimals, ties by id — engine-identical sets); the re-rank is the
   * e01/e02 cosine whose fixture margins are audited, and dropping
   * elements from a ranked pool only widens the gaps between the
   * survivors, so subset re-ranks inherit the global stability.
   */
  def ivfPqRerank(
      codes: DataFrame, centroids: DataFrame, cVecCol: String,
      cIdCol: String, codebook: DataFrame,
      raw: DataFrame,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      m: Int, dim: Int, k: Int = 10, kCoarse: Int = 50,
      nprobe: Int = 2): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    require(kCoarse >= k,
      s"kCoarse=$kCoarse must be >= k=$k — the refine stage can only " +
        "narrow the candidate pool")
    val cand = ivfPqProbe(codes, centroids, cVecCol, cIdCol, codebook,
        queries, qVecCol, qIdCol, m, dim, k = kCoarse, nprobe = nprobe)
      .select(col("query_id"), col("id"))
    val cent = centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"))
    val probed = nearestCentroids(cent,
      queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"),
        col(qIdCol).as("__rid")), "qvec", nprobe)
      .select(col("query_id"), col("qvec"), col("cid"))
    val scored = raw
      .select(col("id"), col("vec"), col("cid"))
      .join(broadcast(probed), Seq("cid"))
      .join(broadcast(cand), Seq("query_id", "id"))
      .select(col("query_id"), col("id"),
        GraftFunctions.vecCosine(col("vec"), col("qvec")).as("sim"))
    rankTopK(scored, k)
  }

  /**
   * Incremental maintenance for a stored [[ivfPqIndex]] — the append
   * path that keeps the compressed serving tier fresh between releases
   * (the [[ivfIndexAppend]] contract for the codes family): new vectors
   * code against the RELEASED codebook (the stored (code, sub, cvec)
   * artifact — never re-derived, never re-trained: queries build their
   * ADC tables BY it, so an append that re-coded old geometry would
   * silently shift every stored candidate's distance) and take their
   * coarse list from the RELEASED centroids by the same cosine argmax
   * as [[ivfIndexAppend]] (the e05/e22 rule, ties by cid). Emits rows
   * schema-identical to the stored (id, sub, code, cid) layout, ready
   * to `write.mode("append").partitionBy("cid")` — only the touched
   * lists' partitions gain files, and the probe's dynamic partition
   * pruning keeps working unchanged.
   *
   * Equivalence contract (spec-pinned, e24 hash gate): PQ codes are
   * per-vector facts (a pure function of the vector and the fixed
   * codebook) and the list assignment is the fixed-centroid argmax, so
   * append(codes, delta) ∪-equals the codes rebuilt from scratch over
   * corpus ∪ delta with delta lists from the same rule — a probe over
   * the appended stored index returns exactly what the rebuild would.
   * Caller contract: delta ids must be NEW ([[graft.ops.Profile
   * .indexAudit]] is the drift check) — a re-ingested id would score
   * twice per probed list.
   *
   * Scale: delta-sized throughout — the codebook and centroids
   * broadcast, coding is m bounded-heap argmins per delta vector, the
   * assignment exchange moves one (id, cid) row per delta vector, and
   * the write appends m·|delta| small-int rows into the touched
   * partitions.
   */
  def ivfPqIndexAppend(
      delta: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      codebook: DataFrame, m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must split into m=$m equal subspaces")
    val sub = dim / m
    val codes = pqCodesFromBook(delta, vecCol, idCol,
      codebook.select(col("code"), col("sub"), col("cvec")), m, sub)
      .select(col("id"), col("sub"), col("code"))
    val assigned =
      assignCentroids(delta, vecCol, idCol, centroids, cVecCol, cIdCol)
        // the argmax aggregator widens cid to long — restore the
        // released list-id type so append rows are schema-identical
        .select(col("id"),
          col("cid").cast(centroids.schema(cIdCol).dataType).as("cid"))
    codes.join(assigned, Seq("id"))
      .select(col("id"), col("sub"), col("code"), col("cid"))
  }

  /**
   * Sign-bit binary quantization: each embedding packs to ceil(dim/32)
   * 32-bit words (bit j of word w set iff coordinate 32w+j is > 0) — the
   * 1-bit tier of the quantization ladder (float32 → int8 [[quantizeInt8]]
   * → PQ codes [[pqAssign]] → sign bits): 32× smaller than float32, and
   * similarity becomes Hamming distance, i.e. XOR + popcount — the
   * binary-embedding retrieval trick (Charikar 2002 random-hyperplane
   * sketches with the identity basis; what vector stores ship as "binary
   * quantization"). Words stay below 2^32 so the packing is exact BIGINT
   * arithmetic on any engine — no sign-bit edge case at dim 64.
   *
   * Map-only. Output: (id, sig: array<bigint>).
   */
  def binaryQuantize(df: DataFrame, vecCol: String, idCol: String,
                     dim: Int): DataFrame =
    df.select(col(idCol).as("id"), binarySig(vecCol, dim).as("sig"))

  /** The packed sign-bit signature expression behind [[binaryQuantize]]
    * and [[hammingTopK]] — SQL-HOF form so the oracle can spell the
    * identical per-bit arithmetic. */
  private[ops] def binarySig(vecCol: String, dim: Int): Column = {
    require(dim >= 1, s"binarySig needs dim >= 1, got $dim")
    val words = (dim + 31) / 32
    // size guard first: under ANSI (Spark 4 default) an out-of-bounds
    // element_at THROWS, so a single truncated vector would abort the
    // whole job instead of being dropped by the caller's isNotNull
    // filter; short or null vectors signature to NULL instead
    expr(s"""IF(size($vecCol) >= $dim,
      transform(sequence(0, ${words - 1}), w ->
        aggregate(sequence(w * 32, least(w * 32 + 31, ${dim - 1})), 0L,
          (acc, i) -> acc + IF(element_at($vecCol, i + 1) > 0.0,
            shiftleft(1L, i % 32), 0L))),
      CAST(NULL AS ARRAY<BIGINT>))""")
  }

  /**
   * Hamming top-k over binary signatures: for every query, the k corpus
   * vectors with the fewest differing sign bits — the coarse-search stage
   * of a binary-quantized index (scan cost is a popcount per word vs a
   * float dot product; the standard serving pattern re-ranks the Hamming
   * candidates with full-precision vectors, which is [[cosineTopK]] over
   * the survivors). Distances are exact integers, so ranks hash-verify
   * bit-for-bit (ties break by id ascending — Hamming ties are common).
   *
   * Scale: same engine as [[cosineTopK]] — broadcast query signatures,
   * map-side XOR+popcount, bounded-heap top-k (the exchange moves k rows
   * per (query, partition)); the corpus side reads ceil(dim/32) longs
   * per row, never the float vector.
   */
  def hammingTopK(
      corpus: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      dim: Int, k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      binarySig(vecCol, dim).as("sig"))
    val q = queries.select(col(qIdCol).as("query_id"),
      binarySig(qVecCol, dim).as("qsig"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("id").cast("long").as("id"),
        aggregate(
          zip_with(col("sig"), col("qsig"),
            (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
          lit(0L), _ + _).as("ham"))
      .filter(col("ham").isNotNull)
      .select(col("query_id"), col("id"),
        (col("ham").cast("double") * -1).as("score"))
    heapRank(scored, k, "dist", negateOut = true)
      .withColumn("dist", col("dist").cast("bigint"))
  }

  /** Medoid-style centroids: the vector of the minimum-id member per label.
    * Fully deterministic AND bit-identical across engines (no float
    * accumulation — a mean's summation order perturbs low bits, which can
    * flip near-tie probe rankings between engines; a member vector cannot).
    * The centroid set an oracle can reproduce exactly. */
  def minIdCentroids(df: DataFrame, vecCol: String, idCol: String,
                     labelCol: String): DataFrame =
    df.groupBy(col(labelCol).as("cid"))
      .agg(min_by(col(vecCol), col(idCol)).as("cvec"))

  /**
   * Materializable IVF index state — the (assignments, centroids) pair a
   * vector-serving stack writes ONCE per corpus release and queries many
   * times: assignments `(id, vec, cid)` (one row per corpus vector with
   * its inverted-list id), centroids `(cid, cvec)` (the
   * [[minIdCentroids]] medoids — deterministic, so the stored index is
   * bit-reproducible from the corpus). Both parquet-native (long, float
   * array, label). [[ivfTopKPartitioned]] is the probe over either the
   * live pair or the parquet round trip — e21 pins that the stored path
   * returns byte-identical rankings to e02's live composition, under the
   * same index-blind oracle. At scale, persist assignments PARTITIONED
   * BY cid: each query touches `nprobe` lists, so a partition-pruned
   * read fetches only the probed lists' vectors — the d18 pattern
   * (column-pruned) upgraded to partition-pruned.
   */
  def ivfIndex(corpus: DataFrame, vecCol: String, idCol: String,
               listCol: String): (DataFrame, DataFrame) =
    (corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
       col(listCol).as("cid")),
     minIdCentroids(corpus, vecCol, idCol, listCol))

  /**
   * Incremental maintenance for a stored [[ivfIndex]] — the append path
   * that keeps the e21 serving index fresh between releases: assign NEW
   * vectors to the EXISTING centroids ([[assignCentroids]], the e05
   * step) and emit rows in the stored assignment schema (id, vec, cid),
   * ready to `write.mode("append").partitionBy("cid")` into the
   * released layout. Only the touched lists' partitions gain files;
   * nothing shipped is rewritten, and the probe's dynamic partition
   * pruning keeps working unchanged over the appended layout. The
   * fixed-centroid model is the production one: the centroid set is a
   * release artifact (queries probe BY it), so appends assign against
   * it and re-training waits for the next release — [[ivfStats]]'s
   * residuals and [[gramDrift]] are the staleness monitors that trigger
   * it.
   *
   * Equivalence contract (spec-pinned): under fixed centroids,
   * append(index, delta) ≡ the index built from scratch over
   * corpus ∪ delta with delta lists from the same nearest-centroid
   * rule — a probe over the appended stored index returns exactly what
   * the rebuild would.
   *
   * Scale: delta-sized throughout — centroids broadcast, scoring
   * map-side codegen, the argmax exchange moves one (id, cid) row per
   * delta vector (never the embedding: the vector joins back id-keyed
   * AFTER the aggregation, the [[assignCentroids]] device), and the
   * write appends |delta| rows into nlist partitions.
   */
  def ivfIndexAppend(
      delta: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame =
    assignCentroids(delta, vecCol, idCol, centroids, cVecCol, cIdCol)
      .select(col("id"), col("cid"))
      .join(delta.select(col(idCol).as("id"), col(vecCol).as("vec")),
        Seq("id"))
      // the argmax aggregator widens cid to long — restore the released
      // list-id type so append rows are schema-identical to the layout
      .select(col("id"), col("vec"),
        col("cid").cast(centroids.schema(cIdCol).dataType).as("cid"))

  /**
   * IVF index quality report — the introspection pass an ANN serving
   * stack runs over its inverted lists: per-list population, corpus
   * share, and mean squared-L2 residual to the list centroid (the
   * quantization-error signal that drives nlist re-tuning and re-training
   * decisions; a skewed share column is why probe-count heuristics fail).
   *
   * Engine parity: each per-vector residual is computed with the shared
   * `(x−y)·(x−y)` double accumulation and rounded to DECIMAL(18,9)
   * BEFORE the list SUM — decimal addition is exact and order-free, so
   * shuffle partial-aggregation order can't flip low bits (the e06/e07
   * device); share and mean are truncating integer fixed point (6/9 dp).
   *
   * Scale: one broadcast join (centroid set = nlist rows), one keyed
   * aggregation with map-side partials; full vectors never shuffle — the
   * exchange carries (cid, count, decimal) partials only.
   */
  def ivfStats(corpus: DataFrame, vecCol: String, idCol: String,
               listCol: String, centroids: DataFrame, cVecCol: String,
               cIdCol: String): DataFrame = {
    val cent = centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"))
    val per = corpus
      .select(col(listCol).as("cid"), col(vecCol).as("vec"))
      .join(broadcast(cent), "cid")
      .select(col("cid"),
        sumSqDiff(col("vec"), col("cvec")).cast("decimal(18,9)").as("r9"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("r9")).as("__sumr"))
    val tot = per.agg(sum(col("n_vectors")).as("__total"))
    per.crossJoin(broadcast(tot))
      .select(col("cid"), col("n_vectors"),
        expr("CAST(n_vectors * 1000000 DIV __total AS DOUBLE) / 1e6")
          .as("share"),
        expr("CAST(CAST(__sumr * 1000000000 AS BIGINT) DIV n_vectors " +
          "AS DOUBLE) / 1e9").as("mean_sq_residual"))
      .orderBy(col("cid"))
  }

  /**
   * Embedding outlier report: the k vectors FARTHEST from their list
   * centroid, per list — the mislabel/noise candidates a data-cleaning
   * pass reviews first (the per-vector drill-down of [[ivfStats]]'s
   * mean residual). Residuals rank by the shared `(x−y)·(x−y)` double
   * (bit-identical across engines), ties by id ascending; the output
   * residual rounds to DECIMAL(12,6) for hash parity.
   *
   * Scale: broadcast centroid join + the bounded-heap top-k aggregator —
   * the exchange moves k rows per (list, partition), never the corpus.
   */
  def embeddingOutliers(corpus: DataFrame, vecCol: String, idCol: String,
      listCol: String, centroids: DataFrame, cVecCol: String,
      cIdCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(k >= 1, s"embeddingOutliers needs k >= 1, got $k")
    val idType = corpus.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"embeddingOutliers id column must be an integral type, got " +
        s"$idType — the bounded-heap aggregator buffers (double, long)")
    val cent = centroids.select(col(cIdCol).as("query_id"),
      col(cVecCol).as("cvec"))
    val scored = corpus.select(col(listCol).as("query_id"),
        col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .join(broadcast(cent), "query_id")
      .select(col("query_id"), col("id"),
        sumSqDiff(col("vec"), col("cvec")).as("score"))
      .filter(col("score").isNotNull)
    heapRank(scored, k, "residual", negateOut = false)
      .withColumnRenamed("query_id", "cid")
      // DECIMAL(38,6): same 6-dp parity guard as (12,6) but with the
      // headroom a residual can actually need — Spark's non-ANSI cast
      // nulls on overflow while DuckDB's throws, so a narrow precision
      // would make the engines diverge exactly on the extreme rows an
      // OUTLIER report exists to surface
      .withColumn("residual",
        col("residual").cast("decimal(38,6)").cast("double"))
      .withColumn("id", col("id").cast(idType))
      .orderBy(col("cid"), col("rk"))
  }

  /**
   * ANN recall@k — the standard quality harness for an approximate
   * index: per query, |approx ∩ exact| / k against the brute-force
   * ground truth ([[cosineTopK]] vs [[ivfTopK]]/[[ivfPqTopK]] results).
   * This is the number an index owner trades against probe cost when
   * tuning nprobe/nlist (pairs with [[ivfStats]], which explains WHY
   * recall dropped — skewed lists, fat residuals).
   *
   * Inputs are any two (query_id, id) result sets; queries missing from
   * `approx` surface as recall 0, not as absent rows. Recall is 6-dp
   * truncating fixed point (n_hits·10⁶ DIV k) — hash-exact.
   *
   * Scale: one (query_id, id)-keyed equi-join of two k·|queries|-row
   * sets + one tiny aggregation — independent of corpus size.
   */
  def annRecall(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"annRecall needs k >= 1, got $k")
    val ex = exact.select(col("query_id"), col("id"))
    val ap = approx.select(col("query_id"), col("id"))
    val hits = ex.join(ap, Seq("query_id", "id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    ex.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall",
        expr(s"CAST(n_hits * 1000000 DIV $k AS DOUBLE) / 1e6"))
      .orderBy(col("query_id"))
  }

  /**
   * IVF nprobe tuning sweep — e10's recall number swept across the knob
   * that actually trades recall for cost: one row per candidate `nprobe`
   * with the candidate rows scored (the cost axis), the exact-top-k hits
   * summed over the query set, and recall@k in ppm (the quality axis).
   * This is the curve an ANN deployment reads before fixing nprobe; a
   * single-point recall (e10) can't show where the curve saturates.
   *
   * Scale design, the x08 sweep device in ANN form: the corpus is scored
   * ONCE against the union of probed lists at max(nprobes) — per-query
   * centroid ranks come from one bounded-heap pass over a broadcast
   * centroid table, and the scored candidate set (query_id, crank, id,
   * sim) is checkpointed. Every sweep row is then a `crank <= nprobe`
   * filter over those candidates (a probed-at-2 list is a subset of
   * probed-at-4 by construction), re-ranked per (nprobe, query) in a
   * KEYED window — the corpus never re-joins, and the brute-force
   * baseline runs once. Determinism: engine-stable full-rank centroid
   * ordering needs adjacent-rank margins above float noise — measured
   * ≥ 3.4e-4 on the fixtures across ALL ranks (the e02 top-3 margin
   * argument, extended), so the candidate sets are oracle-checkable.
   */
  def nprobeSweep(
      corpus: DataFrame, vecCol: String, idCol: String, listCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String,
      k: Int = 5, nprobes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(_ >= 1),
      s"nprobeSweep needs positive nprobe candidates, got $nprobes")
    GraftFunctions.register(corpus.sparkSession)
    val spark = corpus.sparkSession
    import spark.implicits._
    val maxP = nprobes.max
    val cent = centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"))
    val probed = queries
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"))
      .crossJoin(broadcast(cent))
      .withColumn("csim", GraftFunctions.vecCosine(col("qvec"), col("cvec")))
      .groupBy(col("query_id"))
      .agg(first(col("qvec")).as("qvec"),
        TopKAggregator.topK(maxP)(col("csim"), col("cid")).as("__top"))
      .select(col("query_id"), col("qvec"), posexplode(col("__top._2")))
      .toDF("query_id", "qvec", "crank0", "cid")
      .select(col("query_id"), col("qvec"),
        (col("crank0") + 1).as("crank"), col("cid"))
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col(listCol).as("cid"))
      .join(broadcast(probed), Seq("cid"))
      .select(col("query_id"), col("crank"), col("id"),
        GraftFunctions.vecCosine(col("vec"), col("qvec")).as("sim"))
      .localCheckpoint(true)
    val nQueries = queries.select(col(qIdCol)).distinct().count()
    val pDf = nprobes.distinct.sorted.toDF("nprobe")
    val cand = scored.join(broadcast(pDf), col("crank") <= col("nprobe"))
    val counts = cand.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_candidates"))
    val exact = cosineTopK(corpus, vecCol, idCol,
        queries, qVecCol, qIdCol, k)
      .select(col("query_id"), col("id"))
    val hits = cand.filter(col("sim").isNotNull)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("nprobe"), col("query_id"))
          .orderBy(col("sim").desc, col("id"))))
      .filter(col("rk") <= k)
      .join(exact, Seq("query_id", "id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("sum_hits"))
    pDf.join(counts, Seq("nprobe"), "left")
      .join(hits, Seq("nprobe"), "left")
      .select(col("nprobe"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("sum_hits"), lit(0L)).as("sum_hits"),
        expr(s"1000000L * coalesce(sum_hits, 0L) div " +
          s"${k.toLong * math.max(nQueries, 1L)}L").as("recall_ppm"))
      .orderBy(col("nprobe"))
  }

  /**
   * nprobe × nlist tuning surface (the e20 extension): the deployment
   * decision is two-dimensional — how many inverted lists to build AND
   * how many to probe — and a single-nlist curve can't show that a
   * coarser index at higher nprobe often dominates a finer one at lower
   * (same candidate mass, better recall). Each `(nlist, listCol)` config
   * runs [[nprobeSweep]]'s one-scoring-pass sweep against its own
   * min-id-member centroids ([[minIdCentroids]] — a member vector, so
   * the centroid itself adds no float noise) and the rows union with an
   * `nlist` tag: one extra scoring pass per extra nlist value, never a
   * re-join per (nlist, nprobe) cell. For a config with fewer lists than
   * max(nprobes) the high-nprobe rows saturate at the full corpus — the
   * curve's visible ceiling, kept (not dropped) so the surface is
   * rectangular.
   */
  def nprobeNlistSweep(
      corpus: DataFrame, vecCol: String, idCol: String,
      listConfigs: Seq[(Int, String)],
      queries: DataFrame, qVecCol: String, qIdCol: String,
      k: Int = 5, nprobes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(listConfigs.nonEmpty, "nprobeNlistSweep needs >= 1 list config")
    listConfigs.map { case (nl, lc) =>
      nprobeSweep(corpus, vecCol, idCol, lc, queries, qVecCol, qIdCol,
        minIdCentroids(corpus, vecCol, idCol, lc), "cvec", "cid",
        k, nprobes)
        .withColumn("nlist", lit(nl.toLong))
    }.reduce(_.unionByName(_))
      .select(col("nlist"), col("nprobe"), col("n_candidates"),
        col("sum_hits"), col("recall_ppm"))
      .orderBy(col("nlist"), col("nprobe"))
  }

  /** Per-label mean vectors — a deterministic centroid set for `ivfTopK`
    * when a clustering column already exists. */
  def labelCentroids(df: DataFrame, vecCol: String, labelCol: String): DataFrame =
    // element-wise mean, shuffle-friendly: explode to (label, dim_idx, x),
    // partial-aggregated avg per (label, idx), re-assemble ordered by idx.
    df.select(col(labelCol).as("cid"), posexplode(col(vecCol)))
      .toDF("cid", "idx", "x")
      .groupBy(col("cid"), col("idx"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("m")))),
        s => s.getField("m")).as("cvec"))

  /**
   * Embedding-cosine near-duplicate detection: LSH bucket candidates, exact
   * cosine verify >= `threshold`, one-hop min-id cluster rep per vector —
   * same output shape as the text dedup family (id, keep_id, is_dup).
   *
   * Scale design: the banded index carries only (id, band_id, band_key) —
   * vectors never ride through the candidate self-join or its distinct, so
   * the big shuffle moves 24-byte rows, not embeddings. Vectors are joined
   * back for exact verification of the (much smaller) candidate set. Band
   * keys are `rowsPerBand`-bit (default 8 → 256 buckets per band): for a
   * near-dup at cosine 0.97 a sign bit agrees w.p. ~0.92, so an 8-bit band
   * matches w.p. ~0.52 and 6 bands give ~99% recall, while random pairs
   * collide w.p. 2^-8 per band — candidate count stays ~linear in n.
   * `dim` is retained for API stability; the plane matrix is derived from
   * the observed vector length.
   */
  def cosineNearDup(
      corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
      threshold: Double = 0.95, planes: Int = 48, rowsPerBand: Int = 8): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // exchange barrier so both self-join sides reuse one computation of
    // the hyperplane signatures per vector.
    val banded = vecs.select(col("id"),
        posexplode(GraftFunctions.lshBands(col("vec"), planes, rowsPerBand)))
      .toDF("id", "band_id", "band_key")
      .repartition(col("band_id"), col("band_key"))

    val cand = banded.as("l").join(banded.as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    val verified = cand
      .join(vecs.as("a"), col("id_a") === col("a.id"))
      .join(vecs.as("b"), col("id_b") === col("b.id"))
      .select(col("id_a"), col("id_b"),
        GraftFunctions.vecCosine(col("a.vec"), col("b.vec")).as("sim"))
      .filter(col("sim") >= threshold)

    Dedup.minNeighborReps(vecs.select(col("id")), verified)
  }

  /**
   * SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — "SemDeDup:
   * Data-efficient learning at web-scale through semantic
   * deduplication"): embedding-space deduplication restricted to
   * within-cluster pairs. The paper's two-stage shape: k-means the
   * corpus (here: any precomputed cluster column — `assignCentroids`
   * output, or the fixtures' `label`), then compare pairwise cosine
   * ONLY inside each cluster and drop all but one member of every
   * near-duplicate group. Output matches the dedup family:
   * (id, keep_id, is_dup) with the one-hop min-id representative.
   *
   * Scale design: the quadratic term is Σ cluster_size², the knob the
   * paper itself turns (more clusters → smaller c_i); the self-join is
   * cluster-keyed and co-partitioned behind ONE `repartition(cl)`
   * exchange that both sides reuse (ReusedExchange), so each embedding
   * rides exactly one shuffle, scoring is map-side codegen
   * (`VecCosine`), and only the sparse verified pair set (24-byte rows)
   * moves afterwards. A runaway cluster is the known failure mode —
   * cap cluster sizes in the upstream clustering, not here.
   */
  def semDedup(
      corpus: DataFrame, vecCol: String, idCol: String, clusterCol: String,
      threshold: Double = 0.95): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val vecs = corpus.select(col(clusterCol).as("cl"), col(idCol).as("id"),
        col(vecCol).as("vec"))
      .repartition(col("cl"))
    val verified = vecs.as("a").join(vecs.as("b"),
        col("a.cl") === col("b.cl") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        GraftFunctions.vecCosine(col("a.vec"), col("b.vec")).as("sim"))
      .filter(col("sim") >= threshold)
    Dedup.minNeighborReps(vecs.select(col("id")), verified)
  }

  /**
   * Uncentered Gram (second-moment) matrix of the embedding corpus:
   * for every dimension pair i ≤ j, n and Σ_v v[i]·v[j] — the d×d
   * statistic behind whitening, PCA (power iteration / eigendecomp of
   * XᵀX), and embedding-drift monitoring between corpus snapshots.
   *
   * Exactness: coordinates quantize once through the e14-established
   * float→double→DECIMAL cast, at 6 dp (×1e6 — NOT e14's 9 dp: the
   * coarser scale keeps the accumulated integer under 2^53, see below),
   * so every product is an exact ×1e12 integer and the sum is
   * order-free. The edge cast back to natural units is then EXACT —
   * a < 2^53 integer converts to double losslessly on any engine — so
   * results hash-verify bit-for-bit with no rounding-mode assumptions.
   * (A ×1e9 quantization was measured to differ from DuckDB in the
   * last ulp: its HUGEINT→DOUBLE cast is not correctly rounded, and
   * integral-division workarounds founder on DIV-vs-// semantics for
   * negative sums — truncation in Spark, floor in DuckDB.) The 2^53
   * envelope holds while Σ|v[i]·v[j]| ≤ ~9e3 in natural units, i.e.
   * ~10^7 unit-normalized rows per statistic; past that, coarsen the
   * quantization — the knob trades reported precision for range.
   *
   * Scale design: the d·(d+1)/2 products are generated INSIDE each row
   * (nested sequence/transform over the quantized array — map-side,
   * codegen, no self-join), so the only shuffle is the partial-agg of
   * d² running sums per partition: a fixed ~d²·24-byte exchange
   * independent of corpus size. At d=1024 that is ~12 MB per partition
   * — still broadcast-class; past that, tile the dimension range. A
   * corpus-keyed self-join formulation (the oracle's shape) would
   * shuffle n·d rows instead — that is the anti-pattern this layout
   * avoids.
   */
  def gramMatrix(corpus: DataFrame, vecCol: String, idCol: String): DataFrame =
    gramIntUpper(corpus, vecCol)
      // the accumulated integer is < 2^53, so this cast is lossless —
      // both engines produce the identical double
      .select(col("dim_i"), col("dim_j"), col("n_vecs"),
        (col("g").cast("double") / lit(1e12)).as("gram"))
      .orderBy(col("dim_i"), col("dim_j"))

  /** Integer upper-triangle Gram core shared by [[gramMatrix]],
    * [[pcaPowerIteration]] and [[gramDrift]]: (dim_i ≤ dim_j, n_vecs,
    * g = Σ xi·xj) with coordinates 6-dp-quantized to ×1e6 BIGINT. The
    * d(d+1)/2 products generate in ONE native loop per row
    * (graft_gram_products — the HOF reference form below is
    * equivalence-tested in VectorExpressionsSpec); pure BIGINT products:
    * |xi| ≤ a few 1e6 under the documented envelope, so xi·xj ≤ ~1e13
    * and the sum < 2^53, no decimal widening needed. */
  private def gramIntUpper(corpus: DataFrame, vecCol: String): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus
      .filter(col(vecCol).isNotNull)
      .select(explode(GraftFunctions.gramProducts(col(vecCol))).as("p"))
      .select(col("p.dim_i"), col("p.dim_j"), col("p.prod"))
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("prod")).as("g"))
  }

  /** HOF reference form of the [[gramIntUpper]] product stage — the
    * semantics `graft_gram_products` must reproduce bit-for-bit; kept
    * for the VectorExpressionsSpec equivalence gate. */
  private[graft] def gramProductsHof(corpus: DataFrame, vecCol: String): DataFrame =
    corpus
      .filter(col(vecCol).isNotNull)
      .select(expr(
        s"""transform(`$vecCol`, x ->
              CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) * 1000000
                   AS BIGINT))""").as("xi"))
      .select(explode(expr(
        """flatten(transform(sequence(0, size(xi) - 1), i ->
             transform(sequence(i, size(xi) - 1), j ->
               struct(i AS dim_i, j AS dim_j, xi[i] * xi[j] AS prod))))"""))
        .as("p"))
      .select(col("p.dim_i"), col("p.dim_j"), col("p.prod"))

  /**
   * Embedding-drift report between two corpus snapshots: per dimension
   * pair, the per-vector mean second moment of each snapshot and the
   * absolute drift between them — the e15 Gram put to its monitoring use
   * ("did the embedding distribution move between last month's corpus
   * and this month's?"; a retrain/re-index trigger). Top-k most-drifted
   * pairs, exact integers end to end.
   *
   * Means are per-vector (g DIV n, truncating — the e14 device, mirrored
   * sign/abs in the DuckDB oracle) so snapshots of different sizes
   * compare directly; a dim pair absent from one side reports n = 0 and
   * mean 0.
   *
   * Scale design (100 TB): two independent Gram accumulations (each
   * in-row product generation + the fixed d² partial-sum exchange — see
   * [[gramMatrix]]); the join/diff/top-k then run on ≤ d² rows
   * regardless of corpus sizes.
   */
  def gramDrift(a: DataFrame, b: DataFrame, vecCol: String,
                k: Int = 20): DataFrame = {
    require(k > 0, s"gramDrift needs k > 0, got $k")
    val ga = gramIntUpper(a, vecCol).select(col("dim_i"), col("dim_j"),
      col("n_vecs").as("n_a"), col("g").as("g_a"))
    val gb = gramIntUpper(b, vecCol).select(col("dim_i"), col("dim_j"),
      col("n_vecs").as("n_b"), col("g").as("g_b"))
    ga.join(gb, Seq("dim_i", "dim_j"), "full_outer")
      .select(col("dim_i"), col("dim_j"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("g_a"), lit(0L)).as("g_a"),
        coalesce(col("g_b"), lit(0L)).as("g_b"))
      .select(col("dim_i"), col("dim_j"), col("n_a"), col("n_b"),
        expr("CASE WHEN n_a > 0 THEN g_a DIV n_a ELSE 0L END")
          .as("mean_a_scaled"),
        expr("CASE WHEN n_b > 0 THEN g_b DIV n_b ELSE 0L END")
          .as("mean_b_scaled"))
      .withColumn("drift_scaled",
        abs(col("mean_a_scaled") - col("mean_b_scaled")))
      .orderBy(col("drift_scaled").desc, col("dim_i"), col("dim_j"))
      .limit(k)
  }

  /**
   * Top principal direction of the (uncentered) embedding Gram matrix by
   * fixed-count power iteration — the spectral summary behind whitening
   * / anisotropy diagnostics ("is the embedding space collapsing toward
   * one direction?"), PCA-based dim-reduction seeding, and ABTT-style
   * dominant-direction removal.
   *
   * Determinism: everything is exact integers. The Gram matrix is the
   * e15 6-dp-quantized ×1e6 BIGINT form; v₀ = 1e6·𝟙; each step computes
   * w = G·v in DECIMAL(38,0) (|w| ≤ d·|g|·1e6 ≈ 1e24 at d = 64,
   * |corpus| = 2000 — far past BIGINT, comfortably inside 38 digits)
   * and renormalizes by the max-abs component: v′ = (w·1e6) div max|w|,
   * a single truncating division per component (DuckDB mirrors it
   * sign/abs-explicitly, the e14 device). Max-norm instead of L2 keeps
   * the iteration sqrt-free and the scale pinned at |v| ≤ 1e6. The
   * iterate converges to the dominant eigendirection (all-ones start ⇒
   * deterministic sign); `growth = max|w| div 1e6` is the per-step gain,
   * a fixed-point Rayleigh-style estimate of λ_max in Gram units.
   *
   * Scale design (100 TB): the ONLY corpus-sized stage is the Gram
   * accumulation itself (e15's in-row d(d+1)/2 product generation with
   * map-side partial sums — only the fixed d² partial-sum matrix ever
   * shuffles). The iteration then runs on d² ≤ 4096 rows REGARDLESS of
   * corpus size: the mirrored Gram is localCheckpoint'd (cutting the
   * corpus scan out of the 8-iteration lineage — without it every
   * iteration would rescan the corpus), and each step is a tiny
   * broadcast join + d-row aggregate. Output: d rows (dim,
   * comp = v/1e6 as double, growth), dim-ordered.
   */
  def pcaPowerIteration(corpus: DataFrame, vecCol: String, idCol: String,
                        iters: Int = 8): DataFrame = {
    val (v, growth) = powerIterateInt(corpus, vecCol, iters)
    v.select(col("dim"), (col("v").cast("double") / lit(1e6)).as("comp"),
        growth.as("growth"))
      .orderBy(col("dim"))
  }

  /** Integer power-iteration core shared by [[pcaPowerIteration]] and
    * [[removeDominantDirection]]: returns the final iterate (dim,
    * v ×1e6 BIGINT, growth) plus the growth column ref. */
  private def powerIterateInt(corpus: DataFrame, vecCol: String,
                              iters: Int): (DataFrame, Column) = {
    require(iters >= 1 && iters <= 64,
      s"power iteration needs 1 <= iters <= 64, got $iters")
    val spark = corpus.sparkSession
    // ONE distributed pass builds the dim×dim integer Gram (the only
    // corpus-sized work); the power recursion itself runs DRIVER-SIDE
    // over the collected ≤ dim² rows (≤ 64² = 4096 longs — the
    // candidateBuckets / Lloyd-trace bounded-synopsis class, constant
    // in corpus size). The r14 profile read the old per-round
    // distributed form as ~20 jobs of pure fixed overhead: each round
    // joined a 64-row vector against a 4k-row matrix through a
    // checkpoint + a 1-row aggregate — cluster machinery iterating on
    // driver-sized data. Arithmetic is bit-identical: BigInt sums equal
    // the DECIMAL(38,0) sums, and BigInt `/` truncates toward zero
    // exactly like SQL DIV, so every ×1e6 iterate coefficient matches
    // the distributed form's (e16/e18 oracle hashes unchanged).
    val upperRows = gramIntUpper(corpus, vecCol)
      .select(col("dim_i").cast("int"), col("dim_j").cast("int"),
        col("g").cast("long"))
      .collect()
    val gram = scala.collection.mutable.HashMap.empty[(Int, Int), BigInt]
    upperRows.foreach { r =>
      val (i, j, g) = (r.getInt(0), r.getInt(1), BigInt(r.getLong(2)))
      gram((i, j)) = g
      if (i != j) gram((j, i)) = g
    }
    val dims = upperRows.flatMap(r => Seq(r.getInt(0), r.getInt(1)))
      .distinct.sorted.toIndexedSeq
    var v: Map[Int, BigInt] = dims.map(_ -> BigInt(1000000L)).toMap
    var growthVal = BigInt(0)
    for (_ <- 1 to iters) {
      val w: Map[Int, BigInt] = dims.map { i =>
        i -> dims.foldLeft(BigInt(0)) { (acc, j) =>
          acc + gram.getOrElse((i, j), BigInt(0)) * v(j)
        }
      }.toMap
      // max(·,1): an all-zero Gram (degenerate corpus) yields m = 0 and
      // v = 0 either way — the clamp mirrors the old ANSI DIV-0 guard
      val m = (BigInt(1) +: dims.map(i => w(i).abs)).max
      v = dims.map(i => i -> (w(i) * 1000000) / m).toMap
      growthVal = m / 1000000
    }
    import spark.implicits._
    // loud overflow gate: the replaced distributed form CAST(... AS
    // BIGINT) from DECIMAL(38,0) under ANSI failed loudly past 2^63;
    // BigInt.toLong would wrap silently. The documented xi·xj < 2^53
    // envelope keeps v (≤1e6-scaled unit iterate) and growth in range —
    // this asserts it instead of assuming it.
    (dims.map(v) :+ growthVal).foreach(b => require(b.isValidLong,
      s"power iterate overflows BIGINT ($b) - corpus outside the " +
        "documented xi*xj < 2^53 envelope"))
    val out = dims.map(i => (i, v(i).toLong, growthVal.toLong))
      .toDF("dim", "v", "growth")
    (out, col("growth"))
  }

  /**
   * ABTT-style dominant-direction removal ("all-but-the-top",
   * Mu & Viswanath '18): project the [[pcaPowerIteration]] direction out
   * of every embedding — the post-processing step that measurably
   * improves similarity tasks on anisotropic embedding spaces, and the
   * consumer of e16's iterate.
   *
   * Exact integers end to end: x is the e15 6-dp ×1e6 quantization, u
   * the e16 ×1e6 integer iterate; per vector
   * `coef = (⟨x,u⟩ · 1e6) DIV ⟨u,u⟩` (the ×1e6-scaled projection
   * coefficient, one truncating division widened through DECIMAL(38,0) —
   * ⟨x,u⟩·1e6 ≈ 6e19 overflows BIGINT), and per coordinate the residual
   * `x_i·1e6 − coef·u_i` (×1e12 fixed point, < 2^53 — the final DOUBLE
   * cast is lossless). A corpus lying exactly on the direction residues
   * to exact zeros.
   *
   * Scale design (100 TB): the Gram + d²-row iteration are corpus-
   * independent after accumulation (see [[pcaPowerIteration]]); the
   * apply stage is two corpus-sized passes — the coordinate explode with
   * a broadcast join onto u, and one id-keyed partial-aggregated
   * exchange for the per-vector dot (re-joined to the coordinates keyed
   * by id). Output: (id, dim, resid), (id, dim)-ordered.
   */
  def removeDominantDirection(corpus: DataFrame, vecCol: String,
                              idCol: String, iters: Int = 8): DataFrame = {
    val (v, _) = powerIterateInt(corpus, vecCol, iters)
    val u = v.select(col("dim"), col("v")).localCheckpoint()
    val uu = u.agg(sum(col("v") * col("v")).as("uu"))
    val xs = corpus
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), posexplode(expr(
        s"""transform(`$vecCol`, x ->
              CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) * 1000000
                   AS BIGINT))""")).as(Seq("dim", "xi")))
      .join(broadcast(u), "dim")
    val dots = xs.groupBy(col("id"))
      .agg(sum(col("xi") * col("v")).as("dot"))
      .crossJoin(broadcast(uu))
      .select(col("id"), expr(
        "CAST((CAST(dot AS DECIMAL(38,0)) * 1000000) DIV uu AS BIGINT)")
        .as("coef"))
    xs.join(dots, "id")
      .select(col("id"), col("dim"),
        ((col("xi") * lit(1000000L) - col("coef") * col("v"))
          .cast("double") / lit(1e12)).as("resid"))
      .orderBy(col("id"), col("dim"))
  }

  /**
   * Full Lloyd iteration — the convergent k-means loop that
   * [[assignCentroids]] (E-step) and [[kmeansUpdate]] (M-step) are the
   * halves of, with a per-round training trace. This is the algorithm a
   * curation pipeline actually runs: SemDeDup and cluster-based data
   * curation both start from a converged clustering, and the IVF coarse
   * quantizer ([[ivfTopKPartitioned]]) is trained exactly this way.
   *
   * Output: one row per (round, cid) that received members —
   * `(round, cid, n_assigned, inertia, c0)` where `inertia` is the
   * cluster's cosine-distance cost `Σ (1 − sim)` with each term rounded
   * through DECIMAL(10,4) BEFORE the order-free decimal sum (the
   * e05-established cross-engine rounding of a cosine), and `c0` is
   * dimension 0 of the POST-round centroid — so the hash pins both the
   * per-round memberships and the centroid evolution itself.
   *
   * Engine parity: assignment argmax and tie-breaking are
   * [[assignCentroids]]'s (full-precision cosine, ties by cid); the
   * centroid update is [[kmeansUpdate]]'s truncating 9-dp fixed point,
   * so every round's centroids are EXACT 9-dp rationals — bit-identical
   * doubles on both engines, which is what lets round r+1's cosines
   * agree cross-engine at all. A cluster that loses all members keeps
   * its previous centroid, coordinate-for-coordinate (the standard
   * empty-cluster rule, spelled as a per-dimension COALESCE on both
   * sides).
   *
   * Scale design (100 TB): centroid state is O(k·dim) and lives on the
   * DRIVER between rounds (collect + re-broadcast each round — the
   * Spark MLlib KMeans pattern; the corpus itself is never collected).
   * Each round is one persisted pass over the corpus feeding two
   * actions (the k-row stats and the k·dim-row update, both bounded by
   * k), then the round's assignment unpersists — one state generation
   * live at a time, the bounded-memory discipline IterativeMemory
   * established for CC/PageRank/HITS. Lineage never grows: every
   * round's plan starts from the corpus scan plus a literal local
   * centroid table.
   */
  def lloydTrace(
      corpus: DataFrame, vecCol: String, idCol: String,
      init: DataFrame, cVecCol: String, cIdCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"lloydTrace needs 1 <= rounds <= 64, got $rounds")
    val spark = corpus.sparkSession
    import spark.implicits._

    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // driver-held centroid state: k rows of dim doubles
    var cent: Seq[(Long, IndexedSeq[Double])] = init
      .select(col(cIdCol).cast("long").as("cid"),
        col(cVecCol).cast("array<double>").as("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
      .sortBy(_._1).toIndexedSeq

    val trace = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Double, Double)]
    for (round <- 1 to rounds) {
      val centDf = cent.map { case (c, v) => (c, v.toArray) }
        .toDF("cid", "cvec")
      val assigned = assignCentroids(vecs, "vec", "id",
        centDf, "cvec", "cid").persist()
      try {
        // E-step stats then M-step update, both reading the persisted
        // assignment SEQUENTIALLY. The r14 overlap (Par.both on the two
        // collects) was re-measured this round at sf1/local[32]:
        // 4.13 s overlapped vs 4.23 s sequential — flat (VERDICT item
        // 5), and on a multi-executor cluster two concurrent jobs can
        // compute overlapping partitions of the persisted assignment
        // twice before blocks land. Sequential is the simpler, equal-
        // speed form: the first collect materializes the persist, the
        // second reads blocks.
        val stats =
          assigned.groupBy(col("cid"))
            .agg(count(lit(1)).as("n_assigned"),
              sum(lit(1.0).cast("decimal(10,4)") -
                col("sim").cast("decimal(10,4)"))
                .cast("double").as("inertia"))
            .collect()
            .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
            .toMap
        // M-step: truncating 9-dp means, collected as k·dim rows
        val upd =
          updateFromAssigned(assigned, vecs)
            .collect()
            .flatMap(r => if (r.isNullAt(3)) None
              else Some((r.getLong(0), r.getInt(1)) -> r.getDouble(3)))
            .toMap
        cent = cent.map { case (cid, old) =>
          (cid, old.indices.map(i => upd.getOrElse((cid, i), old(i))))
        }
        val centMap = cent.toMap
        stats.toSeq.sortBy(_._1).foreach { case (cid, (n, inertia)) =>
          trace += ((round, cid, n, inertia, centMap(cid)(0)))
        }
      } finally assigned.unpersist()
    }
    trace.toSeq
      .toDF("round", "cid", "n_assigned", "inertia", "c0")
      .orderBy(col("round"), col("cid"))
  }
}
