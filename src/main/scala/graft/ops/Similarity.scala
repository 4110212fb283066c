package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search and embedding near-dup over an
 * `Array[Float]` embedding column.
 *
 * Three tiers:
 *  - `cosineTopK` — exact brute force: broadcast the (small) query set,
 *    one map-side pass over the corpus, per-query top-k via window. The
 *    correctness baseline; O(|corpus| * |queries| * dim) but embarrassingly
 *    parallel and shuffle-free until the final tiny top-k.
 *  - `ivfTopK` — inverted-file ANN: cluster corpus vectors by nearest
 *    centroid once, probe only the `nprobe` closest centroids per query,
 *    exact re-rank inside probed clusters. The 100 TB path: the scan cost
 *    drops by ~(nprobe/nlist) and centroid assignment is a broadcast join.
 *  - `cosineNearDup` — random-hyperplane LSH bucketing, then exact cosine
 *    verification inside buckets (embedding-space near-duplicate dedup).
 *
 * All vector math is `zip_with`/`aggregate` higher-order functions over the
 * array column — distributed per row, no UDF, no driver collect.
 */
object Similarity {

  /** Deterministic pseudo-random unit-ish hyperplane component (SplitMix64
    * bit-mixed (plane, dim) index mapped to [-1, 1)). */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def planeComponent(plane: Int, d: Int): Double =
    mix(plane.toLong << 32 | d.toLong).toDouble / Long.MaxValue

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
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("id"),
        cosine(col("vec"), col("qvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
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
    val cent = centroids.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"))

    def nearestCentroids(df: DataFrame, vc: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col("__rid")).orderBy(col("csim").desc, col("cid"))
      df.crossJoin(broadcast(cent))
        .withColumn("csim", cosine(col(vc), col("cvec")))
        .withColumn("__crk", row_number().over(w))
        .filter(col("__crk") <= n)
        .drop("cvec", "csim", "__crk")
    }

    val assigned = nearestCentroids(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
        col(idCol).as("__rid")), "vec", 1)
      .select(col("id"), col("vec"), col("cid"))

    val probed = nearestCentroids(
      queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"),
        col(qIdCol).as("__rid")), "qvec", nprobe)
      .select(col("query_id"), col("qvec"), col("cid"))

    val scored = assigned.join(broadcast(probed), Seq("cid"))
      .select(col("query_id"), col("id"),
        cosine(col("vec"), col("qvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
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
   * Random-hyperplane LSH signature: `planes` sign bits packed into bands
   * of `rowsPerBand` bits; docs sharing any band are candidates.
   */
  def lshBandKeys(vec: Column, dim: Int, planes: Int, rowsPerBand: Int): Column = {
    require(planes % rowsPerBand == 0)
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      when(dot(vec, plane) >= 0, 1L).otherwise(0L)
    }
    val bands = (0 until planes / rowsPerBand).map { b =>
      val packed = bits.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        .zipWithIndex.map { case (bit, i) => bit * (1L << i) }
        .reduce(_ + _)
      struct(lit(b).as("band_id"), packed.as("band_key"))
    }
    array(bands: _*)
  }

  /**
   * Embedding-cosine near-duplicate detection: LSH bucket candidates, exact
   * cosine verify >= `threshold`, one-hop min-id cluster rep per vector —
   * same output shape as the text dedup family (id, keep_id, is_dup).
   */
  def cosineNearDup(
      corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
      threshold: Double = 0.95, planes: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // exchange barrier so both self-join sides reuse one computation of
    // the 16 hyperplane dot products per vector.
    val banded = vecs.select(col("id"), col("vec"),
        explode(lshBandKeys(col("vec"), dim, planes, rowsPerBand)).as("bk"))
      .select(col("id"), col("vec"),
        col("bk.band_id").as("band_id"), col("bk.band_key").as("band_key"))
      .repartition(col("band_id"), col("band_key"))

    val verified = banded.as("l").join(banded.as("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.vec").as("va"), col("r.vec").as("vb"))
      .distinct()
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)

    val neighborMin = verified
      .select(col("id_b").as("id"), col("id_a").as("nb"))
      .union(verified.select(col("id_a").as("id"), col("id_b").as("nb")))
      .groupBy(col("id")).agg(min(col("nb")).as("nb_min"))
    vecs.select(col("id"))
      .join(neighborMin, Seq("id"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("nb_min"), col("id"))).as("keep_id"))
      .withColumn("is_dup", col("id") =!= col("keep_id"))
      .orderBy(col("id"))
  }
}
