package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `BinaryType` columns with a typed metadata struct, and run
 * decode/feature-extract as a per-partition batch transform.
 *
 * The decode step itself is STUBBED (this environment has no image/audio
 * codecs): `fakeDecode` derives deterministic pseudo-features from the raw
 * bytes. Everything around it is the real production shape:
 *  - schema: (id, payload BINARY, meta STRUCT<format,width,height,n_bytes>)
 *  - `mapPartitions` over a typed iterator — the Scala analogue of
 *    `mapInPandas` batches: the codec is invoked once per partition with a
 *    stream of records, so per-call setup (model load, codec init) is
 *    amortized exactly as it would be with a real decoder;
 *  - output: fixed-width feature vector + extracted metadata, ready for the
 *    Similarity operators above.
 *
 * At 100 TB: payloads never shuffle (map-only), partitions are sized by
 * `spark.sql.files.maxPartitionBytes`, and the feature output is orders of
 * magnitude smaller than the input — the classic decode-early/shed-early
 * pipeline shape.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType))))))

  /**
   * Build a deterministic media table from the documents fixture: payload =
   * UTF-8 bytes of the text (a stand-in blob), metadata derived from it.
   * In production this column comes straight from parquet/Iceberg BINARY.
   */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        element_at(split(lit("jpeg,png,wav,mp4"), ","),
          (col("doc_id") % 4 + 1).cast("int")).as("format"),
        (col("doc_id") % 640 + 16).cast(IntegerType).as("width"),
        (col("doc_id") % 480 + 16).cast(IntegerType).as("height"),
        length(col("text")).cast(LongType).as("n_bytes")).as("meta"))

  /** Deterministic stand-in for a real decoder: a 16-bin byte histogram
    * normalized to [0,1] — replace with an actual codec in production. */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload != null && payload.nonEmpty) {
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xFF) >> 4) += 1f
        i += 1
      }
      var j = 0
      while (j < 16) { bins(j) /= payload.length; j += 1 }
    }
    bins
  }

  /**
   * Per-partition batched feature extraction. The iterator-in/iterator-out
   * contract means the (stubbed) codec initializes once per partition —
   * the same batch shape `mapInPandas`/`mapInArrow` gives a Python model.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      // per-partition init happens HERE (codec/model load in production)
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        Row(r.getLong(idIdx), meta.getString(0), meta.getLong(3),
          fakeDecode(r.getAs[Array[Byte]](payloadIdx)).toSeq)
      }
    }(encoder)
  }

  /** Resize stand-in: deterministic downsample of the payload to
    * `targetBytes` by stride sampling, with meta rewritten to the target
    * dimensions — the byte-in/byte-out plumbing of an image resize with
    * the codec stubbed out. Output schema == input schema, so resize
    * stages compose/chain like real preprocessing pipelines. */
  def resize(spark: SparkSession, media: DataFrame,
             targetWidth: Int = 64, targetHeight: Int = 64,
             targetBytes: Int = 4096): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    val idIdx = media.schema.fieldIndex("id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val meta = r.getStruct(metaIdx)
        val out =
          if (payload == null || payload.length <= targetBytes) payload
          else {
            val stride = payload.length.toDouble / targetBytes
            Array.tabulate(targetBytes)(i => payload((i * stride).toInt))
          }
        Row(r.getLong(idIdx), out,
          Row(meta.getString(0), targetWidth, targetHeight,
            if (out == null) 0L else out.length.toLong))
      }
    }(encoder)
  }

  /** Integer nibble-count histogram of a payload — the exact-integer
    * companion of [[fakeDecode]]'s normalized bins. Counts (not ratios)
    * so the near-dup decision in [[mediaNearDup]] can be pure integer
    * arithmetic. */
  def countHistogram(payload: Array[Byte]): Array[Long] = {
    val bins = new Array[Long](16)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xFF) >> 4) += 1L
        i += 1
      }
    }
    bins
  }

  /**
   * Media near-duplicate detection over the (stubbed-codec) content
   * histograms — the perceptual-dedup stage of a multimodal pipeline,
   * blocked by format (a jpeg is never a dup of a wav). Output matches
   * the dedup family: (id, keep_id, is_dup), one-hop min-id reps.
   *
   * The similarity decision is EXACT: cosine(a,b) >= ppm/10⁶ over
   * nonnegative integer count vectors rewrites to
   * `10¹²·dot(a,b)² >= ppm²·‖a‖²·‖b‖²` — dot and the squared norms are
   * exact integers, the products run in DECIMAL(38,0) (no rounding; no
   * overflow for payloads up to ~250 KB, which also keeps the DuckDB
   * HUGEINT oracle in range — larger media wants the counts bucketed
   * coarser first), so both engines decide every pair identically with
   * zero float involvement (an irrational-cosine compare would hinge on
   * libm parity exactly at the threshold). The threshold is
   * parts-per-million because count histograms of same-language text are
   * near-collinear — percent granularity can't separate true near-dups
   * from the baseline. Zero-histogram payloads (empty/null) are mutual
   * duplicates of EACH OTHER only — the predicate requires both norms
   * positive, or both zero: without that guard `0 >= 0` would link an
   * empty payload to every same-format row (and, as min id, crown it
   * keep_id for the whole format).
   *
   * Scale design: histograms are map-side (payloads never shuffle). The
   * pair stage must NOT key its exchange on `format` — 4 distinct keys
   * would collapse the quadratic work onto 4 shuffle partitions. Instead
   * the probe side hash-spreads on id across the full core count and the
   * build side (16 longs + 2 scalars per row — payload-free) broadcasts,
   * so every core carries an even slice of the n²/formats pairs. A
   * double-precision prescreen with a wide relative margin (double
   * products are exact to ~4 ulps; the margin is 1e-9) discards ~all
   * non-candidates before the exact DECIMAL confirm runs. Broadcast +
   * quadratic-within-format is the exact-verify tier: at corpus scale put
   * an LSH bucket (Similarity.cosineNearDup over the counts) in front and
   * keep this as the verifier on candidate buckets, the d04/d02 split.
   */
  def mediaNearDup(spark: SparkSession, media: DataFrame,
                   thresholdPpm: Int = 999990): DataFrame = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000,
      s"thresholdPpm must be in [0, 1000000], got $thresholdPpm")
    val hists = histsOf(media).localCheckpoint(true)
    val thr2 = thresholdPpm.toLong * thresholdPpm
    val nPart = spark.sparkContext.defaultParallelism
    Dedup.minNeighborReps(hists.select(col("id")),
      brutePairsOf(hists, thr2, nPart))
  }

  /** Exact verification of a candidate (id_a, id_b) set: join the
    * histograms back, compute the integer dot, and decide with
    * [[ppmExact]] — shared by the LSH and grid candidate tiers so a
    * surviving pair is exactly as trustworthy as the brute tier's. */
  private def verifyPairs(cand: DataFrame, hists: DataFrame,
                          thr2: Long): DataFrame =
    cand
      .join(hists.select(col("id").as("id_a"), col("hist").as("__ha"),
        col("nn").as("na")), "id_a")
      .join(hists.select(col("id").as("id_b"), col("hist").as("__hb"),
        col("nn").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        aggregate(zip_with(col("__ha"), col("__hb"), _ * _),
          lit(0L), _ + _).as("dot"),
        col("na"), col("nb"))
      .filter(ppmExact(thr2))
      .select(col("id_a"), col("id_b"))

  /** The broadcast-quadratic-within-format exact pair stage, shared by the
    * brute tier and [[mediaNearDupScaled]]'s auto-fallback.
    *
    * Explicit partition count: the histogram table is tiny BEFORE the
    * join and huge AFTER (row-explosive broadcast join), so AQE's
    * input-size-based coalescing would fold the exchange to 1 partition
    * and serialize the n² work; a user-specified count is exempt. */
  private[graft] def brutePairsOf(hists: DataFrame, thr2: Long,
                                  nPart: Int): DataFrame =
    hists.repartition(nPart, col("id")).as("a")
      .join(broadcast(hists.as("b")),
        col("a.format") === col("b.format") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        aggregate(zip_with(col("a.hist"), col("b.hist"), _ * _),
          lit(0L), _ + _).as("dot"),
        col("a.nn").as("na"), col("b.nn").as("nb"))
      .filter(ppmExact(thr2))
      .select(col("id_a"), col("id_b"))

  /** (id, format, hist, nn) rows from a media table — the map-side
    * histogram pass shared by both near-dup tiers. Callers
    * `localCheckpoint` the result: it feeds 3 consumers (pair probe,
    * pair build/index, reps id list) and must not re-scan payloads. */
  private def histsOf(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("format", StringType),
      StructField("hist", ArrayType(LongType, containsNull = false))))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(idIdx), r.getStruct(metaIdx).getString(0),
          countHistogram(r.getAs[Array[Byte]](payloadIdx)).toSeq)
      }
    }(encoder)
      .withColumn("nn",
        aggregate(transform(col("hist"), x => x * x), lit(0L), _ + _))
  }

  /** Spec access to the shared histogram pass ([[histsOf]]), checkpointed
    * exactly like the operator entry points do before fanning out. */
  private[graft] def histsForTest(spark: SparkSession,
                                  media: DataFrame): DataFrame =
    histsOf(media).localCheckpoint(true)

  /** The exact ppm-cosine gate over (dot, na, nb) columns: a conservative
    * double prescreen (margin 1e-9 vs ~4-ulp product error — keeps every
    * true candidate) ANDed with the DECIMAL(38,0) decision; both-zero
    * norms pair, zero-vs-positive never does. Shared by [[mediaNearDup]]
    * and [[mediaNearDupScaled]] so the two tiers cannot drift. */
  private def ppmExact(thr2: Long): org.apache.spark.sql.Column = {
    val dec = "decimal(38,0)"
    (lit(1.0e12) * col("dot") * col("dot") >=
      lit(thr2.toDouble) * col("na") * col("nb") * lit(1.0 - 1e-9)) &&
    ((col("na") > 0 && col("nb") > 0 &&
      lit(1000000000000L).cast(dec) * col("dot").cast(dec) * col("dot").cast(dec)
        >= lit(thr2).cast(dec) * col("na").cast(dec) * col("nb").cast(dec)) ||
     (col("na") === 0 && col("nb") === 0))
  }

  /** The two blocking dimensions for [[gridPairsOf]]: the bin with the
    * highest variance of the NORMALIZED coordinate across the corpus,
    * then the bin with the highest CONDITIONAL variance within the first
    * bin's cells. The second pick must be conditional — correlated bins
    * are the realistic case (letter nibbles move together in text; the
    * round-6 sf1 probe measured the failure: bins 3/14/9/8 perfectly
    * correlated, a (3,14) grid degenerating to 61 one-per-population
    * cells and a 3.0e8 candidate mass where the conditional pick's
    * (3,7) grid yields 3.3e7). Both passes fold to a bounded row count —
    * 16 rows for the first, (cells-per-bin ≈ 1/w) × 16 for the second —
    * so the driver-side pick is O(1) in corpus size (the tier probe's
    * bounded-collect shape). Deterministic: ties break on bin index.
    * Degenerate corpora (< 2 rows with a nonzero norm) fall back to
    * bins (0, 1) — the grid then collapses toward one cell and the mass
    * probe routes around it. */
  private[graft] def topVarianceBins(hists: DataFrame,
                                     thresholdPpm: Int): (Int, Int) = {
    // the when() guard looks redundant under the filter, but ANSI-mode
    // codegen may evaluate the projection speculatively on rows the
    // filter drops — the division must be total
    val coords = hists.filter(col("nn") > 0)
      .select(col("hist"), col("nn"), transform(col("hist"),
        x => when(col("nn") > 0,
          x.cast("double") / sqrt(col("nn").cast("double")))).as("vv"))
    val ranked = coords
      .select(posexplode(col("vv"))).toDF("idx", "v")
      .groupBy(col("idx"))
      .agg(coalesce(var_samp(col("v")), lit(0.0)).as("s2"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy { case (i, s2) => (-s2, i) }
    if (ranked.length < 2) return (0, 1)
    val binA = ranked(0)._1
    val w = gridCellWidth(thresholdPpm)
    val cellA = floor(element_at(col("hist"), binA + 1).cast("double") /
      (sqrt(when(col("nn") > 0, col("nn")).otherwise(1L)
        .cast("double")) * w))
    // weighted within-cell variance per bin: Σ_cells n_cell · Var_cell
    // (singleton cells contribute 0 via the coalesce)
    val grouped = coords.select(cellA.as("ca"), posexplode(col("vv")))
      .toDF("ca", "idx", "v")
      .groupBy(col("ca"), col("idx"))
      .agg(coalesce(var_samp(col("v")), lit(0.0)).as("s2"),
        count(lit(1)).as("k"))
      .groupBy(col("idx"))
      .agg(sum(col("s2") * col("k")).as("ws2"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .filter(_._1 != binA)
      .sortBy { case (i, ws2) => (-ws2, i) }
    (binA, if (grouped.isEmpty) (binA + 1) % 16 else grouped(0)._1)
  }

  /** Cell width for the grid tier: cosine(a,b) >= t between unit vectors
    * implies ‖â−b̂‖² = 2(1−cos) <= 2(1−t), hence per coordinate
    * |â_i−b̂_i| <= √(2(1−t)) — one cell of this width. Widened by 1e-9
    * relative (coarser cells are always recall-safe; floor(x/w) on an
    * exact-boundary pair must not land 2 cells apart over a double ulp)
    * and floored at 1e-9 so thresholdPpm = 10⁶ can't divide by zero. */
  private[graft] def gridCellWidth(thresholdPpm: Int): Double =
    math.max(math.sqrt(2.0 * (1.0 - thresholdPpm / 1e6)), 1e-9) * (1 + 1e-9)

  /** Zero-norm rows' cell key. A real cell is always >= 0 (nonnegative
    * coordinate over a positive width), and the 3×3 neighbor shift moves
    * a key by at most 1, so sentinel keys (−1001..−999 after shifting)
    * can never collide with content cells — zero-norm rows pair with each
    * other (shifted sentinel still covers −1000) and with nothing else.
    * Deliberately NOT Long.MinValue: the shift arithmetic must not wrap
    * under ANSI overflow checking. */
  private val ZeroNormCell = -1000L

  /** (id, format, c1, c2) cell keys: each row's NORMALIZED value in the
    * two blocking bins, quantized to width-`w` cells; zero-norm rows map
    * to the [[ZeroNormCell]] sentinel so the both-empty pairing
    * convention survives blocking. */
  private def gridKeysOf(hists: DataFrame, w: Double,
                         bins: (Int, Int)): DataFrame = {
    def cell(bin: Int): org.apache.spark.sql.Column =
      when(col("nn") === 0, lit(ZeroNormCell))
        .otherwise(floor(element_at(col("hist"), bin + 1).cast("double") /
          (sqrt(col("nn").cast("double")) * w)))
    hists.select(col("id"), col("format"),
      cell(bins._1).as("c1"), cell(bins._2).as("c2"))
  }

  /** Grid-blocking candidate tier: quantize each row's two highest-
    * variance NORMALIZED histogram coordinates to cells of width
    * [[gridCellWidth]], replicate one join side into its 3×3 cell
    * neighborhood, and equi-join on (format, c1, c2). Recall is EXACTLY 1
    * (a qualifying pair's coordinates differ by at most one cell width in
    * every dimension, so its cells differ by at most 1 — the neighborhood
    * covers it), each qualifying pair matches exactly once (the 9
    * replicated keys are distinct, the probe row sits in one cell), and
    * the identical [[ppmExact]] gate decides survivors.
    *
    * Why this exists next to the hyperplane-LSH tier: sign-of-projection
    * hashing resolves ANGULAR spread — for direction-clustered
    * populations (every English doc's byte histogram points the same
    * way) all rows agree on ~every hyperplane and the buckets degenerate
    * to format blocks. The grid keys on ABSOLUTE normalized coordinates
    * with resolution √(2(1−t)) ≈ 4.5e-3 at the default threshold, an
    * order below typical cross-document variation, so it separates
    * populations whose spread is metric rather than angular. The mass
    * probe in [[mediaNearDupScaled]] measures which regime the data is
    * in and routes accordingly. */
  private[graft] def gridPairsOf(hists: DataFrame, thresholdPpm: Int,
                                 thr2: Long, nPart: Int,
                                 bins: Option[(Int, Int)] = None): DataFrame = {
    val w = gridCellWidth(thresholdPpm)
    val keys = gridKeysOf(hists, w, bins.getOrElse(topVarianceBins(hists, thresholdPpm)))
    val shifted = keys
      .withColumn("d1", explode(lit(Array(-1L, 0L, 1L))))
      .withColumn("d2", explode(lit(Array(-1L, 0L, 1L))))
      .select(col("id"), col("format"),
        (col("c1") + col("d1")).as("c1"), (col("c2") + col("d2")).as("c2"))
    // explicit partition count for the same AQE-coalesce reason as the
    // other tiers: the key tables are narrow before the join
    val cand = keys.repartition(nPart, col("format"), col("c1"), col("c2"))
      .as("l")
      .join(shifted.as("r"),
        col("l.format") === col("r.format") &&
        col("l.c1") === col("r.c1") && col("l.c2") === col("r.c2") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    verifyPairs(cand, hists, thr2)
  }

  /**
   * [[mediaNearDup]]'s declared 100 TB path, made real: LSH bucketing
   * over the (float view of the) count histograms generates candidate
   * pairs — ~linear in corpus size instead of quadratic-within-format —
   * and the IDENTICAL exact integer ppm gate ([[ppmExact]]) verifies
   * them, so a surviving pair is exactly as trustworthy as the
   * brute-force tier's. Same output shape and, at the default
   * threshold, the same output: at cosine ≥ 0.99999 a sign bit of a
   * random hyperplane disagrees w.p. θ/π ≈ 1.4e-3, an 8-bit band
   * matches w.p. ≈ 0.989, and 6 bands miss together w.p. ≈ 2e-12 — the
   * d05/d02 recall argument, stated here because the oracle IS the
   * brute-force result. All-zero histograms share one LSH key, so the
   * empty-payload convention survives bucketing.
   *
   * HONEST CAVEAT, measured — and the reason this tier AUTO-SELECTS:
   * hyperplane bucketing pays off only when the feature has ANGULAR
   * diversity. The text-derived nibble histograms of the fixture are
   * near-collinear (every English doc points the same way), so the
   * buckets degenerate toward format-blocking and the candidate set
   * stays ~quadratic with ~6× band multiplicity on top — strictly more
   * pair work than the m03 broadcast tier, with a distinct() on the
   * explosion for dessert. Real perceptual hashes (pHash bits, CLIP
   * embeddings) spread over the sphere and flip that comparison. The
   * round-6 sf0.1→sf1 scale probe measured the consequence: with only
   * the LSH/brute pair of tiers this operator ran 41× longer on 10× the
   * documents (exponent 1.62) because BOTH tiers are quadratic on
   * direction-clustered data. The fix is the [[gridPairsOf]] third
   * tier: absolute-coordinate grid blocking at resolution √(2(1−t)) in
   * normalized-histogram space separates metric spread that hyperplanes
   * can't see, with recall exactly 1 by the per-coordinate bound.
   *
   * The right tier is therefore a DATA property, not a corpus-size
   * property, so this operator measures it: cheap probes aggregate
   * each tier's candidate mass — LSH's Σ_bucket C(k,2) from the banded
   * index (one pass, no join), the grid's Σ k_cell·k_neighbor from the
   * cell-count table (one aggregation plus a 9-key self-join on the
   * ALREADY-AGGREGATED cell counts), the brute tier's Σ_format C(n,2) —
   * and the cheapest tier runs, with brute preferred unless an indexed
   * tier cuts at least half the pair work (index construction isn't
   * free). All three feed the same [[ppmExact]] gate, so the probe
   * changes COST, never the answer. At 100 TB the probes cost a few
   * metadata-sized passes over the checkpointed histogram table —
   * orders below the cost of running the wrong tier.
   *
   * NOTE on the tempting mean-centering "fix" for near-collinear
   * histograms: hashing the centered residuals spreads the population
   * across hyperplanes (smaller buckets, faster join) but CHANGES THE
   * METRIC — a true near-dup pair at raw cosine ≥ t can have its
   * small residuals at a large angle, landing in different buckets
   * (measured: it drops a planted near-dup at sf0.01). Candidate
   * recall must hold in the same space the exact gate decides in, so
   * the bands hash the raw histograms and degenerate populations take
   * the brute path via the probe instead.
   */
  def mediaNearDupScaled(spark: SparkSession, media: DataFrame,
                         thresholdPpm: Int = 999990,
                         planes: Int = 48, rowsPerBand: Int = 8): DataFrame = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000,
      s"thresholdPpm must be in [0, 1000000], got $thresholdPpm")
    graft.functions.GraftFunctions.register(spark)
    val hists = histsOf(media).localCheckpoint(true)
    val thr2 = thresholdPpm.toLong * thresholdPpm
    // explicit partition count for the same reason as the brute tier:
    // the banded index is tiny before the self-join and explosive after,
    // so AQE coalescing must not fold it to one partition
    val nPart = spark.sparkContext.defaultParallelism
    val banded = hists.select(col("id"), col("format"),
        posexplode(graft.functions.GraftFunctions.lshBands(
          transform(col("hist"), x => x.cast("float")), planes, rowsPerBand)))
      .toDF("id", "format", "band_id", "band_key")
    // candidate-mass probe: pair work each tier would do, in doubles — a
    // cost comparison needs 2 significant digits, and double can't
    // overflow where Σ k(k-1) on a trillion-row bucket would wrap a long
    def pairMass(grouped: DataFrame): Double =
      grouped.agg(coalesce(
        sum(col("count").cast("double") * (col("count") - 1).cast("double")),
        lit(0.0)).as("m")).head().getDouble(0)
    val bruteMass = pairMass(hists.groupBy(col("format")).count())
    // grid mass: ordered-pair upper bound Σ k_cell·k_neighbor over the
    // cell-count table (9 shifted keys per AGGREGATED cell row, not per
    // data row — the probe's join is on cell counts, bounded by the
    // number of occupied cells)
    val bins = topVarianceBins(hists, thresholdPpm)
    val gridKeys = gridKeysOf(hists, gridCellWidth(thresholdPpm), bins)
    val cellCounts = gridKeys.groupBy(col("format"), col("c1"), col("c2"))
      .count()
    val shiftedCounts = cellCounts
      .withColumn("d1", explode(lit(Array(-1L, 0L, 1L))))
      .withColumn("d2", explode(lit(Array(-1L, 0L, 1L))))
      .select(col("format"), (col("c1") + col("d1")).as("c1"),
        (col("c2") + col("d2")).as("c2"), col("count").as("k2"))
    val gridMass = cellCounts.join(shiftedCounts, Seq("format", "c1", "c2"))
      .agg(coalesce(sum(col("count").cast("double") * col("k2")),
        lit(0.0)).as("m")).head().getDouble(0)
    val pairs =
      // grid already cuts ≥ half the brute pair work: run it without
      // paying for the banded index at all (the LSH probe would cost a
      // full explode+aggregate pass over n×bands rows just to lose —
      // the grid's absolute-coordinate resolution dominates hyperplane
      // signs on 16-dim count features in both regimes we've measured)
      if (gridMass * 2 < bruteMass)
        gridPairsOf(hists, thresholdPpm, thr2, nPart, Some(bins))
      else {
        val lshMass = pairMass(
          banded.groupBy(col("format"), col("band_id"), col("band_key"))
            .count())
        if (lshMass * 2 >= bruteMass) brutePairsOf(hists, thr2, nPart)
        else {
          val idx = banded.repartition(nPart, col("band_id"), col("band_key"))
          val cand = idx.as("l").join(idx.as("r"),
              col("l.band_id") === col("r.band_id") &&
              col("l.band_key") === col("r.band_key") &&
              col("l.format") === col("r.format") &&
              col("l.id") < col("r.id"))
            .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
            .distinct()
          verifyPairs(cand, hists, thr2)
        }
      }
    Dedup.minNeighborReps(hists.select(col("id")), pairs)
  }

  /** Frame-sample stand-in: take every `stride`-th byte of the payload as a
    * "frame", capped at `maxFrames` — the partition/batch plumbing of video
    * frame sampling with the codec stubbed out. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   stride: Int = 64, maxFrames: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_byte", IntegerType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.flatMap { r =>
      val payload = r.getAs[Array[Byte]](payloadIdx)
      val id = r.getLong(idIdx)
      if (payload == null) Iterator.empty
      else payload.indices.by(stride).take(maxFrames).zipWithIndex.map {
        case (off, fi) => Row(id, fi, payload(off) & 0xFF)
      }
    }(encoder)
  }
}
