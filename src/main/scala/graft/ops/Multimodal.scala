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
    // validate BEFORE the histogram pass: the eager checkpoint is the
    // dominant payload scan, and a bad threshold must not pay it
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000,
      s"thresholdPpm must be in [0, 1000000], got $thresholdPpm")
    nearDupFromHists(spark, histsOf(media).localCheckpoint(true),
      thresholdPpm)
  }

  /** [[mediaNearDup]] over an ALREADY-materialized histogram table —
    * the entry [[graft.streaming.MediaStreams]] uses so one payload
    * pass per micro-batch serves the within-batch gate, the stored-
    * index probe AND the append rows (payload histogramming is the
    * dominant cost at media scale — the module's own claim, which
    * three separate histsOf calls per batch would quietly break). */
  private[graft] def nearDupFromHists(spark: SparkSession,
      hists: DataFrame, thresholdPpm: Int): DataFrame = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000,
      s"thresholdPpm must be in [0, 1000000], got $thresholdPpm")
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

  /** The checkpointed histogram pass ([[histsOf]]) as a reusable
    * artifact — ONE payload read serving every hist-level consumer
    * ([[nearDupFromHists]], [[probeFromHists]], [[appendFromHists]]);
    * the streaming ingestion's per-batch entry and the specs' access
    * point. */
  private[graft] def mediaHists(media: DataFrame): DataFrame =
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

  /** The grid cell of one histogram bin at width `w` over (hist, nn)
    * columns — the ONE quantization both the in-query tiers
    * ([[gridKeysOf]] → m03/m04) and the stored-signature tier
    * ([[sigRowsOf]] → m05) derive cells from, so the two can never
    * drift; [[cellValOf]] is its driver mirror. Zero-norm rows map to
    * the [[ZeroNormCell]] sentinel so the both-empty pairing
    * convention survives blocking. */
  private def cellCol(bin: Int, w: Double): org.apache.spark.sql.Column =
    when(col("nn") === 0, lit(ZeroNormCell))
      .otherwise(floor(element_at(col("hist"), bin + 1).cast("double") /
        (sqrt(col("nn").cast("double")) * w)))

  /** (id, format, c1, c2) cell keys: each row's NORMALIZED value in the
    * two blocking bins, quantized to width-`w` cells. */
  private def gridKeysOf(hists: DataFrame, w: Double,
                         bins: (Int, Int)): DataFrame =
    hists.select(col("id"), col("format"),
      cellCol(bins._1, w).as("c1"), cellCol(bins._2, w).as("c2"))

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

  // --- the STORED media signature index (m05) ---------------------------
  //
  // The one family member media lacked through r13: m03/m04 rebuild the
  // perceptual candidate structure in-query every time, while every
  // text/vector family persists its probe-side state (d18/e21/t28/t29).
  // At 100 TB of media the histogram pass over raw payloads is the
  // dominant cost — a release job should pay it ONCE and every probe
  // (new-batch dedup gate, "have we seen this asset" search) should read
  // signatures, never payloads.
  //
  // The stored signature is the GRID key (absolute-coordinate banding of
  // the two release-chosen highest-variance normalized histogram bins, at
  // resolution √(2(1−t)) — [[gridPairsOf]]'s geometry), NOT hyperplane
  // LSH bands, deliberately: the m04 round-6 sf1 probe MEASURED that
  // sign-of-projection bands degenerate to format blocks on direction-
  // clustered media populations (both tiers quadratic, exponent 1.62),
  // while the grid separates metric spread with candidate recall EXACTLY
  // 1 (per-coordinate bound: a qualifying pair's cells differ by ≤ 1 in
  // each dimension, so the probe's 3×3 replication always covers the
  // stored cell). Recall 1 also makes the stored tier's hash gate
  // DETERMINISTIC — the probe-over-store output equals m03's exact gate
  // by argument, not by a 2e-12 miss budget.

  /** Partition bucket of a grid cell key — the sb column both sides of
    * the probe join derive from (c1, c2) alone, so the fpb/cid-style
    * dynamic partition pruning arms on the stored scan. 2003 is an
    * arbitrary odd spreading constant; collisions only coarsen pruning.
    * Overflow-safe under ANSI: |c1| ≤ max(1/w, sentinel) ≈ 1e9 at the
    * extreme threshold, ×2003 ≪ 2^63. */
  private def sigBucket(c1: org.apache.spark.sql.Column,
                        c2: org.apache.spark.sql.Column,
                        buckets: Int): org.apache.spark.sql.Column =
    pmod(c1 * lit(2003L) + c2, lit(buckets.toLong)).cast("int")

  /** Driver mirrors of the in-plan signature arithmetic — used by the
    * stored-geometry validation ([[validateSigGeometry]]); every step
    * (divide, sqrt, floor, multiply) is a correctly-rounded IEEE-754
    * operation on both sides, so the mirror matches bit-for-bit. */
  private def sigBucketOf(c1: Long, c2: Long, buckets: Int): Int = {
    val m = (c1 * 2003L + c2) % buckets
    (if (m < 0) m + buckets else m).toInt
  }

  private def cellValOf(histBin: Long, nn: Long, w: Double): Long =
    if (nn == 0) ZeroNormCell
    else math.floor(histBin.toDouble / (math.sqrt(nn.toDouble) * w)).toLong

  /** One signature row per media item: (id, format, hist, nn, c1, c2,
    * sb) — the stored hist/nn make the exact [[ppmExact]] verify run
    * against the STORE (payloads are never re-read at probe time);
    * (c1, c2) are the grid cells under the given release geometry and
    * `sb` the partition bucket. Shared by build, append and the probe's
    * own (probe-side) derivation so the three can never drift. */
  private def sigRowsOf(hists: DataFrame, thresholdPpm: Int,
                        bins: (Int, Int), buckets: Int): DataFrame = {
    val w = gridCellWidth(thresholdPpm)
    hists.select(col("id"), col("format"), col("hist"), col("nn"),
        cellCol(bins._1, w).as("c1"), cellCol(bins._2, w).as("c2"))
      .withColumn("sb", sigBucket(col("c1"), col("c2"), buckets))
  }

  /**
   * Build the stored media signature index — the release artifact of
   * the media near-dup family (m05; the d18/e21/t28/t29 compute-once/
   * store/probe pattern for media): one signature row per item
   * ([[sigRowsOf]] — content histogram, exact norms, grid cells,
   * partition bucket) plus a 1-row `meta` geometry table
   * (bin1, bin2, threshold_ppm, n_buckets).
   *
   * Persist sigs PARTITIONED BY `sb` and meta LAST (the zorderWrite
   * bounds-last crash ordering: a half-written store with no meta fails
   * every probe loudly). The blocking bins are chosen from THIS
   * corpus's conditional variance ([[topVarianceBins]]) and then FROZEN
   * as release geometry — the zorder-envelope stance: appends and
   * probes reuse the stored bins, and because candidate recall is
   * exactly 1 under ANY bin choice (the per-coordinate grid bound),
   * stale bins can only coarsen pruning, never change an answer.
   * `thresholdPpm` is part of the geometry: the cell width derives from
   * it, so one store serves ONE threshold (build another for another
   * gate — they are different release artifacts, like Bloom nWords/k).
   *
   * Scale: one map-side histogram pass over payloads (the only time
   * they are read), two bounded-collect variance probes (16 and
   * ~16/w rows), one narrow signature write. Probes and appends are
   * payload-free on the corpus side forever after. Compact with
   * [[graft.streaming.DocumentStreams.compactStore]]`(dir, sortCols =
   * Seq("id"), partitionCols = Seq("sb"))` as appends accumulate.
   */
  def mediaSignatureIndex(spark: SparkSession, media: DataFrame,
                          thresholdPpm: Int = 999990,
                          buckets: Int = 64): (DataFrame, DataFrame) = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000,
      s"thresholdPpm must be in [0, 1000000], got $thresholdPpm")
    require(buckets >= 1, s"mediaSignatureIndex needs buckets >= 1")
    val hists = histsOf(media).localCheckpoint(true)
    val bins = topVarianceBins(hists, thresholdPpm)
    val sigs = sigRowsOf(hists, thresholdPpm, bins, buckets)
    val meta = spark.range(1).select(
      lit(bins._1).as("bin1"), lit(bins._2).as("bin2"),
      lit(thresholdPpm).as("threshold_ppm"),
      lit(buckets).as("n_buckets"))
    (sigs, meta)
  }

  /** Parse + validate the 1-row meta geometry every stored-index entry
    * point reads — a missing/garbled meta fails loudly (the probe
    * cannot guess the release geometry). */
  private def readSigMeta(meta: DataFrame): ((Int, Int), Int, Int) = {
    val rows = meta.select(col("bin1").cast("int"), col("bin2").cast("int"),
      col("threshold_ppm").cast("int"), col("n_buckets").cast("int"))
      .head(2)
    require(rows.length == 1,
      s"media signature meta must be exactly 1 row, got ${rows.length}")
    val r = rows(0)
    require((0 to 3).forall(!r.isNullAt(_)),
      "media signature meta has null geometry")
    val (b1, b2, t, nb) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
    require(b1 >= 0 && b1 < 16 && b2 >= 0 && b2 < 16 && b1 != b2,
      s"meta bins ($b1, $b2) must be distinct in [0, 16)")
    require(t >= 0 && t <= 1000000,
      s"meta threshold_ppm must be in [0, 1000000], got $t")
    require(nb >= 1, s"meta n_buckets must be >= 1, got $nb")
    ((b1, b2), t, nb)
  }

  /** A meta row that disagrees with the stored rows' actual geometry
    * would make the probe's (sb, c1, c2) join silently drop matches —
    * false negatives in a dedup gate (and, on the append path,
    * PERMANENTLY misplaced rows). The stored rows carry enough to
    * verify: every (hist, nn, c1, c2, sb) must satisfy the cell and
    * bucket formulas under the meta geometry. A bounded 100-row sample
    * (the t29 validateBuckets device — the clean case stays cheap)
    * makes a drifted meta essentially impossible to miss. */
  private def validateSigGeometry(index: DataFrame, bins: (Int, Int),
                                  thresholdPpm: Int, buckets: Int): Unit = {
    val w = gridCellWidth(thresholdPpm)
    val sample = index.select(col("hist"), col("nn"), col("c1"),
      col("c2"), col("sb").cast("int")).limit(100).collect()
    require(sample.forall { r =>
      val hist = r.getSeq[Long](0)
      val (nn, c1, c2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      c1 == cellValOf(hist(bins._1), nn, w) &&
        c2 == cellValOf(hist(bins._2), nn, w) &&
        r.getInt(4) == sigBucketOf(c1, c2, buckets)
    }, "stored media signature rows do not match the meta geometry - " +
      "probe/append with the index's own meta table")
  }

  /**
   * Probe a stored media signature index with a batch of media items:
   * (id, probe_id) — every stored item within the release threshold of
   * each probe item, decided by the IDENTICAL exact integer
   * [[ppmExact]] gate over the STORED histograms. The corpus payloads
   * are never touched: the probe histograms its own (batch-sized)
   * payloads map-side, derives grid cells under the stored geometry,
   * replicates into the 3×3 cell neighborhood (recall exactly 1 — the
   * per-coordinate bound; each qualifying pair matches exactly once,
   * so no distinct), and equi-joins the signature store on
   * (sb, format, c1, c2).
   *
   * `broadcastProbe` (default true — an arriving batch is small by
   * definition) pins the probe side as the broadcast build, which arms
   * the stored scan's `sb` dynamic partition pruning (PlanSpec-pinned)
   * and keeps the store off any shuffle; pass false for a corpus-sized
   * probe set (the m05 self-probe), trading a shuffle join for the
   * broadcast limit. Self-pairs (same id both sides) are excluded so a
   * corpus can probe its own store.
   */
  def mediaSignatureProbe(index: DataFrame, meta: DataFrame,
                          probes: DataFrame,
                          broadcastProbe: Boolean = true): DataFrame =
    probeFromHists(index, meta, histsOf(probes), broadcastProbe)

  /** [[mediaSignatureProbe]] over already-computed probe histograms —
    * the one-payload-pass streaming entry (see [[nearDupFromHists]]). */
  private[graft] def probeFromHists(index: DataFrame, meta: DataFrame,
                                    probeHists: DataFrame,
                                    broadcastProbe: Boolean): DataFrame = {
    val (bins, thresholdPpm, buckets) = readSigMeta(meta)
    validateSigGeometry(index, bins, thresholdPpm, buckets)
    val thr2 = thresholdPpm.toLong * thresholdPpm
    val probeSigs = sigRowsOf(probeHists, thresholdPpm, bins, buckets)
    // broadcast path: materialize the (batch-sized by definition)
    // probe keys ONCE — the histogram pass is an OBJECT plan
    // (mapPartitions), and AQE's dynamic-partition-pruning reuse
    // requires the join's broadcast and the DPP subquery to
    // canonicalize to the SAME exchange; through the un-materialized
    // object plan the stage-cache lookup misses and the planner
    // silently degrades the filter to dynamicpruningexpression(true) —
    // a full store scan (measured; the spec pins the pruned read).
    // The checkpoint also stops the probe payloads being histogrammed
    // twice (join build + pruning subquery).
    val keyed = if (broadcastProbe) probeSigs.localCheckpoint(true)
                else probeSigs
    val shifted = keyed
      .withColumn("d1", explode(lit(Array(-1L, 0L, 1L))))
      .withColumn("d2", explode(lit(Array(-1L, 0L, 1L))))
      .select(col("id").as("probe_id"), col("format"),
        col("hist").as("__hb"), col("nn").as("nb"),
        (col("c1") + col("d1")).as("c1"), (col("c2") + col("d2")).as("c2"))
      .withColumn("sb", sigBucket(col("c1"), col("c2"), buckets))
    val p = if (broadcastProbe) broadcast(shifted) else shifted
    // corpus-sized-probe path: the signature tables are narrow BEFORE
    // the join and pair-explosive AFTER, so AQE's input-size-based
    // coalescing would fold the exchange to ~1 partition and serialize
    // the verify work (the brutePairsOf hazard); a user-specified
    // count is exempt
    val ix = if (broadcastProbe) index
             else index.repartition(
               index.sparkSession.sparkContext.defaultParallelism,
               col("sb"), col("format"), col("c1"), col("c2"))
    ix.join(p, Seq("sb", "format", "c1", "c2"))
      .filter(col("id") =!= col("probe_id"))
      .select(col("id"), col("probe_id"),
        aggregate(zip_with(col("hist"), col("__hb"), _ * _),
          lit(0L), _ + _).as("dot"),
        col("nn").as("na"), col("nb"))
      .filter(ppmExact(thr2))
      .select(col("id"), col("probe_id"))
  }

  /** Signature rows for new media under a RELEASED meta geometry — the
    * unvalidated core shared by [[mediaSignatureAppend]] (which
    * validates against the stored rows first), the first-batch path of
    * streaming ingestion (no store to validate yet), and
    * [[graft.ops.Profile.indexRepair]]'s buildRows closure (signature
    * rows are per-item facts, so the media family repairs row-level
    * like dedup/postings/fps). */
  def mediaSignatureRows(meta: DataFrame, newMedia: DataFrame): DataFrame =
    rowsFromHists(meta, histsOf(newMedia))

  /** [[mediaSignatureRows]] over already-computed histograms (the
    * streaming first-batch path — see [[nearDupFromHists]]). */
  private[graft] def rowsFromHists(meta: DataFrame,
                                   hists: DataFrame): DataFrame = {
    val (bins, thresholdPpm, buckets) = readSigMeta(meta)
    sigRowsOf(hists, thresholdPpm, bins, buckets)
  }

  /**
   * Incremental maintenance for a stored [[mediaSignatureIndex]] — the
   * media family's append member (the t30/t31/d18 contract): a new
   * media batch emits its signature rows under the STORED geometry
   * (histogrammed from the BATCH payloads only — the corpus is never
   * re-read), schema-identical to the released layout and ready to
   * `write.mode("append").partitionBy("sb")` into it. Only touched
   * buckets gain files; probes' dynamic partition pruning keeps working
   * unchanged over the appended layout.
   *
   * Equivalence contract (spec-pinned, the m05 hash gate): signature
   * rows are per-item facts OF THE RELEASE GEOMETRY, so append(index,
   * delta) ∪-equals the index rebuilt from scratch over corpus ∪ delta
   * with the same meta — and because candidate recall is 1 under any
   * bin choice, a probe over the appended store equals the exact gate
   * over the union even where a from-scratch rebuild would have chosen
   * different bins. The meta geometry is validated against a bounded
   * sample of the stored rows BEFORE any row is derived (a drifted
   * meta here would scatter the newest signatures into wrong partitions
   * permanently). Caller contract: delta ids must be NEW (the d07/e22
   * convention; [[graft.ops.Profile.indexAudit]] is the drift check).
   */
  def mediaSignatureAppend(index: DataFrame, meta: DataFrame,
                           newMedia: DataFrame): DataFrame =
    appendFromHists(index, meta, histsOf(newMedia))

  /** [[mediaSignatureAppend]] over already-computed histograms (the
    * streaming append path — see [[nearDupFromHists]]). */
  private[graft] def appendFromHists(index: DataFrame, meta: DataFrame,
                                     hists: DataFrame): DataFrame = {
    val (bins, thresholdPpm, buckets) = readSigMeta(meta)
    validateSigGeometry(index, bins, thresholdPpm, buckets)
    sigRowsOf(hists, thresholdPpm, bins, buckets)
  }

  /**
   * [[mediaNearDup]]'s output THROUGH the stored signature index — the
   * m05 gate composition: self-probe the store with the corpus
   * (`broadcastProbe = false`: the probe side is corpus-sized by
   * construction), order each surviving pair once, and fold to the
   * dedup family's (id, keep_id, is_dup) one-hop min-id reps. Equals
   * [[mediaNearDup]] exactly (recall 1 + the identical exact gate)
   * whenever the store covers `media` — the coverage precondition the
   * family's x13 audit row checks.
   */
  def mediaNearDupIndexed(index: DataFrame, meta: DataFrame,
                          media: DataFrame): DataFrame = {
    val pairs = mediaSignatureProbe(index, meta, media,
        broadcastProbe = false)
      .filter(col("id") < col("probe_id"))
      .select(col("id").as("id_a"), col("probe_id").as("id_b"))
    Dedup.minNeighborReps(media.select(col("id")), pairs)
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
