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

  /** The broadcast-quadratic-within-format exact pair stage, shared by the
    * brute tier and [[mediaNearDupScaled]]'s auto-fallback.
    *
    * Explicit partition count: the histogram table is tiny BEFORE the
    * join and huge AFTER (row-explosive broadcast join), so AQE's
    * input-size-based coalescing would fold the exchange to 1 partition
    * and serialize the n² work; a user-specified count is exempt. */
  private def brutePairsOf(hists: DataFrame, thr2: Long,
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
   * bucketing pays off only when the feature has angular diversity. The
   * text-derived nibble histograms of the fixture are near-collinear
   * (every English doc points the same way), so the buckets degenerate
   * toward format-blocking and the candidate set stays ~quadratic with
   * ~6× band multiplicity on top — strictly more pair work than the m03
   * broadcast tier, with a distinct() on the explosion for dessert. Real
   * perceptual hashes (pHash bits, CLIP embeddings) spread over the
   * sphere and flip that comparison. The right tier is therefore a
   * DATA property, not a corpus-size property, so this operator measures
   * it: a cheap probe aggregates the banded index (one pass over n×bands
   * rows, no join) into the LSH tier's candidate mass Σ_bucket C(k,2)
   * and compares it against the brute tier's Σ_format C(n,2); if
   * bucketing isn't cutting at least half the pair work it runs the
   * brute pair stage instead (same [[ppmExact]] gate, so the output is
   * identical either way — the probe changes COST, never the answer).
   * The probe itself is two scalar aggregates over the checkpointed
   * histogram table — at 100 TB that's the price of one extra
   * metadata-sized pass, orders below the cost of running the wrong
   * tier.
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
    val lshMass = pairMass(
      banded.groupBy(col("format"), col("band_id"), col("band_key")).count())
    val bruteMass = pairMass(hists.groupBy(col("format")).count())
    val pairs =
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
