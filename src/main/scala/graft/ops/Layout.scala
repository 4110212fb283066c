package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional storage layout: Z-order (Morton-curve) clustering of
 * a fact table on two integral columns, with a box-query probe that
 * reads only the matching clustered partitions.
 *
 * Reference behavior: iceberg-explorer inspects partition specs
 * (`api/routes/catalog.py`, `catalog/models.py` — including Iceberg
 * transform specs) but never OPTIMIZES a layout; at 100 TB the layout
 * IS the query plan: a fact table range-partitioned on one column
 * answers one-dimensional slices and full-scans everything else,
 * while a Z-order clustering interleaves two dimensions so a box query
 * on (a, b) — "this user cohort in this key range", "this time window
 * at these temperatures" — prunes to the files whose curve segment
 * intersects the box (the OPTIMIZE ZORDER device of Delta/Iceberg,
 * from Morton 1966; Orenstein & Merrett 1984 for the range-query
 * algebra).
 *
 * Mechanics: each dimension is quantized to 2^bits cells over its
 * data min/max with exact integer arithmetic
 * (cell = (v − min)·2^bits div (max − min + 1), computed in
 * DECIMAL(38,0) so a full-range BIGINT column cannot overflow the
 * product), the two cell ids bit-interleave into the Morton code z,
 * and z's contiguous ranges fold into `nBuckets` partition directories
 * (zbucket = z div (4^bits / nBuckets)). A box query's candidate
 * buckets are enumerable from the quantization alone — the cell
 * rectangle [ca1..ca2]×[cb1..cb2] Morton-maps to ≤ 4^bits cells (a
 * bounded, driver-side integer enumeration; no data touched) — so the
 * probe plans a STATIC partition-pruned scan (`zbucket IN (…)` in
 * PartitionFilters) plus the exact residual predicate. Correctness
 * never depends on the enumeration being tight, only COMPLETE: every
 * cell the box touches must contribute its bucket, which is exactly
 * what the index-blind oracle's hash gate certifies (a dropped bucket
 * = dropped rows = mismatch).
 *
 * The layout is self-describing: a 1-row `bounds` table (min/max per
 * dimension, bits, n_buckets) persists next to the data and the probe
 * reads its parameters from there — a probe run with drifted constants
 * would enumerate the wrong buckets, so the constants live WITH the
 * artifact, never in caller code. Data writes first, bounds last: a
 * crashed write leaves a layout with no bounds table, which every
 * probe fails loudly on, never a silently-wrong prune.
 *
 * Scale design (100 TB): the write is one pass — two-column min/max
 * aggregate (map-side combined), then a range exchange on z (contiguous
 * buckets → contiguous task ranges, so the dynamic-partition writer
 * holds one open file per task) with rows sorted by z within tasks for
 * tight row-group stats. The probe moves NO data to plan: bucket
 * enumeration is closed-form driver arithmetic on the 1-row bounds,
 * and the scan reads only matching directories. Skew: z quantization
 * is value-based, so a hot cell lands in one bucket — size nBuckets so
 * buckets ≈ file-sized, and compact with
 * [[graft.streaming.DocumentStreams.compactStore]] (partition-
 * preserving, skew-splitting) as data accumulates.
 */
object Layout {

  /** Morton interleave of two cell columns (ca gets the odd bits —
    * the HIGHER bit of each pair — cb the even). */
  private[ops] def morton(ca: org.apache.spark.sql.Column,
                          cb: org.apache.spark.sql.Column,
                          bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Driver-side mirrors of the in-plan quantization — the probe's
    * bucket enumeration MUST reproduce the write's arithmetic
    * bit-for-bit, so both sides are exact integer forms of the same
    * formula (BigInt here, DECIMAL(38,0) in the plan). */
  private[ops] def cellOf(v: Long, mn: Long, mx: Long, bits: Int): Long =
    ((BigInt(v) - BigInt(mn)) * (1L << bits) /
      (BigInt(mx) - BigInt(mn) + 1)).toLong

  private[ops] def mortonOf(ca: Long, cb: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((ca >> i) & 1L) << (2 * i + 1)) | (((cb >> i) & 1L) << (2 * i))
    }.reduce(_ | _)

  private def integral(df: DataFrame, c: String): Unit = {
    require(df.columns.contains(c), s"no column $c")
    val t = df.schema(c).dataType.typeName
    require(Set("byte", "short", "integer", "long").contains(t),
      s"zorder column $c must be integral, got $t")
  }

  /**
   * Write `df` Z-order-clustered on (`colA`, `colB`) under `dir`:
   * `dir/data` partitioned by zbucket (rows keep all original columns
   * plus z and zbucket), `dir/bounds` the 1-row parameter table
   * (min_a, max_a, min_b, max_b, bits, n_buckets) written LAST.
   * Returns the bounds row's values (minA, maxA, minB, maxB).
   */
  def zorderWrite(df: DataFrame, colA: String, colB: String, dir: String,
                  bits: Int = 5, nBuckets: Int = 64): (Long, Long, Long, Long) = {
    integral(df, colA); integral(df, colB)
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    val cells = 1L << (2 * bits)
    require(nBuckets >= 1 && cells % nBuckets == 0,
      s"n_buckets=$nBuckets must divide 4^bits=$cells")
    val b = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"zorderWrite needs non-null $colA/$colB data (empty input?)")
    val (mnA, mxA, mnB, mxB) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    def cell(c: String, mn: Long, mx: Long) =
      expr(s"CAST(((CAST($c AS DECIMAL(38,0)) - ($mn)) * ${1L << bits})" +
        s" DIV ((CAST($mx AS DECIMAL(38,0))) - ($mn) + 1) AS BIGINT)")
    val spark = df.sparkSession
    val clustered = df
      .withColumn("z",
        morton(cell(colA, mnA, mxA), cell(colB, mnB, mxB), bits))
      .withColumn("zbucket", expr(s"z DIV ${cells / nBuckets}"))
      .repartitionByRange(nBuckets, col("z"))
      .sortWithinPartitions(col("z"))
    clustered.write.mode("overwrite").partitionBy("zbucket")
      .parquet(s"$dir/data")
    // bounds last: a crashed data write must not leave a readable-
    // looking layout whose probes prune with stale parameters
    spark.range(1).select(
      lit(mnA).as("min_a"), lit(mxA).as("max_a"),
      lit(mnB).as("min_b"), lit(mxB).as("max_b"),
      lit(bits).as("bits"), lit(nBuckets).as("n_buckets"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bounds")
    (mnA, mxA, mnB, mxB)
  }

  /**
   * Box query over a [[zorderWrite]] layout: rows with
   * `colA` ∈ [loA, hiA] and `colB` ∈ [loB, hiB], read through a
   * statically partition-pruned scan of the candidate zbuckets (the
   * Morton cells of the clamped box rectangle, enumerated driver-side
   * from the stored bounds — never from data) plus the exact residual
   * predicate. Output drops the layout's z/zbucket helper columns:
   * probe results are row-identical to filtering the raw table.
   */
  def boxProbe(spark: SparkSession, dir: String, colA: String, colB: String,
               loA: Long, hiA: Long, loB: Long, hiB: Long): DataFrame =
    boxProbeTables(spark.read.parquet(s"$dir/data"),
      spark.read.parquet(s"$dir/bounds"), colA, colB, loA, hiA, loB, hiB)

  /** [[boxProbe]] over already-loaded store/bounds tables — the HTTP
    * box-search route's form (layout artifacts registered as catalog
    * tables), same arithmetic, same static pruning. */
  def boxProbeTables(store: DataFrame, boundsDf: DataFrame,
                     colA: String, colB: String,
                     loA: Long, hiA: Long, loB: Long, hiB: Long): DataFrame = {
    integral(store, colA); integral(store, colB)
    require(store.columns.contains("zbucket"),
      "store is not a zorderWrite layout (no zbucket column)")
    val boundsRows = boundsDf.head(1)
    require(boundsRows.nonEmpty,
      "bounds table is empty - not a zorderWrite layout")
    val p = boundsRows(0)
    val (mnA, mxA, mnB, mxB) = (p.getAs[Long]("min_a"),
      p.getAs[Long]("max_a"), p.getAs[Long]("min_b"), p.getAs[Long]("max_b"))
    val bits = p.getAs[Int]("bits")
    val nBuckets = p.getAs[Int]("n_buckets")
    val out = store.drop("z", "zbucket")
    if (loA > hiA || loB > hiB || loA > mxA || hiA < mnA ||
        loB > mxB || hiB < mnB) return out.filter(lit(false))
    val cellsPerBucket = (1L << (2 * bits)) / nBuckets
    val (ca1, ca2) = (cellOf(math.max(loA, mnA), mnA, mxA, bits),
      cellOf(math.min(hiA, mxA), mnA, mxA, bits))
    val (cb1, cb2) = (cellOf(math.max(loB, mnB), mnB, mxB, bits),
      cellOf(math.min(hiB, mxB), mnB, mxB, bits))
    val buckets = (for {
      ca <- ca1 to ca2
      cb <- cb1 to cb2
    } yield mortonOf(ca, cb, bits) / cellsPerBucket).distinct.sorted
    store
      .filter(col("zbucket").isin(buckets: _*) &&
        col(colA).between(loA, hiA) && col(colB).between(loB, hiB))
      .drop("z", "zbucket")
  }
}
