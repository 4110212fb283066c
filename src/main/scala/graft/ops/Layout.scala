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
 * rectangle [ca1..ca2]×[cb1..cb2] decomposes by Morton QUADTREE into
 * ≤ 4·nBuckets prefix-aligned z-ranges ([[candidateBuckets]] — driver
 * arithmetic bounded by the bucket count, never by 4^bits; no data
 * touched) — so the
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

  /**
   * Candidate zbuckets of the cell rectangle [ca1..ca2]×[cb1..cb2] by
   * QUADTREE decomposition — driver work is O(nBuckets), never
   * O(cells). The r12 form enumerated every cell in the rectangle
   * ((ca2−ca1+1)·(cb2−cb1+1) iterations — fine at the default bits=5,
   * ~10¹² at bits=20 for a wide box: a driver-side scale-killer hiding
   * behind a parameter). A Morton quad (a power-of-4-sized, prefix-
   * aligned square) IS a contiguous z-range, so recursing from the full
   * square: a quad disjoint from the box contributes nothing; a quad
   * whose z-range fits inside ONE bucket contributes that bucket and
   * stops (4^bits and nBuckets are both powers of two, so quad size ≤
   * cellsPerBucket implies the aligned range never straddles a bucket
   * boundary); a quad fully inside the box contributes its whole
   * contiguous bucket span closed-form. Recursion therefore never
   * descends below bucket granularity — ≤ 4·nBuckets nodes visited
   * regardless of `bits` (spec-pinned at bits=16) — and the result
   * EQUALS the per-cell enumeration's (each emitted bucket holds at
   * least one in-box cell; property-tested differentially at small
   * bits): same completeness, same tightness, bounded driver cost.
   *
   * Returns (sorted candidate buckets, nodes visited — the pinned
   * cost witness).
   */
  private[ops] def candidateBuckets(ca1: Long, ca2: Long, cb1: Long,
      cb2: Long, bits: Int, nBuckets: Int): (Seq[Long], Long) = {
    val cpb = (1L << (2 * bits)) / nBuckets
    val out = scala.collection.mutable.SortedSet.empty[Long]
    var visited = 0L
    def rec(level: Int, caP: Long, cbP: Long): Unit = {
      visited += 1
      val side = 1L << (bits - level)
      val (aLo, aHi) = (caP * side, caP * side + side - 1)
      val (bLo, bHi) = (cbP * side, cbP * side + side - 1)
      if (aHi < ca1 || aLo > ca2 || bHi < cb1 || bLo > cb2) return
      val sizeCells = side * side
      val z0 = mortonOf(aLo, bLo, bits)
      if (sizeCells <= cpb) { out += z0 / cpb; return }
      if (aLo >= ca1 && aHi <= ca2 && bLo >= cb1 && bHi <= cb2) {
        out ++= (z0 / cpb) to ((z0 + sizeCells - 1) / cpb)
        return
      }
      rec(level + 1, caP * 2, cbP * 2)
      rec(level + 1, caP * 2, cbP * 2 + 1)
      rec(level + 1, caP * 2 + 1, cbP * 2)
      rec(level + 1, caP * 2 + 1, cbP * 2 + 1)
    }
    rec(0, 0L, 0L)
    (out.toSeq, visited)
  }

  /** Read the 1-row bounds of the layout at `dir` — the shared entry
    * gate of every stored-layout operation ([[zorderAppend]],
    * [[zorderWiden]], [[zorderRepair]], [[boxProbe]]). Two loud
    * failure modes instead of a confusing read error: a layout whose
    * WHOLE directory is missing while `dir.__old` exists is a
    * mid-[[zorderWiden]]-swap crash (the window between the two
    * renames) — the message names the recovery, moving `dir.__old`
    * back; a layout with data but no bounds is a crashed
    * [[zorderWrite]] (bounds are written last by design). */
  private def storedBounds(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Row = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dirPath) &&
        fs.exists(new org.apache.hadoop.fs.Path(dir + ".__old")))
      throw new IllegalStateException(
        s"$dir is missing but $dir.__old exists - a widen/repair swap " +
          s"crashed between its two renames; recover by renaming " +
          s"$dir.__old back to $dir")
    val boundsRows = spark.read.parquet(s"$dir/bounds").head(1)
    require(boundsRows.nonEmpty,
      "bounds table is empty - not a zorderWrite layout")
    boundsRows(0)
  }

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
   *
   * `envelope` (minA, maxA, minB, maxB), when given, PROVISIONS the
   * quantization domain instead of deriving it from the data — the
   * release-owner form every maintained layout wants: a layout whose
   * bounds are its first write's min/max rejects any later
   * [[zorderAppend]]/[[zorderRepair]]/streaming batch that lands
   * outside what that first cut happened to contain, while a
   * release-provisioned envelope (the expected key domain) admits the
   * whole maintenance lifetime. Data outside a given envelope fails
   * loudly (same gate as the append side — an out-of-envelope value
   * has no cell). Cells get coarser as an envelope widens (cell width
   * = domain/2^bits), which trades probe tightness, never correctness.
   *
   * `batch_id` is a RESERVED column name across the stored families
   * (the streaming maintenance stamp; probes drop it from output), so
   * a release over a raw table that carries its own `batch_id` data
   * column is rejected loudly here — silently serving probes with the
   * user's column stripped would break the "row-identical to filtering
   * the raw table" contract. Rename the column before laying out.
   * ([[zorderWiden]] passes store rows whose batch_id IS the stamp and
   * enters through the internal path below; [[zorderRepair]] rewrites
   * through its own clusteredBy + write-verify-swap and never
   * re-enters here.)
   */
  def zorderWrite(df: DataFrame, colA: String, colB: String, dir: String,
                  bits: Int = 5, nBuckets: Int = 64,
                  envelope: Option[(Long, Long, Long, Long)] = None)
      : (Long, Long, Long, Long) = {
    require(!df.columns.contains("batch_id"),
      "batch_id is reserved for the streaming maintenance stamp (box " +
        "probes drop it from output) - rename the input column before " +
        "creating a layout over it")
    zorderWriteInternal(df, colA, colB, dir, bits, nBuckets, envelope)
  }

  /** [[zorderWrite]] without the reserved-name gate — the maintenance
    * rewrites' entry ([[zorderWiden]]: the corpus legitimately carries
    * the streams' batch_id stamps). */
  private def zorderWriteInternal(df: DataFrame, colA: String,
      colB: String, dir: String, bits: Int, nBuckets: Int,
      envelope: Option[(Long, Long, Long, Long)])
      : (Long, Long, Long, Long) = {
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
    val (mnA, mxA, mnB, mxB) = envelope match {
      case None => (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      case Some((eMnA, eMxA, eMnB, eMxB)) =>
        require(eMnA <= eMxA && eMnB <= eMxB,
          s"inverted envelope [$eMnA..$eMxA, $eMnB..$eMxB]")
        require(b.getLong(0) >= eMnA && b.getLong(1) <= eMxA &&
            b.getLong(2) >= eMnB && b.getLong(3) <= eMxB,
          s"zorderWrite: data [$colA ${b.getLong(0)}..${b.getLong(1)}, " +
            s"$colB ${b.getLong(2)}..${b.getLong(3)}] falls outside the " +
            s"provisioned envelope [$eMnA..$eMxA, $eMnB..$eMxB]")
        (eMnA, eMxA, eMnB, eMxB)
    }
    val spark = df.sparkSession
    clusteredBy(df, colA, colB, mnA, mxA, mnB, mxB, bits, nBuckets)
      .write.mode("overwrite").partitionBy("zbucket")
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

  /** The write-side clustering both [[zorderWrite]] and
    * [[zorderAppend]] share — the in-plan DECIMAL(38,0) quantization
    * mirrored by [[cellOf]], Morton interleave, bucket fold, a
    * zbucket-KEYED hash exchange and a within-task sort by z for tight
    * row-group stats.
    *
    * r15: this was `repartitionByRange(nBuckets, z)`. A range exchange
    * pays a SECOND full execution of its child for the range
    * partitioner's reservoir sampling — here the child is the
    * quantization projection over the whole input, so every layout
    * write read its corpus twice (profiled at sf0.1: a duplicate
    * ~0.55 s single-task pass per clusteredBy; at 100 TB a duplicate
    * full corpus scan). The bucket boundaries are CLOSED-FORM
    * (zbucket = z div cells/nBuckets), so sampling buys nothing the
    * key does not already encode: hashing on zbucket keeps every
    * bucket wholly inside one task (still exactly one file per bucket
    * directory) and removes the sampling pass outright (guide §2.4).
    * Trade, stated: hash collisions can land 2–4 of the nBuckets
    * buckets in one reduce task (the guide §2.5 few-distinct-keys
    * caveat), a bounded write-tail skew — cheaper than a full extra
    * corpus pass at any scale. Placement (zbucket dirs), file-per-
    * bucket count, row order within files (z-sorted), and probe
    * results are all unchanged. */
  private def clusteredBy(df: DataFrame, colA: String, colB: String,
      mnA: Long, mxA: Long, mnB: Long, mxB: Long,
      bits: Int, nBuckets: Int): DataFrame = {
    val cells = 1L << (2 * bits)
    def cell(c: String, mn: Long, mx: Long) =
      expr(s"CAST(((CAST($c AS DECIMAL(38,0)) - ($mn)) * ${1L << bits})" +
        s" DIV ((CAST($mx AS DECIMAL(38,0))) - ($mn) + 1) AS BIGINT)")
    df.withColumn("z",
        morton(cell(colA, mnA, mxA), cell(colB, mnB, mxB), bits))
      .withColumn("zbucket", expr(s"z DIV ${cells / nBuckets}"))
      .repartition(nBuckets, col("zbucket"))
      .sortWithinPartitions(col("z"))
  }

  /**
   * Append `delta` into an existing [[zorderWrite]] layout at `dir`:
   * rows cluster with the STORED bounds (read from `dir/bounds`, never
   * recomputed), so appended rows land in exactly the buckets a
   * from-scratch rewrite over (corpus ∪ delta) would assign — the
   * append ≡ rewrite contract (spec-pinned): as long as the delta stays
   * inside the stored envelope, a rewrite's recomputed min/max equal
   * the stored ones, so every cell, z and zbucket matches bit-for-bit
   * and probes prune identically over the appended store.
   *
   * Out-of-envelope input FAILS LOUDLY (the decided semantics — a
   * value past [min, max] has no cell under the stored quantization;
   * clamping it would silently break the probe's completeness argument
   * for every later box touching the edge cells, the one failure a
   * layout must never admit). The remedy is a widen-and-rewrite:
   * re-run [[zorderWrite]] over corpus ∪ delta (the error says so),
   * with [[graft.streaming.DocumentStreams.compactStore]]'s swap
   * protocol as the safe in-place form. Like every stored-index append
   * here, the per-append cost is delta-sized: one min/max aggregate
   * over the delta plus its own range exchange — the corpus is never
   * re-read. Appends accumulate small files per bucket directory;
   * compact with `compactStore(dir + "/data", sortCols = Seq("z"),
   * partitionCols = Seq("zbucket"))` — layout-preserving, skew-
   * splitting — as they build up.
   */
  def zorderAppend(delta: DataFrame, colA: String, colB: String,
                   dir: String): Unit = {
    // same reserved-name gate as zorderWrite: a user data column named
    // batch_id would read as COMMIT MARKERS to streaming maintenance
    // (committedIn) — a later micro-batch whose id collides with the
    // planted values would be silently skipped. The streams stamp their
    // own batch_id and enter through the internal path.
    require(!delta.columns.contains("batch_id"),
      "batch_id is reserved for the streaming maintenance stamp - " +
        "rename the input column, or append through " +
        "EventStreams.layoutBatch if this IS a stamped maintenance batch")
    zorderAppendInternal(delta, colA, colB, dir)
  }

  /** [[zorderAppend]] without the reserved-name gate — the streaming
    * maintenance entry ([[graft.streaming.EventStreams.layoutBatch]]
    * stamps batch_id deliberately). */
  private[graft] def zorderAppendInternal(delta: DataFrame, colA: String,
                                          colB: String, dir: String): Unit = {
    integral(delta, colA); integral(delta, colB)
    val spark = delta.sparkSession
    val p = storedBounds(spark, dir)
    val (mnA, mxA, mnB, mxB) = (p.getAs[Long]("min_a"),
      p.getAs[Long]("max_a"), p.getAs[Long]("min_b"), p.getAs[Long]("max_b"))
    val bits = p.getAs[Int]("bits")
    val nBuckets = p.getAs[Int]("n_buckets")
    require(bits >= 1 && bits <= 20,
      s"bounds table bits must be in [1,20], got $bits")
    require(nBuckets >= 1 && (1L << (2 * bits)) % nBuckets == 0,
      s"bounds table n_buckets=$nBuckets must divide 4^bits=${1L << (2 * bits)}")
    val b = delta.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"zorderAppend needs non-null $colA/$colB data (empty delta?)")
    require(b.getLong(0) >= mnA && b.getLong(1) <= mxA &&
        b.getLong(2) >= mnB && b.getLong(3) <= mxB,
      s"zorderAppend: delta [$colA ${b.getLong(0)}..${b.getLong(1)}, " +
        s"$colB ${b.getLong(2)}..${b.getLong(3)}] falls outside the " +
        s"stored envelope [$mnA..$mxA, $mnB..$mxB] - widen first " +
        "(zorderWidenStore with an envelope covering the delta; it " +
        "reads the store with mergeSchema so streaming batch markers " +
        "survive); an out-of-envelope value has no cell under the " +
        "stored quantization")
    clusteredBy(delta, colA, colB, mnA, mxA, mnB, mxB, bits, nBuckets)
      .write.mode("append").partitionBy("zbucket").parquet(s"$dir/data")
  }

  /**
   * Widen-and-rewrite — the remedy every envelope-gate failure here
   * names ([[zorderAppend]]/[[zorderRepair]]/the streaming batch):
   * re-cluster `corpus` under a NEW provisioned envelope and swap the
   * whole layout (data AND bounds — they must move together: a probe
   * racing a data-only swap would enumerate buckets with the wrong
   * quantization) in place of the old one. The rewrite builds
   * completely in a side directory with [[zorderWrite]]'s own
   * bounds-last crash ordering, is row-count-verified against the
   * corpus, then two renames replace `dir`. Each rename is atomic,
   * but there is a WINDOW between them where no live store exists at
   * `dir`: a crash there strands the complete old layout at
   * `dir.__old` (never a mixed-quantization store — recovery is
   * renaming it back, and [[storedBounds]] detects the state and
   * names that remedy on the next read). Run with writers AND readers
   * of `dir` stopped (the [[graft.streaming.DocumentStreams
   * .compactStore]] rule — a reader racing the swap window fails on a
   * missing path). The new envelope must contain the old one — a
   * widen that can DROP domain is a rewrite mistake, rejected loudly.
   *
   * `bits`/`nBuckets` default to the STORED layout's geometry (a
   * widen is a domain change, not a resolution change): an operator
   * following [[zorderAppend]]'s error-message remedy on a
   * fine-grained layout must not silently re-cluster it to a coarse
   * default — probes would stay correct (bounds swap with data) but
   * pruning tightness would silently degrade. Pass them explicitly
   * only to deliberately re-provision resolution along with domain.
   *
   * If the corpus passed in is the store itself (the streaming-
   * maintenance case — [[graft.streaming.EventStreams.layoutBatch]]),
   * its `batch_id` commit markers ride the rewrite unchanged, so a
   * resumed maintenance stream's skip-if-present guard keeps meaning
   * what it says (spec-pinned: widen-then-resume).
   */
  def zorderWiden(corpus: DataFrame, colA: String, colB: String,
                  dir: String, envelope: (Long, Long, Long, Long),
                  bits: Option[Int] = None,
                  nBuckets: Option[Int] = None): Unit = {
    val spark = corpus.sparkSession
    val p = storedBounds(spark, dir)
    require(envelope._1 <= p.getAs[Long]("min_a") &&
        envelope._2 >= p.getAs[Long]("max_a") &&
        envelope._3 <= p.getAs[Long]("min_b") &&
        envelope._4 >= p.getAs[Long]("max_b"),
      s"zorderWiden: new envelope $envelope does not contain the " +
        s"stored one [${p.getAs[Long]("min_a")}..${p.getAs[Long]("max_a")}, " +
        s"${p.getAs[Long]("min_b")}..${p.getAs[Long]("max_b")}] - " +
        "widening must never drop domain")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // a legacy (pre-relocation) streaming checkpoint INSIDE the layout
    // dir would be destroyed by the whole-dir swap below — the resumed
    // stream would then restart batch ids at 0, collide with the
    // store's markers, and silently drop fresh batches. Refuse BEFORE
    // the (expensive) rewrite; the remedy is the same one rename the
    // maintenance query's migration gate names.
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_checkpoint")))
      throw new IllegalStateException(
        s"$dir holds a legacy streaming checkpoint at $dir/_checkpoint " +
          s"- the widen swap would destroy it; move it to " +
          s"$dir.__checkpoint (one rename, stream stopped) first")
    val tmp = dir + ".__widen"
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    zorderWriteInternal(corpus.drop("z", "zbucket"), colA, colB, tmp,
      bits.getOrElse(p.getAs[Int]("bits")),
      nBuckets.getOrElse(p.getAs[Int]("n_buckets")),
      envelope = Some(envelope))
    val (nNew, nCorpus) =
      (spark.read.parquet(s"$tmp/data").count(), corpus.count())
    require(nNew == nCorpus,
      s"widen rewrite of $dir has $nNew rows, corpus has $nCorpus")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir + ".__old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(dirPath, old), s"could not move $dir aside")
    require(fs.rename(tmpPath, dirPath), s"could not move $tmp into place")
    fs.delete(old, true)
  }

  /**
   * The MAINTENANCE form of [[zorderWiden]]: widen the layout at `dir`
   * from its own store. This is the remedy a streaming-maintenance
   * envelope failure should use ([[graft.streaming.EventStreams
   * .layoutBatch]]): the store is read HERE with `mergeSchema`, so the
   * streams' `batch_id` commit markers survive the rewrite regardless
   * of the store's mixed release/appended file schemas. A caller-side
   * `spark.read.parquet(dir + "/data")` without the merge samples ONE
   * arbitrary footer — if it lands on a release file the rewrite
   * silently drops the batch_id column, the resumed stream's
   * skip-if-present guard stops recognizing committed batches, and the
   * last in-flight batch double-appends (spec-pinned against).
   * Use the DataFrame form only when re-deriving the layout from a
   * source table rather than from the store itself.
   */
  def zorderWidenStore(spark: SparkSession, dir: String,
                       colA: String, colB: String,
                       envelope: (Long, Long, Long, Long),
                       bits: Option[Int] = None,
                       nBuckets: Option[Int] = None): Unit =
    zorderWiden(
      spark.read.option("mergeSchema", "true").parquet(s"$dir/data"),
      colA, colB, dir, envelope, bits, nBuckets)

  /**
   * Reconcile a [[zorderWrite]] layout with its corpus — the layout
   * family's repair member (p19), acting on the two signals its x13
   * release-audit row reports: ORPHANED store rows (their corpus row
   * was deleted) are dropped by an `idCol` semi-join, and UNINDEXED
   * corpus rows (append lag — e.g. a [[zorderAppend]] that failed the
   * envelope gate and was never retried) are clustered through the
   * STORED bounds and added. The result replaces `dir/data` via the
   * write-verify-swap protocol ([[graft.streaming.DocumentStreams
   * .compactStore]]'s two-rename device; run with writers stopped).
   *
   * Contract (spec-pinned): after repair the store holds EXACTLY the
   * corpus rows, each in the bucket the stored quantization assigns —
   * `indexAudit(corpus, repaired)` reads n_unindexed = n_orphaned = 0
   * and fresh_ppm = 1e6, and box probes over the repaired layout equal
   * the raw corpus filter. Unindexed rows outside the stored envelope
   * fail loudly BEFORE any write ([[zorderAppend]]'s gate — the remedy
   * is the widen-and-rewrite, not row surgery with a wrong cell).
   *
   * Scale: the orphan drop prunes the corpus side to one id column
   * (semi-join); the backfill anti-join finds |unindexed| rows and
   * only THOSE take the quantization projection and range exchange;
   * the kept rows are rewritten as stored (no re-clustering — their z
   * is already right by the append ≡ rewrite invariant). The rewrite
   * itself is one pass over store-sized data — the same cost class as
   * the compaction every appended store periodically pays anyway;
   * when the audit reads clean, call nothing.
   *
   * Returns (orphans dropped, rows backfilled).
   */
  def zorderRepair(corpus: DataFrame, colA: String, colB: String,
                   idCol: String, dir: String): (Long, Long) = {
    integral(corpus, colA); integral(corpus, colB)
    require(corpus.columns.contains(idCol), s"no column $idCol")
    val spark = corpus.sparkSession
    val p = storedBounds(spark, dir)
    val (mnA, mxA, mnB, mxB) = (p.getAs[Long]("min_a"),
      p.getAs[Long]("max_a"), p.getAs[Long]("min_b"), p.getAs[Long]("max_b"))
    val bits = p.getAs[Int]("bits")
    val nBuckets = p.getAs[Int]("n_buckets")
    val store = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/data")
    require(store.columns.contains("zbucket") && store.columns.contains(idCol),
      s"store at $dir is not an id-carrying zorderWrite layout")
    val corpusIds = corpus.select(col(idCol))
    val kept = store.join(corpusIds, Seq(idCol), "left_semi")
    // persisted: the envelope gate, the backfill count and the rewrite
    // all read the anti-join — unpersisted it would recompute the
    // reconcile (corpus payload riding the join) once per consumer
    val missing = corpus.join(store.select(col(idCol)), Seq(idCol),
      "left_anti").persist()
    try {
      // envelope gate BEFORE any write — an out-of-envelope unindexed
      // row has no cell under the stored quantization
      val mb = missing.agg(
        min(col(colA)).cast("long"), max(col(colA)).cast("long"),
        min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
      val nMissing = if (mb.isNullAt(0)) 0L else {
        require(mb.getLong(0) >= mnA && mb.getLong(1) <= mxA &&
            mb.getLong(2) >= mnB && mb.getLong(3) <= mxB,
          s"zorderRepair: unindexed rows fall outside the stored envelope " +
            s"[$mnA..$mxA, $mnB..$mxB] - widen first (zorderWidenStore " +
            "with an envelope covering the corpus; it reads the store " +
            "with mergeSchema so streaming batch markers survive, then " +
            "re-run the repair)")
        missing.count()
      }
      val repaired = kept.unionByName(
        clusteredBy(missing, colA, colB, mnA, mxA, mnB, mxB, bits, nBuckets),
        allowMissingColumns = true)
      // write-verify-swap (the compactStore protocol): never overwrite
      // the live store in place
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val dataPath = new org.apache.hadoop.fs.Path(s"$dir/data")
      val tmpPath = new org.apache.hadoop.fs.Path(s"$dir/data.__repair")
      if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
      repaired.write.mode("overwrite").partitionBy("zbucket")
        .parquet(tmpPath.toString)
      // swap gate: the rewrite must account for every corpus row —
      // checked against the corpus directly, independent of the
      // kept/missing split; the split counts then derive by arithmetic
      // (no second execution of the reconcile joins)
      val (nOut, nCorpus) =
        (spark.read.parquet(tmpPath.toString).count(), corpus.count())
      require(nOut == nCorpus,
        s"repair rewrite of $dir has $nOut rows, corpus has $nCorpus")
      val nOrphans = store.count() - (nOut - nMissing)
      val old = new org.apache.hadoop.fs.Path(s"$dir/data.__old")
      if (fs.exists(old)) fs.delete(old, true)
      require(fs.rename(dataPath, old), s"could not move $dir/data aside")
      require(fs.rename(tmpPath, dataPath), s"could not move the rewrite in")
      fs.delete(old, true)
      (nOrphans, nMissing)
    } finally { missing.unpersist(); () }
  }

  /**
   * Box query over a [[zorderWrite]] layout: rows with
   * `colA` ∈ [loA, hiA] and `colB` ∈ [loB, hiB], read through a
   * statically partition-pruned scan of the candidate zbuckets (the
   * Morton cells of the clamped box rectangle, enumerated driver-side
   * from the stored bounds — never from data) plus the exact residual
   * predicate. Output drops the layout's helper columns — z, zbucket,
   * and the `batch_id` stamp streaming maintenance adds
   * ([[graft.streaming.EventStreams.layoutBatch]]; the name is
   * reserved across every store here): probe results are row-identical
   * to filtering the raw table.
   *
   * The store read merges schemas: a maintained layout holds MIXED
   * file schemas (release files without `batch_id`, appended files
   * with it), so without the merge the probe's output schema would
   * depend on which parquet footer Spark happened to sample —
   * nondeterministic, and a contract break for streamed layouts
   * (spec-pinned: probe schema over a layoutBatch-maintained store
   * equals the raw table's columns).
   */
  def boxProbe(spark: SparkSession, dir: String, colA: String, colB: String,
               loA: Long, hiA: Long, loB: Long, hiB: Long): DataFrame = {
    // storedBounds FIRST (before the data read resolves the path): it
    // does the loud mid-swap / crashed-write detection AND is the one
    // bounds read (boxProbeCore takes the row, so the 1-row table is
    // not re-read per probe — this is the hot serving path)
    val p = storedBounds(spark, dir)
    boxProbeCore(
      spark.read.option("mergeSchema", "true").parquet(s"$dir/data"),
      p, colA, colB, loA, hiA, loB, hiB)
  }

  /** [[boxProbe]] over already-loaded store/bounds tables — the HTTP
    * box-search route's form (layout artifacts registered as catalog
    * tables), same arithmetic, same static pruning. */
  def boxProbeTables(store: DataFrame, boundsDf: DataFrame,
                     colA: String, colB: String,
                     loA: Long, hiA: Long, loB: Long, hiB: Long): DataFrame = {
    val boundsRows = boundsDf.head(1)
    require(boundsRows.nonEmpty,
      "bounds table is empty - not a zorderWrite layout")
    boxProbeCore(store, boundsRows(0), colA, colB, loA, hiA, loB, hiB)
  }

  /** The probe dataflow over an already-extracted bounds row — shared
    * by [[boxProbe]] (one storedBounds read) and [[boxProbeTables]]
    * (HTTP-supplied tables). */
  private def boxProbeCore(store: DataFrame, p: org.apache.spark.sql.Row,
                           colA: String, colB: String,
                           loA: Long, hiA: Long, loB: Long, hiB: Long)
      : DataFrame = {
    integral(store, colA); integral(store, colB)
    require(store.columns.contains("zbucket"),
      "store is not a zorderWrite layout (no zbucket column)")
    val (mnA, mxA, mnB, mxB) = (p.getAs[Long]("min_a"),
      p.getAs[Long]("max_a"), p.getAs[Long]("min_b"), p.getAs[Long]("max_b"))
    val bits = p.getAs[Int]("bits")
    val nBuckets = p.getAs[Int]("n_buckets")
    // re-validate the STORED parameters with the same gate as
    // zorderWrite: a bounds table reaching here over HTTP (the
    // box-search route) is caller-supplied data — bits ≥ 32 would wrap
    // the Morton shifts and prune WRONG buckets silently, a non-divisor
    // n_buckets would misalign the bucket arithmetic
    require(bits >= 1 && bits <= 20,
      s"bounds table bits must be in [1,20], got $bits")
    require(nBuckets >= 1 && (1L << (2 * bits)) % nBuckets == 0,
      s"bounds table n_buckets=$nBuckets must divide 4^bits=${1L << (2 * bits)}")
    val out = store.drop("z", "zbucket", "batch_id")
    if (loA > hiA || loB > hiB || loA > mxA || hiA < mnA ||
        loB > mxB || hiB < mnB) return out.filter(lit(false))
    val (ca1, ca2) = (cellOf(math.max(loA, mnA), mnA, mxA, bits),
      cellOf(math.min(hiA, mxA), mnA, mxA, bits))
    val (cb1, cb2) = (cellOf(math.max(loB, mnB), mnB, mxB, bits),
      cellOf(math.min(hiB, mxB), mnB, mxB, bits))
    val buckets = candidateBuckets(ca1, ca2, cb1, cb2, bits, nBuckets)._1
    store
      .filter(col("zbucket").isin(buckets: _*) &&
        col(colA).between(loA, hiA) && col(colB).between(loB, hiB))
      .drop("z", "zbucket", "batch_id")
  }
}
