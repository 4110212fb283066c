package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector math on the ANN/dedup hot
 * paths (SURVEY §7.4: "custom Catalyst `Expression` (codegen dot/cosine)").
 *
 * Why not `zip_with`/`aggregate` higher-order functions: the HOF path
 * evaluates a Catalyst lambda per array ELEMENT — one boxed expression-tree
 * walk per float. These expressions evaluate one tight JVM loop per ROW
 * over the underlying `ArrayData`, with real `doGenCode` so they stay
 * inside whole-stage codegen. Measured on the sf0.1 embedding near-dup
 * pipeline this is the difference between ~60 s and ~2 s.
 *
 * All expressions accept `array<float>` or `array<double>` columns and
 * treat null elements as 0. Nulls at the array level propagate.
 */
object VectorExpressions {

  private[functions] def elemAccessor(dt: DataType): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case other => throw new IllegalArgumentException(
        s"vector expressions need array<float|double>, got $other")
    }

  private[functions] def elemAt(a: ArrayData, dt: DataType, i: Int): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case other => throw new IllegalArgumentException(other.toString)
    }

  val vectorTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType),
    ArrayType(FloatType, containsNull = true),
    ArrayType(DoubleType, containsNull = true))
}

import VectorExpressions._

/** `vec_dot(a, b)` — dot product of two numeric-array columns. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        dot += elemAt(x, left.dataType, i) * elemAt(y, right.dataType, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val getL = elemAccessor(left.dataType)
      val getR = elemAccessor(right.dataType)
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double ${ev.value}_acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            ${ev.value}_acc += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
          }
        }
        ${ev.value} = ${ev.value}_acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_cosine(a, b)` — cosine similarity in ONE fused pass (dot and both
  * norms in the same loop); 0.0 when either norm is 0, matching the
  * higher-order-function formulation it replaces. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecDot(left, right).checkInputDataTypes()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else elemAt(x, left.dataType, i)
      val yi = if (y.isNullAt(i)) 0.0 else elemAt(y, right.dataType, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val getL = elemAccessor(left.dataType)
      val getR = elemAccessor(right.dataType)
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.isNullAt($i) ? 0.0 : (double) $a.$getL($i);
          double $yi = $b.isNullAt($i) ? 0.0 : (double) $b.$getR($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = $denom > 0 ? $dot / $denom : 0.0;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** `vec_norm(a)` — L2 norm. */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecDot(child, child).checkInputDataTypes()

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (!x.isNullAt(i)) {
        val xi = elemAt(x, child.dataType, i)
        acc += xi * xi
      }
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val get = elemAccessor(child.dataType)
      s"""
        int $n = $a.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            double $xi = (double) $a.$get($i);
            $acc += $xi * $xi;
          }
        }
        ${ev.value} = java.lang.Math.sqrt($acc);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/**
 * `lsh_bands(vec, planes, rowsPerBand)` — random-hyperplane LSH band keys:
 * sign bit per (deterministic pseudo-random) hyperplane, packed into
 * `planes/rowsPerBand` band keys of `rowsPerBand` bits. Returns
 * `array<long>` indexed by band id.
 *
 * The hyperplane matrix is derived from SplitMix64((plane<<32)|dim) — no
 * state to ship, any executor regenerates it; cached per (planes, dim) in
 * the expression instance. Same generator as the HOF formulation it
 * replaces (Similarity.planeComponent).
 */
case class LshBands(child: Expression, planes: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(planes % rowsPerBand == 0, "rowsPerBand must divide planes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bands"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecDot(child, child).checkInputDataTypes()

  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // single volatile holder: tasks may share this instance across threads
  // (codegen reference objects), and two plain fields could be observed
  // torn (dim written, matrix not yet visible)
  @transient @volatile
  private var planeCache: (Int, Array[Array[Double]]) = _

  private def planeMatrix(dim: Int): Array[Array[Double]] = {
    val c = planeCache
    if (c != null && c._1 == dim) c._2
    else {
      val m = Array.tabulate(planes, dim)((p, d) =>
        mix(p.toLong << 32 | d.toLong).toDouble / Long.MaxValue)
      planeCache = (dim, m)
      m
    }
  }

  /** One tight loop per row; called from both eval and generated code. */
  def compute(x: ArrayData): ArrayData = {
    val dim = x.numElements()
    val mat = planeMatrix(dim)
    val nBands = planes / rowsPerBand
    val keys = new Array[Long](nBands)
    var p = 0
    while (p < planes) {
      val plane = mat(p)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        if (!x.isNullAt(i)) dot += elemAt(x, child.dataType, i) * plane(i)
        i += 1
      }
      if (dot >= 0) keys(p / rowsPerBand) |= 1L << (p % rowsPerBand)
      p += 1
    }
    new GenericArrayData(keys)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[LshBands].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}

/**
 * `minhash_sig(shingles)` — MinHash signature of a hashed-shingle
 * `array<long>`: `numHashes` universal-hash minima `(a_i*(s mod p)+b_i)
 * mod p` over the shingle set, p = 2^31-1; identical semantics (same
 * SplitMix64 coefficient schedule) to the aggregate/zip_with formulation
 * in graft.ops.Dedup.minHashSignature, one JVM loop instead of
 * numHashes × |shingles| interpreted lambda evaluations.
 */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val Prime = 2147483647L

  private def mix(s: Long): Long = {
    var z = s + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private lazy val as: Array[Long] = Array.tabulate(numHashes)(i =>
    math.abs(mix(seed + 2L * i)) % (Prime - 1) + 1)
  private lazy val bs: Array[Long] = Array.tabulate(numHashes)(i =>
    math.abs(mix(seed + 2L * i + 1)) % Prime)

  def compute(sh: ArrayData): ArrayData = {
    val out = Array.fill(numHashes)(Prime)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      val s = sh.getLong(j)
      val sm = ((s % Prime) + Prime) % Prime
      var i = 0
      while (i < numHashes) {
        val h = (as(i) * sm + bs(i)) % Prime
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhExpr", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/**
 * Cross-engine-reproducible 60-bit hash: the numeric value of the first 15
 * hex digits of md5 — equal to Spark SQL `conv(substr(md5(x),1,15),16,10)`
 * and DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`. Used as the hash mode
 * that lets sketch operators (SimHash, winnowing) be checked against a
 * DuckDB oracle; xxhash64 stays the default scale path (~5× faster, but
 * engine-specific). 60 bits keep the value positive in a signed 64-bit
 * lane in both engines.
 */
object Md5Hash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hash of `bytes[off, off+len)`. */
  def hash(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    val h = d.digest()
    // first 8 bytes big-endian, then drop the lowest hex digit (>>> 4)
    // == value of the first 15 hex chars
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    hash(b, 0, b.length)
  }
}

/**
 * `simhash64(tokens[, mode])` — 64-bit SimHash of an `array<string>` token
 * column: per bit j, sign of the sum over tokens of ±1 by the token's hash
 * bit j. Default hash is xxhash64 with Spark's default seed 42 (same
 * fingerprint family as graft.ops.Dedup.simHashBits); `md5Mode` hashes
 * tokens with [[Md5Hash60]] instead — slower but reproducible in DuckDB
 * SQL, which is what lets the d03 gate query carry a real oracle (the
 * top 4 bits are then always 0 on both sides, so the bit-majority loop
 * needs no special-casing).
 */
case class SimHash64(child: Expression, md5Mode: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val s = tokens.getUTF8String(t)
        val h =
          if (md5Mode) Md5Hash60.hash(s)
          else org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(s, StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shExpr", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * `winnow(text, k, window)` — winnowing document fingerprints
 * (Schleimer/Wilkerson/Aiken, SIGMOD'03): xxhash64 every k-character gram,
 * slide a `window` over consecutive gram hashes keeping each window's min,
 * return the sorted distinct mins. Semantics identical to the
 * higher-order-function form in graft.ops.TextAnalysis
 * (equivalence-tested); one loop per document instead of O(len) substring
 * lambda evaluations.
 */
case class Winnow(child: Expression, k: Int, window: Int,
    md5Mode: Boolean = false)
    extends UnaryExpression {
  require(k >= 1 && window >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte
    val len = text.numChars()
    val nBytes = text.numBytes()
    val base = text.getBaseObject
    val baseOff = text.getBaseOffset
    // char → byte offset table, built once (substringSQL per gram would
    // re-scan from byte 0 every call — quadratic in document length)
    val off = new Array[Int](len + 1)
    var c = 0
    var b = 0
    while (b < nBytes) {
      off(c) = b
      b += numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(
        base, baseOff + b))
      c += 1
    }
    off(len) = nBytes
    val n = math.max(len - k + 1, 1)
    val grams = new Array[Long](n)
    // md5 mode needs an on-heap byte[]; same byte offsets apply
    val heapBytes = if (md5Mode) text.getBytes else null
    var i = 0
    while (i < n) {
      // hash of the k-char gram's bytes == xxhash64(substring(text,i+1,k))
      // (or Md5Hash60 of the same bytes in md5 mode)
      val end = off(math.min(i + k, len))
      grams(i) =
        if (md5Mode) Md5Hash60.hash(heapBytes, off(i), end - off(i))
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, baseOff + off(i), end - off(i), 42L)
      i += 1
    }
    val m = math.max(n - window + 1, 1)
    // primitive collect (skipping consecutive repeats — adjacent windows
    // usually share their min), then sort + dedupe: no per-window boxing
    val mins = new Array[Long](m)
    var nMins = 0
    var prev = 0L
    var w = 0
    while (w < m) {
      var mn = Long.MaxValue
      var j = w
      val end = math.min(w + window, n)
      while (j < end) { if (grams(j) < mn) mn = grams(j); j += 1 }
      if (nMins == 0 || mn != prev) { mins(nMins) = mn; nMins += 1; prev = mn }
      w += 1
    }
    java.util.Arrays.sort(mins, 0, nMins)
    var uniq = 0
    var i2 = 0
    while (i2 < nMins) {
      if (uniq == 0 || mins(i2) != mins(uniq - 1)) { mins(uniq) = mins(i2); uniq += 1 }
      i2 += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, uniq))
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this, classOf[Winnow].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/**
 * `lang_id(tokens, profiles)` — stopword-profile language identification in
 * one pass over the token array: per profile, count tokens that are profile
 * members (repeats count); winner = max by (hits, then language code — the
 * ordering `array_max(struct(hits, lang))` gives), "und" on zero hits.
 * Semantics identical to graft.ops.TextAnalysis.langId (equivalence-tested).
 */
case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
  }

  // profile words as UTF8String sets (sorted by code for deterministic
  // tie-break order identical to the HOF array_max(struct) form)
  @transient private lazy val compiled: Array[(String, java.util.HashSet[org.apache.spark.unsafe.types.UTF8String])] =
    profiles.sortBy(_._1).map { case (lang, words) =>
      val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      words.foreach(w => set.add(
        org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      (lang, set)
    }.toArray

  def compute(tokens: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val hits = new Array[Int](compiled.length)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val tok = tokens.getUTF8String(t)
        var i = 0
        while (i < compiled.length) {
          if (compiled(i)._2.contains(tok)) hits(i) += 1
          i += 1
        }
      }
      t += 1
    }
    // argmax by (hits, lang) — ties resolve to the LARGEST language code,
    // matching array_max over struct(hits, lang)
    var best = 0
    var i = 1
    while (i < compiled.length) {
      if (hits(i) > hits(best) ||
          (hits(i) == hits(best) && compiled(i)._1 > compiled(best)._1)) best = i
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(
      if (hits(best) > 0) compiled(best)._1 else "und")
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdExpr", this, classOf[LangIdExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/**
 * `word_shingles(normText, n)` — distinct xxhash64 word n-gram shingles of
 * an ALREADY-normalized (lower+trim) text column: tokens split on \\s+,
 * each n-gram hashed as its space-joined string; documents shorter than n
 * words fall back to one hash of the whole normalized text. First-
 * occurrence order, matching `array_distinct` over the sequential HOF form
 * in graft.ops.Shingles.wordShingles (equivalence-tested on the fixtures).
 */
case class WordShingleHash(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
  }

  // Spark's split(str, "\\s+") (limit -1) — Pattern.split with limit -1
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  private def hashUtf8(s: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  def compute(norm: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val str = norm.toString
    val tokens = ws.split(str, -1)
    if (tokens.length < n) {
      new GenericArrayData(Array(hashUtf8(str)))
    } else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val sb = new java.lang.StringBuilder
      var i = 0
      val last = tokens.length - n
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        seen.add(hashUtf8(sb.toString))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wsExpr", this, classOf[WordShingleHash].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHash =
    copy(child = newChild)
}

/**
 * `gopher_stats(tokens)` — the Gopher-style repetition/diversity counts in
 * ONE pass over the token array, as a struct
 * `(n_words int, n_distinct int, top_freq int, sum_len long)`.
 *
 * Replaces the HOF form `array_max(transform(array_distinct(w),
 * t -> size(filter(w, x -> x = t))))`, which is O(words x distinct) per
 * document with an interpreted lambda per comparison — here a single
 * hash-map frequency pass is O(words), and CollapseProject re-inlining
 * costs nothing because all four counts ride one struct evaluation
 * (equivalence-tested in VectorExpressionsSpec).
 */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStatsExpr.schema
  override def prettyName: String = "gopher_stats"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
  }

  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val freq = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      Array[Int]](math.max(16, n * 2))
    var sumLen = 0L
    var top = 0
    var i = 0
    while (i < n) {
      // null tokens cannot occur from split(); treated as empty string
      val t =
        if (tokens.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i)
      sumLen += t.numChars()
      var c = freq.get(t)
      if (c == null) { c = Array(0); freq.put(t.clone(), c) }
      c(0) += 1
      if (c(0) > top) top = c(0)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, freq.size(), top, sumLen))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gsExpr", this, classOf[GopherStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (InternalRow) $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_freq", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false)))
}

/**
 * `quantize_int8(vec)` — symmetric int8 quantization of a float/double
 * array in one fused loop: struct `(scale double, qvec array<int>,
 * q_min int, q_max int, q_sum long, n_sat int)` with
 * `scale = 127/max|x|` (0 for all-zero vectors) and
 * `q_i = floor(x_i * scale + 0.5)` — exactly the HOF/DuckDB-oracle
 * arithmetic (floor(v + 0.5) half-up, identical across engines), but one
 * native pass instead of four interpreted lambda sweeps over the array.
 */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuantizeInt8Expr.schema
  override def prettyName: String = "quantize_int8"

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got $other")
  }

  def compute(vec: ArrayData): InternalRow = {
    val n = vec.numElements()
    val xs = new Array[Double](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x =
        if (vec.isNullAt(i)) 0.0
        else if (elemIsFloat) vec.getFloat(i).toDouble
        else vec.getDouble(i)
      xs(i) = x
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs > 0) 127.0 / maxAbs else 0.0
    val q = new Array[Int](n)
    var qMin = if (n == 0) 0 else Int.MaxValue
    var qMax = if (n == 0) 0 else Int.MinValue
    var qSum = 0L
    var nSat = 0
    i = 0
    while (i < n) {
      val qi = math.floor(xs(i) * scale + 0.5).toInt
      q(i) = qi
      if (qi < qMin) qMin = qi
      if (qi > qMax) qMax = qi
      qSum += qi
      if (qi == 127 || qi == -127) nSat += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new GenericArrayData(q),
      if (n == 0) 0 else qMin, if (n == 0) 0 else qMax, qSum, nSat))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qzExpr", this, classOf[QuantizeInt8Expr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (InternalRow) $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Expr =
    copy(child = newChild)
}

object QuantizeInt8Expr {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qvec", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("q_min", IntegerType, nullable = false),
    StructField("q_max", IntegerType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("n_sat", IntegerType, nullable = false)))
}

/**
 * `gram_products(vec)` — the Gram-accumulation core (e15/e16/e17) as one
 * native pass: per row, the d(d+1)/2 upper-triangle products of the 6-dp
 * quantized coordinates, `array<struct<dim_i int, dim_j int, prod long>>`.
 *
 * Bit-identical to the HOF reference form
 * `transform(vec, x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) *
 * 1000000 AS BIGINT))` + nested sequence/transform product generation
 * (equivalence-tested in VectorExpressionsSpec): the quantizer
 * reproduces Spark's double→DECIMAL(18,6) cast exactly — Scala
 * `BigDecimal(double)` goes through `Double.toString`, then HALF_UP at
 * scale 6 — and a null coordinate yields null products against every
 * dimension, as the null-propagating cast chain does. One JVM loop per
 * row instead of ~d²/2 interpreted lambda evaluations; the d=64
 * fixture's 2080 products per row were the dominant interpreted cost of
 * the three Gram queries.
 */
case class GramProducts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(GramProducts.entry,
    containsNull = false)
  override def prettyName: String = "gram_products"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got $other")
  }

  /** Spark's CAST(double AS DECIMAL(18,6)) * 1e6 → BIGINT, exactly:
    * via Double.toString (the scala BigDecimal(Double) path Cast takes)
    * then HALF_UP at scale 6; the ×1e6 is a lossless point move.
    * Mirrors the non-ANSI Cast's null semantics too: NaN/Infinity and
    * values past DECIMAL(18,6)'s 12 integer digits (|v| ≳ 1e12) yield a
    * null coordinate — which null-propagates into every product against
    * that dimension — instead of crashing the query. Returns false when
    * the coordinate is null. */
  private def quantizeInto(v: Double, q: Array[Long], i: Int): Boolean = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      return false
    val bd = new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(6, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 18) return false   // doesn't fit DECIMAL(18,6)
    q(i) = bd.movePointRight(6).longValueExact()
    true
  }

  def compute(x: ArrayData): ArrayData = {
    val dim = x.numElements()
    val q = new Array[Long](dim)
    val isNull = new Array[Boolean](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) isNull(i) = true
      else isNull(i) = !quantizeInto(elemAt(x, child.dataType, i), q, i)
      i += 1
    }
    val out = new Array[Any](dim * (dim + 1) / 2)
    var k = 0
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, j,
            if (isNull(i) || isNull(j)) null else q(i) * q(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramExpr", this, classOf[GramProducts].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramProducts =
    copy(child = newChild)
}

object GramProducts {
  val entry: StructType = StructType(Seq(
    StructField("dim_i", IntegerType, nullable = false),
    StructField("dim_j", IntegerType, nullable = false),
    StructField("prod", LongType, nullable = true)))
}

/**
 * `char_pairs(words)` — adjacent character pairs within each word of an
 * `array<string>`, concatenated in word order: the t22 BPE pair
 * generator as one native pass. Bit-identical to the HOF reference form
 * (split on the empty pattern, filter the trailing "", shifted zip —
 * kept as TextAnalysis.bpePairsHof, equivalence-tested): UTF8String
 * character indexing is code-point-based, matching Java 9+ empty-regex
 * splitting for well-formed text including astral-plane characters.
 * Words shorter than 2 characters contribute nothing; null words are
 * skipped (split never produces them).
 */
/**
 * `anchor_hashes(text, k)` — the d16 substring-dedup anchor pass in one
 * JVM loop: tokenize `lower(trim(text))` on `\s+` (bit-identical to
 * `Shingles.words` — UTF8String.trim/toLowerCase are the same methods the
 * `lower`/`trim` expressions call, and Java regex split with limit −1 is
 * what Spark's `split` does) and emit, for every sliding k-word window,
 * the 60-bit [[Md5Hash60]] of the space-joined window bytes — the exact
 * value of `('0x' || substr(md5(...), 1, 15))::BIGINT`, so a DuckDB
 * oracle can recompute every anchor. Docs shorter than k words emit an
 * empty array.
 *
 * Why native: the HOF form re-evaluated `md5(array_join(slice(words...)))`
 * through the interpreted lambda path once per window — per-window array
 * slices, string builds, and expression-tree walks. Here the window bytes
 * are assembled into one scratch buffer per window from pre-extracted
 * word byte arrays and hashed directly (the gram_products/char_pairs
 * device: one referenced-object call inside whole-stage codegen).
 */
case class AnchorHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"anchor_hashes needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "anchor_hashes"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    // parity with split(lower(trim(text)), "\s+"): same UTF8String
    // methods as the Lower/StringTrim expressions, then Java regex split
    // with limit -1 (Spark's split default)
    val words = text.trim().toLowerCase.toString.split("\\s+", -1)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val wb = new Array[Array[Byte]](words.length)
    var w = 0
    while (w < words.length) {
      wb(w) = words(w).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      w += 1
    }
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var len = k - 1 // separators
      var j = i
      while (j < i + k) { len += wb(j).length; j += 1 }
      val buf = new Array[Byte](len)
      var o = 0
      j = i
      while (j < i + k) {
        val b = wb(j)
        System.arraycopy(b, 0, buf, o, b.length)
        o += b.length
        if (j < i + k - 1) { buf(o) = ' '; o += 1 }
        j += 1
      }
      out(i) = Md5Hash60.hash(buf, 0, len)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahExpr", this, classOf[AnchorHashes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): AnchorHashes =
    copy(child = newChild)
}

case class CharPairsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_pairs"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
  }

  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val buf = new scala.collection.mutable.ArrayBuffer[Any]()
    var w = 0
    while (w < n) {
      if (!words.isNullAt(w)) {
        val s = words.getUTF8String(w)
        val m = s.numChars()
        var i = 0
        while (i < m - 1) {
          // clone: substring shares the row buffer, which codegen reuses
          buf += s.substring(i, i + 2).clone()
          i += 1
        }
      }
      w += 1
    }
    new GenericArrayData(buf.toArray)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cpExpr", this, classOf[CharPairsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharPairsExpr =
    copy(child = newChild)
}

/**
 * `bpe_segment(text, merges)` — apply a learned byte-pair-encoding merge
 * list to segment text into subword tokens: the APPLY half of the
 * tokenizer whose TRAIN half is `TextAnalysis.bpePairCounts` (t22
 * computes the round-one merge statistics; this expression consumes the
 * resulting ranked merge list). Token counts under a real vocabulary are
 * the number every mixture/packing decision (p03/p11/p12) otherwise
 * proxies with whitespace-word counts.
 *
 * Semantics (deliberately oracle-expressible): words are the maximal
 * `[a-z0-9]+` runs of `lower(text)` (the separator-free alphabet lets a
 * SQL oracle replay the merge chain with string `replace`); each word
 * starts as its character sequence, then the merges are applied IN RANK
 * ORDER, each rank as ONE left-to-right non-overlapping greedy pass
 * (fold: if the accumulator's last token equals `a` and the next equals
 * `b`, fuse to `ab`, else append). For well-formed merge lists — every
 * multi-character side produced by a strictly earlier merge, the
 * invariant real BPE training guarantees — this is equivalent to the
 * tokenizer's min-rank loop; unlike that loop it stays a pure function
 * of rank order, so an unrolled fixed-round SQL oracle can reproduce it
 * for ANY list. Output: the final token array, words concatenated in
 * document order.
 *
 * Scale: O(|merges| · len) per document, zero exchange (the merge table
 * is baked into the expression — for the bounded curation vocabularies
 * this serves, cheaper than broadcasting; a 50k-merge production vocab
 * would instead carry a pair→rank hash map and run the min-rank loop,
 * same expression shape, different inner device). One referenced-object
 * call inside whole-stage codegen, like the other graft expressions.
 */
case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.nonEmpty, "bpe_segment needs >= 1 merge")
  require(merges.size <= 256,
    s"bpe_segment rank-order sweep is priced for bounded merge lists; " +
      s"got ${merges.size} > 256 (use a pair-rank map + min-rank loop at " +
      "vocabulary scale)")
  require(merges.forall { case (a, b) =>
    a.nonEmpty && b.nonEmpty && (a + b).matches("[a-z0-9]+") },
    "bpe_segment merge sides must be non-empty [a-z0-9]+ strings")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
  }

  @transient private lazy val mergeA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergeB: Array[String] = merges.map(_._2).toArray

  /** One left-to-right non-overlapping greedy pass of merge (a, b).
   * Continuing AFTER a fusion (the fused token is never re-checked as
   * the `b` side, and can only re-match as `a` against the NEXT token)
   * is exactly the "continue after the replacement" semantics of SQL
   * `replace` on the `|t1||t2|`-wrapped form — the oracle's device. */
  private def mergePass(toks: Array[String], nIn: Int,
                        a: String, b: String): Int = {
    var out = 0
    var i = 0
    while (i < nIn) {
      val t = toks(i)
      if (out > 0 && (t == b) && (toks(out - 1) == a)) {
        toks(out - 1) = a + b
      } else {
        toks(out) = t
        out += 1
      }
      i += 1
    }
    out
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val m = BpeSegmentExpr.Word.matcher(s)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    while (m.find()) {
      val word = m.group()
      // alphabet is [a-z0-9], so char == code point — no surrogate care
      val toks = new Array[String](word.length)
      var i = 0
      while (i < word.length) {
        toks(i) = String.valueOf(word.charAt(i))
        i += 1
      }
      var n = word.length
      var r = 0
      while (r < mergeA.length && n > 1) {
        n = mergePass(toks, n, mergeA(r), mergeB(r))
        r += 1
      }
      i = 0
      while (i < n) {
        out += org.apache.spark.unsafe.types.UTF8String.fromString(toks(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeSegmentExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentExpr =
    copy(child = newChild)
}

object BpeSegmentExpr {
  private val Word = java.util.regex.Pattern.compile("[a-z0-9]+")
}

/**
 * `wrapped_token_pairs(s)` — adjacent within-word token pairs of a
 * BPE-wrapped corpus string (`|t1||t2|…|#|u1|…` — [[BpeSegmentExpr]]'s
 * oracle-shared representation), emitted as `"a b"` strings (tokens are
 * `[a-z0-9]+`, so the space separator is unambiguous). This is the
 * trainer's per-round hot path (`TextAnalysis.bpeTrain`): the HOF form
 * (explode words → let-bound filter/split → shifted zip → explode)
 * walks two Generate stages and an interpreted lambda per token; here
 * one state machine walks the string once per doc — token boundaries
 * at `|` runs, adjacency reset at the `#` word separator.
 */
case class WrappedTokenPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wrapped_token_pairs"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
  }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val sb = new java.lang.StringBuilder
    var prev: String = null
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '|' || c == '#') {
        if (sb.length > 0) {
          val t = sb.toString
          if (prev != null)
            out += org.apache.spark.unsafe.types.UTF8String
              .fromString(prev + " " + t)
          prev = t
          sb.setLength(0)
        }
        if (c == '#') prev = null
      } else sb.append(c)
      i += 1
    }
    if (sb.length > 0 && prev != null)
      out += org.apache.spark.unsafe.types.UTF8String
        .fromString(prev + " " + sb.toString)
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wtpExpr", this, classOf[WrappedTokenPairs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WrappedTokenPairs =
    copy(child = newChild)
}
