package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * `text_stats(text)` — every per-document text-curation statistic in ONE
 * pass over the raw UTF-8 bytes, returned as a struct:
 *
 *   n_chars, n_words, n_subwords, n_punct, n_alpha, n_stop,
 *   mean_word_len, punct_ratio, alpha_ratio, stop_signal, quality
 *
 * This replaces a projection of 4 independent regex/array kernels
 * (`regexp_extract_all` × 2, `split`, `array_intersect`) that each
 * materialized an intermediate array just to take its size — and whose
 * subtrees Catalyst's CollapseProject re-inlined under the CASE WHEN
 * branches of the composite score, where codegen subexpression elimination
 * does not reach (the round-2 t02 regression). Here the string is scanned
 * exactly once, nothing intermediate is allocated, and the whole struct is
 * one codegen-friendly expression (single evaluation shared by all column
 * extracts via ProjectExec subexpression elimination).
 *
 * Semantics are bit-identical to the HOF reference forms in
 * graft.ops.TextAnalysis (equivalence-tested in VectorExpressionsSpec):
 *
 *  - n_chars    = length(text) — UTF-8 code points
 *  - n_words    = size(split(trim(text),'\s+')) with empty→0 — split
 *                 FIELDS (limit -1 keeps empty fields from tab/newline
 *                 padding that 0x20-only trim leaves behind), i.e.
 *                 whitespace-run count + 1 over the space-trimmed text
 *                 (Java \s = [ \t\n\x0B\f\r])
 *  - n_subwords = size(regexp_extract_all(text,'\w+|[^\w\s]')) — maximal
 *                 [A-Za-z0-9_] runs plus one per other non-space code point
 *  - n_punct    = count of ASCII \p{Punct} chars (33-47,58-64,91-96,123-126)
 *  - n_alpha    = count of [A-Za-z]
 *  - n_stop     = size(array_intersect(split(lower(trim(text)),'\s+'),
 *                 EN-stopwords)) — DISTINCT stopwords present; only
 *                 all-ASCII tokens can match, so ASCII case folding in the
 *                 scan is exact (Unicode lowercasing never maps a non-ASCII
 *                 token onto an ASCII stopword: Java toLowerCase('İ') is
 *                 "i̇" — two code points — not "i")
 *
 * Ratios are the hash-parity fixed-point shape (Inventory header): 6-dp
 * truncating integer arithmetic `num * 10^6 / den` then ONE IEEE divide —
 * bit-identical across engines. quality = (4·len-ok + 4·alpha-ok +
 * 2·punct-ok)/10 with the threshold tests on the already-truncated ratios,
 * exactly as the DuckDB oracle computes them.
 *
 * Scale: map-only, zero shuffle, zero allocation per row beyond the result
 * struct — at 100 TB this is the ideal operator shape (reference computes
 * the same signals per-doc in its curation pass).
 */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.schema
  override def prettyName: String = "text_stats"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
  }

  import TextStatsExpr._

  def compute(text: UTF8String): InternalRow = {
    val nBytes = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset

    var nChars = 0
    var nSubwords = 0
    var nPunct = 0
    var nAlpha = 0
    var stopMask = 0 // bit i set = stopword i seen among tokens

    // n_words must equal size(split(trim(text), "\\s+")) with empty→0 (the
    // HOF/DuckDB-oracle semantics, both of which keep EMPTY FIELDS):
    // `trim` strips only 0x20, and split with limit -1 keeps the leading/
    // trailing empty fields produced by non-space whitespace at the ends
    // ("\tfoo bar" → ["", "foo", "bar"]). So: over the space-trimmed byte
    // range, fields = whitespace-RUN count + 1 (0 when the range is
    // empty) — NOT the non-whitespace-run count, which silently diverges
    // for text padded with tabs/newlines.
    var trimStart = 0
    var trimEnd = nBytes
    while (trimStart < nBytes &&
      Platform.getByte(base, off + trimStart) == 0x20) trimStart += 1
    while (trimEnd > trimStart &&
      Platform.getByte(base, off + trimEnd - 1) == 0x20) trimEnd -= 1
    var wsRuns = 0
    var inWsRun = false

    var inWord = false     // inside a non-whitespace token run
    var inWordChars = false // inside a [A-Za-z0-9_] run
    // current token, ASCII-lowercased, for stopword matching; tokLen > MAX
    // or a non-matchable byte marks the token dead (tokLen = -1)
    val tok = new Array[Byte](MaxStopLen)
    var tokLen = 0

    var b = 0
    while (b < nBytes) {
      val c = Platform.getByte(base, off + b)
      if ((c & 0x80) == 0) { // ASCII fast path
        nChars += 1
        val isWs = c == 0x20 || (c >= 0x09 && c <= 0x0D)
        if (isWs) {
          // run-tracking is RANGE-LOCAL: bytes outside [trimStart,trimEnd)
          // are all 0x20 and must not pre-open a run (a tab at trimStart
          // preceded by stripped spaces still starts a separator field)
          if (b >= trimStart && b < trimEnd) {
            if (!inWsRun) wsRuns += 1
            inWsRun = true
          }
          if (inWord) { // token ends: try stopword match
            if (tokLen > 0) stopMask |= matchStop(tok, tokLen)
            inWord = false; inWordChars = false; tokLen = 0
          }
        } else {
          inWsRun = false
          if (!inWord) { inWord = true; tokLen = 0 }
          val isWordChar = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '_'
          if (isWordChar) {
            if (!inWordChars) { nSubwords += 1; inWordChars = true }
          } else {
            nSubwords += 1 // each non-word non-space code point counts
            inWordChars = false
          }
          if (c >= 'A' && c <= 'Z') nAlpha += 1
          else if (c >= 'a' && c <= 'z') nAlpha += 1
          if ((c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
              (c >= 91 && c <= 96) || (c >= 123 && c <= 126)) nPunct += 1
          if (tokLen >= 0) { // accumulate lowercased token for stop match
            val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
            if (tokLen < MaxStopLen &&
                (lc >= 'a' && lc <= 'z')) { tok(tokLen) = lc; tokLen += 1 }
            else tokLen = -1 // too long or non-letter: cannot be a stopword
          }
        }
        b += 1
      } else { // non-ASCII code point: non-word, non-space, non-punct
        nChars += 1
        inWsRun = false
        if (!inWord) { inWord = true; tokLen = 0 }
        nSubwords += 1
        inWordChars = false
        tokLen = -1 // non-ASCII token can never equal an ASCII stopword
        b += UTF8String.numBytesForFirstByte(c)
      }
    }
    if (inWord && tokLen > 0) stopMask |= matchStop(tok, tokLen)

    // split-field count over the space-trimmed range (empty range → 0)
    val nWords = if (trimStart >= trimEnd) 0 else wsRuns + 1

    val nStop = Integer.bitCount(stopMask)
    val meanWordLen =
      if (nWords > 0) (nChars.toLong * 1000000L / nWords).toDouble / 1e6 else 0.0
    val punctRatio =
      if (nChars > 0) (nPunct.toLong * 1000000L / nChars).toDouble / 1e6 else 0.0
    val alphaRatio =
      if (nChars > 0) (nAlpha.toLong * 1000000L / nChars).toDouble / 1e6 else 0.0
    val stopSignal =
      if (nWords > 0) (nStop.toLong * 10L * 1000000L / nWords).toDouble / 1e6 else 0.0
    val quality =
      ((if (nWords >= 20 && nWords <= 2000) 4 else 0) +
       (if (alphaRatio > 0.5) 4 else 0) +
       (if (punctRatio < 0.1) 2 else 0)).toDouble / 10.0

    new GenericInternalRow(Array[Any](
      nChars, nWords, nSubwords, nPunct, nAlpha, nStop,
      meanWordLen, punctRatio, alphaRatio, stopSignal, quality))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsExpr", this, classOf[TextStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {
  /** EN stopword profile — read from the single source of truth so the
    * native expression, the HOF reference form, and the DuckDB oracle can
    * never drift apart. */
  val stopwords: Array[String] =
    graft.ops.TextAnalysis.stopwordProfiles("en").toArray
  private val MaxStopLen = stopwords.map(_.length).max

  private val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Bit for the stopword equal to tok[0..len), or 0. Linear over 10 tiny
    * words — cheaper than hashing for ≤4-byte keys. */
  private def matchStop(tok: Array[Byte], len: Int): Int = {
    var i = 0
    while (i < stopBytes.length) {
      val s = stopBytes(i)
      if (s.length == len) {
        var j = 0
        while (j < len && s(j) == tok(j)) j += 1
        if (j == len) return 1 << i
      }
      i += 1
    }
    0
  }

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("stop_signal", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
}
