package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions.{call_function, lit}

/**
 * Session registration + Column API for the native vector/signature
 * expressions. Spark 4's `Column` no longer wraps a Catalyst `Expression`
 * directly, so the supported route to a custom Expression is the session
 * `FunctionRegistry` + `call_function` — registration is idempotent and
 * per-session (a SparkSessionExtensions injector would do the same wiring
 * at session build; temp-function registration also works on a session we
 * didn't build, e.g. the driver's).
 */
object GraftFunctions {

  private[functions] def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private[functions] def literalLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  /** 'xx' (default, xxhash64) | 'md5' (Md5Hash60, DuckDB-reproducible). */
  private[functions] def literalHashMode(e: Expression, what: String): Boolean =
    e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _)
          if s.toString == "md5" => true
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _)
          if s.toString == "xx" => false
      case other => throw new IllegalArgumentException(
        s"$what must be the string literal 'xx' or 'md5', got $other")
    }

  /** Merge-list wire form for `graft_bpe_segment`: `"a b,c d,..."` —
   * rank-ordered pairs, sides space-separated. A string literal (not an
   * array column) because the merge table is part of the OPERATOR, baked
   * into the expression at plan time like the other literal params. */
  private[functions] def literalMerges(
      e: Expression, what: String): Seq[(String, String)] = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
      s.toString.split(",").toSeq.filter(_.nonEmpty).map { p =>
        p.split(" ") match {
          case Array(a, b) => (a, b)
          case _ => throw new IllegalArgumentException(
            s"$what entries must be 'left right' pairs, got '$p'")
        }
      }
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** Register all graft_* functions in the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_vec_dot",
      (c: Seq[Expression]) => VecDot(c(0), c(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_vec_norm",
      (c: Seq[Expression]) => VecNorm(c(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_vec_cosine",
      (c: Seq[Expression]) => VecCosine(c(0), c(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_lsh_bands",
      (c: Seq[Expression]) => LshBands(c(0),
        literalInt(c(1), "planes"), literalInt(c(2), "rowsPerBand")), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      (c: Seq[Expression]) => MinHashSig(c(0),
        literalInt(c(1), "numHashes"), literalLong(c(2), "seed")), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      (c: Seq[Expression]) => SimHash64(c(0),
        if (c.length > 1) literalHashMode(c(1), "mode") else false), "built-in")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      (c: Seq[Expression]) => WordShingleHash(c(0),
        literalInt(c(1), "n")), "built-in")
    reg.createOrReplaceTempFunction("graft_winnow",
      (c: Seq[Expression]) => Winnow(c(0),
        literalInt(c(1), "k"), literalInt(c(2), "window"),
        if (c.length > 3) literalHashMode(c(3), "mode") else false), "built-in")
    reg.createOrReplaceTempFunction("graft_lang_id",
      (c: Seq[Expression]) =>
        LangIdExpr(c(0), graft.ops.TextAnalysis.stopwordProfiles.toSeq),
      "built-in")
    reg.createOrReplaceTempFunction("graft_text_stats",
      (c: Seq[Expression]) => TextStatsExpr(c(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_gopher_stats",
      (c: Seq[Expression]) => GopherStatsExpr(c(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_quantize_int8",
      (c: Seq[Expression]) => QuantizeInt8Expr(c(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_gram_products",
      (c: Seq[Expression]) => GramProducts(c(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_char_pairs",
      (c: Seq[Expression]) => CharPairsExpr(c(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_anchor_hashes",
      (c: Seq[Expression]) => AnchorHashes(c(0),
        literalInt(c(1), "k")), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_segment",
      (c: Seq[Expression]) => BpeSegmentExpr(c(0),
        literalMerges(c(1), "merges")), "built-in")
    reg.createOrReplaceTempFunction("graft_wrapped_token_pairs",
      (c: Seq[Expression]) => WrappedTokenPairs(c(0)), "built-in")
  }

  // Column-API wrappers (caller must have registered on the session that
  // analyzes the plan; the graft.ops operators do this themselves).
  def vecDot(a: Column, b: Column): Column =
    call_function("graft_vec_dot", a, b)
  def vecNorm(a: Column): Column = call_function("graft_vec_norm", a)
  def vecCosine(a: Column, b: Column): Column =
    call_function("graft_vec_cosine", a, b)
  def lshBands(vec: Column, planes: Int, rowsPerBand: Int): Column =
    call_function("graft_lsh_bands", vec, lit(planes), lit(rowsPerBand))
  def minHashSig(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    call_function("graft_minhash_sig", shingles, lit(numHashes), lit(seed))
  def simHash64(tokens: Column, mode: String = "xx"): Column =
    call_function("graft_simhash64", tokens, lit(mode))
  def winnow(text: Column, k: Int, window: Int, mode: String = "xx"): Column =
    call_function("graft_winnow", text, lit(k), lit(window), lit(mode))
  def wordShingles(normText: Column, n: Int): Column =
    call_function("graft_word_shingles", normText, lit(n))
  def textStats(text: Column): Column = call_function("graft_text_stats", text)
  def gopherStats(tokens: Column): Column =
    call_function("graft_gopher_stats", tokens)
  def quantizeInt8(vec: Column): Column =
    call_function("graft_quantize_int8", vec)
  def gramProducts(vec: Column): Column =
    call_function("graft_gram_products", vec)
  def charPairs(words: Column): Column =
    call_function("graft_char_pairs", words)
  def anchorHashes(text: Column, k: Int): Column =
    call_function("graft_anchor_hashes", text, lit(k))
  def bpeSegment(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_segment", text,
      lit(merges.map { case (a, b) => s"$a $b" }.mkString(",")))
  def wrappedTokenPairs(s: Column): Column =
    call_function("graft_wrapped_token_pairs", s)
}
