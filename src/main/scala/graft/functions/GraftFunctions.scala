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
      (c: Seq[Expression]) => SimHash64(c(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      (c: Seq[Expression]) => WordShingleHash(c(0),
        literalInt(c(1), "n")), "built-in")
    reg.createOrReplaceTempFunction("graft_winnow",
      (c: Seq[Expression]) => Winnow(c(0),
        literalInt(c(1), "k"), literalInt(c(2), "window")), "built-in")
    reg.createOrReplaceTempFunction("graft_lang_id",
      (c: Seq[Expression]) =>
        LangIdExpr(c(0), graft.ops.TextAnalysis.stopwordProfiles.toSeq),
      "built-in")
    reg.createOrReplaceTempFunction("graft_text_stats",
      (c: Seq[Expression]) => TextStatsExpr(c(0)), "built-in")
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
  def simHash64(tokens: Column): Column =
    call_function("graft_simhash64", tokens)
  def winnow(text: Column, k: Int, window: Int): Column =
    call_function("graft_winnow", text, lit(k), lit(window))
  def wordShingles(normText: Column, n: Int): Column =
    call_function("graft_word_shingles", normText, lit(n))
  def textStats(text: Column): Column = call_function("graft_text_stats", text)
}
