package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation: language ID, quality
 * scoring, token counting, and winnowing document fingerprints.
 *
 * Everything is column expressions (built-ins + higher-order functions) so
 * the work runs inside whole-stage codegen where possible and distributes
 * per-row — no UDFs, no collect, schema-stable outputs. At 100 TB each of
 * these is a map-only pass over the corpus (the ideal shape: zero shuffle).
 */
object TextAnalysis {

  // ------------------------------------------------------------------
  // Language identification — stopword-profile heuristic
  // ------------------------------------------------------------------

  /** Tiny per-language function-word profiles (public common stopwords).
    * Real pipelines plug fastText etc.; the heuristic keeps the operator
    * self-contained and deterministic. */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "fr" -> Seq("le", "la", "de", "et", "que", "un", "une", "les", "est", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "为"))

  /** Occurrence count of profile words among the tokens (repeats count —
    * frequency, not distinct membership, separates close languages). */
  private def profileHits(tokens: Column, profile: Seq[String]): Column =
    aggregate(tokens, lit(0),
      (acc, t) => acc + when(t.isInCollection(profile), 1).otherwise(0))

  /**
   * Predict the language of a text column: the profile with the most
   * stopword hits wins; ties and zero-hit docs fall back to "und"
   * (undetermined, BCP-47 convention).
   */
  def langId(text: Column): Column = {
    val tokens = Shingles.words(text)
    val scored = stopwordProfiles.toSeq.sortBy(_._1).map { case (lang, profile) =>
      struct(profileHits(tokens, profile).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** DataFrame form: (id, predicted_lang). Runs the one-pass native
    * graft.functions.LangIdExpr (the HOF `langId` above is the executable
    * reference, equivalence-tested in VectorExpressionsSpec). */
  def langIdOf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("id"),
        call_function("graft_lang_id", Shingles.words(col(textCol)))
          .as("predicted_lang"))
      .orderBy(col("id"))
  }

  // ------------------------------------------------------------------
  // Token counting
  // ------------------------------------------------------------------

  /** Whitespace token count. */
  def wordCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: runs of word chars or single non-space symbols
    * (`\w+|[^\w\s]`) — the standard pre-tokenizer regex shape. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** (id, n_chars, n_words, n_subwords) per document. Runs the one-pass
    * native graft.functions.TextStatsExpr; the HOF form below is the
    * executable reference, equivalence-tested in VectorExpressionsSpec. */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("id"),
        call_function("graft_text_stats", col(textCol)).as("s"))
      .select(col("id"), col("s.n_chars").as("n_chars"),
        col("s.n_words").as("n_words"), col("s.n_subwords").as("n_subwords"))
      .orderBy(col("id"))
  }

  /** HOF reference form of [[tokenCounts]] (regex/split built-ins). */
  def tokenCountsHof(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        length(col(textCol)).as("n_chars"),
        wordCount(col(textCol)).as("n_words"),
        subwordCount(col(textCol)).as("n_subwords"))
      .orderBy(col("id"))

  // ------------------------------------------------------------------
  // Quality scoring
  // ------------------------------------------------------------------

  /**
   * Per-doc quality signals + composite score, the usual curation features:
   * length, mean word length, punctuation density, stopword ratio,
   * alphabetic ratio, max single-word dominance (repetition signal).
   *
   * Ratios are 6-dp TRUNCATING fixed point computed entirely in integer
   * arithmetic (`num * 10^6 DIV den`, then one IEEE divide by 10^6):
   * every engine produces bit-identical doubles, with no decimal-vs-float
   * render ambiguity and no rounding-mode divergence — the hash-parity
   * shape for derived fractions (see Inventory's header).
   */
  def qualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("id"),
        call_function("graft_text_stats", col(textCol)).as("s"))
      .select(col("id"), col("s.n_chars").as("n_chars"),
        col("s.n_words").as("n_words"),
        col("s.mean_word_len").as("mean_word_len"),
        col("s.punct_ratio").as("punct_ratio"),
        col("s.alpha_ratio").as("alpha_ratio"),
        col("s.stop_signal").as("stop_signal"),
        col("s.quality").as("quality"))
      .orderBy(col("id"))
  }

  /** HOF reference form of [[qualityScore]] (regex/array built-ins, ratios
    * via fixed-point SQL) — the round-2 shipped form; kept as the
    * equivalence oracle for TextStatsExpr. Its `withColumn` chain is also
    * the documented CollapseProject hazard: the ratio subtrees re-inline
    * under the CASE WHEN of `quality` where codegen subexpression
    * elimination does not reach — the reason the native form exists. */
  def qualityScoreHof(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val tokens = Shingles.words(t)
    val nChars = length(t)
    val nWords = wordCount(t)
    val nPunct = size(regexp_extract_all(t, lit("[\\p{Punct}]"), lit(0)))
    val nAlpha = size(regexp_extract_all(t, lit("[A-Za-z]"), lit(0)))
    val enStops = array(stopwordProfiles("en").map(lit): _*)
    val nStop = size(array_intersect(tokens, enStops))

    def ratio6(num: String, den: String): Column = expr(
      s"CASE WHEN $den > 0 THEN " +
        s"CAST(CAST($num AS BIGINT) * 1000000 DIV $den AS DOUBLE) / 1e6 " +
        "ELSE 0.0 END")

    docs.select(col(idCol).as("id"),
        nChars.as("n_chars"), nWords.as("n_words"),
        nPunct.as("__n_punct"), nAlpha.as("__n_alpha"),
        nStop.as("__n_stop"))
      .withColumn("mean_word_len", ratio6("n_chars", "n_words"))
      .withColumn("punct_ratio", ratio6("__n_punct", "n_chars"))
      .withColumn("alpha_ratio", ratio6("__n_alpha", "n_chars"))
      .withColumn("stop_signal", ratio6("__n_stop * 10", "n_words"))
      // composite: long-enough, alphabetic, not punctuation-soup —
      // summed in integer tenths so the double is a single exact divide
      .withColumn("quality",
        (when(col("n_words").between(20, 2000), 4).otherwise(0) +
         when(col("alpha_ratio") > 0.5, 4).otherwise(0) +
         when(col("punct_ratio") < 0.1, 2).otherwise(0))
          .cast("double") / 10.0)
      .select(col("id"), col("n_chars"), col("n_words"),
        col("mean_word_len"), col("punct_ratio"), col("alpha_ratio"),
        col("stop_signal"), col("quality"))
      .orderBy(col("id"))
  }

  // ------------------------------------------------------------------
  // Text cleanup / normalization
  // ------------------------------------------------------------------

  /**
   * Curation-standard text cleanup, applied in a fixed order: strip HTML
   * tags, mask URLs and emails with placeholder tokens (masking beats
   * deletion — downstream dedup/quality signals still see that something
   * was there), drop non-whitespace control characters, collapse all
   * whitespace runs to single spaces, trim.
   *
   * Every pattern stays in the Java∩RE2 common subset with EXPLICIT
   * whitespace classes (`[ \t\r\n\x0B\f]` instead of `\s`/`\S`, whose
   * \x0B membership differs between engines) so any SQL engine
   * reproduces the transform byte-for-byte — which is what makes the
   * operator oracle-checkable. Chained `regexp_replace` built-ins:
   * map-only, codegen'd, zero shuffle.
   */
  def cleanText(text: Column): Column = {
    val tags   = regexp_replace(text, "<[^<>]*>", " ")
    val urls   = regexp_replace(tags, "https?://[^ \\t\\r\\n\\x0B\\f]+", " <URL> ")
    val emails = regexp_replace(urls,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", " <EMAIL> ")
    val ctrl   = regexp_replace(emails, "[\\x00-\\x08\\x0E-\\x1F\\x7F]", "")
    trim(regexp_replace(ctrl, "[ \\t\\r\\n\\x0B\\f]+", " "))
  }

  // ------------------------------------------------------------------
  // PII redaction
  // ------------------------------------------------------------------

  /** PII patterns, written to the RE2 ∩ java.util.regex common subset
    * (no lookaround, no backreferences) so a DuckDB oracle evaluates
    * them identically. Phone deliberately requires an international
    * `+CC-` prefix — bare digit runs are far too false-positive-prone
    * for corpus-scale redaction. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{4}\\b"
  private[graft] val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /**
   * PII redaction — the scrub pass every training-data pipeline runs
   * before text leaves the curation boundary: emails → `<EMAIL>`,
   * IPv4 addresses → `<IP>`, international phone numbers → `<PHONE>`.
   * Emits per-doc match counts (the audit trail regulators ask for)
   * alongside the redacted text. Replacement order is fixed
   * (email, then IP, then phone) and counts are taken on the raw text,
   * so the operator is a deterministic pure function of its input.
   *
   * Map-only: three codegen'd `regexp_replace`s + three `regexp_count`s
   * per row, no shuffle — at 100 TB this is scan-bound, exactly like
   * [[cleanText]].
   */
  def piiRedact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    docs.select(col(idCol).as("id"),
        redacted.as("redacted"),
        regexp_count(t, lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count(t, lit(PhoneRe)).cast("int").as("n_phones"),
        regexp_count(t, lit(Ipv4Re)).cast("int").as("n_ipv4"))
      .orderBy(col("id"))
  }

  /** (id, clean, n_chars_clean) per document. */
  def cleaned(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"), cleanText(col(textCol)).as("clean"))
      .withColumn("n_chars_clean", length(col("clean")))
      .orderBy(col("id"))

  // ------------------------------------------------------------------
  // Repetition / lexical-diversity quality rules (Gopher-style)
  // ------------------------------------------------------------------

  /**
   * Gopher-style repetition and diversity filter (Rae et al. 2021,
   * "Scaling Language Models", §A1.1): documents dominated by a single
   * repeated token or with collapsed vocabulary are low-quality training
   * data. Per doc: word count, distinct-word count, top-token frequency,
   * mean word length, and the derived keep flag
   * `3 <= mean_word_len <= 10 AND top_ratio < 0.2 AND distinct_ratio > 0.3`.
   *
   * Map-only (no shuffle): per-token frequencies come from array HOFs over
   * the doc's own token list — O(words x distinct) per doc, done where the
   * doc lives. Ratios use the integer fixed-point form (`x*1e6 DIV n` then
   * one IEEE divide) so DuckDB reproduces them bit-exactly.
   */
  def gopherStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    gopherDerive(docs.select(col(idCol).as("id"),
      graft.functions.GraftFunctions.gopherStats(Shingles.words(col(textCol)))
        .as("s"))
      .select(col("id"), col("s.n_words").as("n_words"),
        col("s.n_distinct").as("n_distinct"),
        col("s.top_freq").as("top_freq"),
        col("s.sum_len").as("__sum_len")))
  }

  /** HOF reference form of [[gopherStats]]'s counting pass —
    * O(words x distinct) interpreted lambdas per doc vs. the native
    * expression's single hash-map pass; kept as the equivalence oracle for
    * GopherStatsExpr. */
  def gopherStatsHof(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    gopherDerive(docs.select(col(idCol).as("id"),
      Shingles.words(col(textCol)).as("w"))
      .select(col("id"),
        size(col("w")).as("n_words"),
        size(array_distinct(col("w"))).as("n_distinct"),
        array_max(transform(array_distinct(col("w")),
          t => size(filter(col("w"), x => x === t)))).as("top_freq"),
        aggregate(col("w"), lit(0L), (acc, t) => acc + length(t))
          .as("__sum_len")))

  /** Shared ratio/flag layer over the (id, n_words, n_distinct, top_freq,
    * __sum_len) counts. */
  private def gopherDerive(counts: DataFrame): DataFrame = {
    // 6-dp truncating fixed point (same idiom as qualityScoreHof.ratio6):
    // bit-identical doubles in every engine, no rounding-mode divergence
    def ratio6(num: String, den: String): Column = expr(
      s"CASE WHEN $den > 0 THEN " +
        s"CAST(CAST($num AS BIGINT) * 1000000 DIV $den AS DOUBLE) / 1e6 " +
        "ELSE 0.0 END")
    counts
      .withColumn("mean_word_len", ratio6("__sum_len", "n_words"))
      .withColumn("top_ratio", ratio6("top_freq", "n_words"))
      .withColumn("distinct_ratio", ratio6("n_distinct", "n_words"))
      .withColumn("keep",
        col("mean_word_len").between(3.0, 10.0) &&
        col("top_ratio") < 0.2 && col("distinct_ratio") > 0.3)
      .select(col("id"), col("n_words"), col("n_distinct"), col("top_freq"),
        col("mean_word_len"), col("top_ratio"), col("distinct_ratio"),
        col("keep"))
      .orderBy(col("id"))
  }

  /** Top-`k` word bigrams across the corpus by frequency (ties broken by
    * gram text ascending — deterministic). The one corpus-level text
    * statistic here: partial aggregation combines counts map-side, the
    * exchange carries (gram, count) pairs, and the final top-k is a
    * TakeOrderedAndProject (no full sort at scale). */
  def topNgrams(docs: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    val w = Shingles.words(col(textCol))
    // zip the token list against itself shifted by one — measured 9x
    // faster than the transform(sequence(1, n-1), i -> element_at(w, i)..)
    // form (positional-lambda indexing defeats the evaluator; zipping
    // walks both arrays once). greatest(.., 0) keeps slice lengths legal
    // for 1-word docs, which then yield an empty gram list and drop at
    // the explode.
    val n1 = greatest(size(w) - 1, lit(0))
    val grams = zip_with(slice(w, lit(1), n1), slice(w, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
    docs.select(explode(grams).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)
  }

  /**
   * BPE merge statistics: corpus-wide counts of adjacent character pairs
   * WITHIN words — the statistic a byte-pair-encoding trainer computes
   * each merge round (round one over raw characters is exactly this
   * table), and the tokenizer-health diagnostic behind "which merges
   * would a domain-adapted vocab learn first?".
   *
   * Tokenization matches the t-series convention (lower/trim/whitespace
   * words). Pairs are generated INSIDE each row with [[topNgrams]]'s
   * shifted-zip device applied at character level (split on the empty
   * pattern appends one trailing "" element under Java regex semantics —
   * filtered before zipping), so the only exchange carries
   * (pair, partial count) and (pair, id) distinct rows after map-side
   * combine, and the final top-k is a TakeOrderedAndProject. Output:
   * (pair, n_occurrences, n_docs), count desc, ties by pair ascending.
   */
  def bpePairCounts(docs: DataFrame, textCol: String, idCol: String,
                    k: Int = 30): DataFrame = {
    require(k > 0, s"bpePairCounts needs k > 0, got $k")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val pairs = graft.functions.GraftFunctions
      .charPairs(Shingles.words(col(textCol)))
    docs.select(col(idCol).as("id"), explode(pairs).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(k)
  }

  /** HOF reference form of the t22 pair generator — the semantics
    * `graft_char_pairs` must reproduce (split on the empty pattern
    * appends one trailing "" under Java regex, filtered before the
    * shifted zip); kept for the VectorExpressionsSpec equivalence gate. */
  private[graft] def bpePairsHof(docs: DataFrame, textCol: String): DataFrame = {
    val pairs = flatten(transform(Shingles.words(col(textCol)), wd => {
      val c = filter(split(wd, ""), ch => ch =!= "")
      val n1 = greatest(size(c) - 1, lit(0))
      zip_with(slice(c, lit(1), n1), slice(c, lit(2), n1),
        (x, y) => concat(x, y))
    }))
    docs.select(explode(pairs).as("pair"))
  }

  /**
   * Default BPE merge list for [[bpeSegment]] — a 16-rank, well-formed
   * vocabulary (every multi-character side is produced by a strictly
   * earlier merge, the invariant real BPE training guarantees) that
   * builds the corpus's own head words through up-to-4-round merge
   * chains: t+a → ta+b → l+e → tab+le assembles "table"; likewise
   * "scan", "value", "row", "window"'s `ind`. Rank order is position.
   */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "ta" -> "b", "l" -> "e", "tab" -> "le",
    "s" -> "c", "sc" -> "a", "sca" -> "n",
    "v" -> "a", "va" -> "l", "u" -> "e", "val" -> "ue",
    "r" -> "o", "ro" -> "w",
    "i" -> "n", "in" -> "d",
    "e" -> "r")

  /**
   * BPE apply/segmenter (t26) — the APPLY half of the tokenizer whose
   * TRAIN half is [[bpePairCounts]] (t22's round-one merge statistics):
   * segment each document under a learned rank-ordered merge list and
   * report the token count a real vocabulary would produce — the number
   * every mixture/packing decision (p03/p11/p12) otherwise proxies with
   * whitespace-word counts. Semantics live in
   * [[graft.functions.BpeSegmentExpr]] (words = `[a-z0-9]+` runs of
   * `lower(text)`; merges applied in rank order, one left-to-right
   * greedy pass each — oracle-reproducible via nested SQL `replace`
   * over a separator-wrapped form).
   *
   * Output per doc: `(id, n_words, n_chars, n_tokens, tokens_per_char_ppm,
   * seg_prefix)` — counts as exact integers, the ppm ratio by truncating
   * integer division (the house exact-arithmetic convention), and the
   * first 200 chars of the space-joined segmentation as direct evidence
   * the SEGMENTS match, not just their count. Scale: embarrassingly
   * parallel, one codegen'd expression call per doc, zero exchange; the
   * only shuffle is the output ORDER BY, which a sink that doesn't need
   * global order would drop.
   */
  def bpeSegment(docs: DataFrame, textCol: String, idCol: String,
                 merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = graft.functions.GraftFunctions.bpeSegment(col(textCol), merges)
    docs
      .select(col(idCol).as("id"), lower(col(textCol)).as("t"),
        toks.as("toks"))
      .select(col("id"),
        size(regexp_extract_all(col("t"), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_words"),
        length(regexp_replace(col("t"), "[^a-z0-9]", "")).cast("long")
          .as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        substring(array_join(col("toks"), " "), 1, 200).as("seg_prefix"))
      .withColumn("tokens_per_char_ppm",
        when(col("n_chars") === 0, 0L)
          .otherwise(expr("1000000L * n_tokens div n_chars")))
      .orderBy(col("id"))
  }

  /** HOF/string reference form of [[bpeSegment]]'s token array — the
    * oracle's own device (each word wrapped `|c1||c2|…|`, words joined
    * by `#`, one literal `replace` per merge rank, then split on
    * `[|#]+`), kept executable for the VectorExpressionsSpec
    * equivalence gate against the native expression. */
  private[graft] def bpeSegmentHof(
      text: Column, merges: Seq[(String, String)]): Column = {
    val ws = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    val wrapped = transform(ws, w =>
      concat(lit("|"),
        array_join(filter(split(w, ""), c => c =!= ""), "||"), lit("|")))
    val s0 = array_join(wrapped, "#")
    val sN = merges.foldLeft(s0) { case (acc, (a, b)) =>
      call_function("replace", acc, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }
    filter(split(sN, "[|#]+"), t => t =!= "")
  }

  /**
   * BPE trainer (t27) — learn an `nMerges`-rank merge list from the
   * corpus, closing the tokenizer loop: [[bpePairCounts]] (t22) is the
   * round-one diagnostic, this is the full greedy trainer, and
   * [[bpeSegment]] (t26) applies what it learns. Per round: segment the
   * corpus under the merges learned so far, count within-word adjacent
   * TOKEN pairs (not char pairs — later rounds merge merged tokens),
   * and adopt the most frequent pair (ties by (lhs, rhs) ascending —
   * exact and engine-stable). Greedy max-count selection is the actual
   * BPE training rule (Sennrich et al. 2016); the learned list is
   * well-formed by construction, so [[bpeSegment]]'s rank-order apply
   * is exactly the tokenizer's min-rank loop on it.
   *
   * The corpus rides as the separator-wrapped string form (the
   * [[bpeSegmentHof]] device): round r+1's state is ONE literal
   * `replace` over round r's — not a re-derivation — checkpointed per
   * round with the previous generation released
   * ([[IterativeMemory.release]], the e19/g01 discipline: O(corpus)
   * storage, not O(rounds x corpus)). Driver state is the O(nMerges)
   * merge list (the e19 centroid pattern); each round is one
   * map-side-combined pair count plus a 1-row TakeOrdered. Stops early
   * if no pair remains (degenerate corpora).
   *
   * Output: `(rank, lhs, rhs, n_occurrences)` — n is the pair's corpus
   * count AT SELECTION TIME (counts interact across rounds; rank 1
   * equals t22's top row over raw characters by construction).
   */
  def bpeTrain(docs: DataFrame, textCol: String, idCol: String,
               nMerges: Int = 8): DataFrame = {
    require(nMerges >= 1 && nMerges <= 64,
      s"bpeTrain needs 1 <= nMerges <= 64, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val ws = regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"),
      lit(0))
    val wrapped = transform(ws, w =>
      concat(lit("|"),
        array_join(filter(split(w, ""), c => c =!= ""), "||"), lit("|")))
    var cur = docs.select(array_join(wrapped, "#").as("s"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    graft.functions.GraftFunctions.register(spark)
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      // one native state-machine pass per doc (wrapped_token_pairs, the
      // "a b" pair stream) — the HOF form it replaced (explode words →
      // let/filter/split → shifted zip → explode) is kept as
      // bpeTrainPairsHof for the spec's differential gate and cost
      // ~2x the whole trainer
      val top = cur.select(explode(graft.functions.GraftFunctions
          .wrappedTokenPairs(col("s"))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        val n = top(0).getLong(1)
        learned += (((r + 1).toLong, a, b, n))
        val next = cur.select(call_function("replace", col("s"),
            lit(s"|$a||$b|"), lit(s"|$a$b|")).as("s"))
          .localCheckpoint(true)
        IterativeMemory.release(cur)
        cur = next
        r += 1
      }
    }
    IterativeMemory.release(cur)
    learned.toSeq.toDF("rank", "lhs", "rhs", "n_occurrences")
      .orderBy(col("rank"))
  }

  /** HOF reference form of the trainer's per-round pair stream — the
    * semantics `graft_wrapped_token_pairs` must reproduce ("a b" per
    * adjacent within-word token pair of the wrapped corpus string),
    * kept for the VectorExpressionsSpec equivalence gate. */
  private[graft] def bpeTrainPairsHof(wrappedDoc: Column): Column =
    flatten(transform(split(wrappedDoc, "#"), wstr =>
      Shingles.let(filter(split(wstr, "\\|+"), t => t =!= "")) { toks =>
        val n1 = greatest(size(toks) - 1, lit(0))
        zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
          (x, y) => concat(x, lit(" "), y))
      }))

  // ------------------------------------------------------------------
  // Document fingerprinting — winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  // ------------------------------------------------------------------

  /**
   * Winnowing fingerprints: hash every k-gram of characters, slide a window
   * of `window` consecutive k-gram hashes, keep the min of each window.
   * The distinct mins are the doc's fingerprints — robust to local edits,
   * used for near-dup and contamination checks at corpus scale.
   */
  def winnowingFingerprints(text: Column, k: Int = 8, window: Int = 4): Column =
    // let-bind the normalized text and the gram array: referenced inside
    // per-element lambdas, they would otherwise be re-evaluated per gram
    // (O(len²) regex work per document — see Shingles.let).
    Shingles.let(lower(regexp_replace(text, "\\s+", " "))) { norm =>
      Shingles.let(transform(
        sequence(lit(1), greatest(length(norm) - lit(k - 1), lit(1))),
        i => xxhash64(substring(norm, lit(i), lit(k))))) { grams =>
        val mins = transform(
          sequence(lit(1), greatest(size(grams) - lit(window - 1), lit(1))),
          i => array_min(slice(grams, i, lit(window))))
        array_sort(array_distinct(mins))
      }
    }

  /** (id, fingerprints array, n_fingerprints) per document. Runs the
    * native graft.functions.Winnow expression (one loop per doc); the HOF
    * form above is the executable reference, equivalence-tested in
    * VectorExpressionsSpec. */
  /**
   * Benchmark-decontamination check: which corpus documents share
   * winnowing fingerprints with a probe set (eval/test documents)?
   * Returns (id, probe_id, n_shared) for pairs sharing at least
   * `minShared` fingerprints — the standard "does the training corpus
   * contain the benchmark" sweep.
   *
   * Scale design: both sides reduce to inverted (fingerprint, id) pairs —
   * the join shuffles 16-byte rows keyed by fingerprint, never text, and
   * the probe side is typically small enough that Catalyst broadcasts it.
   * Self-pairs (same id on both sides) are excluded so a corpus can be
   * probed against its own subset.
   */
  def contamination(docs: DataFrame, textCol: String, idCol: String,
                    probes: DataFrame, probeTextCol: String,
                    probeIdCol: String,
                    k: Int = 8, window: Int = 4, minShared: Int = 2,
                    hashMode: String = "xx"): DataFrame =
    // the live composition IS the probe over the live index (the
    // d02/d07/t28 one-construction device): t29's stored-path hash gate
    // certifies this operator's overlap arithmetic by identity. The
    // probe CORE, not the validated wrapper: the index is built right
    // here with the same modulus, so the stored-path bucket check would
    // only add a driver job re-evaluating the live fingerprint plan
    probeCore(
      contaminationIndex(docs, textCol, idCol, k, window, hashMode),
      probes, probeTextCol, probeIdCol, k, window, minShared, hashMode,
      buckets = 64, broadcastProbe = true)

  /**
   * Materializable contamination-side state — the inverted fingerprint
   * table a release job writes ONCE per corpus and every new benchmark
   * candidate probes (the d18/e21/t28 compute-once/store/probe pattern
   * for the contamination family): one (cid, fp, fpb) row per (doc,
   * distinct winnowing fingerprint), `fpb` = pmod(fp, buckets) — the
   * partition column. Persist PARTITIONED BY fpb: a probe joins on
   * (fpb, fp) against the (broadcast) probe-side fingerprints, so the
   * scan carries a dynamic-partition-pruning subquery and an eval-set
   * check reads the probe's BUCKETS' files, not the corpus's inverted
   * table (with a realistic small probe the bucket set is sparse; at
   * fixture scale every bucket matches and DPP just proves the plumbing).
   * `buckets` trades pruning granularity against directory count —
   * production corpora want more.
   */
  def contaminationIndex(docs: DataFrame, textCol: String, idCol: String,
                         k: Int = 8, window: Int = 4,
                         hashMode: String = "xx",
                         buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"contaminationIndex needs buckets >= 1")
    // widen the corpus text below the winnowing projection (r14, guide
    // §2.5): the fixture's single-split scan ran the whole corpus's
    // fingerprinting in one task (profiled ~1 s); at scale the scan is
    // already parallel and the guard no-ops
    fingerprints(Par.widen(docs.select(col(idCol), col(textCol))),
        textCol, idCol, k, window, hashMode)
      .select(col("id").as("cid"), explode(col("fps")).as("fp"))
      .withColumn("fpb", pmod(col("fp"), lit(buckets)).cast("int"))
  }

  /**
   * Probe a stored [[contaminationIndex]] with a candidate document set:
   * which corpus docs share >= `minShared` fingerprints with each
   * probe doc — [[contamination]]'s output over the stored inverted
   * rows, without re-fingerprinting the corpus. `k`/`window`/
   * `hashMode` must match the index's build parameters (the probe side
   * is fingerprinted here; the corpus side is read as-is); `buckets` is
   * VALIDATED against a bounded sample of the stored rows, because a
   * mismatched modulus silently drops join matches — false negatives in
   * a safety check. `broadcastProbe` (default true — an eval set is
   * small by definition) pins the probe side as the broadcast build,
   * which is what keeps the corpus side off any shuffle ENTIRELY (an
   * AQE runtime conversion would still materialize the corpus side's
   * shuffle map stage first — measured 2× on the live path) and what
   * arms the stored scan's dynamic partition pruning; pass false for a
   * corpus-sized probe set (the API permits one), trading a shuffle
   * join for the 8 GB broadcast limit.
   */
  def contaminationProbe(index: DataFrame,
                         probes: DataFrame, probeTextCol: String,
                         probeIdCol: String,
                         k: Int = 8, window: Int = 4, minShared: Int = 2,
                         hashMode: String = "xx",
                         buckets: Int = 64,
                         broadcastProbe: Boolean = true): DataFrame = {
    require(buckets >= 1, "contaminationProbe needs buckets >= 1" +
      " (pmod(fp, 0) is null and would silently match nothing)")
    validateBuckets(index, buckets)
    probeCore(index, probes, probeTextCol, probeIdCol, k, window,
      minShared, hashMode, buckets, broadcastProbe)
  }

  /** A `buckets` that differs from the index's build value would make
    * the (fpb, fp) join drop every row where the two moduli disagree —
    * silent FALSE NEGATIVES in a decontamination safety check (and, on
    * the append path, PERMANENTLY misplaced rows). The stored rows carry
    * enough to verify: every (fp, fpb) must satisfy fpb = pmod(fp,
    * buckets). A bounded 100-row SAMPLE (not a full scan — the clean
    * case must stay cheap) makes a wrong modulus essentially impossible
    * to miss: each sampled row disagrees with probability >= 1/2 for any
    * wrong buckets value. Shared by the STORED-index entry points
    * ([[contaminationProbe]], [[contaminationIndexAppend]]); the live
    * composition ([[contamination]]) skips it by construction. */
  private def validateBuckets(index: DataFrame, buckets: Int): Unit = {
    val sample = index.select(col("fp"), col("fpb").cast("int"))
      .limit(100).collect()
    require(sample.forall { r =>
      val m = r.getLong(0) % buckets
      r.getInt(1) == (if (m < 0) m + buckets else m)
    }, s"stored index buckets do not match buckets=$buckets — probe " +
      "with the index's build value")
  }

  /**
   * Incremental maintenance for a stored [[contaminationIndex]] — the
   * append path that keeps the t29 contamination index fresh between
   * releases (the [[graft.ops.Similarity.ivfIndexAppend]] contract for
   * the fingerprint family): a new corpus batch emits its inverted
   * (cid, fp, fpb) rows — fingerprinted from the BATCH text only, the
   * released corpus is never re-fingerprinted — schema-identical to the
   * released layout and ready to `write.mode("append")
   * .partitionBy("fpb")` into it. Only the touched buckets' partitions
   * gain files; nothing shipped is rewritten, and a probe's dynamic
   * partition pruning keeps working unchanged over the appended layout.
   *
   * `k`/`window`/`hashMode`/`buckets` must match the index's build
   * parameters; `buckets` is VALIDATED against a bounded sample of the
   * stored rows (the [[contaminationProbe]] check) because a mismatched
   * modulus here is worse than a probe-side one — it would scatter the
   * delta's fingerprints into the WRONG partitions permanently, turning
   * every later DPP-pruned probe into silent false negatives on exactly
   * the newest data. The hash parameters (`k`/`window`/`hashMode`) are
   * not recoverable from the stored rows — they are the release's
   * metadata contract, same as the probe's.
   *
   * Equivalence contract (spec-pinned, t31 hash gate): fingerprint rows
   * are per-document facts, so append(index, delta) ∪-equals the index
   * rebuilt from scratch over corpus ∪ delta — a probe over the
   * appended stored index returns exactly what the rebuild would.
   * Caller contract: delta ids must be NEW (the d07/e22 convention;
   * [[graft.ops.Profile.indexAudit]] is the drift check).
   *
   * Scale: delta-sized throughout — winnowing runs over the batch text
   * only, the explode emits one 20-byte row per (doc, fingerprint), and
   * the partitioned append writes |delta buckets| file sets.
   */
  def contaminationIndexAppend(index: DataFrame, newDocs: DataFrame,
                               textCol: String, idCol: String,
                               k: Int = 8, window: Int = 4,
                               hashMode: String = "xx",
                               buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "contaminationIndexAppend needs buckets >= 1")
    validateBuckets(index, buckets)
    contaminationIndex(newDocs, textCol, idCol, k, window, hashMode,
      buckets)
  }

  /** The probe dataflow shared by [[contamination]] (live index — the
    * bucket check is vacuous by construction) and [[contaminationProbe]]
    * (stored index — bucket-validated wrapper above). */
  private def probeCore(index: DataFrame,
                        probes: DataFrame, probeTextCol: String,
                        probeIdCol: String,
                        k: Int, window: Int, minShared: Int,
                        hashMode: String, buckets: Int,
                        broadcastProbe: Boolean): DataFrame = {
    val p0 = fingerprints(probes, probeTextCol, probeIdCol, k, window,
        hashMode)
      .select(col("id").as("probe_id"), explode(col("fps")).as("fp"))
      .withColumn("fpb", pmod(col("fp"), lit(buckets)).cast("int"))
    val p = if (broadcastProbe) broadcast(p0) else p0
    index.join(p, Seq("fpb", "fp"))
      .filter(col("cid") =!= col("probe_id"))
      .groupBy(col("cid"), col("probe_id"))
      .agg(count(lit(1)).cast("int").as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("cid").as("id"), col("probe_id"), col("n_shared"))
      .orderBy(col("id"), col("probe_id"))
  }

  /**
   * End-to-end curation verdict — the filter chain a pipeline ships,
   * composed from the t-series primitives: t02 quality score ≥
   * `minQuality`, t06 Gopher structural keep, t19 encoding health on
   * the raw text, t03 language against an allow-list. Output per doc:
   * the four component verdicts, the conjunction `keep`, and
   * `reject_reason` — the FIRST failing gate in chain order
   * (quality → repetition → encoding → language), the triage column a
   * curation dashboard pivots on.
   *
   * Scale: every component is its own one-pass map stage over the text
   * (native expressions); the composition is three id-keyed equi-joins
   * of slim verdict projections. The chain could be fused into a single
   * projection mechanically — the components are column expressions —
   * but the composed form keeps each gate definitionally identical to
   * its standalone, individually oracle-checked op.
   */
  def filterChain(docs: DataFrame, textCol: String, idCol: String,
                  allowedLangs: Seq[String],
                  minQuality: Double = 0.6): DataFrame = {
    require(allowedLangs.nonEmpty, "filterChain needs a language allow-list")
    val q = qualityScore(docs, textCol, idCol)
      .select(col("id"), col("quality"))
    val g = gopherStats(docs, textCol, idCol)
      .select(col("id"), col("keep").as("gopher_keep"))
    val m = mojibakeScore(docs, textCol, idCol)
      .select(col("id"), col("is_suspect"))
    val l = langIdOf(docs, textCol, idCol)
    q.join(g, "id").join(m, "id").join(l, "id")
      .select(col("id"), col("quality"), col("gopher_keep"),
        col("is_suspect"), col("predicted_lang"),
        (col("quality") >= minQuality).as("__q_ok"),
        col("predicted_lang").isInCollection(allowedLangs).as("__l_ok"))
      .select(col("id"), col("quality"), col("gopher_keep"),
        col("is_suspect"), col("predicted_lang"),
        (col("__q_ok") && col("gopher_keep") && !col("is_suspect") &&
          col("__l_ok")).as("keep"),
        when(col("__q_ok") && col("gopher_keep") && !col("is_suspect") &&
            col("__l_ok"), lit(null).cast("string"))
          .when(!col("__q_ok"), lit("quality"))
          .when(!col("gopher_keep"), lit("repetition"))
          .when(col("is_suspect"), lit("encoding"))
          .otherwise(lit("language")).as("reject_reason"))
      .orderBy(col("id"))
  }

  /**
   * Asymmetric n-gram containment — quote / near-quote detection: for
   * every (probe, corpus doc) pair, what fraction of the PROBE's
   * distinct word shingles the corpus doc contains, in exact ppm
   * (`1e6·|shared| div |probe shingles|`). Where [[contamination]]
   * counts shared winnowing fingerprints (symmetric evidence, edit-
   * robust), containment is directional: "85 % of this eval question
   * appears inside that training doc" — the decontamination judgment
   * call, which direction-free Jaccard dilutes when the corpus doc is
   * long. Docs shorter than n words fall back to one whole-text
   * shingle, mirroring the d04 convention.
   *
   * Scale design (100 TB): the probe side (eval sets: thousands of
   * docs) reduces to distinct (shingle, probe, n_probe) rows and is
   * broadcast, so the corpus-side shingle stream is consumed MAP-SIDE —
   * no corpus shuffle at all; the only exchange carries matched
   * (probe_id, id) partial counts, bounded by |matches|, and both input
   * shingle arrays are distinct so the join count IS the intersection
   * size. Raw string shingles (not xxhash64) keep the op
   * oracle-checkable; they live only inside the map stage.
   */
  def quoteContainment(corpus: DataFrame, textCol: String, idCol: String,
                       probes: DataFrame, pTextCol: String, pIdCol: String,
                       n: Int = 3, minPpm: Long = 200000): DataFrame = {
    require(n >= 1, s"quoteContainment needs n >= 1, got $n")
    require(minPpm >= 0 && minPpm <= 1000000,
      s"quoteContainment needs 0 <= minPpm <= 1e6, got $minPpm")
    def shingles(t: Column) = Shingles.let(Shingles.words(t)) { w =>
      array_distinct(when(size(w) >= n,
        transform(sequence(lit(1), size(w) - lit(n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n)))))
        .otherwise(array(lower(trim(t)))))
    }
    val p = probes
      .select(col(pIdCol).as("probe_id"), shingles(col(pTextCol)).as("psh"))
      .select(col("probe_id"), size(col("psh")).cast("long").as("n_probe"),
        explode(col("psh")).as("s"))
    corpus.select(col(idCol).as("id"), explode(shingles(col(textCol))).as("s"))
      .join(broadcast(p), "s")
      .filter(col("id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("id"), col("n_probe"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("containment_ppm",
        expr("n_shared * 1000000L DIV n_probe"))
      .filter(col("containment_ppm") >= minPpm)
      .select(col("probe_id"), col("id"), col("n_shared"), col("n_probe"),
        col("containment_ppm"))
      .orderBy(col("probe_id"), col("id"))
  }

  def fingerprints(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 8, window: Int = 4,
                   hashMode: String = "xx"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // whitespace collapse spells Java's \s out as an explicit class so the
    // DuckDB oracle can use the byte-identical class ('[ \t\r\n\x0B\f]+' —
    // RE2's \s lacks \x0B, so a literal '\s+' would NOT be the same
    // pattern there); hashMode "md5" makes each gram hash reproducible in
    // DuckDB (Md5Hash60), which is what lets t04 carry a real oracle.
    // No orderBy here (r14): this is a building block — the t04 gate
    // query sorts at its own site. The interior sort cost every index
    // build a global range exchange PLUS a full re-execution of the
    // winnowing in the range-partitioner's sampling pass (profiled as
    // the duplicate ~1 s single-task job in t29/t31).
    docs.select(col(idCol).as("id"),
        graft.functions.GraftFunctions.winnow(
          lower(regexp_replace(col(textCol), "[ \\t\\r\\n\\u000B\\f]+", " ")),
          k, window, hashMode).as("fps"))
      .select(col("id"), col("fps"), size(col("fps")).as("n_fps"))
  }

  /**
   * Token-rarity quality report — the deterministic stand-in for the
   * CCNet-style LM quality filter: per document, how common its tokens
   * are in the corpus overall. Gibberish / OCR noise / boilerplate-free
   * junk is dominated by corpus-rare tokens (hapaxes), while natural
   * prose re-uses the corpus vocabulary; filtering on these signals is
   * the classic curation step (a real LM perplexity scorer plugs in the
   * same shape — per-token scores joined back and aggregated per doc).
   * All outputs are exact integers: corpus frequencies, not float log
   * probabilities, so the result is bit-identical on any engine.
   *
   * Output per doc: n_tokens, sum_freq (Σ corpus frequency of each
   * token occurrence), min_freq (the rarest token's frequency), n_hapax
   * (occurrences of corpus-unique tokens).
   *
   * Scale: vocab is a partial-aggregated (token, freq) table — tiny
   * relative to the corpus (vocabularies grow ~Heaps' law, sublinearly);
   * the join back re-shuffles the token stream keyed by token (or
   * broadcasts the vocab when it fits), then one keyed aggregation by
   * doc id. Two shuffles total, both keyed — no global ordering.
   */
  def tokenRarity(docs: DataFrame, textCol: String,
                  idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(Shingles.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
    toks.join(vocab, "token")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("freq")).as("sum_freq"),
        min(col("freq")).as("min_freq"),
        sum(when(col("freq") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .orderBy(col("id"))
  }

  // ------------------------------------------------------------------
  // Corpus vocabulary statistics (Zipf / data-card report)
  // ------------------------------------------------------------------

  /**
   * One-row corpus vocabulary report — the numbers a dataset card and a
   * tokenizer-vocab decision need: total token count, type (distinct
   * token) count, hapax-legomena count (types seen exactly once — the
   * long-tail mass that Zipf's law predicts at ~half of all types), and
   * the token mass of the 10 most frequent types (the head weight;
   * head-heavy corpora signal boilerplate). All exact integers.
   *
   * Scale design: one token-keyed aggregation with map-side combine
   * (the unigram table, reused for all four statistics), then two tiny
   * single-row aggregates; the top-10 head uses TakeOrderedAndProject —
   * the token stream shuffles once, keyed, and nothing collects.
   */
  def vocabStats(docs: DataFrame, textCol: String): DataFrame = {
    // lazy localCheckpoint: the unigram table has two consumers (head
    // mass, totals) and Spark plans trees, not DAGs — without it the
    // token scan + aggregation would run twice (heavyHitters' device)
    val uni = docs
      .select(explode(Shingles.words(coalesce(col(textCol), lit(""))))
        .as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("u"))
      .localCheckpoint(false)
    val top10 = uni.orderBy(col("u").desc, col("t")).limit(10)
      .agg(sum(col("u")).as("top10_mass"))
    uni.agg(sum(col("u")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("u") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .crossJoin(top10)
  }

  // ------------------------------------------------------------------
  // Count-based bigram LM scoring (perplexity-filter stand-in)
  // ------------------------------------------------------------------

  /**
   * Per-document fluency score from a corpus-estimated bigram language
   * model — the deterministic, exact-integer stand-in for the LM
   * perplexity filter in curation pipelines (CCNet, Wenzek et al. 2020,
   * filter on a KenLM score; here the n-gram model IS the corpus).
   * Per bigram (w1,w2), add-one smoothed conditional probability
   * p = (B(w1,w2)+1) / (U(w1)+V) with B/U/V the corpus bigram, unigram
   * and vocabulary counts; each term contributes
   * `floor(1e9 · p)` — INTEGER arithmetic only, so per-doc sums are
   * hash-exact across engines (the same device as t11: a float log-sum
   * would hinge on libm ulp parity). Output per doc:
   * (id, n_bigrams, sum_scaled); higher mean ⇔ more predictable text.
   *
   * Scale design: the unigram/bigram count tables are keyed
   * aggregations with map-side combine (never broadcast — vocabulary
   * grows with the corpus), the score joins are keyed equi-joins on
   * (w1) and (w1,w2), and V rides in as a broadcast scalar. At 100 TB
   * this is the classic count-based LM shape: everything partitions by
   * token key.
   */
  def bigramLmScore(docs: DataFrame, textCol: String,
                    idCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      Shingles.words(coalesce(col(textCol), lit(""))).as("w"))
    val bigrams = base
      .select(col("id"), Shingles.let(col("w")) { w =>
        // guard: sequence(1, 0) runs DESCENDING for a 1-word doc and
        // would fabricate out-of-bounds indexes (same trap chunkArray
        // documents) — single-word docs have no bigrams
        when(size(w) >= 2,
          transform(sequence(lit(1), size(w) - 1),
            i => struct(element_at(w, i).as("w1"),
              element_at(w, i + 1).as("w2"))))
          .otherwise(expr("array()")
            .cast("array<struct<w1:string,w2:string>>"))
      }.as("bg"))
      .select(col("id"), explode(col("bg")).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // two consumers (count table, score join) — share one
      // materialization instead of re-tokenizing the corpus per branch
      .localCheckpoint(false)
    val unigrams = base.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("u"))
    val vocab = unigrams.agg(count(lit(1)).as("v"))
    val bigramCounts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("b"))
    val scored = bigrams
      .join(bigramCounts, Seq("w1", "w2"))
      .join(unigrams.withColumnRenamed("t", "w1"), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        expr("(1000000000L * (b + 1)) div (u + v)").as("s"))
    val agg = scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("sum_scaled"))
    base.select(col("id"))
      .join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_scaled"), lit(0L)).as("sum_scaled"))
      .orderBy(col("id"))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
   * Extracting high quality monolingual datasets from web crawl data"):
   * rank every document by corpus-LM fluency — the [[bigramLmScore]]
   * exact-integer score, mean per bigram — and split the corpus into
   * head / middle / tail terciles, the curation knob CCNet ships
   * ("keep head+middle; sample tail at a reduced rate"). Output per
   * doc: (id, n_bigrams, mean_scaled, bucket).
   *
   * Buckets are VALUE-based, not rank-based: b1 is the LARGEST mean
   * score whose ≥-count reaches ceil(n/3) (b2 likewise at ceil(2n/3)),
   * so equal scores always land in the same (better) bucket, membership
   * is a pure function of the score, and the DuckDB oracle reproduces
   * the split exactly — an NTILE split would break ties by row order
   * and make the bucket an artifact of partitioning.
   *
   * Scale design: the boundary search is the classic two-phase
   * distributed quantile. Phase 1 aggregates a 257-cell histogram of
   * the (bounded, integer) mean score — the collect is O(1) in corpus
   * size — and locates each boundary's cell plus its residual rank.
   * Phase 2 aggregates ONLY that cell's rows by distinct value and runs
   * one descending cumulative window over those distinct values — a
   * single-partition window, but over at most cellWidth (≈3.9M)
   * distinct integers and usually far fewer, never over the corpus.
   * Final bucket assignment is a map-side comparison against two
   * boundary literals; the corpus is never globally sorted.
   */
  def perplexityBuckets(docs: DataFrame, textCol: String,
                        idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // scores ride three consumers (histogram, boundary cells, final
    // assignment) — one materialization of the LM-join pipeline
    val scored = bigramLmScore(docs, textCol, idCol)
      .select(col("id"), col("n_bigrams"),
        expr("sum_scaled div greatest(n_bigrams, 1L)").as("mean_scaled"))
      .localCheckpoint(true)
    val cellW = 3906250L // 1e9 / 256; per-bigram scores are <= 1e9
    val coarse = scored
      .groupBy(expr(s"mean_scaled div $cellW").as("cb"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val n = coarse.map(_._2).sum
    val empty = scored.select(col("id"), col("n_bigrams"),
      col("mean_scaled"), lit("tail").as("bucket"))
    if (n == 0) return empty
    // locate the cell holding rank r (counting from the top value down)
    // and the residual rank within it
    def locate(r: Long): (Long, Long) = {
      var above = 0L
      var i = 0
      while (i < coarse.length && above + coarse(i)._2 < r) {
        above += coarse(i)._2
        i += 1
      }
      if (i < coarse.length) (coarse(i)._1, r - above)
      else (coarse.last._1, coarse.last._2) // unreachable for r <= n
    }
    // exact boundary: the largest value in the cell whose within-cell
    // >=-cumulative reaches the residual rank
    def boundary(cell: Long, rr: Long): Long =
      scored.filter(expr(s"mean_scaled div $cellW") === cell)
        .groupBy(col("mean_scaled")).agg(count(lit(1)).as("c"))
        // bounded: distinct mean_scaled values inside ONE coarse cell
        // (≤ cellW = 3,906,250 integers — a range constant, not corpus-
        // proportional; in practice the cell's occupied values)
        .withColumn("cge",
          sum(col("c")).over(
            graft.ops.BoundedWindow.orderBy(col("mean_scaled"),
                col("mean_scaled").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cge") >= rr)
        .agg(max(col("mean_scaled")))
        .head().getLong(0)
    val (cell1, rr1) = locate((n + 2) / 3)
    val (cell2, rr2) = locate((2 * n + 2) / 3)
    val b1 = boundary(cell1, rr1)
    val b2 = boundary(cell2, rr2)
    scored.select(col("id"), col("n_bigrams"), col("mean_scaled"),
      when(col("mean_scaled") >= b1, lit("head"))
        .when(col("mean_scaled") >= b2, lit("middle"))
        .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("id"))
  }

  // ------------------------------------------------------------------
  // Sliding-window chunking (RAG / context-window preparation)
  // ------------------------------------------------------------------

  /**
   * Overlapping fixed-size word-window chunks of each document — the
   * chunking stage in front of embedding/retrieval indexes and
   * context-window packing: window `window` words, step `stride`
   * (stride < window leaves window−stride words of overlap between
   * consecutive chunks so no phrase is split at every boundary;
   * stride = window degenerates to the chunk-dedup family's
   * consecutive chunks). One row per chunk:
   * (id, chunk_ix, chunk_text, n_words), the final chunk may be
   * shorter, and every word of the doc is covered —
   * chunks/doc = 1 + ceil(max(0, len − window)/stride).
   *
   * Map-only plus one Generate (posexplode): chunk construction is
   * per-doc arithmetic over a let-bound word array (the split runs
   * once per row, not once per chunk), nothing shuffles, and the
   * output order key (id, chunk_ix) is computed where the doc lives.
   */
  def slidingChunks(docs: DataFrame, textCol: String, idCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"slidingChunks needs window >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"slidingChunks needs 1 <= stride <= window, got stride=$stride")
    val chunks =
      Shingles.let(Shingles.words(coalesce(col(textCol), lit("")))) { w =>
        Shingles.let(size(w)) { len =>
          transform(
            sequence(lit(0),
              ceil(greatest(len - window, lit(0)) / lit(stride.toDouble))
                .cast("int")),
            i => struct(
              array_join(slice(w, i * stride + 1, lit(window)), " ")
                .as("chunk_text"),
              least(lit(window), len - i * stride).cast("long")
                .as("n_words")))
        }
      }
    docs.select(col(idCol).as("id"), posexplode(chunks))
      .toDF("id", "chunk_ix", "c")
      .select(col("id"), col("chunk_ix").cast("long").as("chunk_ix"),
        col("c.chunk_text").as("chunk_text"), col("c.n_words").as("n_words"))
      .orderBy(col("id"), col("chunk_ix"))
  }

  // ------------------------------------------------------------------
  // Corpus heavy hitters — Misra-Gries candidates + exact recount
  // ------------------------------------------------------------------

  /**
   * All tokens with global frequency strictly greater than `total/k`,
   * with EXACT counts — the corpus-vocabulary skew report (stopword
   * discovery, boilerplate detection, tokenizer-vocab sanity).
   *
   * The naive form — group every token, sort by count — shuffles the
   * whole token stream (at 100 TB: the corpus, re-keyed by word). This
   * one never does: a single `mapPartitions` pass keeps a Misra-Gries
   * summary of `k` counters per partition and emits only its candidate
   * tokens. Misra-Gries guarantees any token with partition frequency
   * > n_p/(k+1) survives the summary, and a token with GLOBAL frequency
   * > n/k must exceed n_p/k ≥ its share in at least one partition (an
   * averaging argument over Σn_p = n), so the union of per-partition
   * candidates is a provable superset of every global heavy hitter —
   * recall 1, no tuning. The exact recount joins the token stream
   * against the (tiny, ≤ 32·k rows) broadcast candidate set — the
   * filter runs map-side inside the scan's codegen stage — and only
   * candidate tokens reach the partial-aggregate exchange. The final
   * `HAVING count·k > total` drops false candidates: precision 1 too,
   * which is what makes the operator oracle-checkable against a plain
   * exact GROUP BY.
   *
   * `mapPartitions` is justified here (SURVEY §4 preference order): the
   * summary is inherently per-partition imperative state — k counters
   * with a shared-decrement step — not expressible as an aggregate over
   * rows without materializing exactly the per-token state the sketch
   * exists to avoid.
   */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"heavyHitters needs k >= 2, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(Shingles.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    // One summary pass emits the candidates AND each partition's token
    // count (a null-token sentinel row) — the corpus is tokenized exactly
    // TWICE per call: this pass and the recount. The summary is tiny
    // (<= partitions x (k+1) rows), so a lazy localCheckpoint shares the
    // one materialization between its two consumers (candidates, total) —
    // without it each consumer would re-run the whole scan (Spark plans
    // trees, not DAGs; same device as ConnectedComponents' rounds).
    val summary = toks.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var nP = 0L
      while (it.hasNext) {
        val t = it.next()
        nP += 1
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // shared decrement: k+1 occurrences retire together (the
            // arriving token plus one from each counter); zeroed
            // counters free their slots
            val dead = List.newBuilder[String]
            counters.foreach { case (w, c) =>
              if (c == 1L) dead += w else counters.update(w, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator.map(t => (t, 0L)) ++ Iterator((null: String, nP))
    }.toDF("token", "cnt").localCheckpoint(false)
    val candidates = summary.filter(col("token").isNotNull)
      .select(col("token")).distinct()
    val total = summary.filter(col("token").isNull)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
    toks.join(broadcast(candidates), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * k > col("total"))
      .select(col("token"), col("n"))
      .orderBy(col("n").desc, col("token"))
  }

  // ------------------------------------------------------------------
  // Corpus novelty
  // ------------------------------------------------------------------

  /**
   * Corpus-novelty score: the fraction of a document's distinct word
   * shingles that occur NOWHERE else in the corpus — high novelty =
   * original writing, low novelty = boilerplate/template mass (the
   * inverse signal of d08's hot-chunk removal, per doc instead of per
   * chunk). The ratio is 6-dp truncating fixed point, hash-exact.
   *
   * Scale: the same inverted-index shape as the PPJoin — shingle rows
   * are (id, hash64); the document-frequency aggregation partial-
   * combines map-side, and the join back to shingle rows is keyed on
   * the shingle hash. Text never shuffles; the `repartition(id)`
   * exchange barrier materializes the shingle set once for both the
   * index and the per-doc recount (the d04 device).
   */
  def noveltyScore(docs: DataFrame, textCol: String, idCol: String,
                   shingleLen: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val inverted = docs.select(col(idCol).as("id"),
        Shingles.wordShinglesFast(col(textCol), shingleLen).as("sh"))
      .repartition(col("id"))
      .select(col("id"), explode(col("sh")).as("s"))
    val df_ = inverted.groupBy(col("s")).agg(count(lit(1)).as("df"))
    inverted.join(df_, "s")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty", expr(
        "CAST(n_unique * 1000000 DIV n_shingles AS DOUBLE) / 1e6"))
      .orderBy(col("id"))
  }

  // ------------------------------------------------------------------
  // Vocabulary growth (Heaps-law report)
  // ------------------------------------------------------------------

  /**
   * Vocabulary-growth report: types/tokens/docs observed in the corpus
   * prefix up to each checkpoint (id ≤ maxId·pct DIV 100) — the
   * Heaps-law curve a corpus card plots, and the practical estimator
   * for "how much NEW vocabulary does the next crawl slice buy".
   * Prefixes are by id order, so the report is deterministic and every
   * number is an exact integer.
   *
   * Scale: token explode → two keyed aggregations (per-doc counts,
   * per-type first-occurrence id) — both partial-combined; the
   * checkpoint sums are conditional aggregates over those compact
   * tables against the broadcast one-row max, |pcts| rows out.
   */
  def vocabGrowth(docs: DataFrame, textCol: String, idCol: String,
                  pcts: Seq[Int] = Seq(20, 40, 60, 80, 100)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"vocabGrowth pcts must be in [1,100], got $pcts")
    require(pcts.distinct.size == pcts.size,
      s"vocabGrowth pcts must be distinct (they name agg columns), got $pcts")
    // id-keyed barrier: the scan + tokenize + explode feeds BOTH keyed
    // aggregations below — the shared exchange is computed once and
    // reused (ReusedExchange), not re-scanned per grouping key
    val tok = docs.select(col(idCol).as("id"),
        explode(Shingles.words(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .repartition(col("id"))
    val perDoc = tok.groupBy(col("id")).agg(count(lit(1)).as("n_tok"))
    val firstDoc = tok.groupBy(col("t")).agg(min(col("id")).as("fd"))
    val mx = docs.agg(max(col(idCol)).as("mx"))
    def thr(p: Int) = expr(s"mx * $p DIV 100")
    val docAgg = docs.select(col(idCol).as("id")).crossJoin(broadcast(mx))
      .agg(pcts.map(p => sum(when(col("id") <= thr(p), 1L)
        .otherwise(0L)).as(s"nd_$p")).head,
        pcts.tail.map(p => sum(when(col("id") <= thr(p), 1L)
          .otherwise(0L)).as(s"nd_$p")): _*)
    val tokAgg = perDoc.crossJoin(broadcast(mx))
      .agg(pcts.map(p => sum(when(col("id") <= thr(p), col("n_tok"))
        .otherwise(lit(0L))).as(s"nt_$p")).head,
        pcts.tail.map(p => sum(when(col("id") <= thr(p), col("n_tok"))
          .otherwise(lit(0L))).as(s"nt_$p")): _*)
    val typAgg = firstDoc.crossJoin(broadcast(mx))
      .agg(pcts.map(p => sum(when(col("fd") <= thr(p), 1L)
        .otherwise(0L)).as(s"ny_$p")).head,
        pcts.tail.map(p => sum(when(col("fd") <= thr(p), 1L)
          .otherwise(0L)).as(s"ny_$p")): _*)
    docAgg.crossJoin(tokAgg).crossJoin(typAgg).crossJoin(broadcast(mx))
      .select(explode(array(pcts.map(p => struct(
        lit(p).as("pct"), thr(p).as("threshold_id"),
        col(s"nd_$p").as("n_docs"), col(s"nt_$p").as("n_tokens"),
        col(s"ny_$p").as("n_types"))): _*)).as("r"))
      .select(col("r.pct"), col("r.threshold_id"), col("r.n_docs"),
        col("r.n_tokens"), col("r.n_types"))
      .orderBy(col("pct"))
  }

  // ------------------------------------------------------------------
  // Readability scoring
  // ------------------------------------------------------------------

  /**
   * Flesch readability scoring — the classic document-level readability
   * quality filter (Flesch reading ease + Flesch–Kincaid grade level),
   * with the dictionary syllable counter replaced by the standard
   * vowel-group heuristic so the whole feature reduces to three counts
   * per document. The heuristic contract both engines implement:
   * syllables = maximal `[aeiouyAEIOUY]+` runs, sentences = maximal
   * `[.!?]+` runs, words = whitespace tokens.
   *
   * All derived values are 6-dp TRUNCATING fixed point in integer
   * arithmetic (`num * 10^6 DIV den`, constants as integer fractions:
   * 0.39 = 39/100, 11.8 = 118/10, 1.015 = 1015/1000, 84.6 = 846/10),
   * with one exact IEEE divide by 1e6 at the edge — bit-identical
   * doubles across engines, the same hash-parity shape as
   * [[qualityScore]].
   *
   * The counting layer is separated from the ratio layer by a
   * `repartition(id)` exchange barrier: without it `CollapseProject`
   * re-inlines the regex-count subtrees into every CASE branch of the
   * ratio projection (the round-2 t02 regression). The barrier shuffles
   * (id, 3 longs) rows — ~28 bytes/doc, negligible at any corpus scale —
   * and buys a plan where each regex runs exactly once per document.
   */
  def readability(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol).as("id"),
        wordCount(t).cast("long").as("n_words"),
        size(regexp_extract_all(t, lit("[.!?]+"), lit(0)))
          .cast("long").as("n_sentences"),
        size(regexp_extract_all(t, lit("[aeiouyAEIOUY]+"), lit(0)))
          .cast("long").as("n_syllables"))
      .repartition(col("id"))
      .withColumn("__wps6", expr("CASE WHEN n_sentences > 0 THEN " +
        "n_words * 1000000 DIV n_sentences ELSE 0 END"))
      .withColumn("__spw6", expr("CASE WHEN n_words > 0 THEN " +
        "n_syllables * 1000000 DIV n_words ELSE 0 END"))
      .select(col("id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        expr("CAST(__wps6 AS DOUBLE) / 1e6").as("words_per_sentence"),
        expr("CAST(__spw6 AS DOUBLE) / 1e6").as("syllables_per_word"),
        expr("CAST(39 * __wps6 DIV 100 + 118 * __spw6 DIV 10 " +
          "- 15590000 AS DOUBLE) / 1e6").as("fk_grade"),
        expr("CAST(206835000 - 1015 * __wps6 DIV 1000 " +
          "- 846 * __spw6 DIV 10 AS DOUBLE) / 1e6").as("reading_ease"))
      .orderBy(col("id"))
  }

  /**
   * Encoding-anomaly ("mojibake") score — the cheap filter that catches
   * double-encoded and lossily-decoded documents before they poison a
   * training corpus: counts of U+FFFD replacement characters and of the
   * classic UTF-8-read-as-Latin-1 indicator characters 'Ã' (the é/á/ö
   * family mis-decodes to 'Ã©'/'Ã¡'/…) and 'â' ('â€™'/'â€"' — curly
   * quote/dash mis-decodes), as a ppm rate of the character count.
   *
   * In clean English text all three characters are vanishingly rare, so
   * a rate above ~1000 ppm is a reliable corruption flag; corpora that
   * legitimately contain them (French, Portuguese) calibrate
   * `suspectPpm` instead. `replace`+`length` only — map-only,
   * codegen'd, exact integers, and a SQL oracle evaluates the identical
   * expressions.
   */
  def mojibakeScore(df: DataFrame, textCol: String, idCol: String,
                    suspectPpm: Long = 1000): DataFrame = {
    require(suspectPpm >= 0, s"suspectPpm must be >= 0, got $suspectPpm")
    df.select(col(idCol).as("id"), col(textCol).as("__t"))
      .withColumn("n_chars", length(col("__t")).cast("long"))
      .withColumn("n_replacement",
        (col("n_chars") -
          length(expr("replace(__t, '�', '')"))).cast("long"))
      .withColumn("n_latin1_marks",
        (lit(2) * col("n_chars")
          - length(expr("replace(__t, 'Ã', '')"))
          - length(expr("replace(__t, 'â', '')"))).cast("long"))
      .withColumn("moji_ppm",
        expr("CASE WHEN n_chars > 0 THEN " +
          "(n_replacement + n_latin1_marks) * 1000000 DIV n_chars " +
          "ELSE 0 END"))
      .select(col("id"), col("n_chars"), col("n_replacement"),
        col("n_latin1_marks"), col("moji_ppm"),
        (col("moji_ppm") >= suspectPpm).as("is_suspect"))
      .orderBy(col("id"))
  }
}
