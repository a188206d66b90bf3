package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text statistics, quality scoring, marker-based language ID, and document
  * fingerprinting for training-data pipelines. All pure column expressions
  * (whole-stage codegen, no shuffle) — they scale linearly with the scan.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Count of tokens found in a stopword list. Compiled kernel
    * ([[graft.functions.expressions.TextGrams.count_in]]) since r19 —
    * the old `size(filter(tokens, t => array_contains(stops, t)))`
    * walked every token through an interpreted filter lambda; identical
    * count and NULL-text → NULL semantics (guide §4). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    graft.functions.expressions.TextGrams.count_in(tokens(text), stopwords)

  /** Fraction of tokens found in a stopword list — a standard quality /
    * natural-language signal.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords).cast("double") / size(tokens(text))

  /** Composite quality score in [0,1]: mean-word-length band + stopword
    * presence + type-token ratio. Deterministic double arithmetic.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = size(tokens(text)).cast("double")
    val ttr = size(array_distinct(tokens(text))).cast("double") / nTok
    val stopR = stopwordRatio(text, stopwords)
    val meanLen = (length(text) - (size(tokens(text)) - 1)).cast("double") / nTok
    val lenOk = when(meanLen >= lit(3.0) && meanLen <= lit(10.0), lit(1.0)).otherwise(lit(0.0))
    (ttr * lit(0.4)) + (stopR * lit(0.3)) + (lenOk * lit(0.3))
  }

  /** Function-word language profiles for marker-count language ID. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "y"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Marker-count language ID: count function words per language, argmax with
    * the declaration order as tie-break. The standard n-gram-profile method
    * reduced to its word-marker form so it's a pure expression.
    */
  def langId(text: Column): Column =
    // compiled one-pass marker count + argmax ([[expressions.MarkerBestLang]])
    // — the old form ran 5 interpreted `filter(tokens, array_contains)`
    // HOFs per row (each re-walking every token); same strictly-greater
    // argmax chain, same declaration-order tie-break, and NULL text
    // coalesces to the first language exactly as the old null-blind
    // `when` chain did (guide §4)
    coalesce(
      graft.functions.expressions.TextGrams.marker_best_lang(text, langMarkers),
      lit(langMarkers.head._1))

  /** Normalization-based content fingerprint (lowercased, whitespace
    * collapsed, md5) — the cheap exact-fingerprint; see [[Dedup]] for
    * similarity-preserving ones.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Winnowing-style rolling fingerprint: min over a window of shingle
    * hashes — order-insensitive compact signature for fast prefilter.
    */
  def rollingMinHash(text: Column, n: Int = 8): Column =
    array_min(transform(Dedup.shingleCol(text, n), s => xxhash64(s)))

  /** Word n-gram OCCURRENCES (not deduped — repetition metrics need the
    * multiset, unlike [[Dedup.shingleCol]]). Empty array below n tokens. */
  def ngramOccurrences(text: Column, n: Int): Column =
    // compiled sliding-window join ([[expressions.SlidingJoin]]) — the old
    // `transform(sequence(...), i => concat_ws(" ", slice(toks, i+1, n)))`
    // evaluated interpreted with a slice+concat walk per position; the
    // kernel emits the identical gram strings in one pass. < n tokens →
    // empty array (kernel behavior); NULL text → the old `when` fell
    // through to the empty branch, restored by the coalesce (guide §4)
    coalesce(
      graft.functions.expressions.TextGrams.sliding_join(tokens(text), n, " "),
      array().cast("array<string>"))

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1 quality
    * filters, re-expressed over word n-grams):
    *   - top n-gram fraction: occurrences of the most frequent n-gram over
    *     all n-gram occurrences (boilerplate detector);
    *   - duplicate n-gram fraction: share of n-gram occurrences whose gram
    *     appears more than once (loop/spam detector).
    * Pure expressions — per-row O(n log n) via [[runStats]]' sorted-run
    * aggregate; both fold to exact INT/INT divisions, so the oracle
    * matches bitwise.
    */
  /** Run-length stats of a gram array via ONE aggregate over its sorted
    * form: (top multiplicity, count of grams occurring exactly once).
    * The lambda touches only the accumulator and the element — the
    * original formulation captured the grams array inside its counting
    * lambdas, and Catalyst re-evaluates captured expressions PER ELEMENT
    * (the r16 Dsir lesson), so every distinct gram rebuilt the whole
    * gram array AND its tokenizing split: effectively O(n³) per row
    * (measured 118 s / 164 s for the two fractions over 5000 ~120-token
    * docs; this form runs both in ~2 s). Sort + single pass = O(n log n)
    * per row, still a pure expression — no shuffle, no UDF.
    */
  private def runStats(grams: Column): Column =
    // compiled sort + single-pass run fold ([[expressions.RunTopUniq]]) —
    // identical binary sort order, null-safe run equality, and integer
    // outputs as the r17 aggregate() form, minus the per-element
    // interpreted-lambda cost (guide §4)
    graft.functions.expressions.TextGrams.run_top_uniq(grams)

  def topNgramFraction(text: Column, n: Int): Column = {
    val grams = ngramOccurrences(text, n)
    when(size(grams) > 0,
      runStats(grams).getField("top").cast("double") /
        size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  def dupNgramFraction(text: Column, n: Int): Column = {
    val grams = ngramOccurrences(text, n)
    // a gram's occurrences are "duplicate" iff its multiplicity > 1 —
    // i.e. everything except the exactly-once grams
    when(size(grams) > 0,
      (size(grams) - runStats(grams).getField("uniq")).cast("double") /
        size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Scale-safe Gopher repetition metrics (same math as
    * [[topNgramFraction]]/[[dupNgramFraction]], different plan shape):
    * explode n-gram occurrences → `groupBy(doc, gram).count` → one
    * aggregation per doc. Linear in total occurrences with two keyed,
    * map-side-combined shuffles. The expression form is per-row
    * O(n log n) since the r17 sorted-run rebuild, but it still sorts and
    * folds a 100k-token document's gram array inside ONE task with
    * interpreted per-element lambda cost and no way to parallelize
    * within the row — use this form when documents can be long; the
    * expression form remains the shuffle-free fast path for short-doc
    * corpora.
    *
    * Output: one row per input row — (idCol, top_ngram_frac,
    * dup_ngram_frac), 0.0 for documents with no n-grams.
    */
  def gopherMetrics(df: DataFrame, idCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 3): DataFrame = {
    // Tokens are materialized in their OWN projection before the n-gram
    // transform: higher-order functions evaluate interpreted, so an
    // expression referenced inside the lambda is re-evaluated per element —
    // ngramOccurrences' inline split() would make gram construction
    // O(len²) per row (measured: 730 s for 8×50k-token docs vs ~3 s with
    // the array bound to an attribute). CollapseProject keeps the split
    // separate because __tk is referenced 3× and split isn't cheap.
    def gramCounts(n: Int) = {
      val toked = df.select(col(idCol).as("__id"),
        split(col(textCol), " ").as("__tk"))
      toked.select(col("__id"),
          // compiled sliding-window join (same kernel as
          // [[ngramOccurrences]]) — < n tokens → empty, NULL token array
          // → coalesced to empty like the old when/otherwise (guide §4)
          explode(coalesce(
            graft.functions.expressions.TextGrams
              .sliding_join(col("__tk"), n, " "),
            array().cast("array<string>"))).as("__g"))
        .groupBy("__id", "__g").agg(count(lit(1)).as("__c"))
    }
    val top = gramCounts(topN).groupBy("__id").agg(
      (max("__c").cast("double") / sum("__c").cast("double"))
        .as("top_ngram_frac"))
    val dup = gramCounts(dupN).groupBy("__id").agg(
      (coalesce(sum(when(col("__c") > lit(1L), col("__c"))), lit(0L))
        .cast("double") / sum("__c").cast("double")).as("dup_ngram_frac"))
    df.select(col(idCol))
      .join(top, df(idCol) === top("__id"), "left").drop("__id")
      .join(dup, df(idCol) === dup("__id"), "left").drop("__id")
      .select(col(idCol),
        coalesce(col("top_ngram_frac"), lit(0.0)).as("top_ngram_frac"),
        coalesce(col("dup_ngram_frac"), lit(0.0)).as("dup_ngram_frac"))
  }

  /** Auto-dispatched Gopher repetition metrics (VERDICT r9 item 7): ONE
    * public entry point so the 100k-token failure mode can't be selected
    * by accident. A cheap probe — approximate p99 of text length in
    * chars — picks the plan:
    *   - short-doc corpora take the shuffle-free expression form
    *     ([[topNgramFraction]]/[[dupNgramFraction]] — per-row
    *     O(n log n) sorted-run aggregates since r17, cheap under ~1k
    *     tokens);
    *   - anything longer takes [[gopherMetrics]]'s explode→groupBy form
    *     (linear in occurrences, parallel WITHIN a document).
    * The probe costs one scan of the text lengths; the wrong plan on a
    * long-doc corpus costs hours (measured 730 s for 8×50k-token docs vs
    * ~3 s). Both plans are oracle-pinned to bitwise-equal output.
    * Output: (idCol, top_ngram_frac, dup_ngram_frac).
    */
  def gopherAuto(df: DataFrame, idCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 3, maxExprChars: Int = 5000): DataFrame = {
    val p99 = df.agg(percentile_approx(length(col(textCol)), lit(0.99),
      lit(1000)).cast("long")).head.get(0)
    val short = p99 == null || p99.asInstanceOf[Long] <= maxExprChars
    if (short)
      df.select(col(idCol),
        topNgramFraction(col(textCol), topN).as("top_ngram_frac"),
        dupNgramFraction(col(textCol), dupN).as("dup_ngram_frac"))
    else gopherMetrics(df, idCol, textCol, topN, dupN)
  }

  /** Mean word length in characters (another Gopher gate: 3–10 is the
    * keep band for English). */
  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    // compiled char-length sum ([[expressions.SumCharLen]]) — same
    // left-to-right integer fold as the old aggregate() HOF (guide §4)
    graft.functions.expressions.TextGrams.sum_char_len(toks).cast("double") /
      size(toks).cast("double")
  }

  // PII patterns, restricted to syntax shared by Java regex and RE2 so the
  // engine and SQL oracles (and a Go/RE2 scrubber) agree: no
  // backreferences, no lookaround, [0-9] over \d. \b is common to both.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** General phone pattern: NANP 3-3-4 with `-`/`.`/space separators,
    * optional `+1`/`1` country prefix, optional parenthesized area code —
    * plus bare E.164 (`+` and 8-15 digits). Deliberately excludes the
    * 7-digit local form (`555-0123`): too many false positives on part
    * numbers and ranges for a default scrub set. `\b` sits before the
    * digit alternative only — a boundary can't occur between space and
    * `(`, so the paren branch anchors on `\(` itself.
    */
  val PhoneRe =
    "(?:\\+?1[-. ])?(?:\\([0-9]{3}\\)[-. ]?|\\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\\b" +
      "|\\+[0-9]{8,15}\\b"

  /** US SSN 3-2-4 dashed form. Disjoint from [[PhoneRe]] (3-3-4). */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Planted-fixture phone form used by the synthetic PII test corpus
    * (TEST-ONLY override — real scrubbing wants [[PhoneRe]]). */
  val TestPhoneRe = "\\b555-[0-9]{2,8}\\b"

  /** One redaction rule: regex (Java∩RE2-safe) → typed placeholder. */
  final case class PiiPattern(name: String, regex: String, placeholder: String)

  /** Default scrub registry. Order matters: emails first (so host-like
    * IPs inside addresses are already gone), then phones, SSNs, IPs.
    * Callers can pass their own registry to [[piiRedact]] — patterns must
    * stay in the Java∩RE2 subset if an external oracle re-checks them.
    */
  val defaultPiiPatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", EmailRe, "<EMAIL>"),
    PiiPattern("phone", PhoneRe, "<PHONE>"),
    PiiPattern("ssn", SsnRe, "<SSN>"),
    PiiPattern("ipv4", Ipv4Re, "<IP>"))

  /** Count of pattern matches (distributed, codegen regexp). */
  // ---- C4-style cleaning (Raffel et al. 2020, public heuristics) ----------

  /** True for a line the C4 pipeline KEEPS: ends in terminal punctuation
    * (. ! ? or a closing double quote), carries at least `minWords`
    * whitespace words, and doesn't mention javascript (the cookie/JS
    * boilerplate rule). Pure codegen built-ins. */
  def c4LineKeep(line: Column, minWords: Int = 5): Column =
    line.rlike("[.!?\"]$") &&
      size(split(line, " ")) >= minWords &&
      !lower(line).contains("javascript")

  /** Document-level C4 gate: drop pages containing "lorem ipsum" (filler
    * boilerplate) or a curly brace (leaked code). */
  def c4DocKeep(text: Column): Column =
    !lower(text).contains("lorem ipsum") && !text.contains("{")

  /** C4 clean of a newline-delimited document: the text with only the
    * kept lines (joined with newlines), plus kept/dropped line counts —
    * per-row expressions, no shuffle, scan-speed over a 100 TB corpus.
    *
    * Compiled one-pass kernel ([[graft.functions.expressions.C4Lines]])
    * since r19: the old per-helper `filter(split(text, "\n"),
    * c4LineKeep)` HOFs evaluated interpreted per line AND each of the
    * three helpers re-split and re-filtered the document; the kernel
    * computes all three fields in one pass and identical expressions in
    * one projection collapse to a single evaluation (guide §4).
    * [[c4LineKeep]] stays as the per-line reference form the
    * equivalence spec pins the kernel against. */
  def c4CleanedText(text: Column, minWords: Int = 5): Column =
    graft.functions.expressions.C4Lines.c4_line_stats(text, minWords)
      .getField("kept")

  def c4KeptLines(text: Column, minWords: Int = 5): Column =
    graft.functions.expressions.C4Lines.c4_line_stats(text, minWords)
      .getField("n_kept")

  def c4DroppedLines(text: Column, minWords: Int = 5): Column = {
    val st = graft.functions.expressions.C4Lines.c4_line_stats(text, minWords)
    st.getField("n_total") - st.getField("n_kept")
  }

  /** C4's cross-document span dedup (Raffel et al. 2020 §2.2): any
    * `n`-sentence span occurring more than once in the corpus keeps only
    * its FIRST occurrence — lowest (doc id, position) — and later
    * occurrences' sentences are removed from the cleaned text.
    * "Sentences" here are newline-delimited lines, the same unit the
    * rest of this C4 family gates on.
    *
    * Scale shape (same as exact dedup): explode the sliding spans, ONE
    * hash-groupBy on the span hash to pick the first occurrence
    * (min(struct) — map-side combinable), one keyed join back to flag
    * occurrences, one per-doc aggregation to rebuild the kept text. No
    * pairwise work anywhere; the span-hash shuffle is linear in total
    * lines.
    *
    * Output: (idCol, kept_text, n_spans, dup_spans, removed_lines) —
    * docs with fewer than `n` lines pass through with zero spans.
    */
  def c4SpanDedup(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    Dedup.firstOccurrenceDedup(df, idCol, textCol, n, "\n",
      "n_spans", "dup_spans", "removed_lines")

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact each registry pattern with its typed placeholder, in registry
    * order — the standard pre-training scrub pass. Pure codegen regexp
    * chain: one projection, no shuffle, linear in text length.
    */
  def piiRedact(text: Column,
      patterns: Seq[PiiPattern] = defaultPiiPatterns): Column =
    patterns.foldLeft(text)((t, p) => regexp_replace(t, p.regex, p.placeholder))
}
