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

  /** Fraction of tokens found in a stopword list — a standard quality /
    * natural-language signal.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stops, t))).cast("double") /
      size(tokens(text))
  }

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
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) =>
      val stops = array(markers.map(lit): _*)
      lang -> size(filter(tokens(text), t => array_contains(stops, t)))
    }
    // argmax, ties resolved by declaration order (strictly-greater chain)
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

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
  def ngramOccurrences(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1 quality
    * filters, re-expressed over word n-grams):
    *   - top n-gram fraction: occurrences of the most frequent n-gram over
    *     all n-gram occurrences (boilerplate detector);
    *   - duplicate n-gram fraction: share of n-gram occurrences whose gram
    *     appears more than once (loop/spam detector).
    * Pure codegen expressions — per-row O(distinct·total) on short docs;
    * both fold to exact INT/INT divisions, so the oracle matches bitwise.
    */
  def topNgramFraction(text: Column, n: Int): Column = {
    val grams = ngramOccurrences(text, n)
    val top = array_max(transform(array_distinct(grams),
      g => size(filter(grams, x => x === g))))
    when(size(grams) > 0, top.cast("double") / size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  def dupNgramFraction(text: Column, n: Int): Column = {
    val grams = ngramOccurrences(text, n)
    val dup = size(filter(grams, g => size(filter(grams, x => x === g)) > 1))
    when(size(grams) > 0, dup.cast("double") / size(grams).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean word length in characters (another Gopher gate: 3–10 is the
    * keep band for English). */
  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double")
  }

  // PII patterns, restricted to syntax shared by Java regex and RE2 so the
  // engine and SQL oracles agree: no backreferences, no lookaround,
  // [0-9] over \d. \b is common to both.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{2,8}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Count of pattern matches (distributed, codegen regexp). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails / simple phone forms / IPv4s with typed placeholders —
    * the standard pre-training scrub pass. Order matters: IP redaction
    * runs after email so host-like IPs inside addresses are already gone.
    */
  def piiRedact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhoneRe, "<PHONE>")
    regexp_replace(noPhone, Ipv4Re, "<IP>")
  }
}
