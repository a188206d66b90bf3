package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * gate (Wenzek et al. 2019 trains a KenLM on curated text and buckets
  * the crawl into head/middle/tail by perplexity; the same gate appears
  * in the LLaMA and GPT-3 data recipes). The model here is a bigram LM
  * with Stupid Backoff smoothing (Brants et al. 2007, "Large Language
  * Models in Machine Translation" — the web-scale smoothing choice
  * precisely because it is count-arithmetic only, no discounting
  * state):
  *
  *   P(w2|w1) = c(w1 w2)/c(w1)      when the bigram was seen,
  *            = 0.4 · c(w2)/N       backoff to the unigram,
  *            = 0.4 · 1/(N+1)       OOV floor,
  *
  * with per-token log-probs quantized to integer MICRO-units
  * (floor(1e6·ln P + 0.5)) BEFORE any summation — document scores are
  * exact integer sums, so partial-aggregation order and engine cannot
  * flip a bucket decision ([[Dsir]]'s determinism rules; the same libm
  * ulp caveat applies to the ln itself, see [[Dsir.logRatioMicro]]).
  *
  * Scale shape — deliberately DIFFERENT from [[QualityModel]]: an LM
  * vocabulary is corpus-sized, so the count tables are NOT collected
  * or broadcast. The fit is two map-side-combinable groupBy counts
  * that STAY distributed; scoring explodes the corpus into token
  * transitions and attaches c(w1 w2), c(w1), c(w2) via three keyed
  * equi-joins (AQE picks broadcast automatically when a fitted table
  * is actually small), then one per-doc aggregation. Everything is
  * corpus-linear keyed shuffles; nothing pairwise, nothing
  * driver-side.
  */
object NgramLm {

  /** Fitted model: distributed unigram/bigram count tables + the total
    * token count. Persist the tables (bucketed by gram) to reuse one
    * fit across many scoring runs. */
  final case class Model(uni: DataFrame, bi: DataFrame, totalTokens: Long)

  // tokens = maximal non-whitespace runs ([[Dsir.tokens]] — the shared
  // CCNet-recipe tokenization: `\s+` split, empty fragments dropped)
  private def tokens(text: Column): Column = Dsir.tokens(text)

  /** Fit the LM on a target corpus (the curated side — e.g. the same
    * labeled sample the [[QualityModel]] fit uses). The two aggregates
    * are map-side combinable; their outputs remain DataFrames. */
  def fit(target: DataFrame, textCol: String): Model = {
    val toks = target.select(tokens(col(textCol)).as("__tk"))
    // materialize both tables: uni feeds the totalTokens action here
    // plus TWO joins per score() call and bi one more — without this
    // each consumer re-tokenizes and re-aggregates the target corpus
    // (exchange reuse only kicks in when physical subplans match
    // exactly). For cross-job reuse at scale, persist them bucketed
    // by gram instead (see [[Model]]).
    val uni = toks.select(explode(col("__tk")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c1"))
      .localCheckpoint()
    // compiled transition kernel ([[expressions.TextGrams.bigram_pairs]])
    // since r19 — the old interpreted `transform(sequence(...),
    // element_at...)` built each pair through a per-transition lambda;
    // the kernel emits the identical (w1, w2) structs in one pass, and
    // its empty-array result for < 2 tokens subsumes the old
    // `filter(size >= 2)` row for row. Opaque keeps the Generate's
    // inferred size-guard on the attribute (guide §4.4).
    val bi = toks
      .select(graft.functions.expressions.Opaque.opaque(
        graft.functions.expressions.TextGrams.bigram_pairs(col("__tk")))
        .as("__bp"))
      .select(explode(col("__bp")).as("__b"))
      .select(col("__b.__w1").as("__w1"), col("__b.__w2").as("__w2"))
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
      .localCheckpoint()
    val n = uni.agg(sum("__c1")).head.getLong(0)
    Model(uni, bi, n)
  }

  /** Per-token integer-micro log-prob under Stupid Backoff. Split out
    * so the scoring plan and specs share one definition. */
  private def logPMicro(c12: Column, c1: Column, c2: Column,
      totalTokens: Long): Column = {
    val p = when(c12.isNotNull, c12.cast("double") / c1.cast("double"))
      .otherwise(when(c2.isNotNull,
        lit(0.4) * c2.cast("double") / lit(totalTokens.toDouble))
        .otherwise(lit(0.4) / lit(totalTokens.toDouble + 1.0)))
    floor(log(p) * lit(1e6) + lit(0.5)).cast("long")
  }

  /** Score every document: explode its token transitions, attach the
    * three counts by equi-join, quantize per transition, aggregate per
    * document. Output: (idCol, n_scored, logprob_micro,
    * avg_logprob_micro) — n_scored = token transitions (tokens − 1);
    * docs with fewer than 2 tokens score 0 transitions with NULL
    * average. avg = floor(sum/n) in micro-units (exact: |sum| stays
    * far under 2^53, so the double division is lossless). Higher avg =
    * more target-like; CCNet's head/middle/tail split is two
    * thresholds on this column ([[pplBucket]]).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    // compiled transition kernel — identical pair stream to the old
    // `when(size >= 2, transform(...)).otherwise(empty)` (the kernel's
    // empty-array result covers both the < 2-token and NULL-token-array
    // branches); Opaque keeps the explode's inferred guard on the
    // attribute so the tokenize+pair pass runs once per row (guide §4.4)
    val trans = df
      .select(col(idCol).as("__id"),
        graft.functions.expressions.Opaque.opaque(
          graft.functions.expressions.TextGrams.bigram_pairs(
            tokens(col(textCol)))).as("__bp"))
      .select(col("__id"), explode(col("__bp")).as("__b"))
      .select(col("__id"), col("__b.__w1").as("__w1"),
        col("__b.__w2").as("__w2"))
    val scored = trans
      .join(model.bi, Seq("__w1", "__w2"), "left")
      .join(model.uni.select(col("__w").as("__w1"), col("__c1")),
        Seq("__w1"), "left")
      .join(model.uni.select(col("__w").as("__w2"), col("__c1").as("__c2")),
        Seq("__w2"), "left")
      .select(col("__id"),
        logPMicro(col("__c12"), col("__c1"), col("__c2"),
          model.totalTokens).as("__lp"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_scored"), sum("__lp").as("logprob_micro"))
    df.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("logprob_micro"), lit(0L)).as("logprob_micro"),
        when(col("n_scored") > 0,
          floor(col("logprob_micro").cast("double") /
            col("n_scored").cast("double")).cast("long"))
          .as("avg_logprob_micro"))
  }

  /** CCNet's head/middle/tail bucket from the per-token average
    * log-prob (micro-units; HIGHER = more target-like = lower
    * perplexity). `headMin` and `tailMax` are the two cut points:
    * avg >= headMin → "head", avg < tailMax → "tail", else "middle";
    * unscored docs (NULL avg) → "tail" (the conservative crawl
    * default). Exact integer comparisons — engine-portable. */
  def pplBucket(avgLogProbMicro: Column, headMin: Long,
      tailMax: Long): Column = {
    require(headMin >= tailMax,
      s"headMin ($headMin) must be >= tailMax ($tailMax): buckets are " +
        "head >= headMin > middle >= tailMax > tail on the avg log-prob " +
        "axis — swapped cut points would silently empty the middle bucket")
    when(avgLogProbMicro.isNull, lit("tail"))
      .when(avgLogProbMicro >= headMin, lit("head"))
      .when(avgLogProbMicro < tailMax, lit("tail"))
      .otherwise(lit("middle"))
  }
}
