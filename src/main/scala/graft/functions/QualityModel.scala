package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed bag-of-grams linear quality classifier — the fastText-shaped
  * document gate every public pre-training pipeline runs (Joulin et al.
  * 2016 "Bag of Tricks for Efficient Text Classification"; the CCNet
  * quality filter, Wenzek et al. 2019; the GPT-3 data recipe, Brown et
  * al. 2020 §A). The model is linear over hashed unigram+bigram
  * features; fitting uses per-bucket log-odds (the closed-form Naive
  * Bayes weights) instead of SGD, which keeps the SAME w·x scoring form
  * while making the fit deterministic and replayable in any engine —
  * no optimizer state, no iteration order, no float accumulation.
  *
  * Everything reuses [[Dsir]]'s engine-portable machinery: md5-derived
  * gram buckets ([[Dsir.gramBucket]]), integer micro-unit weights
  * ([[Dsir.logRatioMicro]] — weight_b = 1e6·ln of the add-0.5-smoothed
  * positive/negative bucket-count ratio), and integer-exact document
  * scores (sums of 64-bit micro-units, so partial-aggregation order and
  * engine cannot change a keep/drop decision).
  *
  * Scale shape: the FIT runs two bounded aggregates over the labeled
  * sample (output ≤ nBuckets rows each — the sample is small by
  * contract, the 100 TB corpus never enters the fit); SCORING is a
  * zero-shuffle fold of each document's own gram array against the
  * broadcast weight table, linear in corpus bytes.
  */
object QualityModel {

  /** Fit the classifier: integer-micro log-odds weights per hash bucket
    * from a labeled sample (`pos` = keep-class texts, `neg` =
    * reject-class). Output index = bucket id; buckets unseen in both
    * classes get the smoothing-only prior (≈ ln(negTotal/posTotal)). */
  def fitLogOddsMicro(pos: DataFrame, neg: DataFrame, textCol: String,
      nBuckets: Int = 8192): Array[Long] =
    Dsir.logRatioMicro(
      Dsir.bucketCounts(pos, textCol, nBuckets),
      Dsir.bucketCounts(neg, textCol, nBuckets))

  /** Score every document: score_micro = Σ over the doc's grams of
    * their bucket weights; keep ⟺ score_micro >= thresholdMicroPerGram
    * · n_grams (a per-gram mean threshold expressed as an exact integer
    * cross-multiply — no division, no float). Threshold 0 = the plain
    * "more positive-class-like than negative" decision.
    *
    * The weight table rides a 1-row broadcast ([[Similarity]]'s
    * plan-size rationale) and each row folds its own gram array in one
    * codegen projection — zero corpus shuffle.
    *
    * The contract is TOTAL and two-valued: NULL-text documents score
    * (0 grams, 0 micro) and keep follows the same exact comparison
    * (trivially true at threshold <= 0) — never a NULL keep that both
    * `filter(keep)` and `filter(!keep)` would drop. Run a length/
    * emptiness gate ahead of this one if empty documents should not
    * pass by default. Output: (idCol, n_grams, score_micro, keep).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      weightsMicro: Array[Long], nBuckets: Int,
      thresholdMicroPerGram: Long = 0L): DataFrame = {
    require(weightsMicro.length == nBuckets,
      s"weight table size ${weightsMicro.length} != nBuckets $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val wRow = broadcast(Seq(Tuple1(weightsMicro.toSeq)).toDF("__w"))
    df.crossJoin(wRow)
      .select(col(idCol), Dsir.grams(col(textCol)).as("__gs"), col("__w"))
      .select(col(idCol),
        coalesce(size(col("__gs")).cast("long"), lit(0L)).as("n_grams"),
        // compiled md5-bucket weight fold (same kernel as
        // [[Dsir.importanceWeights]]'s scoring pass) — identical buckets,
        // integer sum, and null semantics as the old interpreted
        // aggregate(transform(...)) chain (guide §4)
        coalesce(graft.functions.expressions.GramBuckets
          .bucket_weight_sum(col("__gs"), col("__w"), nBuckets),
          lit(0L)).as("score_micro"))
      .withColumn("keep",
        col("score_micro") >= col("n_grams") * lit(thresholdMicroPerGram))
  }
}
