package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale text corpora.
  *
  * Beyond-reference operators (the reference only has PK dedup,
  * api/spec.go:344-346). All are designed around shuffles that stay
  * proportional to candidate pairs, not O(n²):
  *   - exact: one hash-groupBy;
  *   - MinHash+LSH: signature agg → band explode → bucket self-join (only
  *     docs sharing a band collide) → exact-Jaccard verification of the
  *     candidates. At 100 TB the bucket join is the only shuffle and AQE
  *     splits skewed buckets.
  */
object Dedup {

  /** Distinct token n-gram shingles of a whitespace-tokenized text column. */
  def shingleCol(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(text))
  }

  /** Exact dedup: canonical (min id) doc per content hash + dup count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature as `numHashes` min-aggregated seeded xxhash64 values,
    * banded for LSH. Returns (id, shingles, band_0..band_{b-1}).
    */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      shingleCol(col(textCol), n).as("__shingles"))
    // per-band hash: combine the band's rowsPerBand min-hashes into one 64-bit
    val bandCols = (0 until bands).map { b =>
      val mins = (0 until rowsPerBand).map { r =>
        val seed = b * rowsPerBand + r
        array_min(transform(col("__shingles"), s => xxhash64(s, lit(seed))))
      }
      xxhash64(mins: _*).as(s"__band_$b")
    }
    sh.select(col("__id") +: col("__shingles") +: bandCols: _*)
  }

  /** Near-duplicate pairs with exact Jaccard >= threshold, found via
    * MinHash-LSH candidate generation then exact verification.
    * Output: (id_a, id_b, jaccard), id_a < id_b.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, bands: Int = 32, rowsPerBand: Int = 6): DataFrame = {
    val sig = signatures(df, idCol, textCol, n, bands, rowsPerBand).cache()
    val bandStruct = posexplode(array((0 until bands).map(b => col(s"__band_$b")): _*))
    val buckets = sig.select(col("__id"), bandStruct.as(Seq("__band_idx", "__band_hash")))
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.__band_idx") === col("b.__band_idx") &&
          col("a.__band_hash") === col("b.__band_hash") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val sets = sig.select(col("__id"), col("__shingles"))
    cands
      .join(sets.select(col("__id").as("id_a"), col("__shingles").as("__sh_a")), "id_a")
      .join(sets.select(col("__id").as("id_b"), col("__shingles").as("__sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over tokens: per-bit majority vote of token hashes.
    * Implemented as explode → bit-position aggregation (2 shuffles, both
    * keyed on doc id — no pairwise work).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val agg = toks.groupBy("id").agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col("id"), sig.as("simhash"))
  }
}
