package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM pre-training: the standard concat-and-chunk
  * layout — documents concatenated in a deterministic key order, the token
  * stream cut into fixed `ctx`-token training sequences — reduced to a
  * DISTRIBUTED PREFIX SUM over token counts.
  *
  * Spark has no scalable scan primitive: `sum() over (order by k)` with no
  * partition clause plans as a single-task window — the one shape that
  * cannot survive a 100 TB corpus. [[prefixSum]] is the classic two-pass
  * scan instead:
  *
  *   1. range-repartition + local sort on the order key (ONE shuffle —
  *      the only corpus-sized exchange);
  *   2. per-partition totals via `mapPartitionsWithIndex` (no shuffle;
  *      collects one long per partition — bounded by the partition count,
  *      never by the data);
  *   3. broadcast the exclusive per-partition offsets; a second
  *      partition-wise pass emits the running sum.
  *
  * Passes 2 and 3 walk the same sorted RDD object, so the range shuffle's
  * map output is written once and reused across the two jobs — the corpus
  * is shuffled exactly once.
  */
object Packing {

  /** Append `outCol` = inclusive prefix sum of `valueCol` in ascending
    * `orderCol` order. `orderCol` must be a unique key (it defines the
    * global order); `valueCol` is cast to long and nulls count as 0.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val prepared = df.withColumn(valueCol, col(valueCol).cast(LongType))
      .repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val schema = prepared.schema
    val vIdx = schema.fieldIndex(valueCol)
    // one RDD object on purpose: both jobs below reuse its shuffle output
    val rdd = prepared.rdd
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator((pid, s))
    }.collect() // one (pid, total) pair per partition — tiny at any scale
    val offsets = {
      val byPid = totals.toMap
      val arr = new Array[Long](rdd.getNumPartitions)
      var acc = 0L
      arr.indices.foreach { i => arr(i) = acc; acc += byPid.getOrElse(i, 0L) }
      arr
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = bc.value(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) s += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    spark.createDataFrame(out, schema.add(outCol, LongType, nullable = false))
  }

  /** Concat-and-chunk packing plan: for each document, the half-open token
    * span [start_off, start_off + n_tokens) it occupies in the
    * concatenated stream (documents laid out in ascending `orderCol`
    * order) and the ctx-sized training sequences it lands in
    * (first_seq..last_seq; n_seqs > 1 means the document crosses a
    * sequence boundary — the GPT-style layout keeps the split, pad-to-fit
    * variants re-bin from the same columns).
    */
  def packChunks(df: DataFrame, orderCol: String, tokensCol: String,
      ctx: Int): DataFrame = {
    require(ctx > 0, s"ctx must be positive, got $ctx")
    val base = df.select(col(orderCol),
      col(tokensCol).cast(LongType).as("n_tokens"))
    // (__cum - 1) div ctx is only meaningful for n_tokens > 0 (where
    // __cum >= 1, so truncating div == floor div and every engine
    // agrees); a zero-token document occupies no sequence — its
    // last_seq pins to first_seq - 1 so n_seqs lands at 0 instead of
    // the engine-dependent div(-1) result
    prefixSum(base, orderCol, "n_tokens", "__cum")
      .select(col(orderCol), col("n_tokens"),
        (col("__cum") - col("n_tokens")).as("start_off"),
        expr(s"(__cum - n_tokens) div $ctx").as("first_seq"),
        when(col("n_tokens") > 0, expr(s"(__cum - 1) div $ctx"))
          .otherwise(expr(s"(__cum - n_tokens) div $ctx") - 1).as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }
}
