package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-chunked scan — the reference's chunking engine
  * (replication.go:688-930): compute min/max of the chunk key on the source,
  * split into N contiguous ranges, read each range as an independent stream.
  * This is the exact analogue of a JDBC partitioned read
  * (partitionColumn/lowerBound/upperBound/numPartitions); on files Spark
  * already parallelizes scans, so the operator's value is (a) JDBC sources
  * and (b) per-chunk transactional loads.
  */
object ChunkedRead {

  /** Split [min(key), max(key)] into `n` ranges and return one filtered
    * DataFrame per range (last range inclusive of max).
    */
  def ranges(df: DataFrame, key: String, n: Int): Seq[DataFrame] = {
    // floor/ceil before the long cast: a bare cast truncates toward zero, so
    // a negative fractional min (e.g. -2.5 -> -2) would drop rows below the
    // first range boundary.
    val row = df.agg(floor(min(col(key))).cast("long"),
      ceil(max(col(key))).cast("long")).head
    // zero rows (or all-null keys): min/max are NULL — no ranges to build
    if (row.isNullAt(0)) return Seq(df.filter(lit(false)))
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val step = math.max((hi - lo) / n + 1, 1L)
    (0 until n).map { i =>
      val a = lo + i * step
      val b = math.min(a + step, hi + 1)
      // completeness: NULL-key rows fall in no numeric range, so the first
      // chunk carries them — unionAll must return every input row
      val in = col(key) >= a && col(key) < b
      df.filter(if (i == 0) in || col(key).isNull else in)
    }
  }

  /** Chunked read reassembled — proves range completeness/disjointness. */
  def unionAll(df: DataFrame, key: String, n: Int): DataFrame =
    ranges(df, key, n).reduce(_.unionByName(_))

  /** Expression chunking (`source_options.chunk_expr` + `chunk_count`,
    * tests/replications/r.20.chunking.expr.yaml): rows bucket by an
    * arbitrary SQL expression (typically hash-mod) instead of a key
    * range — the chunking for skewed or non-numeric keys. Each chunk is
    * an independent pushed-down filter scan, so chunks load
    * transactionally in parallel exactly like [[ranges]].
    */
  def byExpr(df: DataFrame, chunkExpr: String, chunkCount: Int): Seq[DataFrame] = {
    require(chunkCount > 0, "chunk_count must be positive")
    val bucket = expr(chunkExpr)
    // chunk 0 also carries rows the expression cannot place (NULL or
    // out-of-range bucket values) so the union of chunks is complete
    (0 until chunkCount).map { i =>
      val in = bucket === i
      df.filter(if (i == 0)
        in || bucket.isNull || bucket < 0 || bucket >= chunkCount
      else in)
    }
  }
}
