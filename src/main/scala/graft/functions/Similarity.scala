package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Brute-force top-k is the exactness baseline: queries × corpus with the
  * query side broadcast (corpus is never re-shuffled), dot products computed
  * in whole-stage codegen via `zip_with`/`aggregate` — no UDF. The LSH
  * variant (random signed hyperplanes, deterministic seeds) buckets the
  * corpus so each query probes one bucket set: the 100 TB path.
  */
object Similarity {

  /** Sequential-fold double dot product of two float vectors — bit-identical
    * across engines that fold left-to-right.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each row of `queries` against `corpus`.
    * Output: (query_id, neighbor_id, cosine, rank).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim). */
  private def planeComponent(bit: Int, dim: Column): Column = {
    // xxhash64 → uniform in [-1, 1): enough for sign-random-projection LSH
    (xxhash64(lit(bit), dim).cast("double") / lit(Long.MaxValue.toDouble))
  }

  /** Sign-random-projection bucket id (`bits`-bit code) for LSH table
    * `table`. Vectors in the same bucket of any table are ANN candidates;
    * probing cost is O(bucket), not O(corpus).
    */
  def lshBucket(vec: Column, bits: Int, table: Int = 0): Column = {
    val code = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(table * bits + b, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    code.reduce(_.bitwiseOR(_))
  }

  /** All LSH (table, bucket) postings for a vector — `tables` independent
    * hash tables; recall grows as 1-(1-p^bits)^tables.
    */
  def lshPostings(vec: Column, bits: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("t"), lshBucket(vec, bits, t).as("b"))): _*)

  /** Deterministic Lloyd k-means coarse quantizer: init = first `k` corpus
    * rows by id, then `iters` assign-update rounds. The update is an
    * element-wise mean via posexplode → groupBy(cell, dim) in exact DECIMAL
    * (so partial-agg order cannot perturb centroids between runs); per
    * iteration the shuffle is |corpus|·dim value rows — the standard
    * distributed-k-means cost, linear in data size.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): Seq[Seq[Double]] = {
    var cents: Seq[Seq[Double]] = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    (0 until iters).foreach { _ =>
      def cosineToCent(v: Column, ct: Seq[Double]): Column = {
        val ctNorm = math.sqrt(ct.map(x => x * x).sum)
        dot(v, typedLit(ct)) / (norm(v) * lit(ctNorm))
      }
      val sims = array(cents.map(ct => cosineToCent(col(vecCol), ct)): _*)
      val assigned = corpus
        .withColumn("__cell", array_position(sims, array_max(sims)).cast("int"))
        .select(col("__cell"), posexplode(col(vecCol)).as(Seq("__dim", "__x")))
      val means = assigned.groupBy("__cell", "__dim")
        .agg((sum(col("__x").cast("decimal(27,10)")) / count(lit(1)))
          .cast("double").as("__m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      // empty cells keep their previous centroid (standard Lloyd handling)
      cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i + 1, old) }
    }
    cents
  }

  /** IVF-flat ANN: a coarse quantizer of `nlist` centroids (k-means, or the
    * first rows when `kmeansIters` = 0) cells the corpus once (argmax-cosine
    * assignment); each query probes its `nprobe` nearest cells and re-scores
    * exactly inside them. Probing cost is O(corpus * nprobe / nlist) instead
    * of O(corpus); the inverted index is the (cell → vectors)
    * co-partitioning, i.e. one shuffle at build time.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 0): DataFrame = {
    val cents: Seq[Seq[Double]] =
      if (kmeansIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nlist, kmeansIters)
      else corpus.orderBy(col(idCol)).limit(nlist)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    def cosineToCent(v: Column, ct: Seq[Double]): Column = {
      val ctNorm = math.sqrt(ct.map(x => x * x).sum)
      dot(v, typedLit(ct)) / (norm(v) * lit(ctNorm))
    }
    def cellSims(v: Column): Column = array(cents.map(ct => cosineToCent(v, ct)): _*)
    def bestCell(v: Column): Column = {
      val sims = cellSims(v)
      array_position(sims, array_max(sims)).cast("int")
    }
    // top-nprobe cell ids per query: sort (sim desc, cell) structs, take n
    def probeCells(v: Column): Column = {
      val sims = cellSims(v)
      slice(transform(
        array_sort(zip_with(sims, sequence(lit(1), lit(cents.size)),
          (s, i) => struct((-s).as("negs"), i.as("cell")))),
        x => x.getField("cell")), 1, nprobe)
    }
    val indexed = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), bestCell(col(vecCol)).as("__cell"))
    val probes = broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"),
        explode(probeCells(col(vecCol))).as("__cell")))
    val scored = probes.join(indexed, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** ANN top-k: multi-table LSH candidate generation with exact re-scoring.
    * Candidates = pairs sharing a bucket in >= 1 of `tables` hash tables.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int = 4, tables: Int = 16): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(lshPostings(col(vecCol), bits, tables)).as("__p")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      explode(lshPostings(col(vecCol), bits, tables)).as("__p"))
    val cand = q.join(c, Seq("__p"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "__qv", "neighbor_id", "__cv")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("cosine", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
