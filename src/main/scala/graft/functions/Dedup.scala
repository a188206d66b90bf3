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

  /** Widen under-parallel inputs before per-row-heavy work (shingling,
    * signatures): a corpus arriving as one small file plans as ONE input
    * partition, serializing everything up to the first shuffle. Only
    * widens when the scan's parallelism is below the session default —
    * at real scale (many files/splits) this is a no-op, so no shuffle of
    * the full corpus is ever added where it wasn't needed.
    */
  private def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate the scan's parallelism from logical-plan statistics (file
    // sizes for file relations) instead of df.rdd.getNumPartitions — the
    // rdd probe forces physical planning of the frame and can disagree
    // with what AQE later does. bytes/maxPartitionBytes mirrors the file
    // split planner; small inputs (< target partitions' worth) widen,
    // many-file/many-split inputs are untouched.
    val maxPartBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Relations without real size statistics (JDBC, RDD-backed, custom
    // sources) report the spark.sql.defaultSizeInBytes sentinel (defaults
    // to Long.MaxValue), which would make estParts huge and skip widening
    // for exactly the single-partition inputs that need it. For those,
    // fall back to the physical partition-count probe.
    val statsUnknown = sizeBytes >= BigInt(Long.MaxValue) / 2
    val estParts =
      if (statsUnknown) df.rdd.getNumPartitions.toLong
      else (sizeBytes / maxPartBytes).toLong + 1
    if (estParts < target) df.repartition(target) else df
  }

  /** Distinct token n-gram shingles of a whitespace-tokenized text column.
    * Compiled single-pass kernel ([[graft.functions.expressions.TextGrams
    * .shingles]]) since r18 — the old `array_distinct(transform(sequence,
    * i => concat_ws(" ", slice(toks, i+1, n))))` HOF form evaluated
    * interpreted with an O(n·gram) slice+join walk per position; the
    * kernel exploits that single-space-split tokens are contiguous byte
    * ranges of the text, so each gram is one byte-range slice. Identical
    * output: first-occurrence-order distinct grams, whole-text fallback
    * (including NULL → [NULL]) below n tokens (guide §4). */
  def shingleCol(text: Column, n: Int): Column =
    graft.functions.expressions.TextGrams.shingles(text, n)

  /** Exact dedup: canonical (min id) doc per content hash + dup count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash LSH band hashes per doc: (id, __bands: array<bigint>).
    *
    * Each shingle string is hashed ONCE; the k per-permutation hashes are
    * xxhash64 over that fixed-width long (a few ns each, vs k full string
    * hashes).
    *
    * Measured history of this stage's shape: r15 tried k separate
    * `array_min(transform(__hs, h => xxhash64(h, i)))` projection columns
    * — 1.7x SLOWER at sf0.1 (6.6s vs 3.8s) because 64 array-loop
    * expressions in one operator overflow the codegen method-size limit
    * and the stage fell back to interpreted eval; r15-r17 shipped
    * explode → groupBy(id) with k min-aggregates (codegen'd, but k
    * agg-buffer updates per shingle + one Exchange of the k-column
    * signature set); r18's single fused kernel call has neither the
    * method-size blowup nor the Exchange.
    */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int): DataFrame =
    // fused compiled kernel ([[graft.functions.expressions.MinHashBands]])
    // since r18: same per-permutation minima and band hashes, term for
    // term, computed in ONE projection — the explode → groupBy(__id)
    // with k min-aggregates shape this replaces paid k agg-buffer
    // updates per shingle AND one Exchange of the |docs|·k signature
    // columns; the kernel removes that Exchange outright (guide §2.4).
    // Opaque-wrapped since r19: the posexplode consumer above makes
    // InferFiltersFromGenerate add `size(__bands) > 0 AND isnotnull`,
    // and predicate pushdown substituted the alias — the FULL signature
    // kernel ran once in the Filter condition and again in this Project
    // (r18 after-plans, both banded-join sides). The barrier keeps the
    // guard on the cheap attribute, so the kernel runs once per row
    // (guide §4.4).
    df.select(col(idCol).as("__id"),
      graft.functions.expressions.Opaque.opaque(
        graft.functions.expressions.MinHashBands.minhash_bands(
          shingleCol(col(textCol), n), bands, rowsPerBand)).as("__bands"))

  /** Near-duplicate pairs with exact Jaccard >= threshold, found via
    * MinHash-LSH candidate generation then exact verification.
    *
    * EXACT-duplicate texts (same md5) collapse to their min-id
    * representative BEFORE signatures: web corpora carry huge
    * identical-text groups (boilerplate pages), and every member of such
    * a group collides in every LSH band — C(N,2) candidate and output
    * pairs for one group of N. Each group instead emits N−1 star edges
    * (rep, member, 1.0) and only representatives are signed, banded, and
    * verified — candidate and output rows linear in group size, the
    * per-group signature work paid once, and connected components over
    * the edge list (the keep/drop decision) unchanged: the star spans
    * what the clique spanned and the rep carries the group's cross-group
    * edges. NULL texts form one identical group like any other (the
    * collapse join is null-safe, so they star-collapse instead of
    * silently vanishing); their representative carries no shingles and
    * never matches real text. CAVEAT for crawl corpora with many failed
    * extractions: those star edges carry jaccard = 1.0 BY FIAT (two
    * null-text documents are "identical"), so downstream connected
    * components will keep one failed extraction and drop the rest — run
    * an emptiness/length gate ahead of this operator if that is not the
    * intent ([[embedNearDupPairs]] instead EXCLUDES degenerate vectors,
    * because cosine is undefined for them; null TEXT equality is
    * well-defined, hence the asymmetry — see README "Pair-list
    * contract"). Output: (id_a, id_b, jaccard), id_a < id_b.
    */
  /** Generic identical-key representative collapse shared by the
    * near-dup family: group `rows` (which must carry an `__id` column)
    * by `keyCol` NULL-SAFELY (a null key is one group like any other —
    * an equi-join would silently drop those rows from the pair
    * universe), take the min-id representative per group, and return
    * (reps, star): the representative rows (full original columns) and
    * the (id_a = rep, id_b = member) edges for collapsed members. The
    * collapse join is localCheckpoint-materialized because every caller
    * feeds it to 2-3 plan subtrees. */
  private[graft] def collapseByKey(rows: DataFrame,
      keyCol: String): (DataFrame, DataFrame) = {
    // rename the aggregated key: groupBy preserves the grouping
    // attribute, so joining rows to its own aggregate on the same name
    // would be an ambiguous self-join reference
    val groups = rows.groupBy(keyCol).agg(min("__id").as("__rep"))
      .withColumnRenamed(keyCol, "__gk")
    val tagged = rows.join(groups, col(keyCol) <=> col("__gk"))
      .drop("__gk")
      .localCheckpoint()
    val reps = tagged.filter(col("__id") === col("__rep")).drop("__rep")
    val star = tagged.filter(col("__id") =!= col("__rep"))
      .select(col("__rep").as("id_a"), col("__id").as("id_b"))
    (reps, star)
  }

  /** Default banding (16x4) targets high-margin corpora: recall ~1-1.5e-7 at
    * J=0.89 while J<=0.1 background yields ~0 candidates per pair; raise
    * bands/rows for thresholds close to the background similarity.
    */
  def nearDupPairs(df0: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val df = widen(df0)
    val hashed = df.select(col(idCol).as("__id"), col(textCol).as("__t"),
      md5(col(textCol)).as("__ch"))
    val (repRows, starBase) = collapseByKey(hashed, "__ch")
    val star = starBase.withColumn("jaccard", lit(1.0))
    val reps = repRows.select(col("__id").as(idCol), col("__t").as(textCol))
    val sig = signatures(reps, idCol, textCol, n, bands, rowsPerBand)
    val buckets = sig.select(col("__id"),
      posexplode(col("__bands")).as(Seq("__band_idx", "__band_hash")))
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.__band_idx") === col("b.__band_idx") &&
          col("a.__band_hash") === col("b.__band_hash") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val sets = reps.select(col(idCol).as("__id"),
      shingleCol(col(textCol), n).as("__shingles"))
    verifyPairs(cands, sets, threshold).unionByName(star)
  }

  /** Paragraph-granularity fuzzy dedup (RefinedWeb §3.2 / Dolma run
    * MinHash at BOTH document and paragraph level — boilerplate
    * paragraphs repeat across pages whose full texts are nowhere near
    * duplicates): explode `paraDelim`-separated paragraphs and run the
    * document-level [[nearDupPairs]] machinery (identical-text
    * collapse, banded LSH, exact verify) over (doc, paragraph-index)
    * units. Empty paragraphs (split artifacts from doubled delimiters)
    * are dropped BEFORE pairing — unlike [[nearDupPairs]]' null-text
    * star policy there is nothing to pair; indices still count the raw
    * split positions, so kept paragraphs keep their original offsets.
    *
    * Unit ids pack (doc, index) into one long — doc << 20 | index —
    * so the collapse/band/verify pipeline runs unchanged; ids are
    * range-guarded (non-null, doc in [0, 2^43), index < 2^20) and the
    * packing is exact bit arithmetic, never a double round-trip. Doc
    * ids must be UNIQUE, like every id-keyed operator in this module
    * (duplicate ids collide in the packed space and attribute pairs to
    * whichever row wins — uniqueness is the corpus contract, not
    * re-checked per operator). Scale shape is
    * [[nearDupPairs]] on the paragraph multiset: corpus-linear explode,
    * one collapse groupBy (which absorbs the web's giant repeated-
    * boilerplate groups as stars), banded join over representatives.
    *
    * NULL-text documents are DROPPED silently (split(NULL) yields a NULL
    * array, so posexplode emits no paragraph rows): unlike
    * [[nearDupPairs]]' null-text star policy there are no units to pair,
    * the same treatment empty paragraphs get. Coalesce NULL text
    * upstream if such documents must participate.
    *
    * Output: (doc_a, para_a, doc_b, para_b, jaccard) with
    * (doc_a, para_a) < (doc_b, para_b); jaccard >= threshold.
    */
  def paraNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, paraDelim: String = "\n", n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val paras = df
      .select(col(idCol).cast("long").as("__doc"),
        // quote the delimiter: split() takes a Java regex, and a caller
        // passing "|" or "." as a LITERAL separator would otherwise
        // explode the text into per-character garbage paragraphs
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(paraDelim))).as(Seq("__pidx", "__p")))
      .filter(col("__p") =!= "")
    val units = paras.select(
      // NULL guard too: a NULL id (or a non-numeric string id nulled by
      // the long cast) would make the range condition NULL, skip the
      // raise, and pack every paragraph under a NULL pid — which the
      // collapse's non-null-safe rep filter then silently drops,
      // reporting an empty pair list instead of failing loudly
      when(col("__doc").isNull || col("__doc") < 0 ||
          col("__doc") >= (1L << 43) || col("__pidx") >= (1 << 20),
        raise_error(concat(
          lit("paraNearDupPairs: need a non-null long-castable doc id in " +
            "[0, 2^43) and < 2^20 paragraphs per doc, got doc="),
          coalesce(col("__doc").cast("string"), lit("NULL")),
          lit(" para="), col("__pidx"))))
        .otherwise(shiftleft(col("__doc"), 20) + col("__pidx"))
        .as("__pid"),
      col("__p"))
    nearDupPairs(units, "__pid", "__p", threshold, n, bands, rowsPerBand)
      .select(shiftright(col("id_a"), 20).as("doc_a"),
        col("id_a").bitwiseAND(lit((1L << 20) - 1)).cast("int").as("para_a"),
        shiftright(col("id_b"), 20).as("doc_b"),
        col("id_b").bitwiseAND(lit((1L << 20) - 1)).cast("int").as("para_b"),
        col("jaccard"))
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against the
    * full shingle sets — shared by the LSH and prefix-filter generators. */
  private def verifyPairs(cands: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(sets.select(col("__id").as("id_a"), col("__shingles").as("__sh_a")), "id_a")
      .join(sets.select(col("__id").as("id_b"), col("__shingles").as("__sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** EXACT n-gram Jaccard similarity join via prefix filtering (the
    * All-Pairs / PPJoin principle: under any global token order, two sets
    * with J >= t must share a token within their first
    * |S| - ceil(t*|S|) + 1 tokens — so indexing only those prefixes is a
    * complete candidate generator). Unlike [[nearDupPairs]] (MinHash-LSH,
    * probabilistic recall) this finds EVERY qualifying pair.
    *
    * Scale shape: tokens are ordered rarest-first by global document
    * frequency, so prefixes hold the most selective grams and the
    * prefix-token self-join touches few candidates; the only O(pairs) work
    * is candidate verification. No all-pairs product anywhere. Skewed
    * prefix tokens (a gram shared by many docs) are AQE-split like any
    * skewed join key.
    *
    * Output: (id_a, id_b, jaccard), id_a < id_b, jaccard >= threshold.
    */
  def ngramJaccardPairs(df0: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val df = widen(df0)
    // Opaque since r19: the explicit size guard (plus the explode's
    // inferred one) was pushed through this projection, so the shingle
    // kernel ran TWICE per row in each of the four consuming subtrees
    // (r18 plan: `size(shingles(...)) >= 1` in the Filter condition AND
    // `shingles(...)` in the Project output, ×4 scans) — the barrier
    // keeps the guards on the attribute (guide §4.4)
    // NOT materialized, by measurement: sets feeds four subtrees (the
    // explode twice, both verify broadcast sides), but a localCheckpoint
    // here benched SLOWER (r19: 2.50 vs 2.21 norm) — the compiled
    // shingle recompute is cheaper than writing/reading the gram arrays
    val sets = df.select(col(idCol).as("__id"),
        graft.functions.expressions.Opaque.opaque(
          shingleCol(col(textCol), n)).as("__sh"))
      .filter(size(col("__sh")) >= 1)
    val ex = sets.select(col("__id"), size(col("__sh")).as("__sz"),
      explode(col("__sh")).as("__g"))
    val dfreq = ex.groupBy("__g").agg(count(lit(1)).as("__df"))
    // rare-first global order; (__df, __g) ties broken lexically => total.
    // FP guard: t*|S| can land one ulp ABOVE its exact integral value
    // (0.07*100 = 7.000...001), and an over-estimated ceil would shrink the
    // prefix / tighten a bound and silently lose qualifying pairs. Every
    // rounding below is therefore nudged down by eps — erring toward MORE
    // candidates, which the exact verification then filters.
    val eps = 1e-9
    val ranked = ex.join(dfreq, "__g")
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__id").orderBy(col("__df"), col("__g"))))
    val prefixes = ranked
      .filter(col("__rk") <=
        col("__sz") - ceil(lit(threshold) * col("__sz") - eps) + 1)
      .select(col("__g"), col("__id"), col("__sz"), col("__rk"))
    // PPJoin pruning, both exactness-preserving:
    //   length filter — J >= t forces t*|A| <= |B| <= |A|/t;
    //   position filter — overlap can't exceed 1 + min(remaining grams),
    //   and J >= t needs alpha = ceil(t/(1+t)*(|A|+|B|)) shared grams.
    //   A true pair's first shared prefix token always passes (ubound >=
    //   actual overlap there), so no qualifying pair is lost.
    val alpha =
      ceil(lit(threshold / (1 + threshold)) * (col("a.__sz") + col("b.__sz")) - eps)
    val cands = prefixes.as("a").join(prefixes.as("b"),
        col("a.__g") === col("b.__g") && col("a.__id") < col("b.__id") &&
          col("b.__sz") >= lit(threshold) * col("a.__sz") - eps &&
          col("a.__sz") >= lit(threshold) * col("b.__sz") - eps &&
          (least(col("a.__sz") - col("a.__rk"), col("b.__sz") - col("b.__rk")) + 1) >= alpha)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    verifyPairs(cands, sets.withColumnRenamed("__sh", "__shingles"), threshold)
  }

  /** Benchmark decontamination: (corpus doc, eval doc) pairs sharing at
    * least `minShared` DISTINCT token n-grams — the standard eval-set
    * leak check run over a training corpus before training. The EVAL
    * side is broadcast (benchmark suites are thousands of documents;
    * the corpus is the 100 TB side), so the only corpus-scaling work is
    * one shingle explode + one broadcast hash join against the eval
    * postings — no pairwise product, no corpus shuffle beyond the
    * per-pair count aggregation (bounded by true overlaps). Shingles
    * are distinct per doc on both sides, so the joined row count per
    * (doc, eval) pair IS the intersection size.
    *
    * Output: (idCol, eval_id, shared_grams), shared_grams >= minShared.
    */
  def contaminationPairs(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String,
      evalIdCol: String, evalTextCol: String,
      n: Int = 3, minShared: Int = 8,
      maxEvalDocFrac: Double = 1.0): DataFrame =
    contaminationCandidates(corpus, evalSet, idCol, textCol,
      evalIdCol, evalTextCol, n, maxEvalDocFrac)
      .groupBy("__cid", "eval_id")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
      .select(col("__cid").as(idCol), col("eval_id"), col("shared_grams"))

  /** The pre-aggregation candidate rows of [[contaminationPairs]]: one row
    * per (corpus doc, eval doc, shared gram). Split out so specs can
    * assert the high-DF rail's candidate bound directly.
    *
    * `maxEvalDocFrac` is the rail: grams present in more than that
    * fraction of eval documents are dropped BEFORE the broadcast. A
    * stop-phrase gram carried by a large share of both sides multiplies
    * candidate rows as |corpus docs with g| × |eval docs with g| before
    * any aggregation collapses them — CPU-bound blowup on exactly the
    * grams that carry no contamination signal; production decontamination
    * caps or drops high-DF grams. The document frequency computes on the
    * EVAL side only, which is small by contract (it is the broadcast
    * side), so the rail costs one tiny aggregate and no corpus work.
    */
  private[graft] def contaminationCandidates(corpus: DataFrame,
      evalSet: DataFrame, idCol: String, textCol: String,
      evalIdCol: String, evalTextCol: String,
      n: Int, maxEvalDocFrac: Double): DataFrame = {
    // sub-n-token texts carry no real n-grams; shingleCol's whole-text
    // fallback (built for similarity joins) would turn two identical short
    // docs into a pseudo-gram match here, diverging from the documented
    // distinct-n-gram semantics — exclude them on both sides
    val cg = corpus.filter(size(split(col(textCol), " ")) >= n)
      .select(col(idCol).as("__cid"),
        explode(shingleCol(col(textCol), n)).as("__g"))
    val evalDocs = evalSet.filter(size(split(col(evalTextCol), " ")) >= n)
    val eg0 = evalDocs.select(col(evalIdCol).as("eval_id"),
      explode(shingleCol(col(evalTextCol), n)).as("__g"))
    val eg1 =
      if (maxEvalDocFrac >= 1.0) eg0
      else {
        // shingles are distinct per doc, so count(*) per gram IS the
        // eval document frequency
        val nEval = evalDocs.select(col(evalIdCol)).distinct().count()
        val cap = math.max(1L, math.floor(maxEvalDocFrac * nEval).toLong)
        val keep = eg0.groupBy("__g").agg(count(lit(1)).as("__edf"))
          .filter(col("__edf") <= cap).select("__g")
        eg0.join(keep, Seq("__g"))
      }
    cg.join(broadcast(eg1), Seq("__g"))
  }

  /** Embedding-cosine near-duplicate pairs: sign-LSH candidate buckets
    * (pairs must share a (table, bucket) posting) + exact cosine verify.
    * The bucket self-join is the only pairwise work — O(candidates), not
    * O(n²); identical vectors always share every posting, so recall on
    * true duplicates is 1.
    *
    * BIT-IDENTICAL vectors collapse to their min-id representative
    * before the posting join (same rationale as [[nearDupPairs]]'s
    * identical-text collapse: N re-ingested copies of one embedding
    * would fill every shared bucket and emit C(N,2) pairs). Each
    * identical group emits N−1 star edges at cosine 1.0; connected
    * components downstream is unchanged. Null and all-zero vectors are
    * excluded — cosine is undefined for them, so they can neither pair
    * nor collapse (matching their pre-collapse NaN-drop behavior).
    * Output: (id_a, id_b, cosine), id_a < id_b.
    */
  def embedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 4, tables: Int = 8): DataFrame = {
    // DEGENERATE vectors (null, or all-zero — the typical
    // failed-to-embed placeholder) are EXCLUDED up front: cosine is
    // undefined for them, they matched nothing before the collapse
    // either (the NaN similarity failed every threshold), and
    // star-collapsing them would fabricate 1.0 similarities between
    // unrelated documents and delete real data downstream
    // compiled gate ([[expressions.LshVec.any_nonzero]]) since r19 — the
    // `exists(vec, x =!= 0.0f)` HOF walked every vector interpreted;
    // identical exists semantics (true on any non-zero incl. NaN, null
    // if only nulls remain, -0.0 counts as zero) (guide §4)
    val rows = df
      .filter(col(vecCol).isNotNull &&
        graft.functions.expressions.LshVec.any_nonzero(col(vecCol)))
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val (repRows, starBase) = collapseByKey(rows, "__v")
    val star = starBase.withColumn("cosine", lit(1.0))
    // postings in their own Opaque-guarded projection below the explode
    // (same §4.4 guard-duplication fix as the MinHash signature stage)
    val posts = repRows.select(col("__id"), col("__v"),
        graft.functions.expressions.Opaque.opaque(
          Similarity.lshPostings(col("__v"), bits, tables)).as("__posts"))
      .select(col("__id"), col("__v"), explode(col("__posts")).as("__p"))
    posts.as("a").join(posts.as("b"),
        col("a.__p") === col("b.__p") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__v").as("__va"), col("b.__v").as("__vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Similarity.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .unionByName(star)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * k-means-cluster the embedding space, then deduplicate INSIDE each
    * cluster — a document drops when a lower-id document in the same
    * cluster has cosine similarity >= `eps`. The paper breaks duplicate
    * groups by distance-to-centroid; keeping the lowest id instead makes
    * the decision engine-replayable while preserving the paper's
    * one-survivor-per-group semantics.
    *
    * Scale shape: the clustering bounds ALL pairwise work to within-cell
    * pairs — the self-join is equi-keyed on the cell id (a shuffle-hash
    * join on cells, never a cartesian), so cost is Σ|cell|², not
    * |corpus|². Centroids ride a 1-row broadcast ([[Similarity]]'s
    * plan-size rationale) and assignment is a map-side argmax. At 100 TB
    * nlist scales up to keep cells bounded (the paper's regime: tens of
    * thousands of clusters), which only widens the same equi-join key
    * space.
    *
    * Output: (idCol, kept) — kept = no lower-id in-cell neighbor at
    * >= eps. Exact duplicates always land in the same cell (assignment is
    * a deterministic function of the vector), so recall on true copies
    * is 1 regardless of the clustering.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      eps: Double, nlist: Int = 16, kmeansIters: Int = 2): DataFrame = {
    val cents =
      Similarity.kmeansCentroids(df, idCol, vecCol, nlist, kmeansIters)
    val cRow = Similarity.centroidsRow(df.sparkSession, cents)
    // the argmax assignment (O(|corpus|·nlist·dim)) feeds three plan
    // subtrees (both self-join sides + the final keep/drop join) —
    // materialize it once instead of re-deriving it per subtree
    val assigned = df.crossJoin(cRow)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        Similarity.bestCellCol(col(vecCol)).cast("int").as("__cell"))
      .localCheckpoint()
    val dups = assigned.as("a").join(assigned.as("b"),
        col("a.__cell") === col("b.__cell") && col("a.__id") < col("b.__id"))
      .filter(Similarity.cosine(col("a.__v"), col("b.__v")) >= eps)
      .select(col("b.__id").as("__id")).distinct()
      .withColumn("__drop", lit(true))
    assigned.join(dups, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(!col("__drop"), lit(true)).as("kept"))
  }

  /** Incremental dedup of a new batch against a HISTORICAL corpus — the
    * 100 TB ingest pattern: the history is scanned but NEVER shuffled or
    * joined at its own scale. Three stages, exact final semantics:
    *
    *   1. build a Bloom filter over the history's text column
    *      (`df.stat.bloomFilter` — distributed scan, sketches merged on
    *      the driver; size the filter by `expectedItems`/`fpp`);
    *   2. bloom-prefilter the batch (broadcast probe — the only UDF in
    *      this module, kept because no built-in Bloom-probe expression
    *      exists; one byte-array test per row, far cheaper than any
    *      join). False positives survive to stage 3; false negatives
    *      cannot exist, so no true duplicate escapes;
    *   3. exact verify: the candidate TEXTS (tiny — true dups + the fpp
    *      share of the batch) broadcast against the history scan, and
    *      the confirmed texts broadcast back onto the batch. Both joins
    *      build on the small side, so the history contributes only its
    *      scan and the batch only one broadcast-hash probe each.
    *
    * Output: (idCol, kept) — kept = the row's text does NOT appear in
    * the history (exact, bloom-invisible in the result).
    */
  def dedupAgainstHistory(batch: DataFrame, history: DataFrame,
      idCol: String, textCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03,
      maxBroadcastCandidates: Long = 1000000L): DataFrame = {
    val bf = history.stat.bloomFilter(textCol, expectedItems, fpp)
    val bc = batch.sparkSession.sparkContext.broadcast(bf)
    val mightContain =
      udf((t: String) => t != null && bc.value.mightContainString(t))
    // materialize once: the bloom-probe scan over the whole batch feeds
    // the sizing count AND both verify joins — three full passes without
    // this (the count alone justifies the checkpoint; the candidate set
    // is small by the bloom contract, and oversized sets hit the rail)
    val candTexts = batch.filter(mightContain(col(textCol)))
      .select(col(textCol).as("__t")).distinct()
      .localCheckpoint()
    // Sizing rail: an UNDERSIZED filter (expectedItems far below the
    // true history cardinality) saturates toward fpp≈1 and the
    // "tiny" candidate set degrades toward the whole batch — counting
    // it is one cheap job, and past the threshold the verify joins
    // fall back to shuffle joins instead of blowing the 8 GB broadcast
    // limit. The count also pins the bloom guarantee in specs.
    val candCount = candTexts.count()
    val useBroadcast = candCount <= maxBroadcastCandidates
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (useBroadcast) broadcast(df) else df
    val seenTexts = history.select(col(textCol).as("__t"))
      .join(maybeBroadcast(candTexts), Seq("__t"), "left_semi").distinct()
    batch.select(col(idCol), col(textCol).as("__t"))
      .join(maybeBroadcast(seenTexts.withColumn("__dup", lit(true))),
        Seq("__t"), "left")
      .select(col(idCol), coalesce(!col("__dup"), lit(true)).as("kept"))
  }

  /** Connected components over a duplicate-pair edge list: every node gets
    * the minimum node id reachable from it (the canonical document of its
    * duplicate cluster). This is the step that turns pairwise dedup output
    * into per-document keep/drop decisions.
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond" — the published
    * replacement for min-label propagation on high-diameter graphs).
    * Each round rewrites the EDGE SET:
    *
    *   large-star: every node links its LARGER neighbors to the minimum
    *   of its closed neighborhood — long paths fold toward local minima;
    *   small-star: every node (now pointing only at smaller ids) relinks
    *   its smaller neighbors AND itself to that minimum — stars merge.
    *
    * The edge set converges to one star per component (every non-min
    * node → component min) in O(log) rounds REGARDLESS of diameter —
    * a k-node chain closes in ~log2(k) rounds where min-propagation
    * needs k (ConnectedComponentsSpec pins a 50-chain at <= 10 rounds;
    * dedup's near-clique components still close in 2-3). Each half-round
    * is one groupBy(min) + one keyed join on node id over the current
    * edges — never pairwise, AQE-splittable on skewed hubs; edge count
    * is bounded (large-star only reorients/contracts, duplicates drop
    * per round) and `localCheckpoint` cuts the iterative lineage.
    * Convergence = the round leaves the edge set unchanged, which is
    * exactly the all-stars fixpoint of the paper.
    *
    * Edge endpoints must be drawn from `ids`: the alternating rewrite
    * PROPAGATES through out-of-universe endpoints (they relay
    * connectivity like any node) and the component minimum may be such
    * an id — labels can then name a cluster_id absent from `ids`.
    * Filter edges to the id universe first if foreign ids must not leak
    * into labels (the old min-label propagation silently ignored them,
    * which also meant it missed real transitive closure through them).
    */
  def connectedComponents(edges: DataFrame, ids: DataFrame,
      idCol: String, checkpointDir: Option[String] = None): DataFrame =
    ccAlternating(edges, ids, idCol, checkpointDir)._1

  /** [[connectedComponents]] plus the number of alternation rounds run —
    * exposed so the spec can pin convergence cost on adversarial shapes.
    *
    * `checkpointDir`: per-round lineage cuts default to
    * `localCheckpoint(true)` — right for local/bench runs (no
    * distributed store needed, blocks vanish with the app) but it PINS
    * the executors holding the blocks and loses them on executor death,
    * which on a multi-hour 100 TB run means restarting the whole
    * iteration. Passing a reliable store path (HDFS/object store)
    * switches every cut to a RELIABLE `checkpoint(true)` under that
    * directory: executor loss recovers from storage and dynamic
    * allocation may release workers between rounds (guide §5 —
    * localCheckpoint trades fault tolerance for speed; make the trade
    * explicit at scale). */
  private[graft] def ccAlternating(edges: DataFrame, ids: DataFrame,
      idCol: String, checkpointDir: Option[String] = None): (DataFrame, Int) = {
    def cut(df: DataFrame): DataFrame = checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(true)
      case None => df.localCheckpoint(true)
    }
    val nodes = ids.select(col(idCol).cast("long").as("__id")).distinct()
    var e = cut(edges.select(col("id_a").cast("long").as("__u"),
        col("id_b").cast("long").as("__v"))
      .filter(col("__u") =!= col("__v"))
      .select(greatest(col("__u"), col("__v")).as("__u"),
        least(col("__u"), col("__v")).as("__v"))
      .distinct())
    var rounds = 0
    var eCount = e.count()
    var converged = eCount == 0L
    while (!converged) {
      rounds += 1
      // large-star over the SYMMETRIC neighborhood: m = min(N(u) ∪ {u});
      // (v, m) for v > u. Every emitted edge has bigger-id on the left.
      val sym = e.unionAll(
        e.select(col("__v").as("__u"), col("__u").as("__v")))
      val lsMin = sym.groupBy("__u").agg(min("__v").as("__mn"))
        .select(col("__u"), least(col("__u"), col("__mn")).as("__m"))
      val ls = sym.join(lsMin, "__u")
        .filter(col("__v") > col("__u"))
        .select(col("__v").as("__u"), col("__m").as("__v"))
        .filter(col("__u") =!= col("__v"))
        .distinct()
      // small-star over the smaller-neighbor lists ls leaves behind:
      // m = min(N⁻(u) ∪ {u}); every smaller neighbor AND u link to m
      val ssMin = ls.groupBy("__u").agg(min("__v").as("__m"))
      val stepped = cut(ls.join(ssMin, "__u")
        .select(col("__v").as("__u"), col("__m").as("__v"))
        .unionAll(ssMin.select(col("__u"), col("__m").as("__v")))
        .filter(col("__u") =!= col("__v"))
        .select(greatest(col("__u"), col("__v")).as("__u"),
          least(col("__u"), col("__v")).as("__v"))
        .distinct())
      // fixpoint = the round left the edge set unchanged (both steps
      // only ever emit (node, smaller-reachable-id) pairs, so set
      // equality is the paper's all-stars termination test). The old
      // count rides along from last round's probe — one count + one
      // union-distinct job per round, not three.
      val steppedCount = stepped.count()
      converged = steppedCount == eCount &&
        stepped.unionAll(e).distinct().count() == eCount
      e = stepped
      eCount = steppedCount
    }
    val roots = e.groupBy("__u").agg(min("__v").as("__root"))
    val labels = nodes.join(roots, nodes("__id") === roots("__u"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__root"), col("__id")).as("cluster_id"))
    (labels, rounds)
  }

  /** Shared first-occurrence window-dedup engine behind
    * [[TextAnalysis.c4SpanDedup]] (newline-delimited sentence units) and
    * [[exactSubstrDedup]] (whitespace token units): explode the sliding
    * `n`-unit windows, flag later occurrences with ONE window-function
    * pass (min(doc, pos) over each window hash — no self-join, so the
    * exploded frame is computed exactly once), fold counts and covered
    * unit indices in ONE per-doc aggregation, and rebuild the text.
    * Linear in total units; three keyed exchanges total (window hash,
    * doc id, rebuild join) and no pairwise work anywhere.
    */
  private[functions] def firstOccurrenceDedup(df: DataFrame, idCol: String,
      textCol: String, n: Int, delim: String,
      nName: String, dupName: String, rmName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val units = df.select(col(idCol).as("__id"),
      split(col(textCol), delim).as("__us"))
    val wins = units.select(col("__id"),
      // compiled fused window-join + xxhash64 (seed 42, identical to the
      // builtin over the joined string) — the old transform(...) form
      // evaluated interpreted with a slice+concat_ws+hash walk per
      // position. < n units → empty (kernel); NULL unit array (NULL
      // text) → coalesced to empty like the old when/otherwise (guide §4)
      posexplode(coalesce(
        graft.functions.expressions.TextGrams
          .sliding_join_hash(col("__us"), n, delim),
        array().cast("array<bigint>"))).as(Seq("__pos", "__h")))
    val flagged = wins.withColumn("__f",
        min(struct(col("__id"), col("__pos"))).over(Window.partitionBy("__h")))
      .withColumn("__dup",
        !(col("__f.__id") === col("__id") && col("__f.__pos") === col("__pos")))
    // one aggregation carries counts AND the covered unit indices:
    // per-row sequences of covered indices collect (nulls skipped for
    // non-dup rows), flatten, and array_distinct collapses the overlap
    // between adjacent duplicate windows. The per-group buffer is
    // bounded by dup_windows·n ints before the distinct (factor n over
    // the final covered set on pathologically dup-heavy docs) — the
    // object-hash aggregate spills to sort-based if a group outgrows
    // memory, and the win is that nothing here re-evaluates the
    // corpus-sized explode
    val perDoc = flagged.groupBy("__id").agg(
      count(lit(1)).as(nName),
      sum(when(col("__dup"), 1L).otherwise(0L)).as(dupName),
      array_distinct(flatten(collect_list(
        when(col("__dup"), sequence(col("__pos"), col("__pos") + (n - 1))))))
        .as("__rm"))
    units.join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        // compiled index-excluding join (O(units + rm) hash-set pass) —
        // the old filter((_, i) => !array_contains(__rm, i)) HOF was
        // interpreted AND O(units · rm); array_join semantics preserved
        // exactly (guide §4)
        graft.functions.expressions.TextGrams.join_excluding_indices(
          col("__us"), coalesce(col("__rm"), array().cast("array<int>")),
          delim).as("kept_text"),
        coalesce(col(nName), lit(0L)).as(nName),
        coalesce(col(dupName), lit(0L)).as(dupName),
        coalesce(size(col("__rm")), lit(0)).as(rmName))
  }

  /** Exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499): any run of `w`
    * whitespace tokens occurring verbatim more than once in the corpus
    * keeps only its FIRST occurrence — lowest (doc id, position) — and the
    * tokens covered by every later occurrence are removed from the text.
    * The paper builds a corpus-wide suffix array (a single-node
    * structure); the distributed equivalent slides a w-token window with
    * stride 1 and hash-groups the windows. Any shared run of length
    * >= w is covered exactly by its overlapping duplicate windows, so the
    * interval union removed per doc equals the paper's duplicated-range
    * semantics at window granularity.
    *
    * Scale shape = [[exact]]: one corpus-linear window explode, one
    * hash-groupBy, a keyed join back, a per-doc rebuild — no suffix
    * array, no pairwise product.
    *
    * Output: (idCol, kept_text, n_windows, dup_windows, removed_tokens).
    */
  def exactSubstrDedup(df: DataFrame, idCol: String, textCol: String,
      w: Int = 50): DataFrame =
    firstOccurrenceDedup(df, idCol, textCol, w, " ",
      "n_windows", "dup_windows", "removed_tokens")

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
