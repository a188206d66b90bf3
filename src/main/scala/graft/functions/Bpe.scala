package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Byte-level BPE tokenization for training-data budgets (beyond-reference;
  * the reference has no tokenizer — token counting is a core LLM-pipeline
  * operator). Implements the public GPT-2-style algorithm (Sennrich et al.
  * 2016; Radford et al. 2019): a regex pre-tokenizer partitions the text,
  * each pre-token's UTF-8 bytes are the initial symbols, and ranked merge
  * rules apply lowest-rank-first until no adjacent pair has a rank.
  *
  * Byte-level means LOSSLESS: concatenating the tokens' bytes reproduces
  * the input exactly (pinned by the roundtrip property spec), and no
  * out-of-vocabulary text exists — every byte is a base symbol.
  *
  * Scale shape: the merge table is a driver-side artifact (learned on a
  * bounded corpus sample, or supplied — e.g. published GPT-2 merges read
  * from a file) broadcast to executors; counting is a partition-wise map
  * over the text column with a per-partition word cache — no shuffle,
  * linear in corpus bytes, the same residency story as the multimodal
  * decoders.
  */
object Bpe {

  /** A ranked merge table. Merges apply in rank order (lowest first) —
    * the defining property of merge-ranks BPE. Symbols are strings over
    * 1:1 byte↔char code points 0-255.
    */
  final case class Vocab(merges: Seq[(String, String)]) extends Serializable {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** GPT-2's published pre-tokenizer (Radford et al. 2019): contractions,
    * space-prefixed letter/number/punct runs (the Unicode categories
    * \p{L}/\p{N}, so "naïve" or "café" is ONE word — an ASCII class would
    * split at every non-ASCII letter, inflating token counts on
    * multilingual text, the operator's whole purpose for training
    * budgets), and whitespace runs (the final space before a word
    * attaches to the word). UNICODE_CHARACTER_CLASS makes \s match
    * Unicode whitespace like Python's `regex` module does in the
    * reference implementation. Losslessness is structural either way:
    * every code point is letter, number, whitespace, or catch-all.
    */
  private val PreToken = java.util.regex.Pattern.compile(
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Partition the text into pre-tokens; concatenation reproduces the
    * input (the pattern's alternatives cover every character class). */
  def preTokenize(text: String): Seq[String] = {
    val m = PreToken.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Byte→symbol string: each UTF-8 byte becomes the char with its code
    * point, so merges are plain string concatenation and decode is a
    * byte-for-byte inverse. */
  private def byteSymbols(word: String): Vector[String] = {
    val bytes = word.getBytes("UTF-8")
    val v = Vector.newBuilder[String]
    var i = 0
    while (i < bytes.length) {
      v += String.valueOf((bytes(i) & 0xff).toChar)
      i += 1
    }
    v.result()
  }

  /** Standard merge loop: find the adjacent pair with the LOWEST rank,
    * merge all its occurrences left-to-right, repeat until no pair ranks.
    */
  def encodeWord(word: String, vocab: Vocab): Seq[String] = {
    var parts = byteSymbols(word)
    if (parts.length <= 1) return parts
    val ranks = vocab.ranks
    var done = false
    while (!done && parts.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) done = true
      else {
        val (a, b) = (vocab.merges(bestRank)._1, vocab.merges(bestRank)._2)
        val nb = Vector.newBuilder[String]
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
            nb += (a + b); j += 2
          } else { nb += parts(j); j += 1 }
        }
        parts = nb.result()
      }
    }
    parts
  }

  /** Tokenize a full text: pre-tokenize, BPE each pre-token. The cache
    * bounds repeated-word work (natural text repeats words heavily). */
  def encode(text: String, vocab: Vocab,
      cache: scala.collection.mutable.Map[String, Seq[String]] = null): Seq[String] = {
    val pts = preTokenize(text)
    if (cache == null) pts.flatMap(encodeWord(_, vocab))
    else pts.flatMap(w => cache.getOrElseUpdate(w, encodeWord(w, vocab)))
  }

  /** Inverse of [[encode]]: token symbol chars are bytes; concatenating
    * and re-decoding UTF-8 reproduces the input exactly. */
  def decode(tokens: Seq[String]): String = {
    val buf = new java.io.ByteArrayOutputStream()
    tokens.foreach(t => t.foreach(c => buf.write(c.toInt & 0xff)))
    new String(buf.toByteArray, "UTF-8")
  }

  def countTokens(text: String, vocab: Vocab,
      cache: scala.collection.mutable.Map[String, Seq[String]] = null): Int = {
    val pts = preTokenize(text)
    var n = 0
    pts.foreach { w =>
      n += (if (cache == null) encodeWord(w, vocab).length
        else cache.getOrElseUpdate(w, encodeWord(w, vocab)).length)
    }
    n
  }

  /** Learn a merge table from a bounded corpus sample (Sennrich et al.
    * 2016): count adjacent symbol pairs over the sample's pre-token
    * multiset, merge the most frequent pair, repeat `numMerges` times.
    * Ties break lexicographically so the table is deterministic. Runs
    * driver-side by design — the sample is bounded, like PQ codebook
    * training; the learned table is what gets broadcast.
    */
  def learn(sample: Seq[String], numMerges: Int): Vocab = {
    // word multiset over all pre-tokens
    val words = scala.collection.mutable.Map[Vector[String], Long]()
    sample.foreach(t => preTokenize(t).foreach { w =>
      val k = byteSymbols(w)
      if (k.length > 1) words(k) = words.getOrElse(k, 0L) + 1L
    })
    val merges = Seq.newBuilder[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (w, c) =>
        var i = 0
        while (i < w.length - 1) {
          val p = (w(i), w(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val maxC = pairCounts.values.max
        // toSeq BEFORE collect: collecting (sym, sym) tuples straight off
        // the Map rebuilds a MAP keyed on the LEFT symbol, silently
        // deduplicating tied candidates that share it (hash-order pick
        // instead of the documented lexicographic tie-break) — caught by
        // the learnDistributed parity spec
        val (a, b) = pairCounts.toSeq.collect {
          case (p, c) if c == maxC => p
        }.min // lexicographically smallest among the most frequent
        merges += ((a, b))
        val updated = words.toSeq.map { case (w, c) => (mergeWord(w, a, b), c) }
        words.clear()
        updated.foreach { case (w, c) =>
          if (w.length > 1) words(w) = words.getOrElse(w, 0L) + c
        }
        iter += 1
      }
    }
    Vocab(merges.result())
  }

  /** One left-to-right non-overlapping application of merge (a,b) to a
    * symbol sequence — the step both [[learn]] variants share. */
  private def mergeWord(w: Vector[String], a: String,
      b: String): Vector[String] = {
    val nb = Vector.newBuilder[String]
    var j = 0
    while (j < w.length) {
      if (j < w.length - 1 && w(j) == a && w(j + 1) == b) {
        nb += (a + b); j += 2
      } else { nb += w(j); j += 1 }
    }
    nb.result()
  }

  /** DISTRIBUTED merge learning — [[learn]]'s exact semantics when the
    * fitting sample is itself corpus-scale (learn() holds the word
    * multiset on the driver; a multi-TB sample cannot land there).
    * Returns the ranked merges with their winning pair counts;
    * [[vocabFrom]] turns the result into a [[Vocab]].
    *
    * Scale shape: ONE corpus-linear pass builds the distinct-word
    * multiset (pre-tokenize + byte symbols, a map-side-combinable
    * groupBy — the multiset is bounded by distinct pre-tokens, far
    * smaller than the corpus). Each of the `numMerges` rounds is then
    * one adjacent-pair count over that multiset (map-side combinable,
    * output bounded by distinct pairs), ONE collected row (the argmax,
    * ties broken like learn(): lexicographically smallest pair — for
    * these byte-symbol strings Spark's UTF-8 binary sort order equals
    * Scala's string order, both being code-point order below U+0800),
    * and a partition-wise merge application. The evolving multiset is
    * localCheckpoint'd per round so lineage stays flat across rounds;
    * words reduced to one symbol drop out (they can never pair again).
    * Distinct byte strings can never converge to the same symbol
    * sequence (merges preserve the underlying bytes), so no re-group
    * is needed after a merge.
    */
  def learnDistributed(corpus: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String, Long)] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, desc, lit, sum}
    var words = corpus.select(col(textCol)).as[String]
      .flatMap(t => if (t == null) Iterator.empty else preTokenize(t).iterator)
      .map(w => byteSymbols(w): Seq[String])
      .filter(_.length > 1)
      .groupBy(col("value")).agg(count(lit(1)).as("c"))
      .as[(Seq[String], Long)]
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String, Long)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val top = words
        .flatMap { case (syms, c) =>
          syms.iterator.sliding(2).withPartial(false)
            .map(p => (p.head, p(1), c))
        }
        .toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((a, b, cnt))
        val prev = words
        words = words
          .map { case (syms, c) => (mergeWord(syms.toVector, a, b): Seq[String], c) }
          .filter(_._1.length > 1)
          .localCheckpoint()
        // the new checkpoint is EAGER, so its blocks no longer depend on
        // the previous round's — release them now instead of letting
        // numMerges copies of the multiset pile up in executor storage
        // until driver GC gets around to them (a 32k-merge vocab fit
        // would otherwise hold 32k cached copies)
        prev.unpersist()
        iter += 1
      }
    }
    merges.result()
  }

  /** The [[Vocab]] a [[learnDistributed]] result denotes. */
  def vocabFrom(merges: Seq[(String, String, Long)]): Vocab =
    Vocab(merges.map(m => (m._1, m._2)))

  /** Max distinct pre-tokens a partition caches: natural text repeats
    * words heavily (the cache earns its memory), but an ID/hash-heavy
    * corpus would otherwise grow the map without bound — past the cap,
    * new words compute uncached (correctness unchanged, bounded RAM). */
  private val WordCacheCap = 65536

  /** Append a BPE token count column: the merge table rides a broadcast,
    * each partition compiles the rank map once and keeps a SIZE-CAPPED
    * word cache — no shuffle, no driver involvement, linear in corpus
    * bytes, bounded executor residency even on high-cardinality token
    * streams. NULL text counts as NULL.
    */
  def tokenCount(df: DataFrame, textCol: String,
      vocab: Vocab, outCol: String = "bpe_tokens"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(vocab)
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, IntegerType, nullable = true))
    val idx = df.schema.fieldIndex(textCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      val v = bc.value
      // only the LENGTH is ever read here — caching the token Seq itself
      // would hold 65k boxed-string sequences per partition for nothing
      val cache = scala.collection.mutable.Map[String, Int]()
      def countCapped(t: String): Int = {
        val pts = preTokenize(t)
        var n = 0
        pts.foreach { w =>
          n += (cache.get(w) match {
            case Some(len) => len
            case None =>
              val len = encodeWord(w, v).length
              if (cache.size < WordCacheCap) cache(w) = len
              len
          })
        }
        n
      }
      it.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        val n: Any = if (t == null) null else countCapped(t)
        Row.fromSeq(r.toSeq :+ n)
      }
    }(enc)
  }
}
