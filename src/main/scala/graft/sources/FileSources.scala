package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.model.TypeInference

/** CSV / JSONL readers with sling-style sampling inference.
  *
  * Both read the raw file with all-string schemas, infer from the first 900
  * rows with [[TypeInference]], apply user `columns:` overrides (the
  * reference's `Columns.Coerce`, dataset.go:604-606), and cast the full
  * lazy scan — so only the sample is collected to the driver; the data path
  * stays distributed and codegen'd.
  */
object FileSources {

  /** `encoding`: source charset per the reference's
    * `source_options.encoding` (tests/replications/r.32-34 encoding tests;
    * latin1/windows-1252/utf-16 and friends). Spark's text datasource
    * decodes non-UTF-8 charsets natively, so the read stays distributed.
    */
  /** Reference CSV source options beyond header/delimiter
    * (core/sling/config.go source options; stream_processor semantics):
    * quote/escape pass to the parser; null_if values and empty strings
    * null out BEFORE type inference (so a column of "\\N" still infers);
    * skip_lines drops the first N physical lines of EACH file
    * (pre-header), skip_blank_lines drops whitespace-only lines. */
  final case class CsvOpts(quote: Option[String] = None,
      escape: Option[String] = None, nullIf: Seq[String] = Nil,
      emptyAsNull: Boolean = false, skipLines: Int = 0,
      skipBlankLines: Boolean = false, datetimeFormat: Option[String] = None,
      // None = sniff (one splittable quote-parity pass decides whether any
      // record spans physical lines); Some(b) pins the parser mode and
      // skips the sniff — declare false on huge known-clean inputs to
      // avoid the extra read, true for known embedded-newline data
      multiLine: Option[Boolean] = None)

  def csv(spark: SparkSession, path: String,
      header: Boolean = true, delimiter: String = ",",
      overrides: Map[String, DataType] = Map.empty,
      sampleSize: Int = TypeInference.SampleSize,
      encoding: Option[String] = None,
      opts: CsvOpts = CsvOpts()): DataFrame = {
    val reader = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("inferSchema", "false")
    opts.quote.foreach(q => reader.option("quote", q))
    // RFC-4180 doubled-quote escaping is the default (the reference's Go
    // encoding/csv dialect); Spark's own default is backslash — override
    // unless the task declares one
    reader.option("escape", opts.escape.getOrElse("\""))
    encoding.foreach(e => reader.option("encoding", e))
    // gzip/snappy/lz4/bzip2 go through Hadoop codecs natively; .zst routes
    // through the zstd-jni line reader (compression.go extension sniffing),
    // which must apply the charset itself — csv(Dataset[String]) never
    // sees the raw bytes, so the reader's encoding option can't
    val skipping = opts.skipLines > 0 || opts.skipBlankLines
    val raw =
      if (hasZstd(spark, path)) {
        var lines = Compression.readZstdLines(spark, path, encoding)
        if (skipping) lines = applyLineSkips(spark, lines, opts)
        reader.csv(lines)
      } else if (Compression.isZip(path)) {
        // .zip routes through the archive line reader (compression.go
        // extension dispatch); same line-fed CSV parse as .zst
        var lines = Compression.readZipLines(spark, path, encoding)
        if (skipping) lines = applyLineSkips(spark, lines, opts)
        reader.csv(lines)
      } else if (skipping) {
        require(encoding.forall(e =>
          e.equalsIgnoreCase("utf-8") || e.equalsIgnoreCase("utf8")),
          "skip_lines/skip_blank_lines need UTF-8 input (the line pre-pass " +
            "reads through the text source)")
        reader.csv(readLinesSkipping(spark, path, opts))
      } else {
        // Quoted fields may embed newlines (the reference's Go csv reader
        // always handles them), which forces Spark's multiLine parser —
        // but multiLine makes every file ONE unsplittable task, the
        // difference between 2-way and 32-way parallelism on a 2-file
        // input, and between file-count and split-count parallelism at
        // 100 TB. A record spanning physical lines must leave some line
        // with an ODD number of quote chars (the "" in-field escape is two
        // chars), so one splittable, codegen'd validation pass over the
        // text proves newline-free inputs safe for the line-splittable
        // parser. Only sniffable under the default "-quote/escape dialect
        // and a byte-compatible charset; otherwise conservative multiLine.
        val multi = opts.multiLine.getOrElse {
          val sniffable = opts.quote.forall(_ == "\"") &&
            opts.escape.forall(_ == "\"") &&
            encoding.forall(e => e.equalsIgnoreCase("utf-8") ||
              e.equalsIgnoreCase("utf8"))
          if (!sniffable) true
          else {
            import org.apache.spark.sql.functions.{col, length, translate}
            !spark.read.text(path)
              .filter(((length(col("value")) -
                length(translate(col("value"), "\"", ""))) % 2) === 1)
              .isEmpty
          }
        }
        reader.option("multiLine", multi.toString).csv(path)
      }
    val nulled = applyNullIf(raw, opts)
    inferAndCast(nulled, overrides, sampleSize, opts.datetimeFormat)
  }

  /** Drop the first `skipLines` physical lines of each file without a
    * shuffle: partition 0 of a file's splits holds its first lines, so a
    * per-file textFile read + drop on partition 0 stays distributed. */
  private def readLinesSkipping(spark: SparkSession, path: String,
      opts: CsvOpts): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(s => s.isFile &&
          !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_")).map(_.getPath.toString).sorted
      else Seq(path)
    val n = opts.skipLines
    val perFile = files.map { f =>
      if (n == 0) spark.read.textFile(f)
      else spark.read.textFile(f)
        .rdd.mapPartitionsWithIndex((i, it) => if (i == 0) it.drop(n) else it)
        .toDS()
    }
    // a directory with no data files (or only dot/underscore-prefixed
    // ones) must not hit empty.reduce — mirror the non-skipping path's
    // empty-source behavior with an empty Dataset[String]
    val all =
      if (perFile.isEmpty) spark.emptyDataset[String]
      else perFile.reduce(_ union _)
    applyLineSkips(spark, all, opts.copy(skipLines = 0))
  }

  /** Blank-line filter plus per-PARTITION head drop. Only the zstd path
    * passes a non-zero skipLines here — readZstdLines yields exactly one
    * partition per file, so dropping from every partition IS the per-file
    * semantics. The plain-text path skips per file itself
    * (readLinesSkipping) and calls this with skipLines=0. */
  private def applyLineSkips(spark: SparkSession,
      lines: org.apache.spark.sql.Dataset[String],
      opts: CsvOpts): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    val dropped =
      if (opts.skipLines > 0)
        lines.mapPartitions(_.drop(opts.skipLines))
      else lines
    if (opts.skipBlankLines) dropped.filter(l => l.trim.nonEmpty) else dropped
  }

  /** null_if / empty_as_null on the raw all-string frame, pre-inference. */
  private def applyNullIf(raw: DataFrame, opts: CsvOpts): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    if (opts.nullIf.isEmpty && !opts.emptyAsNull) raw
    else raw.select(raw.columns.map { c =>
      val base = col(s"`$c`")
      val matchesNull =
        (if (opts.nullIf.nonEmpty) Some(base.isin(opts.nullIf: _*)) else None) ++
          (if (opts.emptyAsNull) Some(base === "") else None)
      val anyMatch = matchesNull.reduce(_ || _)
      when(anyMatch, lit(null)).otherwise(base).as(c)
    }.toSeq: _*)
  }

  def jsonl(spark: SparkSession, path: String,
      overrides: Map[String, DataType] = Map.empty,
      sampleSize: Int = TypeInference.SampleSize): DataFrame = {
    // primitivesAsString routes JSON scalars through the same inference
    // engine as CSV, for identical type decisions across formats
    val reader = spark.read
      .option("primitivesAsString", "true")
      // a file whose first non-ws byte is '[' is a JSON ARRAY document
      // (iop/json.go handles both layouts); line-mode would yield one
      // corrupt row per pretty-printed line
      .option("multiLine", firstByteIsBracket(spark, path).toString)
    val raw1 =
      if (hasZstd(spark, path)) reader.json(Compression.readZstdLines(spark, path))
      else reader.json(path)
    // a pretty-printed document the line-mode parse can't read yields only
    // the corrupt-record column — retry as a whole-file document (covers
    // '{'-rooted layouts the '['-sniff above misses)
    val raw0 =
      if (raw1.columns.toSeq == Seq("_corrupt_record") && !hasZstd(spark, path))
        spark.read.option("primitivesAsString", "true")
          .option("multiLine", "true").json(path)
      else raw1
    // object-wrapped array document ({"data": [...]}): the records live in
    // the single array field — unwrap to its elements (iop/json.go treats
    // both layouts as the same stream)
    val raw = raw0.schema.fields match {
      case Array(f) => f.dataType match {
        case org.apache.spark.sql.types.ArrayType(_: StructType, _) =>
          raw0.select(org.apache.spark.sql.functions
            .explode(org.apache.spark.sql.functions.col(s"`${f.name}`"))
            .as("__rec")).select("__rec.*")
        case _ => raw0
      }
      case _ => raw0
    }
    inferAndCast(raw, overrides, sampleSize)
  }

  /** Peek the first data file's first non-whitespace byte. */
  private def firstByteIsBracket(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val st = fs.globStatus(p) match {
        case null => Array.empty[org.apache.hadoop.fs.FileStatus]
        case arr => arr
      }
      val first = st.flatMap { s =>
        if (s.isDirectory)
          fs.listStatus(s.getPath).filter(f => f.isFile &&
            !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
        else Array(s)
      }.sortBy(_.getPath.toString).headOption
      first.exists { f =>
        val in = fs.open(f.getPath)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          (0 until math.max(n, 0)).iterator.map(buf(_).toChar)
            .find(!_.isWhitespace).contains('[')
        } finally in.close()
      }
    } catch { case _: java.io.IOException => false }
  }

  private def hasZstd(spark: SparkSession, path: String): Boolean = {
    if (Compression.isZstd(path)) true
    else {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      try {
        val isDir = fs.getFileStatus(p).isDirectory
        val anyZstd = isDir &&
          fs.listStatus(p).exists(f => Compression.isZstd(f.getPath.getName))
        if (anyZstd) {
          // the zstd route reads ONLY .zst files — a mixed directory would
          // silently drop the plain files' rows, so refuse it
          val plain = fs.listStatus(p).filter(f => f.isFile &&
            !Compression.isZstd(f.getPath.getName) &&
            !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
          require(plain.isEmpty, s"directory $path mixes .zst and plain " +
            s"files (e.g. ${plain.head.getPath.getName}); split them or " +
            "recompress uniformly")
        }
        anyZstd
      } catch { case _: java.io.FileNotFoundException => false }
    }
  }

  /** stdin scan (`cat f.csv | sling run`, fs.go:1537 MakeDatastream): drain
    * the stream to a staging file, then run the normal distributed read +
    * inference path. Stdin is inherently a single driver-side stream; the
    * staging hop is what makes the rest of the plan parallel.
    */
  def stdin(spark: SparkSession, in: java.io.InputStream,
      format: String = "csv", stagingDir: String = "/tmp/graft-stdin",
      overrides: Map[String, DataType] = Map.empty): DataFrame = {
    val dir = new java.io.File(stagingDir)
    dir.mkdirs()
    val f = java.io.File.createTempFile("stdin-", s".$format", dir)
    val out = new java.io.FileOutputStream(f)
    try in.transferTo(out) finally out.close()
    format match {
      case "csv" => csv(spark, f.getAbsolutePath, overrides = overrides)
      case "jsonl" | "json" => jsonl(spark, f.getAbsolutePath, overrides = overrides)
      case other => throw new IllegalArgumentException(s"stdin format $other")
    }
  }

  private def inferAndCast(raw: DataFrame,
      overrides: Map[String, DataType], sampleSize: Int,
      datetimeFormat: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    // inference runs over STRING columns only — JSON structs/arrays (and
    // any already-typed column) pass through castTo untouched
    val strNames = raw.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
    if (strNames.isEmpty) return raw
    val sample = raw.select(strNames.map(n => col(s"`$n`")): _*)
      .limit(sampleSize).collect().toSeq
    val schema = TypeInference.infer(sample, strNames, overrides, datetimeFormat)
    TypeInference.castTo(raw, schema, datetimeFormat)
  }
}
