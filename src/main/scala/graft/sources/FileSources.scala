package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DataType

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
  def csv(spark: SparkSession, path: String,
      header: Boolean = true, delimiter: String = ",",
      overrides: Map[String, DataType] = Map.empty,
      sampleSize: Int = TypeInference.SampleSize,
      encoding: Option[String] = None): DataFrame = {
    val reader = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("inferSchema", "false")
    encoding.foreach(e => reader.option("encoding", e))
    // gzip/snappy/lz4/bzip2 go through Hadoop codecs natively; .zst routes
    // through the zstd-jni line reader (compression.go extension sniffing),
    // which must apply the charset itself — csv(Dataset[String]) never
    // sees the raw bytes, so the reader's encoding option can't
    val raw =
      if (hasZstd(spark, path))
        reader.csv(Compression.readZstdLines(spark, path, encoding))
      else reader.csv(path)
    inferAndCast(raw, overrides, sampleSize)
  }

  def jsonl(spark: SparkSession, path: String,
      overrides: Map[String, DataType] = Map.empty,
      sampleSize: Int = TypeInference.SampleSize): DataFrame = {
    // primitivesAsString routes JSON scalars through the same inference
    // engine as CSV, for identical type decisions across formats
    val reader = spark.read
      .option("primitivesAsString", "true")
    val raw =
      if (hasZstd(spark, path)) reader.json(Compression.readZstdLines(spark, path))
      else reader.json(path)
    inferAndCast(raw, overrides, sampleSize)
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
      overrides: Map[String, DataType], sampleSize: Int): DataFrame = {
    val sample = raw.limit(sampleSize).collect().toSeq
    val schema = TypeInference.infer(sample, raw.columns.toSeq, overrides)
    TypeInference.castTo(raw, schema)
  }
}
