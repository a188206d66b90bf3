package graft.repl

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.yaml.snakeyaml.Yaml

import graft.sources.{DeltaLite, Discover, FileSources, Tables}

/** Data-driven E2E suite replay — the port of the reference's primary test
  * strategy (tests/suite.file.template.yaml + suite.db.template.yaml +
  * suite.cli.yaml, runner cmd/sling/sling_test.go:347-353): a YAML list of
  * scenarios, each a full task/discover/replication run followed by the
  * reference's validation vocabulary (`validation_row_count`,
  * `validation_types`, golden-file column compare, contains/not_contains).
  *
  * Scenarios are graft-native adaptations: Derby stands in for the live
  * Postgres/MySQL targets (zero egress), the local fs for object stores.
  * Fixture CSVs are the reference's own (tests/files/test1.csv et al.),
  * read in place — data files, not code.
  *
  * Placeholders substituted into every scenario string:
  *   `[files]` → fixture dir, `[out]` → per-suite scratch dir,
  *   `[name]` → scenario name (for unique Derby instances).
  * Scenarios run IN ORDER and may depend on earlier scenarios' outputs
  * (the reference's `after:` chains, linearized).
  */
object SuiteMatrix {

  final case class Scenario(
      name: String,
      kind: String, // task | discover | replication
      config: String, // task/replication YAML (connections YAML for DB discover)
      runs: Int,
      discoverPath: String,
      recursive: Boolean,
      level: String, // file | column (fs) / schema | table | column (db)
      conn: String, // non-empty → discover against this named connection
      validation: Map[String, String])

  final case class Result(name: String, passed: Boolean, detail: String)

  /** Default fixture dir — the reference's own test CSV corpus. Override
    * with GRAFT_SUITE_FILES when the tree is mounted elsewhere. */
  def fixtureDir: String =
    sys.env.getOrElse("GRAFT_SUITE_FILES", "/root/reference/tests/files")

  /** Root of the reference checkout, for the non-tests fixtures
    * (excel workbook, json dirs) some scenarios read. */
  def referenceRoot: String =
    sys.env.getOrElse("GRAFT_SUITE_REF", "/root/reference")

  def resourceSuite(): String = {
    val in = getClass.getResourceAsStream("/graft/suite.yaml")
    require(in != null, "classpath resource /graft/suite.yaml missing")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def load(yamlText: String): Seq[Scenario] = {
    val root = new Yaml().load[java.util.List[java.util.Map[String, Object]]](yamlText)
    root.asScala.toSeq.map { m0 =>
      val m = m0.asScala.toMap
      def str(k: String, d: String = ""): String =
        Option(m.getOrElse(k, null)).map(_.toString).getOrElse(d)
      val validation = Option(m.getOrElse("validation", null))
        .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
          .map { case (k, v) => k -> v.toString })
        .getOrElse(Map.empty[String, String])
      Scenario(
        name = str("name"),
        kind = str("kind", "task"),
        config = str("config"),
        runs = str("runs", "1").toInt,
        discoverPath = str("path"),
        recursive = str("recursive", "false").toBoolean,
        level = str("level", "file"),
        conn = str("conn"),
        validation = validation)
    }
  }

  // ---- run ---------------------------------------------------------------

  def runSuite(spark: SparkSession, suiteYaml: String, filesDir: String,
      workDir: String, sfDir: String): Seq[Result] = {
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(workDir))
    load(suiteYaml).map { sc0 =>
      val sub = (s: String) => s.replace("[files]", filesDir)
        .replace("[refroot]", referenceRoot)
        .replace("[out]", workDir).replace("[name]", sc0.name)
      val sc = sc0.copy(config = sub(sc0.config),
        discoverPath = sub(sc0.discoverPath),
        validation = sc0.validation.map { case (k, v) => k -> sub(v) })
      val expectError = sc.validation.get("expect_error").exists(_.toBoolean)
      try {
        val r = runOne(spark, sc, sfDir)
        // failure-path scenarios (e.g. suite.cli id=161: definition-only
        // into a CSV target must refuse): success IS the regression
        if (expectError)
          Result(sc.name, passed = false,
            "expected an error but the run succeeded")
        else r
      } catch {
        case scala.util.control.NonFatal(e) if expectError =>
          val want = sc.validation.getOrElse("error_contains", "")
          if (want.isEmpty || String.valueOf(e.getMessage).contains(want))
            Result(sc.name, passed = true,
              s"failed as expected: ${e.getClass.getSimpleName}")
          else Result(sc.name, passed = false,
            s"error lacks '$want': ${String.valueOf(e.getMessage).take(160)}")
        case scala.util.control.NonFatal(e) =>
          Result(sc.name, passed = false,
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
  }

  private def runOne(spark: SparkSession, sc: Scenario, sfDir: String): Result =
    sc.kind match {
      case "task" =>
        var count = 0L
        (1 to sc.runs).foreach(_ => count = TaskConfig.run(spark, sc.config, sfDir))
        validateTask(spark, sc, count, sfDir)
      case "discover" =>
        val entries =
          if (sc.conn.nonEmpty) {
            // DB discover (suite.db discover_schema/_schemas/_tables/
            // _columns): resolve the named connection from the scenario's
            // connections YAML and walk JDBC metadata at the given level
            val spec = Connections.resolve(Connections.parse(sc.config), sc.conn)
            Connections.discover(spec, sc.discoverPath, sc.level)
          } else if (sc.level == "column")
            Discover.fileColumns(spark, sc.discoverPath).map(_._1)
          else Discover.files(spark, sc.discoverPath, sc.recursive)
        validateList(sc, entries)
      case "replication" =>
        val compiled = Replication.parse(sc.config, Tables.names)
        val out = Replication.run(spark, sfDir, compiled,
          s"/tmp/graft-suite-repl/${sc.name}", threads = 2)
        val total = out.map(_._3).sum
        checkRowCount(sc, total).map(d => Result(sc.name, passed = false, d))
          .getOrElse(Result(sc.name, passed = true, s"rows=$total"))
      case "pipeline" =>
        // step outputs validate like the reference's output_contains /
        // output_does_not_contain (suite.cli id=82/189)
        val results = Pipeline.run(spark, sc.config)
        val output = results.map(_.detail).mkString("\n")
        val errs = Seq.newBuilder[String]
        results.filterNot(_.ok).foreach(r =>
          errs += s"step ${r.hook.kind} failed: ${r.detail.take(120)}")
        sc.validation.get("contains").foreach {
          _.split(',').map(_.trim).filter(_.nonEmpty).foreach { want =>
            if (!output.contains(want)) errs += s"output lacks '$want'"
          }
        }
        sc.validation.get("not_contains").foreach {
          _.split(',').map(_.trim).filter(_.nonEmpty).foreach { bad =>
            if (output.contains(bad)) errs += s"output contains '$bad'"
          }
        }
        val es = errs.result()
        if (es.isEmpty) Result(sc.name, passed = true, s"steps=${results.size}")
        else Result(sc.name, passed = false, es.mkString("; ").take(300))
      case other => Result(sc.name, passed = false, s"unknown kind $other")
    }

  // ---- validations -------------------------------------------------------

  private def checkRowCount(sc: Scenario, n: Long): Option[String] =
    sc.validation.get("row_count").flatMap { want =>
      val ok =
        if (want.startsWith(">=")) n >= want.drop(2).trim.toLong
        else if (want.startsWith(">")) n > want.drop(1).trim.toLong
        else n == want.trim.toLong
      if (ok) None else Some(s"row_count: got $n want $want")
    }

  private def validateList(sc: Scenario, entries: Seq[String]): Result = {
    val errs = Seq.newBuilder[String]
    checkRowCount(sc, entries.size.toLong).foreach(errs += _)
    sc.validation.get("contains").foreach { want =>
      want.split(',').map(_.trim).filter(_.nonEmpty).foreach { item =>
        if (!entries.exists(_.contains(item))) errs += s"missing entry $item"
      }
    }
    sc.validation.get("not_contains").foreach { want =>
      want.split(',').map(_.trim).filter(_.nonEmpty).foreach { item =>
        if (entries.exists(_.contains(item))) errs += s"unexpected entry $item"
      }
    }
    val es = errs.result()
    if (es.isEmpty) Result(sc.name, passed = true, s"entries=${entries.size}")
    else Result(sc.name, passed = false, es.mkString("; ").take(300))
  }

  private def validateTask(spark: SparkSession, sc: Scenario, count: Long,
      sfDir: String): Result = {
    val errs = Seq.newBuilder[String]
    checkRowCount(sc, count).foreach(errs += _)
    lazy val target = readTarget(spark, TaskConfig.parse(sc.config))
    sc.validation.get("golden_file").foreach { golden =>
      val cols = sc.validation.getOrElse("golden_cols", "")
        .split(',').filter(_.nonEmpty).map(_.trim.toInt).toSeq
      goldenDiff(spark, target, golden, cols).foreach(errs += _)
    }
    sc.validation.get("types").foreach { spec =>
      typeDiffs(target, spec).foreach(errs += _)
    }
    sc.validation.get("columns").foreach { want =>
      val got = target.columns.map(_.toLowerCase).toSeq
      val exp = want.split(',').map(_.trim.toLowerCase).toSeq
      if (got != exp) errs += s"columns: got ${got.mkString(",")}"
    }
    sc.validation.get("columns_contains").foreach { want =>
      val got = target.columns.map(_.toLowerCase).toSet
      want.split(',').map(_.trim.toLowerCase).filter(_.nonEmpty).foreach { c =>
        if (!got.contains(c)) errs += s"column $c missing"
      }
    }
    sc.validation.get("file_count_min").foreach { wantStr =>
      val tgt = TaskConfig.parse(sc.config).target
      val p = new org.apache.hadoop.fs.Path(tgt.obj)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val n = fs.listStatus(p).count(s => s.isFile &&
        !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      if (n < wantStr.toInt) errs += s"file_count: got $n want >=$wantStr"
    }
    val es = errs.result()
    if (es.isEmpty) Result(sc.name, passed = true, s"rows=$count")
    else Result(sc.name, passed = false, es.mkString("; ").take(300))
  }

  /** Read a task's target back for validation, over whichever backend the
    * task wrote. */
  private def readTarget(spark: SparkSession, task: TaskConfig.Task): DataFrame = {
    val tgt = task.target
    tgt.conn.map(Connections.resolve(task.connections, _)) match {
      case Some(spec) if spec.isDatabase =>
        graft.sources.Jdbc.read(spark, spec.jdbcUrl, tgt.obj)
      case _ => tgt.format match {
        case "parquet" if tgt.obj.contains("{part_") =>
          // {part_*} mask targets: read the partitioned tree at the base
          spark.read.parquet(
            tgt.obj.substring(0, tgt.obj.indexOf("{part_")).stripSuffix("/"))
        case "parquet" => spark.read.parquet(tgt.obj)
        case "delta" => DeltaLite.read(spark, tgt.obj)
        case "csv" => FileSources.csv(spark, tgt.obj)
        case "jsonl" | "json" => FileSources.jsonl(spark, tgt.obj)
        case other => sys.error(s"unreadable target format $other")
      }
    }
  }

  /** Golden-file compare, the reference's validation_file/validation_cols:
    * the golden CSV's columns at `idx` (by position) must match the target
    * values under the same names, order-insensitively. Cells canonicalize
    * through one value grammar so decimal/double/jdbc round-trips compare
    * equal.
    */
  private def goldenDiff(spark: SparkSession, target: DataFrame,
      goldenPath: String, idx: Seq[Int]): Option[String] = {
    val golden = FileSources.csv(spark, goldenPath)
    val useIdx = if (idx.nonEmpty) idx else golden.columns.indices
    val names = useIdx.map(golden.columns(_))
    def pick(df: DataFrame): Seq[Seq[String]] = {
      val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
      val sel = names.map(n => byLower.getOrElse(n.toLowerCase,
        sys.error(s"target lacks golden column $n")))
      df.select(sel.map(c => col(s"`$c`")): _*).collect()
        .map(_.toSeq.map(canon)).toSeq.sortBy(_.mkString(""))
    }
    val g = pick(golden)
    val t = pick(target)
    if (g == t) None
    else if (g.size != t.size) Some(s"golden rows ${g.size} != target ${t.size}")
    else {
      val i = g.indices.find(i => g(i) != t(i)).get
      Some(s"golden mismatch at sorted row $i: ${g(i)} vs ${t(i)}".take(240))
    }
  }

  private def canon(v: Any): String = v match {
    case null => ""
    case b: java.math.BigDecimal => b.stripTrailingZeros.toPlainString
    case b: scala.math.BigDecimal => b.underlying.stripTrailingZeros.toPlainString
    case d: java.lang.Double =>
      java.math.BigDecimal.valueOf(d).stripTrailingZeros.toPlainString
    case f: java.lang.Float =>
      java.math.BigDecimal.valueOf(f.toDouble).stripTrailingZeros.toPlainString
    case t: java.sql.Timestamp => t.toInstant.toString
    case d: java.sql.Date => d.toString
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case x => x.toString
  }

  /** validation_types: `col:kind` pairs; kinds are the reference's logical
    * names, matched against the Spark/JDBC type the target round-tripped
    * to. */
  private def typeDiffs(target: DataFrame, spec: String): Seq[String] = {
    import org.apache.spark.sql.types._
    val byLower = target.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    spec.split(',').map(_.trim).filter(_.nonEmpty).toSeq.flatMap { pair =>
      val Array(c, kind) = pair.split(':').map(_.trim)
      byLower.get(c.toLowerCase) match {
        case None => Seq(s"type: column $c absent")
        case Some(dt) =>
          val ok = kind match {
            case "decimal" => dt.isInstanceOf[DecimalType] ||
              dt == DoubleType || dt == FloatType
            case "integer" | "bigint" => dt == IntegerType || dt == LongType ||
              dt == ShortType || dt.isInstanceOf[DecimalType]
            case "timestamp" | "timestampz" => dt == TimestampType ||
              dt == TimestampNTZType
            case "date" => dt == DateType
            case "bool" => dt == BooleanType
            case "string" | "json" => dt == StringType
            case other => sys.error(s"unknown type kind $other")
          }
          if (ok) Nil else Seq(s"type: $c is $dt, want $kind")
      }
    }
  }

  /** The suite as a DataFrame for the CORRECTNESS gate: one row per
    * scenario with pass/fail. */
  def resultsDf(spark: SparkSession, results: Seq[Result]): DataFrame = {
    import spark.implicits._
    results.map(r => (r.name, if (r.passed) 1 else 0))
      .toDF("scenario", "passed").orderBy("scenario")
  }
}
