package graft.repl

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.yaml.snakeyaml.Yaml

/** Pipeline files: an ordered list of steps (reference pipeline.go:18-275),
  * each a typed action or a nested group. Steps run sequentially; a failing
  * step aborts unless its on_failure says otherwise.
  *
  * Step types: `log`, `query` (optionally against a JDBC `connection`, with
  * `into:` storing the scalar/rows in runtime state), `check`, `command`,
  * `copy` (single-file exact-destination semantics under `single_file:
  * true` — the reference's fix for the duplicated-filename bug, suite.cli
  * id=82), `http`, `write` (inline content to a file), `list` (glob →
  * state), `delete`, `group` (with `loop:` over a state list), and
  * `migrate` (identity-aware schema migration, suite.cli id=189).
  *
  * Runtime state mirrors the reference's `{state.<id>.*}` / `{loop.value.*}`
  * interpolation grammar.
  */
object Pipeline {

  /** `local//tmp/x` → `/tmp/x` (the reference's local-connection path
    * prefix); other URIs pass through. */
  private[repl] def normPath(p: String): String =
    if (p.startsWith("local//")) p.substring("local/".length) else p

  private type StepMap = Map[String, Object]

  private def parseSteps(raw: java.util.List[Object]): Seq[StepMap] =
    raw.asScala.toSeq.map(_.asInstanceOf[java.util.Map[String, Object]]
      .asScala.toMap)

  def parse(yamlText: String): Seq[StepMap] = {
    val root = new Yaml().load[java.util.Map[String, Object]](yamlText)
      .asScala.toMap
    parseSteps(root("steps").asInstanceOf[java.util.List[Object]])
  }

  def run(spark: SparkSession, yamlText: String): Seq[Hooks.Result] = {
    val out = collection.mutable.Buffer[Hooks.Result]()
    val state = collection.mutable.Map[String, Any]()
    runSteps(spark, parse(yamlText), state, None, out)
    out.toSeq
  }

  /** One listed file: name + full location. */
  final case class Entry(name: String, location: String)

  // ---- interpolation -----------------------------------------------------

  private def renderState(v: Any): String = v match {
    case es: Seq[_] => es.map {
      case Entry(_, loc) => loc
      case other => String.valueOf(other)
    }.mkString("[", ", ", "]")
    case other => String.valueOf(other)
  }

  private def interp(s: String, state: collection.Map[String, Any],
      loop: Option[Entry]): String = {
    var out = s
    loop.foreach { e =>
      out = out.replace("{loop.value.name}", e.name)
        .replace("{loop.value.location}", e.location)
        .replace("{loop.value}", e.location)
    }
    "\\{state\\.([A-Za-z0-9_]+)(\\.result)?\\}".r.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(
        state.get(m.group(1)).map(renderState).getOrElse(m.matched)))
  }

  // ---- execution ---------------------------------------------------------

  private def hookOf(m: StepMap, kind: String, value: String) =
    Hooks.Hook(kind, value,
      m.get("on_failure").map(_.toString).getOrElse("abort"))

  private def fail(h: Hooks.Hook, detail: String): Hooks.Result =
    if (h.onFailure == "abort") throw new IllegalStateException(detail)
    else Hooks.Result(h, ok = false, s"$detail (${h.onFailure})")

  private def runSteps(spark: SparkSession, steps: Seq[StepMap],
      state: collection.mutable.Map[String, Any], loop: Option[Entry],
      out: collection.mutable.Buffer[Hooks.Result]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def str(m: StepMap, k: String): String =
      interp(m(k).toString, state, loop)
    def opt(m: StepMap, k: String): Option[String] =
      m.get(k).map(v => interp(v.toString, state, loop))
    for (m <- steps) {
      val kind = m("type").toString
      kind match {
        case "log" | "query" | "check" | "command" | "http"
            if !m.contains("connection") && !m.contains("into") =>
          // plain hook kinds delegate to the shared interpreter
          val value = kind match {
            case "query" => str(m, "sql")
            case "check" => str(m, "expression")
            case "log" => str(m, "message")
            case "command" => str(m, "command")
            case "http" => str(m, "url")
          }
          out ++= Hooks.run(spark, Seq(hookOf(m, kind, value)))
        case "query" =>
          // JDBC-targeted query, optionally stored into state under `into:`
          // (or the step's `id:`)
          val sql = str(m, "sql")
          val h = hookOf(m, kind, sql)
          val url = opt(m, "connection").getOrElse(
            throw new IllegalArgumentException("query: connection required with into"))
          val stored = opt(m, "into").orElse(opt(m, "id"))
          try {
            if (sql.trim.toLowerCase.startsWith("select")) {
              val conn = java.sql.DriverManager.getConnection(url)
              try {
                val st = conn.createStatement()
                val rs = st.executeQuery(sql)
                val md = rs.getMetaData
                val rows = collection.mutable.Buffer[Seq[Any]]()
                while (rs.next())
                  rows += (1 to md.getColumnCount).map(rs.getObject)
                rs.close(); st.close()
                // a 1x1 result stores as a scalar (the common check shape)
                val v: Any =
                  if (rows.size == 1 && rows.head.size == 1) rows.head.head
                  else rows.toSeq
                stored.foreach(state(_) = v)
                out += Hooks.Result(h, ok = true, s"rows=${rows.size}")
              } finally conn.close()
            } else {
              graft.sources.Jdbc.execute(url, sql)
              out += Hooks.Result(h, ok = true, "query ok")
            }
          } catch {
            case e: Exception if h.onFailure != "abort" =>
              out += Hooks.Result(h, ok = false, s"${e.getMessage} (${h.onFailure})")
          }
        case "write" =>
          val to = normPath(str(m, "to"))
          val h = hookOf(m, kind, to)
          val p = new org.apache.hadoop.fs.Path(to)
          val fs = p.getFileSystem(conf)
          val os = fs.create(p, true)
          try os.write(str(m, "content").getBytes("UTF-8")) finally os.close()
          out += Hooks.Result(h, ok = true, s"wrote $to")
        case "list" =>
          val loc = normPath(str(m, "location"))
          val h = hookOf(m, kind, loc)
          val p = new org.apache.hadoop.fs.Path(loc)
          val fs = p.getFileSystem(conf)
          val onlyFiles = opt(m, "only").contains("files")
          val statuses =
            if (loc.exists(c => c == '*' || c == '?'))
              Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
            else if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
              fs.listStatus(p).toSeq
            else if (fs.exists(p)) Seq(fs.getFileStatus(p))
            else Nil
          val entries = statuses
            .filter(s => !onlyFiles || s.isFile)
            .sortBy(_.getPath.getName)
            .map(s => Entry(s.getPath.getName,
              s.getPath.toUri.getPath))
          opt(m, "id").foreach(state(_) = entries)
          out += Hooks.Result(h, ok = true,
            s"listed ${entries.size}: ${entries.map(_.location).mkString(", ")}")
        case "delete" =>
          val loc = normPath(str(m, "location"))
          val h = hookOf(m, kind, loc)
          val p = new org.apache.hadoop.fs.Path(loc)
          val fs = p.getFileSystem(conf)
          val recursive = opt(m, "recursive").exists(_.toBoolean)
          fs.delete(p, recursive)
          out += Hooks.Result(h, ok = true, s"deleted $loc")
        case "copy" =>
          val src = normPath(str(m, "from"))
          val dst = normPath(str(m, "to"))
          val h = hookOf(m, kind, s"$src > $dst")
          val sp = new org.apache.hadoop.fs.Path(src)
          val dp = new org.apache.hadoop.fs.Path(dst)
          val sfs = sp.getFileSystem(conf)
          val dfs = dp.getFileSystem(conf)
          val singleFile = opt(m, "single_file").exists(_.toBoolean) ||
            (sfs.exists(sp) && sfs.getFileStatus(sp).isFile)
          val detail =
            if (singleFile) {
              // the id=82 fix: a single-file copy resolves (lists) the
              // EXACT source path and uses `to` verbatim as the target —
              // never re-appending the source filename onto a destination
              // that already carries it
              require(sfs.exists(sp), s"copy source missing: $src")
              org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp, false, true, conf)
              s"copying single file from $src (listing path: $src) -> $dst"
            } else {
              org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp, false, true, conf)
              s"copied $src -> $dst (listing path: $src)"
            }
          opt(m, "id").foreach(state(_) = detail)
          out += Hooks.Result(h, ok = true, detail)
        case "group" =>
          val h = hookOf(m, kind, opt(m, "loop").getOrElse(""))
          val nested = parseSteps(m("steps").asInstanceOf[java.util.List[Object]])
          opt(m, "loop") match {
            case Some(expr) =>
              val key = "state\\.([A-Za-z0-9_]+)(\\.result)?".r
                .findFirstMatchIn(expr).map(_.group(1)).getOrElse(
                  throw new IllegalArgumentException(s"group loop: $expr"))
              val items = state.get(key) match {
                case Some(es: Seq[_]) => es.collect { case e: Entry => e }
                case _ => Nil
              }
              items.foreach(e => runSteps(spark, nested, state, Some(e), out))
              out += Hooks.Result(h, ok = true, s"looped ${items.size}")
            case None =>
              runSteps(spark, nested, state, loop, out)
              out += Hooks.Result(h, ok = true, s"group of ${nested.size}")
          }
        case "migrate" =>
          val h = hookOf(m, kind, str(m, "table"))
          val options = opt(m, "options")
            .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
            .getOrElse(Set("auto_increment", "primary_key", "nullable"))
          val r = SchemaMigration.migrate(spark,
            str(m, "from"), str(m, "table"),
            str(m, "to"), str(m, "target_table"),
            opt(m, "dialect").getOrElse("derby"), options)
          opt(m, "id").foreach(state(_) = r.rowsCopied)
          out += Hooks.Result(h, ok = true,
            s"Identity columns found: ${r.identityCols.size} " +
              s"(${r.identityCols.mkString(", ")}); " +
              s"Non-identity columns found: ${r.nonIdentityCols.size}; " +
              s"rows=${r.rowsCopied}; execution succeeded")
        case other =>
          out += fail(hookOf(m, kind, ""), s"unknown step type: $other")
      }
    }
  }
}
