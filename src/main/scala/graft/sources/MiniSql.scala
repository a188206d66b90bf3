package graft.sources

import java.io.IOException

/** Shared SQL-evaluation core for the loopback wire-protocol fixtures
  * ([[LoopbackPg]], [[LoopbackMysql]]). Each fixture keeps its own
  * protocol framing (that's what the tests exercise); the table store
  * and the statement grammar the graft clients actually issue — CREATE /
  * DROP / TRUNCATE, INSERT … VALUES, SELECT with conjunctive range
  * WHERE + min/max/count + ORDER BY/LIMIT, and bulk-append of
  * text-format lines — live here once.
  *
  * Rows are held in the engine's text wire form (both protocols are
  * text-format on these paths); comparisons parse per the column's
  * engine-specific type code, where the only distinction that matters is
  * numeric-vs-lexical (ISO dates/timestamps compare lexically).
  */
private[sources] object MiniSql {

  /** name, engine type code, engine type modifier (-1 = none). */
  final case class Col(name: String, code: Int, typmod: Int = -1)

  sealed trait Result
  /** A result set: fields + text rows + completion tag. */
  final case class Rows(fields: Seq[Col], rows: Seq[Seq[Option[String]]],
      tag: String) extends Result
  /** A statement with no result set. */
  final case class Done(tag: String) extends Result

  /** @param numeric    type codes that compare numerically
    * @param typeOf     DDL type text → (code, typmod)
    * @param textCode   code for untyped/text columns (CREATE default)
    * @param countCode  code for count(*) results (engine's int8)
    * @param temporal   datetime codes: text compares after normalizing
    *                   the ISO 'T' separator to ' ', so a fixture
    *                   storing `2024-01-01T06:30` and a client predicate
    *                   rendering `2024-01-01 06:30:00` order the way a
    *                   real engine's TYPED comparison would
    */
  final class Store(numeric: Int => Boolean, typeOf: String => (Int, Int),
      textCode: Int, countCode: Int,
      temporal: Int => Boolean = _ => false) {

    final class Table(val cols: Seq[Col]) {
      val rows = new java.util.Vector[Seq[Option[String]]]()
      def oidOf(c: String): Int = cols.find(_.name.equalsIgnoreCase(c))
        .map(_.code).getOrElse(textCode)
      def idxOf(c: String): Int = {
        val i = cols.indexWhere(_.name.equalsIgnoreCase(c))
        if (i < 0) throw new IOException(s"column $c does not exist")
        i
      }
    }

    private val tables =
      new java.util.concurrent.ConcurrentHashMap[String, Table]()

    private def norm(name: String): String =
      name.toLowerCase.stripPrefix("public.").replaceAll("[\"`]", "")
        .replaceAll("^[\\w]+\\.", "")

    def define(table: String, cols: Seq[Col]): Unit =
      tables.put(norm(table), new Table(cols))

    def resolve(name: String): Table = {
      val t = tables.get(norm(name))
      if (t == null)
        throw new IOException(s"""relation "$name" does not exist""")
      t
    }
    def exists(name: String): Boolean = tables.containsKey(norm(name))
    def drop(name: String): Unit = tables.remove(norm(name))

    def rowCount(table: String): Int =
      Option(tables.get(norm(table))).map(_.rows.size).getOrElse(0)

    def textRows(table: String): Seq[Seq[Option[String]]] = {
      import scala.jdk.CollectionConverters._
      resolve(table).rows.asScala.toSeq
    }

    def appendText(t: Table, vals: Seq[Option[String]],
        idx: Seq[Int]): Unit = {
      val full = Array.fill[Option[String]](t.cols.size)(None)
      idx.zip(vals).foreach { case (i, v) => full(i) = v }
      t.rows.add(full.toSeq)
    }

    // ---- statement grammar ------------------------------------------------

    private val SelectRe =
      """(?is)SELECT\s+(.*?)\s+FROM\s+([\w"`\.]+)(?:\s+WHERE\s+(.*?))?(?:\s+ORDER\s+BY\s+([\w"`]+)(\s+DESC)?)?(?:\s+LIMIT\s+(\d+))?\s*""".r
    private val InsertRe =
      """(?is)INSERT\s+INTO\s+([\w"`\.]+)\s*\(([^)]*)\)\s*VALUES\s*(.*)""".r
    private val CreateRe =
      """(?is)CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w"`\.]+)\s*\((.*)\)\s*""".r
    private val AggRe =
      """(?i)(min|max|count)\s*\(\s*([\w"`\*]+)\s*\)(?:\s+AS\s+([\w"`]+))?""".r

    private def compare(a: String, b: String, code: Int): Int =
      if (numeric(code)) BigDecimal(a).compare(BigDecimal(b))
      else if (temporal(code)) tparse(a).compareTo(tparse(b))
      else a.compareTo(b)

    /** Parse a temporal text in either the fixture's ISO 'T' render or
      * a client predicate's space render, with or without seconds /
      * fraction — engines compare datetimes as TYPED values, so the
      * fixture must too (prefix string-compare would rank
      * `07:45` below `07:45:00`). */
    private val TFlex = new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd HH:mm")
      .optionalStart().appendPattern(":ss").optionalEnd()
      .optionalStart()
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 9, true)
      .optionalEnd()
      .toFormatter

    private def tparse(s: String): java.time.LocalDateTime = {
      val t = s.replace('T', ' ').trim
      if (t.length <= 10) java.time.LocalDate.parse(t).atStartOfDay
      else java.time.LocalDateTime.parse(t, TFlex)
    }

    private def parseLiteral(tok: String): Option[String] = {
      val t = tok.trim
      if (t.equalsIgnoreCase("null")) None
      else if (t.startsWith("'") && t.endsWith("'"))
        Some(t.substring(1, t.length - 1).replace("''", "'"))
      else Some(t)
    }

    /** Split on top-level commas (quote- and paren-aware). */
    def splitTop(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0; var inQ = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'') { inQ = !inQ; cur.append(c) }
        else if (!inQ && c == '(') { depth += 1; cur.append(c) }
        else if (!inQ && c == ')') { depth -= 1; cur.append(c) }
        else if (!inQ && c == ',' && depth == 0) {
          out += cur.toString; cur.clear()
        }
        else cur.append(c)
        i += 1
      }
      if (cur.nonEmpty) out += cur.toString
      out.toSeq
    }

    private def stripQ(s: String): String = s.replaceAll("[\"`]", "")

    /** Peel balanced wrapping parens off one conjunct — clients compose
      * watermark predicates as `(existing) AND (cond)`. */
    private def stripParens(c0: String): String = {
      var c = c0.trim
      def balanced(s: String): Boolean = {
        var depth = 0
        s.foreach { ch =>
          if (ch == '(') depth += 1
          else if (ch == ')') { depth -= 1; if (depth < 0) return false }
        }
        depth == 0
      }
      while (c.startsWith("(") && c.endsWith(")") &&
        balanced(c.substring(1, c.length - 1))) c = c.substring(1, c.length - 1).trim
      c
    }

    /** Evaluate one non-bulk statement. Bulk loads (COPY / LOAD DATA)
      * are protocol-level flows the callers handle themselves, feeding
      * lines through [[appendText]]. */
    def run(sql: String): Result = sql match {
      case CreateRe(name, colsDef) =>
        if (!exists(name)) {
          val cols = splitTop(colsDef).map(_.trim).filter(_.nonEmpty)
            .filterNot(c => c.toUpperCase.startsWith("PRIMARY KEY") ||
              c.toUpperCase.startsWith("CONSTRAINT"))
            .map { c =>
              val parts = c.split("\\s+", 2)
              val (code, typmod) = typeOf(parts.lift(1).getOrElse("text"))
              Col(stripQ(parts(0)), code, typmod)
            }
          define(name, cols)
        }
        Done("CREATE TABLE")

      case d if d.toUpperCase.startsWith("DROP TABLE") =>
        drop(d.split("\\s+").last)
        Done("DROP TABLE")

      case t if t.toUpperCase.startsWith("TRUNCATE") =>
        resolve(t.split("\\s+").last).rows.clear()
        Done("TRUNCATE TABLE")

      case b if b.toUpperCase.matches("BEGIN|COMMIT|ROLLBACK|SET\\b.*") =>
        Done(b.split("\\s+")(0).toUpperCase)

      case InsertRe(name, colList, valuesPart) =>
        val t = resolve(name)
        val idx = colList.split(",").map(c => t.idxOf(stripQ(c.trim))).toSeq
        var n = 0
        splitTop(valuesPart).map(_.trim).foreach { tuple =>
          require(tuple.startsWith("(") && tuple.endsWith(")"),
            s"bad VALUES tuple: $tuple")
          appendText(t,
            splitTop(tuple.substring(1, tuple.length - 1)).map(parseLiteral),
            idx)
          n += 1
        }
        Done(s"INSERT 0 $n")

      case SelectRe(proj, name, whereOpt, orderOpt, descOpt, limitOpt) =>
        val t = resolve(name)
        import scala.jdk.CollectionConverters._
        var rows: Seq[Seq[Option[String]]] = t.rows.asScala.toSeq

        Option(whereOpt).filter(_ != null).foreach { w =>
          w.split("(?i)\\s+AND\\s+").foreach { cond0 =>
            val cond = stripParens(cond0)
            val m = """([\w"`\.]+)\s*(>=|<=|<>|!=|=|>|<)\s*(.+)""".r
              .findFirstMatchIn(cond).getOrElse(
                throw new IOException(s"unsupported predicate: $cond"))
            val i = t.idxOf(stripQ(m.group(1)))
            val code = t.cols(i).code
            val lit = parseLiteral(m.group(3)).getOrElse(
              throw new IOException("NULL comparison unsupported"))
            val op = m.group(2)
            rows = rows.filter(_(i) match {
              case None => false
              case Some(v) =>
                val c = compare(v, lit, code)
                op match {
                  case ">=" => c >= 0
                  case "<=" => c <= 0
                  case ">" => c > 0
                  case "<" => c < 0
                  case "=" => c == 0
                  case "<>" | "!=" => c != 0
                }
            })
          }
        }

        val projTrim = proj.trim
        if (AggRe.findFirstIn(projTrim).isDefined && projTrim != "*") {
          val aggs = splitTop(projTrim).map(_.trim).map { a =>
            val m = AggRe.findFirstMatchIn(a).getOrElse(
              throw new IOException(s"unsupported projection: $a"))
            (m.group(1).toLowerCase, stripQ(m.group(2)),
              Option(m.group(3)).map(stripQ).getOrElse(m.group(1).toLowerCase))
          }
          val fields = aggs.map { case (fn, col, alias) =>
            if (fn == "count") Col(alias, countCode)
            else t.cols(t.idxOf(col)).copy(name = alias) // keep the typmod
          }
          val vals = aggs.map { case (fn, col, _) =>
            if (fn == "count") Some(rows.size.toString)
            else {
              val i = t.idxOf(col)
              val code = t.cols(i).code
              val present = rows.flatMap(_(i))
              if (present.isEmpty) None
              else Some(if (fn == "min")
                present.reduce((a, b) =>
                  if (compare(a, b, code) <= 0) a else b)
              else
                present.reduce((a, b) =>
                  if (compare(a, b, code) >= 0) a else b))
            }
          }
          Rows(fields, Seq(vals), "SELECT 1")
        } else {
          val (names, idx) =
            if (projTrim == "*") (t.cols.map(_.name), t.cols.indices.toSeq)
            else {
              val cs = projTrim.split(",").map(c => stripQ(c.trim)).toSeq
              (cs, cs.map(t.idxOf))
            }
          Option(orderOpt).filter(_ != null).foreach { oc =>
            val i = t.idxOf(stripQ(oc))
            val code = t.cols(i).code
            rows = rows.sortWith { (a, b) =>
              (a(i), b(i)) match {
                case (None, None) => false
                case (None, _) => true
                case (_, None) => false
                case (Some(x), Some(y)) => compare(x, y, code) < 0
              }
            }
            if (descOpt != null) rows = rows.reverse
          }
          Option(limitOpt).filter(_ != null)
            .foreach(l => rows = rows.take(l.toInt))
          Rows(names.zip(idx).map { case (n, i) => t.cols(i).copy(name = n) },
            rows.map(r => idx.map(r(_))), s"SELECT ${rows.size}")
        }

      case other =>
        throw new IOException(s"unsupported statement: ${other.take(80)}")
    }
  }

  /** COPY/LOAD-DATA text-format unescape shared by both fixtures:
    * `\N` → NULL, `\t` `\n` `\r` `\\` escapes. */
  def unescapeText(s: String): Option[String] = {
    if (s == "\\N") None
    else if (!s.contains('\\')) Some(s)
    else {
      val b = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 't' => b.append('\t'); i += 2
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case '\\' => b.append('\\'); i += 2
            case other => b.append(other); i += 2
          }
        } else { b.append(c); i += 1 }
      }
      Some(b.toString)
    }
  }

  /** Incremental line splitter for bulk-load streams: buffer chunks,
    * emit complete lines, flush the trailing partial at end. */
  final class LineAssembler(onLine: String => Unit) {
    private val pending = new StringBuilder
    def push(chunk: String): Unit = {
      pending.append(chunk)
      var nl = pending.indexOf("\n")
      while (nl >= 0) {
        emit(pending.substring(0, nl))
        pending.delete(0, nl + 1)
        nl = pending.indexOf("\n")
      }
    }
    def finish(): Unit = {
      if (pending.nonEmpty) emit(pending.toString)
      pending.clear()
    }
    private def emit(line: String): Unit =
      if (line != "\\.") onLine(line)
  }
}
