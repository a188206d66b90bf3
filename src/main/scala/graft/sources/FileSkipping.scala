package graft.sources

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

/** Stats-based file skipping ("data skipping") shared by the Delta and
  * Iceberg readers. Both formats record per-file column bounds in their
  * metadata (Delta: the add action's `stats` JSON of
  * minValues/maxValues/nullCount; Iceberg: the manifest entry's
  * lower_bounds/upper_bounds byte maps) — at scale, pruning files against a
  * predicate BEFORE the scan is the difference between reading one file and
  * reading the whole table. The reference gets this for free from its
  * embedded engines (duckdb `delta_scan`/`iceberg_scan` both consume file
  * statistics); here it is an explicit metadata-level step in front of the
  * distributed parquet read, and the full predicate is still re-applied to
  * the surviving rows, so pruning is a pure optimization.
  *
  * The evaluator is deliberately CONSERVATIVE: it answers "may this file
  * contain a matching row?" and returns true whenever stats are missing,
  * a value is incomparable, or the predicate shape is not understood —
  * correctness never depends on it.
  */
object FileSkipping {

  /** Per-column bounds. Values are normalized to one of: BigDecimal,
    * String, Boolean, LocalDate, Instant — [[cmp]] handles exactly these. */
  final case class ColStats(min: Option[Any], max: Option[Any],
      nullCount: Option[Long])

  /** Per-file stats: row count + per-column bounds, keyed lowercase. */
  final case class FileStats(numRecords: Option[Long],
      cols: Map[String, ColStats]) {
    def col(name: String): Option[ColStats] = cols.get(name.toLowerCase)
  }

  val NoStats: FileStats = FileStats(None, Map.empty)

  // ---- predicate AST -----------------------------------------------------

  sealed trait Pred
  /** op ∈ {=, <, <=, >, >=, !=}; value normalized as in [[ColStats]]. */
  final case class Cmp(op: String, col: String, value: Any) extends Pred
  final case class InSet(col: String, values: Seq[Any]) extends Pred
  final case class NullCheck(col: String, isNull: Boolean) extends Pred
  final case class AndP(l: Pred, r: Pred) extends Pred
  final case class OrP(l: Pred, r: Pred) extends Pred
  /** Anything the translator does not understand — never prunes. */
  case object Opaque extends Pred

  /** Parse a SQL condition into the pruning AST. Unsupported shapes fold to
    * [[Opaque]] (no pruning) — the condition itself is still applied to the
    * scan output by the caller, so this can never drop rows. */
  def parse(condition: String): Pred =
    try translate(CatalystSqlParser.parseExpression(condition))
    catch { case scala.util.control.NonFatal(_) => Opaque }

  private def translate(e: org.apache.spark.sql.catalyst.expressions.Expression): Pred = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def attr(x: Expression): Option[String] = x match {
      case a: UnresolvedAttribute => Some(a.name)
      case Cast(a: UnresolvedAttribute, _, _, _) => Some(a.name)
      case _ => None
    }
    def lit(x: Expression): Option[Any] = x match {
      case l: Literal => normalizeLiteral(l)
      case Cast(l: Literal, _, _, _) => normalizeLiteral(l)
      case _ => None
    }
    def cmpOf(op: String, flip: String, l: Expression, r: Expression): Pred =
      (attr(l), lit(r), attr(r), lit(l)) match {
        case (Some(c), Some(v), _, _) => Cmp(op, c, v)
        case (_, _, Some(c), Some(v)) => Cmp(flip, c, v)
        case _ => Opaque
      }
    e match {
      case And(l, r) => AndP(translate(l), translate(r))
      case Or(l, r) =>
        val (tl, tr) = (translate(l), translate(r))
        // an Opaque OR-branch may match anything — the whole OR is opaque
        if (tl == Opaque || tr == Opaque) Opaque else OrP(tl, tr)
      case EqualTo(l, r) => cmpOf("=", "=", l, r)
      case LessThan(l, r) => cmpOf("<", ">", l, r)
      case LessThanOrEqual(l, r) => cmpOf("<=", ">=", l, r)
      case GreaterThan(l, r) => cmpOf(">", "<", l, r)
      case GreaterThanOrEqual(l, r) => cmpOf(">=", "<=", l, r)
      case Not(EqualTo(l, r)) => cmpOf("!=", "!=", l, r)
      case In(v, list) =>
        (attr(v), list.map {
          case l: Literal => normalizeLiteral(l)
          case _ => None
        }) match {
          case (Some(c), vs) if vs.forall(_.isDefined) =>
            FileSkipping.InSet(c, vs.map(_.get))
          case _ => Opaque
        }
      case IsNull(v) => attr(v).map(NullCheck(_, isNull = true)).getOrElse(Opaque)
      case IsNotNull(v) => attr(v).map(NullCheck(_, isNull = false)).getOrElse(Opaque)
      case _ => Opaque
    }
  }

  /** Catalyst literal → comparison-domain value (see [[ColStats]]). */
  private def normalizeLiteral(l: org.apache.spark.sql.catalyst.expressions.Literal): Option[Any] = {
    import org.apache.spark.sql.types._
    if (l.value == null) return None
    l.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(BigDecimal(l.value.toString))
      case FloatType | DoubleType =>
        val d = l.value.toString.toDouble
        if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
      case _: DecimalType =>
        Some(l.value.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal)
      case StringType => Some(l.value.toString)
      case BooleanType => Some(l.value.asInstanceOf[Boolean])
      case DateType => Some(LocalDate.ofEpochDay(l.value.toString.toLong))
      case TimestampType | TimestampNTZType =>
        val micros = l.value.toString.toLong
        Some(Instant.EPOCH.plusSeconds(math.floorDiv(micros, 1000000L))
          .plusNanos(math.floorMod(micros, 1000000L) * 1000L))
      case _ => None
    }
  }

  // ---- evaluation --------------------------------------------------------

  /** Three-valued comparison: None = incomparable (caller keeps the file). */
  private[sources] def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case (x: LocalDate, y: LocalDate) => Some(x.compareTo(y))
    case (x: Instant, y: Instant) => Some(x.compareTo(y))
    // Delta stats carry dates/timestamps as JSON strings
    case (x: String, y: LocalDate) =>
      try Some(LocalDate.parse(x.take(10)).compareTo(y))
      catch { case _: Exception => None }
    case (x: String, y: Instant) =>
      try Some(parseInstant(x).compareTo(y)) catch { case _: Exception => None }
    case _ => None
  }

  private def parseInstant(s: String): Instant = {
    val t = s.replace(' ', 'T')
    if (t.endsWith("Z") || t.contains("+")) Instant.parse(t)
    else Instant.parse(t + "Z")
  }

  /** May this file contain a row matching `p`? Conservative: true unless
    * the stats PROVE no row can match. */
  def mayContain(p: Pred, stats: FileStats): Boolean = p match {
    case Opaque => true
    case AndP(l, r) => mayContain(l, stats) && mayContain(r, stats)
    case OrP(l, r) => mayContain(l, stats) || mayContain(r, stats)
    case NullCheck(c, true) =>
      stats.col(c).flatMap(_.nullCount).forall(_ > 0)
    case NullCheck(c, false) =>
      (stats.numRecords, stats.col(c).flatMap(_.nullCount)) match {
        case (Some(n), Some(nulls)) => nulls < n
        case _ => true
      }
    case InSet(c, vs) => vs.isEmpty || vs.exists(v => mayContain(Cmp("=", c, v), stats))
    case Cmp(op, c, v) => stats.col(c) match {
      case None => true
      case Some(cs) =>
        // min/max bounds ignore nulls; a file of only nulls has no bounds
        // and stays kept (no non-null row matches, which is fine — keeping
        // is always safe)
        val lo = cs.min.flatMap(cmp(_, v))
        val hi = cs.max.flatMap(cmp(_, v))
        op match {
          case "=" => lo.forall(_ <= 0) && hi.forall(_ >= 0)
          case "<" => lo.forall(_ < 0)
          case "<=" => lo.forall(_ <= 0)
          case ">" => hi.forall(_ > 0)
          case ">=" => hi.forall(_ >= 0)
          case "!=" => !(lo.contains(0) && hi.contains(0))
          case _ => true
        }
    }
  }

  /** A serialized partition/stats value string → the comparison domain for
    * `dt` (see [[ColStats]]). None = unparseable (no pruning on it). */
  def domainValue(s: String,
      dt: org.apache.spark.sql.types.DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    try dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType => Some(BigDecimal(s))
      case StringType => Some(s)
      case BooleanType => Some(s.toBoolean)
      case DateType => Some(LocalDate.parse(s.take(10)))
      case TimestampType | TimestampNTZType => Some(parseInstant(s))
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Rewrite predicate column names through `rename` (logical → physical,
    * for Delta column mapping). A column with no mapping keeps its name. */
  def renameCols(p: Pred, rename: Map[String, String]): Pred = {
    def rn(c: String): String = rename.getOrElse(c.toLowerCase, c)
    p match {
      case Cmp(op, c, v) => Cmp(op, rn(c), v)
      case InSet(c, vs) => InSet(rn(c), vs)
      case NullCheck(c, n) => NullCheck(rn(c), n)
      case AndP(l, r) => AndP(renameCols(l, rename), renameCols(r, rename))
      case OrP(l, r) => OrP(renameCols(l, rename), renameCols(r, rename))
      case Opaque => Opaque
    }
  }
}
