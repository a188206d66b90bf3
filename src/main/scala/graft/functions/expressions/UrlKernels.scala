package graft.functions.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass forms of [[graft.functions.Urls.normalizeUrl]] and
  * [[graft.functions.Urls.urlHost]].
  *
  * The Column forms execute ~11 independent regexp operations per row
  * (four `regexp_extract`s re-matching the same RFC-3986 pattern, plus
  * userinfo/www/port/path replaces), each converting the UTF8String to a
  * java.lang.String and walking an interpreted-adjacent expression tree.
  * These kernels are a RE-ORCHESTRATION, not a re-implementation: every
  * regex runs through the SAME `java.util.regex` Pattern/Matcher API
  * Spark's RegExpExtract/RegExpReplace/RLike use (so `$`-before-trailing-
  * newline, `.`-excludes-line-terminators, and find() semantics are
  * inherited, not imitated), case folding uses `UTF8String.toLowerCase`
  * (Spark's `lower`), trimming uses `UTF8String.trim()` (Spark's `trim`,
  * ASCII space only), and query-parameter ordering compares UTF8 BYTES
  * (Spark's binary `array_sort` order — java.lang.String comparison
  * would order supplementary characters differently). One String decode
  * and one RFC-pattern match per row instead of four (guide §4).
  * NULL → NULL, exactly the old `when(u.isNull, …)` head.
  */
object UrlKernels {

  def normalize_url(url: Column): Column =
    GraftColumnBridge.column(NormalizeUrl(GraftColumnBridge.expression(url)))

  def url_host(url: Column): Column =
    GraftColumnBridge.column(UrlHostOf(GraftColumnBridge.expression(url)))

  /** Group 1 = scheme, 2 = authority, 3 = path, 4 = query (no '?'). */
  private[expressions] val UrlRe: Pattern = Pattern.compile(
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$")
  private[expressions] val UserinfoRe: Pattern = Pattern.compile("^([^@]*@)")
  private[expressions] val HostPrefixRe: Pattern = Pattern.compile("^[^@]*@")
  private[expressions] val WwwRe: Pattern = Pattern.compile("^www\\..+\\.")
  private[expressions] val WwwStripRe: Pattern = Pattern.compile("^www\\.")
  private[expressions] val Port80Re: Pattern = Pattern.compile(":80$")
  private[expressions] val Port443Re: Pattern = Pattern.compile(":443$")
  private[expressions] val AnyPortRe: Pattern = Pattern.compile(":[0-9]*$")
  private[expressions] val PathSlashRe: Pattern = Pattern.compile("/+$")
  private[expressions] val AmpRe: Pattern = Pattern.compile("&")

  private def lc(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** `lower(regexp_replace(authRaw, "^[^@]*@", ""))` — the shared
    * host[:port] extraction. */
  private[expressions] def hostPortOf(authRaw: String): String =
    lc(HostPrefixRe.matcher(authRaw).replaceAll(""))

  /** `when(host.rlike("^www\\..+\\."), regexp_replace(host, "^www\\.",
    * "")).otherwise(host)`. */
  private[expressions] def stripWww(host: String): String =
    if (WwwRe.matcher(host).find()) WwwStripRe.matcher(host).replaceAll("")
    else host

  /** RegExpExtract semantics: first find; unmatched pattern OR
    * non-participating group → "". */
  private def group(m: java.util.regex.Matcher, g: Int): String = {
    val v = m.group(g)
    if (v == null) "" else v
  }

  /** The full normalizeUrl rule chain over a TRIMMED url string; null
    * never reaches here. */
  private[expressions] def normalize(u: UTF8String): UTF8String = {
    val trimmed = u.trim()
    val s = trimmed.toString
    val m = UrlRe.matcher(s)
    if (!m.find()) return trimmed // not scheme://… : trimmed passthrough
    val scheme = lc(group(m, 1))
    val authRaw = group(m, 2)
    val uiM = UserinfoRe.matcher(authRaw)
    val userinfo = if (uiM.find()) { val g = uiM.group(1); if (g == null) "" else g } else ""
    val hostNoWww = stripWww(hostPortOf(authRaw))
    val host = scheme match {
      case "http" => Port80Re.matcher(hostNoWww).replaceAll("")
      case "https" => Port443Re.matcher(hostNoWww).replaceAll("")
      case _ => hostNoWww
    }
    val path = PathSlashRe.matcher(group(m, 3)).replaceAll("")
    val query = group(m, 4)
    val queryPart =
      if (query.isEmpty) ""
      else {
        // split("&", -1) + binary-order sort + join — Spark's
        // split/array_sort/array_join over UTF8 bytes
        val parts = AmpRe.split(query, -1).map(UTF8String.fromString)
        java.util.Arrays.sort(parts,
          (a: UTF8String, b: UTF8String) => a.compareTo(b))
        "?" + parts.mkString("&")
      }
    UTF8String.fromString(scheme + "://" + userinfo + host + path + queryPart)
  }

  /** The urlHost rule chain over a TRIMMED url; null never reaches
    * here. Non-URL strings yield "". */
  private[expressions] def hostOf(u: UTF8String): UTF8String = {
    val s = u.trim().toString
    val m = UrlRe.matcher(s)
    val authRaw = if (m.find()) group(m, 2) else ""
    val host = AnyPortRe.matcher(hostPortOf(authRaw)).replaceAll("")
    UTF8String.fromString(stripWww(host))
  }
}

/** [[graft.functions.Urls.normalizeUrl]] compiled. NULL → NULL. */
case class NormalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  def compute(u: UTF8String): UTF8String = UrlKernels.normalize(u)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizeUrl", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.unsafe.types.UTF8String) $ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): NormalizeUrl =
    copy(child = newChild)
}

/** [[graft.functions.Urls.urlHost]] compiled. NULL → NULL. */
case class UrlHostOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  def compute(u: UTF8String): UTF8String = UrlKernels.hostOf(u)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlHostOf", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.unsafe.types.UTF8String) $ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): UrlHostOf =
    copy(child = newChild)
}
