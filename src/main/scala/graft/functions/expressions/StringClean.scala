package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot-path string transforms that have
  * no Spark built-in (reference transforms.go: `replace_accents`,
  * `replace_non_printable`). Unlike a Scala UDF these stay inside
  * whole-stage codegen: `doGenCode` emits a static call, so there is no
  * serialization boundary, no null-boxing, and the surrounding operators
  * keep their fused loop.
  */
object StringClean {

  /** Unicode-decompose and drop combining marks: "café" → "cafe". */
  def stripAccents(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    var needs = false
    var i = 0
    while (i < str.length && !needs) { if (str.charAt(i) > 0x7f) needs = true; i += 1 }
    if (!needs) return s // fast path: pure ASCII, no allocation
    UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFD).replaceAll("\\p{M}", ""))
  }

  /** Drop ISO control chars except \n and \t (transforms.go:644-717). */
  def stripNonPrintable(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    var clean = true
    var i = 0
    while (i < str.length && clean) {
      val c = str.charAt(i)
      if (Character.isISOControl(c) && c != '\n' && c != '\t') clean = false
      i += 1
    }
    if (clean) return s
    val sb = new java.lang.StringBuilder(str.length)
    str.foreach(c => if (!Character.isISOControl(c) || c == '\n' || c == '\t') sb.append(c))
    UTF8String.fromString(sb.toString)
  }

  def strip_accents(c: Column): Column =
    GraftColumnBridge.column(StripAccents(GraftColumnBridge.expression(c)))
  def strip_non_printable(c: Column): Column =
    GraftColumnBridge.column(StripNonPrintable(GraftColumnBridge.expression(c)))
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    StringClean.stripAccents(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.StringClean.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

case class StripNonPrintable(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    StringClean.stripNonPrintable(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.StringClean.stripNonPrintable($c)")
  override protected def withNewChildInternal(newChild: Expression): StripNonPrintable =
    copy(child = newChild)
}
