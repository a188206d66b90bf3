package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass C4 line cleaning — the compiled form of
  * [[graft.functions.TextAnalysis]]'s
  * {{{
  *   kept  = filter(split(text, "\n"), l => l.rlike("[.!?\"]$")
  *             && size(split(l, " ")) >= minWords
  *             && !lower(l).contains("javascript"))
  *   c4CleanedText = array_join(kept, "\n")
  *   c4KeptLines   = size(kept)
  *   c4DroppedLines = size(split(text, "\n")) - size(kept)
  * }}}
  * The filter HOF evaluated interpreted per line, and the three public
  * helpers each re-split and re-filtered the document — the td_quality_c4
  * projection ran the whole pass three times. This expression computes
  * kept text and both counts in ONE pass and the helpers read struct
  * fields off it (one evaluation per row under projection-level
  * subexpression elimination).
  *
  * Exactness notes (guide §4 discipline):
  *   - line split: '\n' is a single byte that never occurs inside a
  *     UTF-8 multibyte sequence; segments = Java `split("\n", -1)`
  *     (trailing empties kept), byte-scan equivalent.
  *   - terminal-punctuation test: the SAME `java.util.regex` pattern
  *     rlike compiled, via matcher.find — inherits `$`'s
  *     before-final-line-terminator quirk verbatim.
  *   - word count: `size(split(l, " "))` = 0x20 count + 1 (single-space
  *     regex, limit −1).
  *   - javascript test: UTF8String.toLowerCase + contains, the exact
  *     Lower/Contains path.
  *   - NULL text → NULL (all the old forms were null-intolerant).
  */
object C4Lines {

  def c4_line_stats(text: Column, minWords: Int): Column =
    GraftColumnBridge.column(
      C4LineStats(GraftColumnBridge.expression(text), minWords))
}

case class C4LineStats(child: Expression, minWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("kept", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_total", IntegerType, nullable = false)))

  @transient private lazy val termPat =
    java.util.regex.Pattern.compile("[.!?\"]$")
  @transient private lazy val jsNeedle = UTF8String.fromString("javascript")

  private def keep(line: UTF8String): Boolean = {
    // cheap word-count gate first, then the regex, then the lowercase
    // scan — pure predicates, so evaluation order is unobservable
    val bytes = line.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) spaces += 1
      i += 1
    }
    if (spaces + 1 < minWords) return false
    if (!termPat.matcher(line.toString).find(0)) return false
    !line.toLowerCase.contains(jsNeedle)
  }

  def compute(t: UTF8String): InternalRow = {
    val bytes = t.getBytes
    val keptBuf = new java.util.ArrayList[UTF8String]()
    var nTotal = 0
    var keptBytes = 0
    var i = 0
    var segStart = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x0a) {
        val line = UTF8String.fromBytes(bytes, segStart, i - segStart)
        nTotal += 1
        if (keep(line)) {
          keptBuf.add(line)
          keptBytes += line.numBytes
        }
        segStart = i + 1
      }
      i += 1
    }
    val nKept = keptBuf.size()
    val joined =
      if (nKept == 0) UTF8String.EMPTY_UTF8
      else {
        val buf = new Array[Byte](keptBytes + (nKept - 1))
        var pos = 0
        var k = 0
        while (k < nKept) {
          if (k > 0) { buf(pos) = 0x0a; pos += 1 }
          val l = keptBuf.get(k)
          l.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += l.numBytes
          k += 1
        }
        UTF8String.fromBytes(buf)
      }
    new GenericInternalRow(Array[Any](joined, nKept, nTotal))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("c4LineStats", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): C4LineStats =
    copy(child = newChild)
}
