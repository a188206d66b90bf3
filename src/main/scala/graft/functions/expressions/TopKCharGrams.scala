package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document rank-ordered character-n-gram profile, computed as a
  * pure per-row function.
  *
  * [[graft.functions.LangIdNgram.classify]] used to build each
  * document's profile DISTRIBUTEDLY: explode every character n-gram
  * occurrence, groupBy(doc, gram) count, then a per-doc window
  * row_number to rank and keep the top k — two Exchanges (hash
  * aggregate + window sort) carrying every gram occurrence in the
  * corpus, for a quantity that only ever depends on the document's own
  * text. This kernel counts and ranks in one compiled pass per row,
  * removing both Exchanges and the corpus-gram explode outright
  * (guide §2.4).
  *
  * Identical ranking: occurrences counted over the same char n-grams
  * ([[CharNgrams]]' offsets — code-point positions, O(len)), ranked by
  * (count desc, gram ascending in BINARY UTF8 order) exactly like the
  * old `row_number over (orderBy __c.desc, __g)`, ranks 1-based, at
  * most k entries. Fewer than n chars → empty array (the old explode
  * emitted no rows, leaving the doc absent — `inline` of an empty
  * array is the same absence). NULL text → NULL (callers guard as the
  * old charGrams-based form did via its coalesce-to-empty).
  */
object TopKCharGrams {
  def top_k_char_grams(text: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(TopKCharGramsExpr(
      GraftColumnBridge.expression(text), n, k))
}

case class TopKCharGramsExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n >= 1 && k >= 1, s"n and k must be >= 1, got n=$n k=$k")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("__g", StringType, nullable = false),
    StructField("__dr", IntegerType, nullable = false))),
    containsNull = false)

  def compute(t: UTF8String): ArrayData = {
    val bytes = t.getBytes
    val offs = TextGrams.charOffsets(bytes)
    val chars = offs.length - 1
    if (chars < n) return TextGrams.EmptyStringArray
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var w = 0
    while (w <= chars - n) {
      val g = UTF8String.fromBytes(bytes, offs(w), offs(w + n) - offs(w))
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1)) else c(0) += 1
      w += 1
    }
    val entries = new Array[java.util.Map.Entry[UTF8String, Array[Int]]](
      counts.size())
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { entries(i) = it.next(); i += 1 }
    // (count desc, gram binary asc) — the row_number order
    java.util.Arrays.sort(entries,
      (a: java.util.Map.Entry[UTF8String, Array[Int]],
       b: java.util.Map.Entry[UTF8String, Array[Int]]) => {
        val c = Integer.compare(b.getValue()(0), a.getValue()(0))
        if (c != 0) c else a.getKey.compareTo(b.getKey)
      })
    val m = math.min(k, entries.length)
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      out(i) = new GenericInternalRow(
        Array[Any](entries(i).getKey, i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topKCharGrams", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): TopKCharGramsExpr =
    copy(child = newChild)
}
