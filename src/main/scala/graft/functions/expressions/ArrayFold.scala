package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sequential-fold vector kernels for the similarity family.
  *
  * The original forms — `aggregate(zip_with(a, b, (x, y) => …), 0.0,
  * (acc, v) => acc + v)` — are higher-order functions, which Catalyst
  * evaluates INTERPRETED (HigherOrderFunction is CodegenFallback): every
  * element pays lambda-variable binding plus an interpreted expression
  * tree, and the zip_with materializes an intermediate array per row.
  * These expressions run the identical fold as one compiled loop — same
  * element order, same double widening, same IEEE operations — so
  * results are bit-identical while the per-pair cost drops an order of
  * magnitude (guide §4: prefer codegen-friendly expressions in hot
  * paths; the ANN encode/scan and brute-force recall gates evaluate one
  * of these per (row, centroid/candidate)).
  *
  * Null semantics mirror the HOF originals exactly: a NULL array → NULL;
  * arrays of different lengths → NULL (zip_with pads the shorter side
  * with NULL, and the null product poisons the running sum); a NULL
  * element → NULL for the same reason. Element types float and double
  * are both accepted (the originals cast each element to double).
  */
object ArrayFold {

  def fold_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      FoldDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def fold_l2sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      FoldL2Sq(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  private[expressions] def isFloatElem(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"fold kernels take array<float|double>, got $other")
    }
}

/** Σ_i (double)a(i) · (double)b(i), folded left to right. */
case class FoldDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val leftFloat = ArrayFold.isFloatElem(left)
  private lazy val rightFloat = ArrayFold.isFloatElem(right)

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("foldDot", this)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $r = $ref.compute($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FoldDot =
    copy(left = newLeft, right = newRight)
}

/** Σ_i ((double)a(i) − (double)b(i))², folded left to right. */
case class FoldL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val leftFloat = ArrayFold.isFloatElem(left)
  private lazy val rightFloat = ArrayFold.isFloatElem(right)

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("foldL2Sq", this)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $r = $ref.compute($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FoldL2Sq =
    copy(left = newLeft, right = newRight)
}
