package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native argmin/ranking kernels for the ANN coarse-quantizer and PQ
  * encode paths.
  *
  * The original forms wrap compiled folds in `transform(...)` +
  * `array_sort(...)` + `element_at(...).getField(...)`: the transform
  * evaluates INTERPRETED per codebook entry / centroid (and re-evaluates
  * captured expressions like `norm(v)` per element — no CSE crosses a
  * lambda boundary), and each row materializes + sorts a struct array
  * just to take its head. These kernels run the identical
  * computation — same fold order, same IEEE ops, same
  * (key asc, index asc) tie-breaks under Spark's double ordering
  * (NaN greatest, -0.0 == 0.0, exactly `SQLOrderingUtil.compareDoubles`)
  * — as one compiled pass (guide §4).
  *
  * Contract: vectors and codebook/centroid entries are non-null,
  * null-element-free, and dimension-matched (the embedding-operator
  * corpus contract; [[graft.KernelEquivalenceSpec]] pins equality on
  * that domain, including NaN/zero-norm cells). NULL top-level inputs
  * → NULL, as before.
  */
object VectorCells {

  def arg_min_l2(sub: Column, codebook: Column): Column =
    GraftColumnBridge.column(ArgMinL2(
      GraftColumnBridge.expression(sub), GraftColumnBridge.expression(codebook)))

  def sorted_cells(vec: Column, cents: Column): Column =
    GraftColumnBridge.column(SortedCells(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cents)))

  /** Spark's SQLOrderingUtil.compareDoubles: -0.0 == 0.0, NaN greatest
    * (and equal to itself) — NOT java.lang.Double.compare, which orders
    * -0.0 < 0.0. */
  private[expressions] def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0
    else if (x < y) -1
    else if (x > y) 1
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1

  private[expressions] def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    out
  }

  /** Left-to-right Σ x_i·y_i — identical to [[FoldDot]]'s fold. */
  private[expressions] def dot(x: Array[Double], y: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i) * y.getDouble(i); i += 1 }
    acc
  }
}

/** 0-based argmin-L2 code of `sub` against `codebook`
  * (array<array<double>>): the compiled form of
  * `element_at(array_sort(transform(cb, (cent, j) =>
  * struct(fold_l2sq(sub, cent).as("d2"), j.as("j")))), 1).getField("j")`
  * — ties on d2 go to the lowest j, exactly the ascending struct sort's
  * head. Empty codebook → NULL (element_at past the end). */
case class ArgMinL2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  private lazy val subFloat = ArrayFold.isFloatElem(left)

  def compute(sub: ArrayData, cb: ArrayData): java.lang.Integer = {
    val k = cb.numElements()
    if (k == 0) return null
    val x = VectorCells.toDoubles(sub, subFloat)
    var best = 0
    var bestD = java.lang.Double.NaN
    var j = 0
    while (j < k) {
      val cent = cb.getArray(j)
      // dimension contract (a shorter entry threw a bare AIOOBE, a
      // longer one silently truncated — the old zip_with form produced a
      // deterministic NULL-d2 sort instead): fail loudly with the name
      assert(cent.numElements() == x.length,
        s"ArgMinL2: codebook entry $j has dim ${cent.numElements()}, " +
          s"subvector has dim ${x.length}")
      var acc = 0.0
      var i = 0
      while (i < x.length) {
        val d = x(i) - cent.getDouble(i)
        acc += d * d
        i += 1
      }
      if (j == 0 || VectorCells.cmpDouble(acc, bestD) < 0) {
        best = j; bestD = acc
      }
      j += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argMinL2", this)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Integer $r = $ref.compute($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.intValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinL2 =
    copy(left = newLeft, right = newRight)
}

/** Centroid cell ids sorted by cosine rank: the compiled form of
  * `transform(array_sort(transform(cents, c => struct((-(dot(v, c.cvec)
  * / (norm(v) * c.cnorm))).as("negs"), c.cell.as("cell")))), x =>
  * x.getField("cell"))` over `cents: array<struct<cell:int,
  * cvec:array<double>, cnorm:double>>`. norm(v) is computed ONCE (the
  * lambda form re-evaluated it per centroid — same value, wasted work).
  * Best cell = element 1; probe list = slice(…, 1, nprobe). */
case class SortedCells(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val vecFloat = ArrayFold.isFloatElem(left)

  def compute(v: ArrayData, cents: ArrayData): ArrayData = {
    val x = VectorCells.toDoubles(v, vecFloat)
    var nv = 0.0
    var i = 0
    while (i < x.length) { nv += x(i) * x(i); i += 1 }
    val normv = math.sqrt(nv)
    val k = cents.numElements()
    val negs = new Array[Double](k)
    val cells = new Array[Int](k)
    var j = 0
    while (j < k) {
      val st = cents.getStruct(j, 3)
      cells(j) = st.getInt(0)
      // dimension contract: fail loudly naming the centroid, not with a
      // bare AIOOBE (or a silent truncation for longer entries)
      assert(st.getArray(1).numElements() == x.length,
        s"SortedCells: centroid cell ${st.getInt(0)} has dim " +
          s"${st.getArray(1).numElements()}, vector has dim ${x.length}")
      negs(j) = -(VectorCells.dot(x, st.getArray(1)) / (normv * st.getDouble(2)))
      j += 1
    }
    // sort index permutation by (negs, cell) under Spark double ordering
    val idx = (0 until k).toArray
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (a: Integer, b: Integer) => {
      val c = VectorCells.cmpDouble(negs(a), negs(b))
      if (c != 0) c else Integer.compare(cells(a), cells(b))
    })
    val out = new Array[Int](k)
    i = 0
    while (i < k) { out(i) = cells(boxed(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedCells", this)
    defineCodeGen(ctx, ev, (a, b) =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCells =
    copy(left = newLeft, right = newRight)
}
