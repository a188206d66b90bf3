package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that hides its (genuinely deterministic) child from
  * optimizer rewrites which would DUPLICATE the child's evaluation.
  *
  * The duplication this kills (guide §4.4 — the same reason expensive
  * UDFs get `asNondeterministic()`): a Project field computed by an
  * expensive kernel, consumed by a Filter or Generate above it. The
  * optimizer infers a guard from the Generate (`InferFiltersFromGenerate`
  * adds `size(e) > 0 AND isnotnull(e)`) or takes the query's own guard
  * (`filter(size(col) >= 1)`), then `PushPredicateThroughNonJoin`
  * substitutes the alias — so the full kernel runs once in the Filter
  * condition and AGAIN in the Project output (r18 plans: the whole
  * `minhashbandsexpr(shingles(...))` signature computation appeared in
  * both, per banded-join side). Codegen does not share subexpressions
  * across operator boundaries, so that is honest 2× work per row.
  *
  * Reporting `deterministic = false` makes `PushPredicateThroughNonJoin`
  * refuse to push ANY predicate through the hosting Project
  * (`fields.forall(_.deterministic)` is its gate) and `CollapseProject`
  * refuse to inline the field into consumers — the guard then evaluates
  * the cheap ATTRIBUTE and the kernel runs exactly once.
  *
  * Why the lie is safe: the child IS deterministic (same input row, same
  * value, any number of re-evaluations), so task retries and speculative
  * duplicates recompute identical values; the flag only pessimizes
  * optimizer freedom around the hosting Project. Use it ONLY on
  * expensive kernel fields whose guards are cheap on the attribute —
  * it also blocks pushdown of genuinely selective predicates through
  * the same Project, so the query must place its own selective filters
  * BELOW the wrapped projection (DataFrame construction order already
  * does that at every call site in this repo).
  *
  * Runtime cost: zero — eval and codegen delegate to the child verbatim.
  */
object Opaque {
  def opaque(c: Column): Column =
    GraftColumnBridge.column(OpaqueExpr(GraftColumnBridge.expression(c)))
}

case class OpaqueExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: see the scaladoc above
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OpaqueExpr =
    copy(child = newChild)
}
