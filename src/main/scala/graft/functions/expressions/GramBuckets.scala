package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the md5-bucket hashed-gram machinery shared by
  * [[graft.functions.Dsir]] and [[graft.functions.QualityModel]].
  *
  * The contract value is `pmod(conv(substring(md5(gram), 1, 4), 16, 10)
  * .cast("int"), nBuckets)` — i.e. the first 16 BITS of the md5 digest,
  * mod nBuckets. The builtin chain materializes the full 32-char hex
  * string, substrings it, and re-parses the hex — per gram; and the
  * scoring fold wraps it in `aggregate(transform(...))`, which Catalyst
  * evaluates INTERPRETED (HigherOrderFunction is CodegenFallback).
  * These expressions read the two digest bytes directly and run the
  * whole fold as one compiled loop — same md5, same arithmetic, same
  * null semantics, bit-identical output (guide §4: prefer
  * codegen-friendly expressions in hot paths).
  */
object GramBuckets {

  def gram_bucket(gram: Column, nBuckets: Int): Column =
    GraftColumnBridge.column(
      GramBucket(GraftColumnBridge.expression(gram), nBuckets))

  def bucket_weight_sum(grams: Column, weights: Column, nBuckets: Int): Column =
    GraftColumnBridge.column(BucketWeightSum(
      GraftColumnBridge.expression(grams),
      GraftColumnBridge.expression(weights), nBuckets))

  // MessageDigest is stateful; in local mode one expression instance can
  // be referenced by many concurrently-running tasks — one digest per
  // thread, reset() per use
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 16 bits of md5(gram) mod nBuckets — exactly
    * `pmod(conv(substring(md5(g),1,4),16,10).cast("int"), n)`: the 4 hex
    * chars are the big-endian rendering of digest bytes 0..1, and the
    * value is non-negative so pmod degenerates to %. */
  private[expressions] def bucketOf(g: UTF8String, nBuckets: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest(g.getBytes)
    (((digest(0) & 0xff) << 8) | (digest(1) & 0xff)) % nBuckets
  }
}

/** md5-prefix hash bucket of one gram ([[graft.functions.Dsir.gramBucket]]
  * compiled). NULL gram → NULL, like the builtin chain. */
case class GramBucket(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets > 0 && nBuckets <= 65536,
    s"nBuckets must be in (0, 65536], got $nBuckets")
  override def dataType: DataType = IntegerType

  def compute(g: UTF8String): Int = GramBuckets.bucketOf(g, nBuckets)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramBucket", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): GramBucket =
    copy(child = newChild)
}

/** Σ over a gram array of `weights[bucket(gram) + 1]` — the compiled form
  * of `aggregate(transform(grams, g => element_at(weights,
  * gramBucket(g, n) + 1)), 0L, (acc, v) => acc + v)`. Null semantics
  * mirror the original exactly: NULL array or NULL weights → NULL; a
  * NULL gram element makes element_at's index NULL → NULL element → the
  * running sum poisons to NULL; an out-of-range index cannot occur when
  * `weights.length == nBuckets` (enforced by callers), but a NULL
  * weights ELEMENT poisons the sum the same way element_at would. */
case class BucketWeightSum(left: Expression, right: Expression, nBuckets: Int)
    extends BinaryExpression {
  require(nBuckets > 0 && nBuckets <= 65536,
    s"nBuckets must be in (0, 65536], got $nBuckets")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  def compute(grams: ArrayData, weights: ArrayData): java.lang.Long = {
    val n = grams.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (grams.isNullAt(i)) return null
      val b = GramBuckets.bucketOf(grams.getUTF8String(i), nBuckets)
      // contract violation (weights shorter than nBuckets): the old
      // element_at chain returned NULL, never AIOOBE — preserve that
      if (b >= weights.numElements()) return null
      if (weights.isNullAt(b)) return null
      acc += weights.getLong(b)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketWeightSum", this)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long $r = $ref.compute($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketWeightSum =
    copy(left = newLeft, right = newRight)
}
