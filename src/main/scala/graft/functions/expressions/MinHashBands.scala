package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused MinHash signature + LSH banding over a document's own shingle
  * array — the whole per-document signature in ONE compiled projection.
  *
  * The prior shape ([[graft.functions.Dedup]] `signatures`) exploded the
  * shingles and ran a groupBy(doc) with k = bands·rowsPerBand
  * `min(xxhash64(xxhash64(shingle), i))` aggregates: per exploded row it
  * paid k agg-buffer updates, and the aggregation cost one Exchange of
  * |docs|·k columns plus the hash-aggregate machinery. (The r15 attempt
  * at a projection form — k separate `array_min(transform(...))`
  * columns — overflowed the codegen method-size limit and fell back to
  * interpreted eval, measured 1.7× SLOWER; ONE kernel call has no such
  * blowup.) This expression computes the identical k minima and band
  * hashes in a single pass, REMOVING the signature Exchange outright
  * (guide §2.4) and the per-row agg-buffer churn (guide §4).
  *
  * Hash identity with the old aggregate chain, term for term:
  *   base(s)  = xxhash64(xxhash64(s))    — string hash seed 42, then
  *                                         hashLong(·, 42);
  *   m_i      = min over shingles of hashInt(i, base(s)) — xxhash64's
  *                                         multi-arg chaining;
  *   band_b   = xxhash64(m_{b·r}, …, m_{b·r+r−1}) — hashLong chain from
  *                                         seed 42.
  * A NULL shingle element hashes like the builtin: null children leave
  * the running hash at its seed, so base = hashLong(42, 42).
  *
  * EMPTY array → NULL (the old explode emitted no rows, so the doc was
  * absent from the aggregated signatures; `posexplode(NULL)` emits no
  * rows, which is the same absence). [[graft.functions.Dedup.shingleCol]]
  * never returns an empty array, so this is defensive only.
  */
object MinHashBands {

  def minhash_bands(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    GraftColumnBridge.column(MinHashBandsExpr(
      GraftColumnBridge.expression(shingles), bands, rowsPerBand))
}

case class MinHashBandsExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1,
    s"bands/rowsPerBand must be >= 1, got $bands/$rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val k = bands * rowsPerBand
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var si = 0
    while (si < n) {
      // __h = xxhash64(shingle): seed 42, null element leaves the seed
      val h =
        if (arr.isNullAt(si)) 42L
        else XxHash64Function.hash(arr.getUTF8String(si), StringType, 42L)
      // xxhash64(__h, i) = hashInt(i, hashLong(__h, 42))
      val base = XxHash64Function.hash(h, LongType, 42L)
      var i = 0
      while (i < k) {
        val v = XxHash64Function.hash(i, IntegerType, base)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      si += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // xxhash64(m_0, …, m_{r-1}): hashLong chain from seed 42
      var hb = 42L
      var j = 0
      while (j < rowsPerBand) {
        hb = XxHash64Function.hash(mins(b * rowsPerBand + j), LongType, hb)
        j += 1
      }
      out(b) = hb
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = {
    val r = compute(v.asInstanceOf[ArrayData])
    if (r == null) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashBands", this)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $r =
        (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}
