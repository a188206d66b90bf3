package graft.functions.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's exact column checksums: a per-value uint64 derived by
  * type (stream_processor.go:766-1050) summed with uint64 wrap-around
  * (commitChecksum, :646-664).
  *
  * The per-value checksum is a codegen'd Column expression; the wrapping
  * SUM is a typed `Aggregator` — JVM long addition wraps bit-identically
  * to Go's uint64 addition, and a native aggregate sidesteps ANSI mode's
  * overflow error without giving up map-side partial aggregation.
  */
object ExactChecksum {

  /** Per-value checksum by type:
    * string→UTF-8 byte length (the reference computes uint64(len(sVal)) over
    * Go's UTF-8 bytes, stream_processor.go:771 — octet_length, not character
    * count), json→byte length without spaces (:795), int→|v|, float/decimal→
    * trunc|v|, bool→len("true"/"false"), timestamp→unix micros,
    * date→midnight micros, binary→byte length.
    */
  def valueChecksum(c: Column, dt: DataType, isJson: Boolean = false): Column =
    dt match {
      case StringType =>
        if (isJson) octet_length(regexp_replace(c, " ", "")).cast(LongType)
        else octet_length(c).cast(LongType)
      case ByteType | ShortType | IntegerType | LongType => abs(c).cast(LongType)
      case FloatType | DoubleType => abs(c).cast(LongType) // trunc toward zero
      case d: DecimalType => abs(c).cast(LongType)
      // NULL must fall through (an `otherwise` would count it as false=5,
      // corrupting the sum — wrapSum skips nulls like the reference)
      case BooleanType => when(c === true, lit(4L)).when(c === false, lit(5L))
      case TimestampType => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case DateType => unix_micros(c.cast(TimestampType))
      case BinaryType => length(c).cast(LongType)
      case other => throw new IllegalArgumentException(s"checksum type $other")
    }

  /** SUM with uint64 wrap semantics (nulls contribute nothing). */
  val wrapSum: Aggregator[java.lang.Long, Long, Long] =
    new Aggregator[java.lang.Long, Long, Long] {
      override def zero: Long = 0L
      override def reduce(acc: Long, v: java.lang.Long): Long =
        if (v == null) acc else acc + v // JVM wrap == Go uint64 wrap
      override def merge(a: Long, b: Long): Long = a + b
      override def finish(acc: Long): Long = acc
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Column-level checksum aggregate: wrap-sum of per-value checksums. */
  def checksum(c: Column, dt: DataType, isJson: Boolean = false): Column =
    udaf(wrapSum).apply(valueChecksum(c, dt, isJson))

  /** Unsigned rendering of the wrapped accumulator (matches the reference's
    * printed uint64): negative longs shift up by 2^64, emitted as
    * DECIMAL(20,0).
    */
  def asUnsigned(c: Column): Column = {
    val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
    when(c < 0, c.cast(DecimalType(20, 0)) + two64)
      .otherwise(c.cast(DecimalType(20, 0)))
  }
}
