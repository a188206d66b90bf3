package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column typing rules (reference `ColumnTyping`, datatype.go:2508-2585):
  * post-inference adjustments applied before a write —
  *   - string length caps (truncate to maxLength),
  *   - decimal precision/scale caps,
  *   - booleans as ints (targets without a bool type),
  *   - json/variant payloads as strings.
  */
object Typing {

  final case class Rules(
      stringMaxLength: Option[Int] = None,
      decimalPrecisionCap: Option[(Int, Int)] = None,
      booleanAsInt: Boolean = false,
      jsonAsString: Boolean = true)

  def apply(df: DataFrame, rules: Rules): DataFrame = {
    val cols: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val adjusted = f.dataType match {
        case _: StringType =>
          rules.stringMaxLength.map(n => substring(c, 1, n)).getOrElse(c)
        case d: DecimalType =>
          rules.decimalPrecisionCap.map { case (p, s) =>
            if (d.precision > p || d.scale > s) {
              // scale must also clamp to the CAPPED precision — e.g. (6,5)
              // capped to p=3 would otherwise build the invalid Decimal(3,5)
              val p2 = math.min(d.precision, p)
              c.cast(DecimalType(p2, math.min(math.min(d.scale, s), p2)))
            } else c
          }.getOrElse(c)
        case _: BooleanType if rules.booleanAsInt => c.cast(IntegerType)
        case _: VariantType if rules.jsonAsString => to_json(c)
        case _ => c
      }
      adjusted.as(f.name)
    }
    df.select(cols: _*)
  }
}
