package graft.write

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Zone-rule-free UTC text rendering for instants.
  *
  * `to_utc_timestamp(c, session_tz) CAST STRING` resolves the zone
  * offset TWICE (once at the instant, once at the shifted instant) —
  * inside the session zone's DST transition window the two resolutions
  * differ and the render shifts by an hour, silently, for a few rows a
  * year. This renderer never consults zone rules: it splits the epoch
  * micros arithmetically (UTC days are exactly 86_400_000_000 µs — no
  * leap-second smearing in Unix time) and formats the pieces. Pure
  * integer expressions, fully whole-stage-codegen.
  */
object TimeText {

  private val DayUs = 86400000000L

  /** `yyyy-MM-dd HH:mm:ss.SSSSSS` of a TimestampType column's instant in
    * UTC, independent of spark.sql.session.timeZone. Always 6 fraction
    * digits (PG, MySQL, and friends parse trailing zeros). NULL in,
    * NULL out. */
  def utcText(c: Column): Column = {
    val us = unix_micros(c)
    val tod = pmod(us, lit(DayUs)) // non-negative, also for pre-1970
    // Spark's `/` is DOUBLE division — day counts near the long range
    // would round. us - tod is an exact day multiple, so decimal
    // division + truncating cast stays exact everywhere.
    val days = ((us - tod).cast("decimal(30,0)") / lit(DayUs)).cast("long")
    val date = date_add(to_date(lit("1970-01-01")), days.cast("int"))
    // time-of-day quotients are < 1e11 / divisor: double division then
    // truncation is exact at these magnitudes (0.5 ulp « distance to the
    // next integer), and stays in flat codegen
    def idiv(v: Column, d: Long) = (v / lit(d)).cast("long")
    def pad(v: Column, n: Int) = lpad(v.cast("string"), n, "0")
    concat(
      date.cast("string"), lit(" "),
      pad(idiv(tod, 3600000000L), 2), lit(":"),
      pad(pmod(idiv(tod, 60000000L), lit(60L)), 2), lit(":"),
      pad(pmod(idiv(tod, 1000000L), lit(60L)), 2), lit("."),
      pad(pmod(tod, lit(1000000L)), 6))
  }
}
