package graft.sources

/** Shared min/max → bounded-predicate range splitting for the wire
  * readers ([[Mysql.read]], [[Tds.read]]; [[Pg]] has an OID-typed
  * variant inline). A partition column may be numeric, DATE, or
  * DATETIME/TIMESTAMP — numeric bounds split in decimal space,
  * temporal bounds in epoch space (the reference's chunked reads do the
  * same dispatch per driver type; core/dbio/database templating). An
  * unsplittable column (string bounds, unparsable values) yields None
  * and callers fall back to a single unpartitioned statement rather
  * than crash — the same task YAML must work across engines.
  */
private[graft] object RangeSplit {

  private def epochCuts(lo: Long, hi: Long, splits: Int): Seq[(Long, Long)] = {
    val span = (BigInt(hi) - BigInt(lo)) + 1
    (0 until splits).map { i =>
      ((BigInt(lo) + span * i / splits).toLong,
        if (i == splits - 1) hi
        else (BigInt(lo) + span * (i + 1) / splits).toLong)
    }
  }

  private def render(pc: String, cuts: Seq[(String, String)],
      extra: String): Seq[String] = cuts.zipWithIndex.map { case ((a, b), i) =>
    val hiOp = if (i == cuts.size - 1) "<=" else "<"
    s"$pc >= $a AND $pc $hiOp $b$extra"
  }

  private[graft] val TsFmt = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .optionalStart()
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 9, true)
    .optionalEnd()
    .toFormatter

  /** WHERE-fragment predicates splitting `[lo, hi]` (engine text
    * renders) into `splits` ranges, dispatching on what the bounds
    * parse as: numeric → decimal space, `yyyy-MM-dd` → epoch-day,
    * `yyyy-MM-dd HH:mm:ss[.f]` → epoch-milli. None when the column
    * isn't range-splittable (caller falls back to one statement). */
  def predicates(pc: String, lo: String, hi: String, splits: Int,
      extra: String): Option[Seq[String]] = {
    def num = try {
      val l = BigDecimal(lo); val h = BigDecimal(hi)
      Some(render(pc, (0 until splits).map { i =>
        ((l + (h - l) * i / splits).toString,
          (if (i == splits - 1) h else l + (h - l) * (i + 1) / splits)
            .toString)
      }, extra))
    } catch { case _: NumberFormatException => None }

    def date = try {
      val l = java.time.LocalDate.parse(lo).toEpochDay
      val h = java.time.LocalDate.parse(hi).toEpochDay
      Some(render(pc, epochCuts(l, h, splits).map { case (a, b) =>
        (s"'${java.time.LocalDate.ofEpochDay(a)}'",
          s"'${java.time.LocalDate.ofEpochDay(b)}'")
      }, extra))
    } catch { case _: java.time.format.DateTimeParseException => None }

    def ts = try {
      def ep(s: String) = java.time.LocalDateTime.parse(s, TsFmt)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      def r(m: Long) = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(m), java.time.ZoneOffset.UTC)
        .format(TsFmt)
      val cuts = epochCuts(ep(lo), ep(hi), splits).map { case (a, b) =>
        (s"'${r(a)}'", s"'${r(b)}'")
      }
      // the top bound compares `<=`: use the engine's own render, not
      // the milli-truncated round-trip, so sub-milli max rows survive
      Some(render(pc, cuts.init :+ (cuts.last._1 -> s"'$hi'"), extra))
    } catch { case _: java.time.format.DateTimeParseException => None }

    num.orElse(date).orElse(ts)
  }
}
