package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bigtable, RangeSplit}

/** Property tests for the range-splitting layers — the failure class here
  * is SILENT row loss or duplication at cut boundaries, which a few
  * hand-picked examples won't surface.
  *
  * RangeSplit renders WHERE fragments; the test re-parses the rendered
  * bounds and checks, for adversarial probe values (the bounds
  * themselves, every cut point, ±1 neighbors, randoms), that each value
  * inside [lo, hi] matches EXACTLY one predicate and values outside
  * match none.
  */
class RangeSplitPropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(1234L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > 0, "generator produced no samples")
  }

  /** Parse one rendered predicate "pc >= A AND pc < B[ extra]" into
    * (A, B, inclusiveHi). */
  private def parsePred(p: String): (String, String, Boolean) = {
    val m = """__pc >= (.+) AND __pc (<=?) (.+)""".r
    p match {
      case m(a, op, b) => (a, b, op == "<=")
      case _ => fail(s"unparsable predicate: $p")
    }
  }

  private def matchCount[T](preds: Seq[String], v: T, lift: String => T)
      (implicit ord: Ordering[T]): Int =
    preds.map(parsePred).count { case (a, b, incl) =>
      ord.gteq(v, lift(a)) &&
        (if (incl) ord.lteq(v, lift(b)) else ord.lt(v, lift(b)))
    }

  test("numeric splits: every in-range value matches exactly one range") {
    val gen = for {
      lo <- Gen.chooseNum(-1000000L, 1000000L)
      span <- Gen.chooseNum(0L, 5000000L)
      splits <- Gen.chooseNum(1, 40)
    } yield (lo, lo + span, splits)
    forSamples(gen) { case (lo, hi, splits) =>
      val preds = RangeSplit.predicates("__pc", lo.toString, hi.toString,
        splits, "").get
      assert(preds.size == splits)
      val cuts = preds.map(parsePred).flatMap(p => Seq(p._1, p._2))
        .map(BigDecimal(_))
      val probes = (Seq(BigDecimal(lo), BigDecimal(hi)) ++ cuts ++
        cuts.map(_ + 1) ++ cuts.map(_ - 1) ++
        Seq(BigDecimal(lo) + (BigDecimal(hi) - BigDecimal(lo)) / 3)).distinct
      probes.foreach { v =>
        val n = matchCount(preds, v, BigDecimal(_))
        val expect = if (v >= lo && v <= hi) 1 else 0
        assert(n == expect, s"value $v in [$lo,$hi]x$splits matched $n")
      }
    }
  }

  test("date splits: boundaries land in exactly one range") {
    val gen = for {
      lo <- Gen.chooseNum(-20000L, 40000L) // epoch days ~1915..2079
      span <- Gen.chooseNum(0L, 8000L)
      splits <- Gen.chooseNum(1, 20)
    } yield (lo, lo + span, splits)
    forSamples(gen) { case (loD, hiD, splits) =>
      val lo = java.time.LocalDate.ofEpochDay(loD).toString
      val hi = java.time.LocalDate.ofEpochDay(hiD).toString
      val preds = RangeSplit.predicates("__pc", lo, hi, splits, "").get
      // ISO dates order lexically == chronologically; strip quotes
      def lift(s: String) = s.stripPrefix("'").stripSuffix("'")
      val cuts = preds.map(parsePred).flatMap(p => Seq(p._1, p._2)).map(lift)
      val probes = (Seq(lo, hi) ++ cuts ++
        cuts.map(d => java.time.LocalDate.parse(d).plusDays(1).toString) ++
        cuts.map(d => java.time.LocalDate.parse(d).minusDays(1).toString))
        .distinct
      probes.foreach { v =>
        val n = matchCount(preds, s"'$v'", identity[String])
        val expect = if (v >= s"$lo" && v <= s"$hi") 1 else 0
        // values compare with quotes on both sides: lexical ISO order
        val inRange = v >= lo && v <= hi
        assert(n == (if (inRange) 1 else 0),
          s"date $v in [$lo,$hi]x$splits matched $n")
      }
    }
  }

  test("timestamp splits: sub-milli max row survives the top bound") {
    val gen = for {
      lo <- Gen.chooseNum(0L, 2000000000L) // epoch millis
      span <- Gen.chooseNum(0L, 100000000L)
      splits <- Gen.chooseNum(1, 16)
      micros <- Gen.chooseNum(0, 999)
    } yield (lo, lo + span, splits, micros)
    forSamples(gen, n = 120) { case (loM, hiM, splits, micros) =>
      def r(m: Long, extraMicros: Int) = java.time.LocalDateTime
        .ofInstant(java.time.Instant.ofEpochMilli(m)
          .plus(extraMicros.toLong, java.time.temporal.ChronoUnit.MICROS),
          java.time.ZoneOffset.UTC)
        .format(RangeSplit.TsFmt)
      val lo = r(loM, 0)
      val hi = r(hiM, micros) // sub-milli fraction on the max row
      val preds = RangeSplit.predicates("__pc", lo, hi, splits, "").get
      def lift(s: String) = java.time.LocalDateTime
        .parse(s.stripPrefix("'").stripSuffix("'"), RangeSplit.TsFmt)
      implicit val ord: Ordering[java.time.LocalDateTime] =
        Ordering.fromLessThan(_ isBefore _)
      // the exact max value (with its sub-milli fraction) must match once
      val probes = Seq(lo, hi) ++
        preds.map(parsePred).flatMap(p => Seq(p._1, p._2))
          .map(_.stripPrefix("'").stripSuffix("'"))
      probes.map(s => java.time.LocalDateTime.parse(s, RangeSplit.TsFmt))
        .distinct.foreach { v =>
          val loT = java.time.LocalDateTime.parse(lo, RangeSplit.TsFmt)
          val hiT = java.time.LocalDateTime.parse(hi, RangeSplit.TsFmt)
          val inRange = !v.isBefore(loT) && !v.isAfter(hiT)
          val n = matchCount(preds, v, lift)
          assert(n == (if (inRange) 1 else 0),
            s"ts $v in [$lo,$hi]x$splits matched $n")
        }
    }
  }

  test("bigtable keyRanges: contiguous, complete, unsigned-ordered for random byte keys") {
    val keyGen = Gen.nonEmptyListOf(Gen.chooseNum(0, 255).map(_.toByte))
      .map(_.toArray)
    val gen = for {
      keys <- Gen.listOfN(30, keyGen)
      maxRanges <- Gen.chooseNum(1, 12)
    } yield (keys, maxRanges)
    forSamples(gen, n = 150) { case (keys, maxRanges) =>
      val ranges = Bigtable.keyRanges(keys, maxRanges)
      assert(ranges.nonEmpty && ranges.size <= maxRanges)
      assert(ranges.head._1.isEmpty && ranges.last._2.isEmpty)
      // contiguity: each range's end is the next range's start
      ranges.sliding(2).foreach {
        case Seq((_, e), (s, _)) => assert(java.util.Arrays.equals(e, s))
        case _ =>
      }
      // interior bounds strictly increase under UNSIGNED byte order
      val bounds = ranges.map(_._1).drop(1)
      bounds.sliding(2).foreach {
        case Seq(a, b) => assert(java.util.Arrays.compareUnsigned(a, b) < 0)
        case _ =>
      }
      // completeness: every sampled key falls in exactly one range
      keys.foreach { k =>
        val n = ranges.count { case (s, e) =>
          (s.isEmpty || java.util.Arrays.compareUnsigned(k, s) >= 0) &&
            (e.isEmpty || java.util.Arrays.compareUnsigned(k, e) < 0)
        }
        assert(n == 1, s"key ${k.mkString(",")} matched $n ranges")
      }
    }
  }
}
