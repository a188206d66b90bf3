package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TypeInference._
import graft.state.StateStore
import graft.transform.Casing

/** Property-style tests (ScalaCheck generators, fixed seed for determinism)
  * for the parser/caster/state layers.
  */
class PropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > 0, "generator produced no samples")
  }

  test("parseKind classifies every long as int") {
    forSamples(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)) { n =>
      assert(parseKind(n.toString) == KInt, n)
    }
  }

  test("parseKind classifies fixed-point decimals as dec") {
    val gen = for {
      i <- Gen.chooseNum(-999999L, 999999L)
      scale <- Gen.chooseNum(1, 6)
      frac <- Gen.listOfN(scale, Gen.numChar).map(_.mkString)
    } yield s"$i.$frac"
    forSamples(gen) { s => assert(parseKind(s) == KDec, s) }
  }

  test("parseKind classifies ISO dates and datetimes") {
    val gen = for {
      y <- Gen.chooseNum(1900, 2100)
      m <- Gen.chooseNum(1, 12)
      d <- Gen.chooseNum(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d"
    forSamples(gen) { s =>
      assert(parseKind(s) == KDate, s)
      assert(parseKind(s + " 10:20:30") == KDateTime, s)
    }
  }

  test("snake casing is idempotent") {
    forSamples(Gen.identifier) { s =>
      val once = Casing.snake(s)
      assert(Casing.snake(once) == once, s)
    }
  }

  test("state store round-trips arbitrary keys/values incl. quotes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString
    val store = new StateStore(s"$dir/state.json")
    val printable = Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('"', '\\', ' ', ':', ',', '{', '}'))).map(_.mkString)
    val kv = Gen.zip(Gen.identifier, printable)
    forSamples(kv, n = 100) { case (k, v) =>
      store.put(k, v)
      assert(store.get(k).contains(v), s"k=$k v=$v")
    }
  }
}
