package graft.operators

import graft.functions.TextHash
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}

/** Pure-math pins for the SimHash candidate generators' recall
  * guarantees. q43/q96 rely on pigeonhole arguments — if a refactor
  * changes chunk widths, probe radii or ball enumeration, the DuckDB
  * oracle would catch the *resulting* missed pairs only on data that
  * happens to exercise the broken case; these properties catch the
  * broken MATH on randomized fingerprints directly.
  */
class SimhashProbeSpec extends AnyFunSuite {

  private val params = Parameters.default.withMinSuccessfulTests(2000)

  /** A random 64-bit value and a perturbation of exactly `d` random bit
    * flips (d sampled in [0, maxD]). */
  private def pairGen(maxD: Int): Gen[(Long, Long)] = for {
    a <- Gen.long
    d <- Gen.choose(0, maxD)
    bits <- Gen.pick(d, 0 until 64)
  } yield (a, bits.foldLeft(a)((v, b) => v ^ (1L << b)))

  /** q43's generator: 8 chunks of 8 bits, probe side expands each chunk
    * value to its hamming ≤ 1 ball. Mirrors the flatMaps in Dedup.q43. */
  private def multiprobeFinds(a: Long, b: Long): Boolean =
    (0 until 8).exists { i =>
      val va = (a >>> (i * 8)) & 0xffL
      val vb = (b >>> (i * 8)) & 0xffL
      va == vb || (0 until 8).exists(j => (va ^ (1L << j)) == vb)
    }

  /** q96's generator: 4 chunks of 16 bits, exact match. */
  private def tightFinds(a: Long, b: Long): Boolean =
    (0 until 4).exists { i =>
      ((a >>> (i * 16)) & 0xffffL) == ((b >>> (i * 16)) & 0xffffL)
    }

  test("multiprobe 8x8-bit + hamming<=1 ball finds EVERY pair at radius 15") {
    val prop: Prop = forAll(pairGen(15)) { case (a, b) =>
      multiprobeFinds(a, b)
    }
    assert(check(params, prop).passed)
  }

  test("tight 4x16-bit chunks find EVERY pair at radius 3") {
    val prop: Prop = forAll(pairGen(3)) { case (a, b) =>
      tightFinds(a, b)
    }
    assert(check(params, prop).passed)
  }

  test("guarantees are tight: a counterexample exists just past each radius") {
    // hamming 16 spread 2-per-8-bit-chunk defeats the multiprobe ball
    val a = 0L
    val b16 = (0 until 8).foldLeft(0L)((v, i) => v | (3L << (i * 8)))
    assert(TextHash.hamming(a, b16) == 16 && !multiprobeFinds(a, b16))
    // hamming 4 spread 1-per-16-bit-chunk defeats the exact chunks
    val b4 = (0 until 4).foldLeft(0L)((v, i) => v | (1L << (i * 16)))
    assert(TextHash.hamming(a, b4) == 4 && !tightFinds(a, b4))
  }

  test("simhashSha is deterministic and tie-rounds up (empty set = all ones)") {
    val s = Seq("alpha beta gamma", "beta gamma delta")
    assert(TextHash.simhashSha(s) == TextHash.simhashSha(s))
    assert(TextHash.simhashSha(Nil) == -1L)
  }
}
