package graft

import graft.kernel.{PHash, Pdq}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator property tests for the Hamming/band algebra
  * (FIXTURES.md §3): pigeonhole probe-tier guarantees, metric axioms,
  * pack/chunk round trips, dihedral group closure. Deterministic seeded
  * sampling (no scalatestplus bridge in the offline cache). */
class HammingPropertiesSpec extends AnyFunSuite {
  private def samples[A](gen: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(42L + i)))

  private val genHash: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](32, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  private val genBits: Gen[Seq[Int]] =
    Gen.chooseNum(0, 63).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 255)))

  private def flip(h: Array[Byte], bits: Seq[Int]): Array[Byte] = {
    val out = h.clone()
    bits.distinct.foreach(b => out(b / 8) = (out(b / 8) ^ (1 << (b % 8))).toByte)
    out
  }

  test("pigeonhole: dist ≤ t ⇒ min chunk dist ≤ ⌊t/16⌋ (probe-tier recall basis)") {
    for ((h, bits) <- samples(genHash).zip(samples(genBits))) {
      val g = flip(h, bits)
      val d = Pdq.hamming(h, g)
      val minChunk = (0 until 16)
        .map(k => Integer.bitCount(Pdq.chunk(h, k) ^ Pdq.chunk(g, k))).min
      assert(minChunk <= d / 16, s"d=$d minChunk=$minChunk")
    }
  }

  test("hamming is a metric: identity, symmetry, triangle inequality") {
    for (((h, b1), b2) <- samples(genHash).zip(samples(genBits)).zip(samples(genBits, 300).reverse)) {
      val a = flip(h, b1); val b = flip(h, b2)
      assert(Pdq.hamming(h, h) == 0)
      assert(Pdq.hamming(a, b) == Pdq.hamming(b, a))
      assert(Pdq.hamming(a, b) <= Pdq.hamming(a, h) + Pdq.hamming(h, b))
    }
  }

  test("long packing preserves hamming and chunks") {
    val hs = samples(genHash)
    for ((a, b) <- hs.zip(hs.reverse)) {
      assert(Pdq.hammingLongs(Pdq.toLongs(a), Pdq.toLongs(b)) == Pdq.hamming(a, b))
      assert(Pdq.fromLongs(Pdq.toLongs(a)).sameElements(a))
      val la = Pdq.toLongs(a)
      (0 until 16).foreach { k =>
        assert((((la(k / 4) >>> ((k % 4) * 16)) & 0xffffL).toInt) == Pdq.chunk(a, k))
      }
    }
  }

  test("split-radius coverage: chunk dist ≤ 2 ⇒ some radius-2 index mask collides") {
    val gen16 = Gen.chooseNum(0, 65535)
    val masksI = graft.lsh.BandJoin.masks(2)
    for ((c, flips) <- samples(gen16).zip(samples(Gen.listOfN(2, Gen.chooseNum(0, 15))))) {
      val c2 = flips.distinct.foldLeft(c)((v, b) => v ^ (1 << b))
      assert(masksI.exists(m => (c2 ^ m) == c),
        s"chunk pair $c/$c2 not covered by radius-2 index masks")
    }
  }

  test("pHash dihedral ops are involutions/4-cycles for all hashes") {
    for (h <- samples(Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      assert(PHash.rotate90(PHash.rotate90(PHash.rotate90(PHash.rotate90(h)))) == h)
      assert(PHash.rotate180(PHash.rotate180(h)) == h)
      assert(PHash.flipHorizontal(PHash.flipHorizontal(h)) == h)
      val inv = PHash.rotationInvariant(h)
      assert(PHash.rotationInvariant(PHash.rotate90(h)) == inv)
    }
  }
}
