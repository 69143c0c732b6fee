package graft

import graft.kernel.PHash
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** 64-bit pHash: bitwise dihedral algebra + robustness (phash.rs:137-255,
  * documented 1-2-bit tolerance vs pixel-domain transforms phash.rs:5-8). */
class PHashSpec extends AnyFunSuite {
  private val samples = Seq(0x0L, 0xffffffffffffffffL, 0xabcd123456789ef0L,
    0x5a5a5a5a5a5a5a5aL, 0x123456789abcdef1L)

  test("rotate90 applied four times is identity") {
    for (h <- samples)
      assert(PHash.rotate90(PHash.rotate90(PHash.rotate90(PHash.rotate90(h)))) == h)
  }
  test("rotate180 twice is identity and equals rotate90 twice") {
    for (h <- samples) {
      assert(PHash.rotate180(PHash.rotate180(h)) == h)
      assert(PHash.rotate90(PHash.rotate90(h)) == PHash.rotate180(h))
    }
  }
  test("rotate270 = rotate90 ∘ rotate180") {
    for (h <- samples) assert(PHash.rotate270(h) == PHash.rotate90(PHash.rotate180(h)))
  }
  test("flipHorizontal twice is identity") {
    for (h <- samples) assert(PHash.flipHorizontal(PHash.flipHorizontal(h)) == h)
  }
  test("rotationInvariant is invariant under rotation") {
    for (h <- samples) {
      val inv = PHash.rotationInvariant(h)
      assert(PHash.rotationInvariant(PHash.rotate90(h)) == inv)
      assert(PHash.rotationInvariant(PHash.rotate180(h)) == inv)
    }
  }
  test("dihedral returns 8 variants with identity first") {
    val d = PHash.dihedral(0xabcd123456789ef0L)
    assert(d.length == 8 && d(0) == 0xabcd123456789ef0L)
  }

  test("pixel-domain rotation matches bitwise dihedral within tolerance") {
    val img = Synth.baseImage(4242L, nearFlat = false)
    val h0 = PHash.hashGray(img.luma601, img.w, img.h)
    val variants = PHash.dihedral(h0)
    val r90 = Synth.rotate90(img)
    val hr = PHash.hashGray(r90.luma601, r90.w, r90.h)
    val best = variants.map(PHash.hamming(_, hr)).min
    // bitwise rotation assumes median≈0 (phash.rs:145-149); a few bits of
    // slack is expected — reference operates at max_dist 15 for u64
    assert(best <= 12, s"rot90 best dihedral distance $best")
  }

  test("recompression keeps pHash distance small") {
    val img = Synth.baseImage(31337L, nearFlat = false)
    val h0 = PHash.hashGray(img.luma601, img.w, img.h)
    val jpeg = graft.kernel.ImageCodec.encodeJpeg(img, 0.70f)
    val dec = graft.kernel.ImageCodec.decode(jpeg, "jpg", img.w, img.h).get
    val h1 = PHash.hashGray(dec.luma601, dec.w, dec.h)
    assert(PHash.hamming(h0, h1) <= 10)
  }
}
