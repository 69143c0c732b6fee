package graft

import graft.kernel.Pdq
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level dihedral robustness: every synthetic base must match its
  * physically rotated/flipped variants through the dihedral hash set
  * (hamminghash.rs:415-481 analog; tolerance 22, observed 0 on this
  * generator because the transforms are exact pixel permutations). */
class DihedralCorpusSpec extends AnyFunSuite {
  test("all synthetic bases match their 5 physical transforms ≤ 22 bits") {
    var worst = 0
    for (base <- 0L until 40L) {
      val img = Synth.baseImage(base, nearFlat = false)
      val (c0, _) = Pdq.featuresFromLuma(img.luma601, img.w, img.h)
      val variants = Pdq.dihedralHashes(c0)
      val ts = Seq(Synth.rotate90(img), Synth.rotate180(img),
        Synth.rotate270(img), Synth.flipH(img), Synth.flipV(img))
      for (t <- ts) {
        val (ct, _) = Pdq.featuresFromLuma(t.luma601, t.w, t.h)
        worst = math.max(worst, variants.map(Pdq.hamming(_, Pdq.toHash(ct))).min)
      }
    }
    info(s"worst best-variant distance over 40 bases × 5 transforms: $worst")
    assert(worst <= 22)
  }
}
