package graft

import graft.kernel.{Pdq, SignatureKernel}
import graft.model.ImageRow
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

import java.security.MessageDigest

/** Photometric variants (brightness shift, contrast scale): PDQ drops the
  * DC coefficient and binarizes against the median, so both should sit far
  * below threshold 40 — measured over every base that drew one. */
class PhotometricSpec extends AnyFunSuite {

  test("bright/contrast variants stay within threshold 40 of their orig") {
    val sha = MessageDigest.getInstance("SHA-256")
    val fams = (0L until 150L).map(Synth.rowsForBase)
      .filter(f => f.exists(r => r.variant == "bright" || r.variant == "contrast"))
    assert(fams.nonEmpty, "no base drew a photometric variant in 150 bases")
    var worst = 0
    var n = 0
    fams.foreach { fam =>
      val sigOf = fam.map { r =>
        r.variant -> SignatureKernel.computeOne(
          ImageRow(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash), sha)
      }.toMap
      val orig = sigOf("orig")
      val oh = Array(orig.h0, orig.h1, orig.h2, orig.h3)
      Seq("bright", "contrast").flatMap(sigOf.get).foreach { v =>
        val d = v.variants.map(Pdq.hammingLongs(_, oh)).min
        worst = math.max(worst, d)
        n += 1
        assert(d <= 40, s"photometric variant at dist $d > 40")
      }
    }
    info(s"$n photometric variants, worst dihedral-min distance = $worst")
  }
}
