package graft.tools

import graft.kernel._
import graft.model.ImageRow
import graft.synth.Synth

import java.security.MessageDigest

/** Round-6 phase-level breakdown of the signature kernel (single core,
  * synth mix): where do the ~2.2 ms/img actually go? Read-only probe —
  * prints one line per phase. */
object KernelPhaseProbe {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toInt).getOrElse(300)
    val rows = (0L until nBases.toLong).flatMap(Synth.rowsForBase)
      .map(r => ImageRow(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
    val sha = MessageDigest.getInstance("SHA-256")
    // warm
    rows.take(rows.size / 3).foreach(SignatureKernel.computeOne(_, sha))

    def time(label: String)(f: ImageRow => Unit): Unit = {
      val t0 = System.nanoTime()
      rows.foreach(f)
      println(f"KPHASE $label ${(System.nanoTime() - t0) / 1e6 / rows.size}%.3f ms/img")
    }
    time("full_kernel")(r => SignatureKernel.computeOne(r, sha))
    time("content_sha")(r => { sha.reset(); sha.digest(r.bytes) })
    time("decode_only")(r => ImageCodec.decodeWithStatus(r.bytes, r.fmt, r.w, r.h))
    time("exif_only")(r =>
      try Exif.fromBytes(r.bytes, r.fmt)
      catch { case scala.util.control.NonFatal(_) => () })
    time("minhash_only")(r => graft.functions.MinHash.signature(r.caption))
    // decoded-dependent phases: pre-decode once outside the timer
    val decoded = rows.map(r => r -> ImageCodec.decodeWithStatus(r.bytes, r.fmt, r.w, r.h)._1)
      .collect { case (r, Some(d)) if d.w >= Pdq.MinHashableDim && d.h >= Pdq.MinHashableDim => (r, d) }
    def timeD(label: String)(f: ((ImageRow, graft.kernel.DecodedImage)) => Unit): Unit = {
      val t0 = System.nanoTime()
      decoded.foreach(f)
      println(f"KPHASE $label ${(System.nanoTime() - t0) / 1e6 / decoded.size}%.3f ms/img (over ${decoded.size} decoded)")
    }
    timeD("pixelhash_sha")(x => { sha.reset(); sha.digest(x._2.pixelHashBytes) })
    timeD("luma601")(x => x._2.luma601)
    val lumas = decoded.map(x => (x._2.luma601, x._2.w, x._2.h))
    def timeL(label: String)(f: ((Array[Float], Int, Int)) => Unit): Unit = {
      val t0 = System.nanoTime()
      lumas.foreach(f)
      println(f"KPHASE $label ${(System.nanoTime() - t0) / 1e6 / lumas.size}%.3f ms/img (over ${lumas.size})")
    }
    timeL("pdq_features")(x => Pdq.featuresFromLuma(x._1, x._2, x._3))
    val coeffs = lumas.map(x => Pdq.featuresFromLuma(x._1, x._2, x._3)._1)
    locally {
      val t0 = System.nanoTime()
      coeffs.foreach(c => Pdq.dihedralHashes(c).map(Pdq.toLongs))
      println(f"KPHASE pdq_dihedral ${(System.nanoTime() - t0) / 1e6 / coeffs.size}%.3f ms/img")
    }
    timeL("phash64")(x => PHash.hashGray(x._1, x._2, x._3))
  }
}
