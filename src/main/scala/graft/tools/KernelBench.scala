package graft.tools

import graft.kernel.SignatureKernel
import graft.model.ImageRow
import graft.synth.Synth

import java.security.MessageDigest

/**
 * Single-threaded signature-kernel microbenchmark — the per-image cost
 * anchor behind BASELINE.md's "2.19 ms/img/core" row (reference:
 * 4.29 ms/img PDQ-only, NOTES.txt:41-44). Prints total ms/img plus a
 * per-fmt breakdown so a kernel regression names the decode tier that
 * caused it (r3: tiff/nef rows joined the mix).
 *
 * Usage: runMain graft.tools.KernelBench [nBases] [reps]
 */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toInt).getOrElse(300)
    val reps = if (args.length > 1) args(1).toInt else 3
    val rows = (0L until nBases.toLong).flatMap(Synth.rowsForBase)
      .map(r => ImageRow(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
    val sha = MessageDigest.getInstance("SHA-256")
    // warmup (JIT)
    rows.take(rows.size / 3).foreach(SignatureKernel.computeOne(_, sha))

    val best = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      rows.foreach(SignatureKernel.computeOne(_, sha))
      (System.nanoTime() - t0) / 1e6
    }.min
    val perImg = best / rows.size

    val byFmt = rows.groupBy(_.fmt).toSeq.sortBy(_._1).map { case (fmt, rs) =>
      val t0 = System.nanoTime()
      rs.foreach(SignatureKernel.computeOne(_, sha))
      val ms = (System.nanoTime() - t0) / 1e6 / rs.size
      f""""$fmt":{"n":${rs.size},"ms_per_img":$ms%.2f}"""
    }.mkString("{", ",", "}")

    println(f"""KERNELBENCH {"images":${rows.size},"ms_per_img":$perImg%.3f,"img_per_sec_core":${1000.0 / perImg}%.0f,"by_fmt":$byFmt}""")
  }
}
