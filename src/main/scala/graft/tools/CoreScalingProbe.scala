package graft.tools

import graft.kernel.SignatureKernel
import graft.model.ImageRow
import graft.synth.Synth

import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicLong

/**
 * Spark-free host-parallelism probe: the signature kernel run on T
 * concurrent plain JVM threads for a fixed wall window, at several T.
 * `core_equivalents(T) = throughput(T) / throughput(1)` measures how many
 * cores of SUSTAINED compute the host actually delivers — independent of
 * Spark scheduling, shuffle, or IO.
 *
 * Why it exists: the shared host starves wide runs in bad windows (five
 * of five 16-core pipeline shots across two round-5 campaigns; BASELINE
 * .md "host pathology"), and the per-stage splits show the embarrassingly
 * parallel signatures stage — a zero-shuffle mapPartitions — running at
 * 4-core speed under 16 threads while the bursty edges stage scales at
 * 0.92. A cgroup quota was ruled out (cpu.cfs_quota_us = -1); this probe
 * settles, per window, whether ANY 16-thread measurement can scale, by
 * showing the ceiling a Spark-free burn hits on the same host. If
 * `core_equivalents(16)` reads ~5 while nproc says 32, no pipeline shot
 * in that window can exceed efficiency ~5/16 on its compute-bound stages
 * no matter how it is written.
 *
 * Usage: runMain graft.tools.CoreScalingProbe [nBases] [levels] [secsPerLevel]
 *   e.g.                                       120      1,4,16   15
 * Prints one JSON line: CORESCALE {"levels":{"1":imgs_per_sec,...},
 * "core_equivalents":{...},"nproc":N}
 */
object CoreScalingProbe {
  def main(args: Array[String]): Unit = {
    val nBases = args.headOption.map(_.toInt).getOrElse(120)
    val levels = (if (args.length > 1) args(1) else "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val secs = if (args.length > 2) args(2).toInt else 15
    val rows = (0L until nBases.toLong).flatMap(Synth.rowsForBase)
      .map(r => ImageRow(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
      .toArray
    require(rows.nonEmpty, "no rows synthesized")

    // JIT warmup on one thread
    val warmSha = MessageDigest.getInstance("SHA-256")
    rows.foreach(SignatureKernel.computeOne(_, warmSha))

    def burn(threads: Int): Double = {
      val done = new AtomicLong(0L)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val ts = (0 until threads).map { k =>
        val t = new Thread(() => {
          val sha = MessageDigest.getInstance("SHA-256")
          var i = k * 17 % rows.length // stagger starting offsets
          while (!stop.get()) {
            SignatureKernel.computeOne(rows(i), sha)
            done.incrementAndGet()
            i += 1
            if (i >= rows.length) i = 0
          }
        })
        t.setDaemon(true); t.start(); t
      }
      val t0 = System.nanoTime()
      Thread.sleep(secs * 1000L)
      val n = done.get() // count BEFORE signaling: joins shouldn't inflate
      val wall = (System.nanoTime() - t0) / 1e9
      stop.set(true)
      ts.foreach(_.join(5000))
      n / wall
    }

    val tp = levels.map(t => t -> burn(t))
    val tp1 = tp.find(_._1 == 1).map(_._2).getOrElse(tp.head._2 / tp.head._1)
    val lv = tp.map { case (t, v) => f""""$t":$v%.1f""" }.mkString("{", ",", "}")
    val ce = tp.map { case (t, v) => f""""$t":${v / tp1}%.2f""" }
      .mkString("{", ",", "}")
    println(s"""CORESCALE {"levels":$lv,"core_equivalents":$ce,""" +
      s""""nproc":${Runtime.getRuntime.availableProcessors()},""" +
      s""""secs_per_level":$secs,"images":${rows.length}}""")
  }
}
