package graft.tools

import graft.{CorpusState, Incremental, Pipeline}
import graft.synth.Synth

/**
 * Steady-state ingest evidence: apply K equal-sized deltas sequentially
 * to a growing corpus and print per-delta wall — with merge-on-read
 * state and auto-compaction the cost must stay FLAT as versions pile up
 * (the 10¹²-corpus daily-ingest loop), not grow with the layer stack.
 *
 * Usage: runMain graft.tools.ChainBench [corpusBases] [deltaBases] [k] [cpus]
 */
object ChainBench {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(4000L)
    val nDelta = if (args.length > 1) args(1).toLong else 200L
    val k = if (args.length > 2) args(2).toInt else 8
    val cpus = if (args.length > 3) args(3).toInt else 16
    val spark = Pipeline.session(s"local[$cpus]", shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft-chainbench").toString
    val corpusImages = Synth.imagesDF(spark, 0L, nCorpus).localCheckpoint()
    Pipeline.run(spark, corpusImages, s"$base/corpus-work").count()

    val times = (0 until k).map { i =>
      val from = nCorpus + i * nDelta
      val delta = Synth.imagesDF(spark, from, from + nDelta).localCheckpoint()
      val t0 = System.nanoTime()
      Incremental.run(spark, delta, s"$base/corpus-work", s"$base/delta-$i",
        fullOutput = false).count()
      (System.nanoTime() - t0) / 1e9
    }
    val layers = new java.io.File(s"$base/corpus-work").listFiles()
      .map(_.getName).count(_.startsWith("state_v"))
    val ver = CorpusState.version(spark, s"$base/corpus-work")
    val perDelta = times.map(t => f"$t%.1f").mkString("[", ",", "]")
    // flatness: mean of the last 3 deltas vs the first 3 — growth with
    // version count would show here as a rising tail
    val head3 = times.take(3).sum / 3
    val tail3 = times.takeRight(3).sum / 3
    println(f"""CHAINBENCH {"corpus_bases":$nCorpus,"delta_bases":$nDelta,"k":$k,"per_delta_sec":$perDelta,"head3_avg":$head3%.1f,"tail3_avg":$tail3%.1f,"tail_over_head":${tail3 / head3}%.2f,"versions":$ver,"state_dirs_on_disk":$layers,"cpus":$cpus}""")
    spark.stop()
  }
}
