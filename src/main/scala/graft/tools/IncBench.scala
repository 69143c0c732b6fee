package graft.tools

import graft.{Incremental, Pipeline}
import graft.synth.Synth
import org.apache.spark.sql.functions._

/**
 * Delta-proportionality evidence for incremental dedup (SCALING.md lever
 * #1): time a full batch run over N bases, then an Incremental merge of a
 * disjoint M-base delta into it. At 10¹²-scale the full join happens once
 * ever; the steady state is the delta path, so the ratio here IS the
 * steady-state cost model.
 *
 * Usage: runMain graft.tools.IncBench [corpusBases] [deltaBases] [cpus]
 */
object IncBench {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(10000L)
    val nDelta = if (args.length > 1) args(1).toLong else nCorpus / 20
    val cpus = if (args.length > 2) args(2).toInt else 16
    val spark = Pipeline.session(s"local[$cpus]", shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft-incbench").toString
    // disjoint base-id ranges → corpus and delta share no dup families,
    // but the delta still probes the whole corpus index
    val corpusImages = Synth.imagesDF(spark, 0L, nCorpus).localCheckpoint()
    val deltaImages = Synth.imagesDF(spark, nCorpus, nCorpus + nDelta).localCheckpoint()
    val nCorpusImgs = corpusImages.count()
    val nDeltaImgs = deltaImages.count()

    val t0 = System.nanoTime()
    Pipeline.run(spark, corpusImages, s"$base/corpus-work").count()
    val fullSec = (System.nanoTime() - t0) / 1e9

    // scale mode: report only delta-affected groups (the 10¹² operating
    // point — state commit identical, output restricted)
    val t1 = System.nanoTime()
    Incremental.run(spark, deltaImages, s"$base/corpus-work",
      s"$base/delta-work", fullOutput = false).count()
    val deltaSec = (System.nanoTime() - t1) / 1e9

    // full-output mode (reference report-everything UX) for comparison —
    // fresh deltaWork, same state version contract not disturbed: use a
    // disjoint second delta
    val delta2 = Synth.imagesDF(spark, nCorpus + nDelta,
      nCorpus + 2 * nDelta).localCheckpoint()
    val nDelta2 = delta2.count()
    val t2 = System.nanoTime()
    Incremental.run(spark, delta2, s"$base/corpus-work",
      s"$base/delta2-work", fullOutput = true).count()
    val fullOutSec = (System.nanoTime() - t2) / 1e9

    // sanity: merged state covers corpus+both deltas, index consistent
    val ver = graft.CorpusState.version(spark, s"$base/corpus-work")
    val merged = graft.CorpusState.readSignatures(
      spark, s"$base/corpus-work", ver).count()
    require(ver == 2 && merged == nCorpusImgs + nDeltaImgs + nDelta2,
      s"state inconsistent: v$ver rows=$merged " +
        s"want=${nCorpusImgs + nDeltaImgs + nDelta2}")

    val perImgFull = fullSec / nCorpusImgs
    val perImgDelta = deltaSec / nDeltaImgs
    println(f"""INCBENCH {"corpus_images":$nCorpusImgs,"delta_images":$nDeltaImgs,""" +
      f""""full_sec":$fullSec%.1f,"delta_sec":$deltaSec%.1f,""" +
      f""""full_report_delta_sec":$fullOutSec%.1f,""" +
      f""""full_ms_per_img":${perImgFull * 1000}%.2f,"delta_ms_per_img":${perImgDelta * 1000}%.2f,""" +
      f""""delta_vs_full_per_img":${perImgDelta / perImgFull}%.2f,"cpus":$cpus}""")
    spark.stop()
  }
}
