package graft.tools

import graft.{Incremental, Pipeline}
import graft.groups.Groups
import graft.synth.Synth

/**
 * Incremental dedup CLI: merge a delta of new images into a completed
 * corpus run (the `phdupes` rescan analog at delta-proportional cost).
 *
 * Usage:
 *   runMain graft.tools.IncrementalCli <corpusWorkDir> <deltaImagesDir|SYNTHDELTA:n:seedOffset> <deltaWorkDir> [threshold] [registryPath] [pdq|phash]
 *
 * `SYNTHDELTA:30:1000` synthesizes 30 bases starting at base id 1000 (so
 * the delta contains both fresh images and, by re-using low base ids,
 * near-dups of corpus images — pass an offset overlapping the corpus to
 * exercise cross-boundary merging).
 */
object IncrementalCli {
  def main(args: Array[String]): Unit = {
    val Array(corpusWork, deltaInput, deltaWork) = args.take(3)
    // "-" or "" = default (so registryPath can be passed positionally)
    val algorithm = args.lift(5).filter(a => a.nonEmpty && a != "-")
      .getOrElse("pdq")
    val threshold = args.lift(3).filter(t => t.nonEmpty && t != "-")
      .map(_.toInt).getOrElse(-1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Pipeline.session(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")

    val delta =
      if (deltaInput.startsWith("SYNTHDELTA")) {
        val parts = deltaInput.split(":")
        val n = parts.lift(1).map(_.toLong).getOrElse(20L)
        val off = parts.lift(2).map(_.toLong).getOrElse(0L)
        import spark.implicits._
        (off until off + n).flatMap(Synth.rowsForBase)
          .map(r => (r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
          .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
      } else Synth.readImages(spark, deltaInput)

    val registryPath = args.lift(4).filter(a => a.nonEmpty && a != "-")
    val t0 = System.nanoTime()
    val grouped = Incremental.run(spark, delta, corpusWork, deltaWork, threshold,
      registryPath = registryPath, algorithm = algorithm)
    val summary = Groups.groupSummary(grouped).collect()
    val wall = (System.nanoTime() - t0) / 1e9
    val nDelta = delta.count()

    println(s"== graft incremental: $nDelta delta images into $corpusWork ==")
    summary.take(30).foreach { r =>
      val members = r.getAs[scala.collection.Seq[String]]("members")
      println(f"group size=${r.getAs[Long]("group_size")}%3d " +
        f"max_dist=${r.getAs[Int]("max_dist")}%3d " +
        f"status=${r.getAs[String]("status")}%-13s ${members.sorted.mkString(", ")}")
    }
    if (summary.length > 30) println(s"... ${summary.length - 30} more groups")
    println(f"== ${summary.length} groups after merge, ${wall}%.1f s wall ==")
    spark.stop()
  }
}
