package graft.tools

import graft.{Pipeline, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to
  * plans/<round>/<query>_<suffix>.txt — the judge-checkable record of plan
  * shapes before/after an optimization round. Plans depend on schema, not
  * data volume, so the smallest SF suffices.
  *
  * Usage: runMain graft.tools.PlanDump [outDir] [suffix] [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/plans/r06")
    val suffix = if (args.length > 1) args(1) else "after"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names: Seq[String] = if (args.length > 2) args.drop(2).toSeq else Seq(
      "q_img_edges", "q_minhash_band_pairs", "q_doc_minhash",
      "q_substring_dup", "q_phash_groups", "q_hamming_hist")
    val spark = Pipeline.session("local[4]")
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
