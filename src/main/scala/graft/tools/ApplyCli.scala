package graft.tools

import graft.Pipeline
import graft.groups.FileOps
import org.apache.spark.sql.functions._

/**
 * Apply a keep/drop manifest to the filesystem — the batch form of the
 * reference's delete / move-to-destination actions (phdupes.rs:477-494,
 * state.rs:824-860, fileops.rs:97-257). DRY-RUN by default: pass the
 * literal `apply` to perform side effects.
 *
 * Usage:
 *   runMain graft.tools.ApplyCli <manifestParquet> <delete|move> <allowedRoot> [destDir|-] [apply] [resultsOut]
 *
 * The manifest needs `path` and `keep` columns (join your image_id → path
 * scan table onto DedupCli's drop manifest first — the input contract
 * carries image_ids, not files). Results land as a parquet lineage table
 * (path, action, ok, dest, err) at `resultsOut` (default
 * `<manifest>_applied`), and the run is idempotent: re-running after a
 * partial failure reports the finished rows as `already_absent`.
 */
object ApplyCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ApplyCli <manifestParquet> <delete|move> <allowedRoot> [destDir|-] [apply] [resultsOut]")
    val Array(manifestPath, mode, allowedRoot) = args.take(3)
    val destDir = args.lift(3).filter(a => a.nonEmpty && a != "-")
    val doApply = args.lift(4).contains("apply")
    val resultsOut = args.lift(5).filter(_.nonEmpty)
      .getOrElse(manifestPath.stripSuffix("/") + "_applied")

    val spark = Pipeline.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")

    val manifest = spark.read.parquet(manifestPath)
    require(manifest.columns.contains("path") && manifest.columns.contains("keep"),
      s"manifest at $manifestPath needs (path, keep) columns — join your " +
        "image_id -> path table onto the drop manifest first; found: " +
        manifest.columns.mkString(", "))

    val results = FileOps.applyManifest(manifest, mode, allowedRoot,
      destDir, dryRun = !doApply)
    results.write.mode("overwrite").parquet(resultsOut)

    val written = spark.read.parquet(resultsOut)
    val counts = written.groupBy("action").count()
      .orderBy(desc("count")).collect()
    val label = if (doApply) "APPLIED" else "DRY-RUN"
    println(s"== $label $mode under $allowedRoot ==")
    counts.foreach(r => println(f"  ${r.getAs[String]("action")}%-16s ${r.getAs[Long]("count")}"))
    val failures = written.where(!col("ok")).limit(20).collect()
    if (failures.nonEmpty) {
      println(s"-- first ${failures.length} failures --")
      failures.foreach(r => println(
        s"  ${r.getAs[String]("action")} ${r.getAs[String]("path")}: ${r.getAs[String]("err")}"))
    }
    println(s"== results -> $resultsOut ==")
    spark.stop()
  }
}
