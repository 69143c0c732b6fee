package graft.tools

import graft.Pipeline
import graft.groups.GroupRegistry
import org.apache.spark.sql.functions._

/**
 * Registry scale evidence (round-3 VERDICT #7): the O(delta)
 * segment-append registry is spec-gated at fixture size only — this
 * bench drives it at ~10⁷ rows and verifies the contract holds:
 *
 *  - base merge of 10⁷ synthetic (hash → uuid) rows
 *  - a delta merge of `deltaRows` NEW hashes mixed with `deltaRows`
 *    ALREADY-REGISTERED hashes: the committed segment must contain
 *    exactly the new rows (anti-join discards re-registrations), and the
 *    wall is the O(corpus-scan + delta-write) steady-state cost
 *  - an idempotent re-merge of the same rows appends NOTHING
 *  - compact folds the segments into one resolved segment (the
 *    amortized O(corpus) rewrite, every CompactAfter runs)
 *
 * Usage: runMain graft.tools.RegistryBench [baseRows] [deltaRows] [cpus]
 */
object RegistryBench {
  def main(args: Array[String]): Unit = {
    val baseRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val deltaRows = if (args.length > 1) args(1).toLong else 10000L
    val cpus = if (args.length > 2) args(2).toInt else 16
    val spark = Pipeline.session(s"local[$cpus]", shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")

    val path = java.nio.file.Files.createTempDirectory("graft-regbench")
      .toString + "/registry"
    // deterministic synthetic registry rows: 4 hash words + a uuid-shaped
    // string, all derived from the row id
    def rows(from: Long, until: Long) =
      spark.range(from, until, 1, cpus).select(
        xxhash64(col("id")).as("h0"),
        xxhash64(col("id"), lit(1)).as("h1"),
        xxhash64(col("id"), lit(2)).as("h2"),
        xxhash64(col("id"), lit(3)).as("h3"),
        md5(col("id").cast("string")).as("group_uuid"))

    val t0 = System.nanoTime()
    GroupRegistry.merge(spark, path, rows(0, baseRows))
    val baseSec = (System.nanoTime() - t0) / 1e9

    // delta: half new hashes, half re-registrations of existing ones
    val delta = rows(baseRows, baseRows + deltaRows)
      .unionByName(rows(0, deltaRows))
    val t1 = System.nanoTime()
    GroupRegistry.merge(spark, path, delta)
    val deltaSec = (System.nanoTime() - t1) / 1e9

    val segs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("seg_")).map(_.getName).sorted
    require(segs.length == 2, s"expected 2 segments, got ${segs.mkString(",")}")
    val deltaSegRows = spark.read.parquet(s"$path/${segs.last}").count()
    require(deltaSegRows == deltaRows,
      s"delta segment has $deltaSegRows rows, want exactly $deltaRows " +
        "(re-registered hashes must be anti-joined away)")

    // idempotent re-merge: nothing new ⇒ no segment at all
    val t2 = System.nanoTime()
    GroupRegistry.merge(spark, path, delta)
    val rerunSec = (System.nanoTime() - t2) / 1e9
    require(new java.io.File(path).listFiles()
      .count(_.getName.startsWith("seg_")) == 2,
      "idempotent re-merge appended a segment")

    val t3 = System.nanoTime()
    GroupRegistry.compact(spark, path)
    val compactSec = (System.nanoTime() - t3) / 1e9
    val total = GroupRegistry.read(spark, path).count()
    require(total == baseRows + deltaRows,
      s"resolved registry has $total rows, want ${baseRows + deltaRows}")

    println(f"""REGISTRYBENCH {"base_rows":$baseRows,"delta_rows":$deltaRows,""" +
      f""""base_merge_sec":$baseSec%.1f,"delta_merge_sec":$deltaSec%.1f,""" +
      f""""idempotent_rerun_sec":$rerunSec%.1f,"compact_sec":$compactSec%.1f,""" +
      f""""delta_seg_rows":$deltaSegRows,"cpus":$cpus}""")
    spark.stop()
  }
}
