package graft

import graft.cc.ConnectedComponents
import graft.ckpt.Ckpt
import graft.groups.Groups
import graft.kernel.SignatureKernel
import graft.lsh.{BandIndex, BandJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental dedup: merge a DELTA of new images into a completed corpus
 * run without touching corpus-internal pairs — the 10^12-scale version of
 * the reference's incremental rescan (scanner.rs:1251-1294: cache-hit
 * files skip hashing; here the whole corpus skips candidate generation).
 *
 * Work is delta-proportional:
 *   1. kernel only on delta rows (ords offset past the corpus max)
 *   2. delta ↔ corpus candidate edges via the persisted range-partitioned
 *      [[BandIndex]] (probe-side dihedral + multi-probe expansion on the
 *      small delta only). One-directional probing is EXACT: each dihedral
 *      variant hash is a fixed bit-isometry T_g of the original
 *      (pdqhash.rs:71-151 — permutation + XOR), so
 *      min_g dist(T_g(a), b) = min_g dist(a, T_g(b)) by group closure.
 *   3. delta-internal edges via the ordinary self band join
 *   4. existing groups enter connected components as star edges
 *      (comp → member), so merged labels stay min-ord-consistent with
 *      what a full run over corpus ∪ delta would produce
 *   5. the delta's band keys are appended to the index (guarded by a
 *      marker so a resumed run never double-appends)
 *
 * All stages checkpoint through [[Ckpt]] — a crashed incremental run
 * resumes idempotently like the batch pipeline.
 */
object Incremental {

  def run(spark: SparkSession, deltaImages: DataFrame, corpusWork: String,
          deltaWork: String,
          threshold: Int = Pipeline.DefaultThreshold,
          registryPath: Option[String] = None): DataFrame = {
    val ckpt = new Ckpt(spark, deltaWork)
    val corpusSig = spark.read.parquet(s"$corpusWork/signatures")
    val indexPath = s"$corpusWork/band_index"
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }
    if (!exists(s"$indexPath/_SUCCESS")) BandIndex.build(corpusSig, indexPath)

    val maxOrd = corpusSig.agg(max("ord")).head().getLong(0)
    val (deltaSig, _) = ckpt.stage("delta_signatures")(
      SignatureKernel.signatures(spark, deltaImages).toDF()
        .dropDuplicates("image_id")
        // S1 semantics across runs: an image_id already in the corpus is
        // the same logical row — skip it (cheap anti-join on ~tiny delta)
        .join(corpusSig.select("image_id"), Seq("image_id"), "left_anti")
        .withColumn("ord", monotonically_increasing_id() + lit(maxOrd + 1)))

    val (cross, _) = ckpt.stage("delta_cross_edges")(
      BandIndex.probe(spark, indexPath, deltaSig, threshold)
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"), col("dist")))

    val (internal, _) = ckpt.stage("delta_internal_edges")(
      BandJoin.edges(deltaSig, threshold))

    val oldComps = spark.read.parquet(s"$corpusWork/components")
    val starEdges = oldComps.where(col("id") =!= col("comp"))
      .select(col("comp").as("a"), col("id").as("b"), lit(0).as("dist"))

    val allEdges = cross.unionByName(internal).unionByName(starEdges)
    val (comps, _) = ckpt.stage("components")(
      ConnectedComponents.run(spark, allEdges))

    val allSig = corpusSig.unionByName(deltaSig)
    val (grouped, _) = ckpt.stage("groups")(registryPath match {
      case None => Groups.assemble(allSig, comps)
      case Some(regPath) =>
        // same S11/J7 semantics as the batch path: a merged group keeps
        // the UUID any of its members' hashes already carry — so a group
        // that absorbs delta rows keeps its identity across runs
        val assembled = Groups.assemble(allSig, comps)
        val registry =
          try spark.read.parquet(regPath)
          catch {
            case scala.util.control.NonFatal(_) =>
              import spark.implicits._
              Seq.empty[(Long, Long, Long, Long, String)]
                .toDF("h0", "h1", "h2", "h3", "group_uuid")
          }
        val assigned = graft.groups.GroupRegistry.assign(assembled, registry)
          .localCheckpoint()
        graft.groups.GroupRegistry.merge(spark, regPath,
          graft.groups.GroupRegistry.registryRows(assembled, assigned))
        assembled.join(assigned, Seq("comp"), "left")
    })

    // index maintenance — marker-guarded so resume never double-appends
    val appendedMarker = s"$deltaWork/_index_appended"
    if (!exists(appendedMarker)) {
      BandIndex.append(deltaSig, indexPath)
      val mp = new org.apache.hadoop.fs.Path(appendedMarker)
      mp.getFileSystem(hconf).create(mp, true).close()
    }
    ckpt.flush()
    grouped
  }
}
