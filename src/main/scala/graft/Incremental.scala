package graft

import graft.cc.ConnectedComponents
import graft.ckpt.Ckpt
import graft.groups.Groups
import graft.kernel.SignatureKernel
import graft.lsh.{BandIndex, BandJoin}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Versioned corpus state for chained incremental runs. A corpus work dir
 * holds an evolving (signatures, components) pair; version 0 is the batch
 * [[Pipeline]] run's own stage output, each incremental merge commits
 * version k+1 under `state_v{k+1}/` with an atomic marker file — the
 * Iceberg-snapshot analog. Readers resolve the highest committed marker,
 * so a crash mid-write leaves the previous version intact and visible.
 *
 * The marker records the deltaWork that produced it: a resumed run with
 * the same deltaWork skips the commit; a DIFFERENT delta trying to commit
 * the same version means two runs raced from the same base — refused
 * loudly (sequential chaining is the contract, matching single-writer
 * Iceberg commits).
 */
object CorpusState {
  def sigPath(corpusWork: String, v: Int): String =
    if (v == 0) s"$corpusWork/signatures" else s"$corpusWork/state_v$v/signatures"
  def compPath(corpusWork: String, v: Int): String =
    if (v == 0) s"$corpusWork/components" else s"$corpusWork/state_v$v/components"

  private def marker(corpusWork: String, v: Int) = s"$corpusWork/_state_v$v"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readFile(spark: SparkSession, p: String): Option[String] = {
    val f = fs(spark, p)
    val hp = new Path(p)
    if (!f.exists(hp)) None
    else {
      val in = f.open(hp)
      try {
        val bytes = new Array[Byte](math.max(f.getFileStatus(hp).getLen.toInt, 0))
        in.readFully(0, bytes)
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  private def writeFile(spark: SparkSession, p: String, content: String): Unit = {
    val f = fs(spark, p)
    val out = f.create(new Path(p), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Highest committed state version (0 when only the batch run exists). */
  def version(spark: SparkSession, corpusWork: String): Int = {
    var v = 0
    while (readFile(spark, marker(corpusWork, v + 1)).isDefined) v += 1
    v
  }

  def owner(spark: SparkSession, corpusWork: String, v: Int): Option[String] =
    readFile(spark, marker(corpusWork, v))

  /** Commit version `v` on behalf of `deltaWork`. Idempotent for the same
    * owner; refuses a version already committed by a different owner. */
  def commit(spark: SparkSession, corpusWork: String, v: Int,
             deltaWork: String): Unit =
    owner(spark, corpusWork, v) match {
      case Some(prev) if prev == deltaWork => // resume — already committed
      case Some(prev) =>
        throw new IllegalStateException(
          s"corpus state v$v was committed by $prev while $deltaWork was " +
            "running — concurrent incremental runs from the same base are " +
            "not supported; re-run against the current state")
      case None => writeFile(spark, marker(corpusWork, v), deltaWork)
    }
}

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
 *   5. the merged (signatures, components) state commits as a NEW corpus
 *      version ([[CorpusState]]) and the delta's band keys append to the
 *      index as an atomic segment — so the NEXT delta chains off complete
 *      state instead of silently reusing stale ords (the round-1 chained-
 *      run corruption)
 *
 * Consistency audit on every run: the index's max indexed ord must never
 * exceed the signatures' max ord (refused as corruption); an index LAGGING
 * the signatures (crash between state commit and index append) is
 * self-healed by re-appending the missing ord range.
 *
 * All stages checkpoint through [[Ckpt]] — a crashed incremental run
 * resumes idempotently like the batch pipeline.
 */
object Incremental {

  /** Filesystem-safe idempotency token for this delta (segment + marker). */
  private def deltaToken(deltaWork: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(deltaWork.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
  }

  def run(spark: SparkSession, deltaImages: DataFrame, corpusWork: String,
          deltaWork: String,
          threshold: Int = Pipeline.DefaultThreshold,
          registryPath: Option[String] = None): DataFrame = {
    val ckpt = new Ckpt(spark, deltaWork)
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String): Boolean = {
      val hp = new Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }

    // Pin the base version at FIRST start of this deltaWork: a resumed run
    // must keep reading the pre-merge state even after its own commit
    // advanced the version (otherwise resume would re-merge the delta into
    // an allSig that already contains it — duplicated rows).
    val baseVerPath = s"$deltaWork/_base_version"
    val baseVer: Int = {
      val fsys = new Path(deltaWork).getFileSystem(hconf)
      fsys.mkdirs(new Path(deltaWork))
      if (exists(baseVerPath)) {
        val in = fsys.open(new Path(baseVerPath))
        try scala.io.Source.fromInputStream(in).mkString.trim.toInt
        finally in.close()
      } else {
        val v = CorpusState.version(spark, corpusWork)
        val out = fsys.create(new Path(baseVerPath), true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
        v
      }
    }

    val corpusSig = spark.read.parquet(CorpusState.sigPath(corpusWork, baseVer))
    val indexPath = s"$corpusWork/band_index"
    if (!BandIndex.exists(spark, indexPath)) BandIndex.build(corpusSig, indexPath)

    val maxOrd = {
      val r = corpusSig.agg(max("ord")).head()
      if (r.isNullAt(0)) -1L else r.getLong(0) // empty corpus: start ords at 0
    }

    // index/signature consistency audit against the CURRENT state version
    // (a resumed run has already advanced the state + index past its own
    // pinned base — that is consistent, not corrupt)
    val curVer = CorpusState.version(spark, corpusWork)
    val curSig = if (curVer == baseVer) corpusSig
      else spark.read.parquet(CorpusState.sigPath(corpusWork, curVer))
    val curMaxOrd = {
      val r = curSig.agg(max("ord")).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
    val idxMax = BandIndex.maxOrd(spark, indexPath)
    require(idxMax <= curMaxOrd,
      s"band index max ord $idxMax exceeds signatures max ord $curMaxOrd — " +
        s"the index contains rows missing from corpus state v$curVer " +
        "(corrupt chained run); rebuild the index or restore the state")
    if (idxMax < curMaxOrd)
      BandIndex.append(curSig.where(col("ord") > idxMax), indexPath,
        segName = s"seg_repair_$curMaxOrd")

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

    val oldComps = spark.read.parquet(CorpusState.compPath(corpusWork, baseVer))
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

    // --- commit the merged state as the next corpus version, then append
    // the delta's band keys as an atomic segment. Order matters for the
    // audit above: state first (index may lag → self-heals), never the
    // reverse (index leading state is unrecoverable without a rebuild).
    val newVer = baseVer + 1
    if (CorpusState.owner(spark, corpusWork, newVer).isEmpty) {
      allSig.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(CorpusState.sigPath(corpusWork, newVer))
      comps.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(CorpusState.compPath(corpusWork, newVer))
    }
    CorpusState.commit(spark, corpusWork, newVer, deltaWork)
    BandIndex.append(deltaSig, indexPath,
      segName = s"seg_delta_${deltaToken(deltaWork)}")

    ckpt.flush()
    grouped
  }
}
