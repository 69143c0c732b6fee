package graft.lsh

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted band index — the Iceberg-shaped inverted index that makes
 * dedup INCREMENTAL at corpus scale (the Spark answer to the reference's
 * LMDB cache chain, scanner.rs:1251-1294 + hamminghash.rs:82-149): instead
 * of re-exploding all N images per run, the corpus's 16 exact chunk keys
 * per image are written once as a **range-partitioned, sorted** table;
 * a delta of new images expands its probe keys (8 dihedral variants ×
 * 16 chunks × radius-tol masks — the reference's probe-side scheme,
 * scanner.rs:1729-1767) and equi-joins the index.
 *
 * Why repartitionByRange on (band_idx, band_val) + sortWithinPartitions:
 * every parquet file then covers a tight contiguous key range, so file /
 * row-group min-max statistics prune probe scans (each probe batch
 * touches the narrow slice of files its band values fall in), compaction
 * stays local, and the 10^12-scale table can be split/merged by key range
 * — none of which hash partitioning gives. Storage is radius-0 (16
 * rows/image, like the reference's MIH buckets); the multi-probe masks
 * stay on the small delta side.
 *
 * Layout: a directory of SEGMENT subdirectories (`seg_*`), each committed
 * atomically by writing to a dot-prefixed staging dir and renaming — the
 * Iceberg-snapshot-commit analog. A crash mid-append leaves only an
 * invisible staging dir; a resumed append with the same segment name is a
 * no-op once the segment exists, so appends are exactly-once without any
 * side marker.
 *
 * Semantics match the full-join path including the low-quality gate
 * (scanner.rs:1579-1594): low-confidence rows are indexed and probed at
 * per-side limit 0 (exact match only), confident rows at the threshold.
 */
object BandIndex {
  final val BaseSegment = "seg_base"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- persisted chunk width -------------------------------------------
  // The index stores radius-0 keys, so probe masks all live on the delta
  // side: covering chunk tolerance ⌊t/m⌋ needs V(tol, b) masks per chunk
  // (no radius split is possible against a pre-materialized index). At
  // 16-bit (reference parity) that caps cleanly for any t ≤ 63; at 32-bit
  // chunks (the ≥10⁹-row build: 2¹⁶× sparser buckets, SCALING.md) the
  // probe-side mask cap limits t ≤ 31 — checked at probe time. The width
  // is written once at build (exclusive `_meta` file) and every later
  // append/probe reads it, so an index can never hold mixed-width keys.

  private def metaPath(path: String) = s"$path/_meta_chunk_bits"

  /** Chunk width this index was built with (16 when the marker predates
    * the knob — every pre-round-3 index is 16-bit). */
  def chunkBitsOf(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    val p = new Path(metaPath(path))
    if (!f.exists(p)) BandJoin.BitsPerChunk
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toInt
      finally in.close()
    }
  }

  private def writeChunkBits(spark: SparkSession, path: String, bits: Int): Unit = {
    val f = fs(spark, path)
    f.mkdirs(new Path(path))
    val p = new Path(metaPath(path))
    if (f.exists(p)) {
      val existing = chunkBitsOf(spark, path)
      require(existing == bits,
        s"band index at $path was built with $existing-bit chunks; cannot use $bits")
    } else {
      try {
        val out = f.create(p, false)
        try out.write(bits.toString.getBytes("UTF-8")) finally out.close()
      } catch {
        case _: java.io.IOException => // lost a create race — verify instead
          require(chunkBitsOf(spark, path) == bits,
            s"band index at $path committed a different chunk width")
      }
    }
  }

  /** True when the index has at least one committed segment. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    val p = new Path(path)
    f.exists(p) && f.listStatus(p).exists(_.getPath.getName.startsWith("seg_"))
  }

  /** All committed segment paths (ordered by name for determinism). */
  private def segments(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath).filter(_.getName.startsWith("seg_"))
      .map(_.toString).sorted.toSeq
  }

  /** The full index as a DataFrame (union of committed segments). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val segs = segments(spark, path)
    require(segs.nonEmpty, s"band index at $path has no committed segments")
    spark.read.parquet(segs: _*)
  }

  /** 16-bit values keep the historical INT band_val column (a pre-r3
    * segment and an r3 append must share one parquet schema within an
    * index dir); wider chunks need LONG and only occur in new indexes. */
  private def bandValTyped(c: org.apache.spark.sql.Column, chunkBits: Int) =
    if (chunkBits <= 16) c.cast("int") else c

  private def bandRows(sig: DataFrame, chunkBits: Int): DataFrame =
    sig.filter(col("has_pdq"))
      .select(col("ord"), col("h0"), col("h1"), col("h2"), col("h3"),
        col("low_conf"),
        posexplode(BandJoin.chunksArrayB(Seq("h0", "h1", "h2", "h3").map(col),
          chunkBits)).as(Seq("band_idx", "band_val")))
      .withColumn("band_val", bandValTyped(col("band_val"), chunkBits))

  /** Write one segment atomically: stage under a dot-prefixed dir, then
    * rename into place. Idempotent: an existing committed segment is left
    * untouched (a resumed run never double-appends). */
  private def writeSegment(sig: DataFrame, path: String, segName: String,
                           numPartitions: Int): Unit = {
    require(segName.startsWith("seg_"), s"segment name must start with seg_: $segName")
    val spark = sig.sparkSession
    val f = fs(spark, path)
    val finalP = new Path(path, segName)
    if (f.exists(finalP)) return // already committed
    val staging = new Path(path, s".tmp_$segName")
    bandRows(sig, chunkBitsOf(spark, path))
      .repartitionByRange(numPartitions, col("band_idx"), col("band_val"))
      .sortWithinPartitions("band_idx", "band_val")
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (!f.rename(staging, finalP))
      throw new java.io.IOException(
        s"band index commit failed: rename $staging -> $finalP")
  }

  /** Build the index from a full corpus (base segment). `chunkBits` is
    * frozen into the index (16 = reference parity; 32 = the ≥10⁹-row
    * build — probes then require threshold ≤ 31, see probe()). */
  def build(sig: DataFrame, path: String, numPartitions: Int = 32,
            chunkBits: Int = BandJoin.BitsPerChunk): Unit = {
    writeChunkBits(sig.sparkSession, path, chunkBits)
    writeSegment(sig, path, BaseSegment, numPartitions)
  }

  /** Append a delta's band keys as a new named segment (width comes from
    * the index's own metadata). `segName` is the idempotency key: pass one
    * derived from the delta run identity so a crashed-and-resumed append
    * commits exactly once. */
  def append(sig: DataFrame, path: String, segName: String = "seg_delta",
             numPartitions: Int = 32): Unit =
    writeSegment(sig, path, segName, numPartitions)

  /**
   * Compact all committed segments into one (the Iceberg rewrite-data-files
   * analog): after many deltas the index is N small range-sorted segments,
   * each probed file-by-file; compaction restores one tight global range
   * order. Protocol: write the merged rows to a staging dir, commit it as
   * a new segment, then delete the subsumed ones. A crash between commit
   * and deletes leaves duplicate band rows — semantically benign (probe
   * dedups via groupBy/min) and removed by the next compact; the index is
   * never unreadable or missing keys at any point.
   */
  def compact(spark: SparkSession, path: String, numPartitions: Int = 32): Unit = {
    val all = segments(spark, path)
    if (all.size <= 1) return
    val gen = all.size
    val segName = f"seg_zc$gen%06d" // sorts after deltas; new name per shape
    val f = fs(spark, path)
    val finalP = new Path(path, segName)
    if (!f.exists(finalP)) {
      val staging = new Path(path, s".tmp_$segName")
      spark.read.parquet(all: _*)
        .dropDuplicates() // row-identical dups from a prior crash window
        .repartitionByRange(numPartitions, col("band_idx"), col("band_val"))
        .sortWithinPartitions("band_idx", "band_val")
        .write.mode(SaveMode.Overwrite).parquet(staging.toString)
      if (!f.rename(staging, finalP))
        throw new java.io.IOException(s"compact commit failed: $staging -> $finalP")
    }
    all.filterNot(_.endsWith(s"/$segName"))
      .foreach(s => f.delete(new Path(s), true))
  }

  /** Highest ord present in the index, or -1 when empty — the indexed-ord
    * ceiling used to audit index/signature consistency (a lagging index
    * means committed signatures whose keys were never appended). */
  def maxOrd(spark: SparkSession, path: String): Long = {
    val r = read(spark, path).agg(max("ord")).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /**
   * Probe the persisted index with a delta: verified duplicate edges
   * (a = delta ord, b = index ord, dist), per-side low-confidence limits
   * applied. The delta expands probe keys at the full chunk tolerance
   * (pigeonhole over 16 chunks, exhaustive recall ≤ 63); the index side
   * is scanned with only the probed (band_idx, band_val) keys surviving —
   * a shuffled hash join whose index-side scan benefits from the range
   * layout's min-max pruning when the delta's key set is narrow.
   */
  def probe(spark: SparkSession, path: String, deltaSig: DataFrame,
            threshold: Int): DataFrame = {
    require(threshold <= 63,
      s"similarity $threshold > 63 needs R=4 probing (scanner.rs:1649-1655)")
    val chunkBits = chunkBitsOf(spark, path)
    val numChunks = 256 / chunkBits
    val tol = threshold / numChunks
    // the index side is radius-0, so the whole probe ball sits on the
    // delta — feasibility is arithmetic-checked BEFORE any mask array
    // materializes (at 32-bit chunks this limits threshold ≤ 31:
    // V(4,32) = 41k fits, V(5,32) = 242k does not)
    require(BandJoin.maskCount(tol, chunkBits) <= BandJoin.MaxMasksPerSide,
      s"threshold $threshold over a $chunkBits-bit index needs " +
        s"${BandJoin.maskCount(tol, chunkBits)} probe masks/chunk " +
        s"(> ${BandJoin.MaxMasksPerSide}) — rebuild the index with " +
        "narrower chunks or lower the threshold")
    val idx = read(spark, path)
      .select(col("band_idx"), col("band_val"), col("ord").as("c_ord"),
        col("h0").as("c0"), col("h1").as("c1"),
        col("h2").as("c2"), col("h3").as("c3"),
        col("low_conf").as("c_low"))

    val delta = deltaSig.filter(col("has_pdq"))
    val prbBase = delta
      .select(col("ord"), col("low_conf").as("q_low"),
        explode(col("variants")).as("v"))
      .select(col("ord"), col("q_low"),
        col("v").getItem(0).as("v0"), col("v").getItem(1).as("v1"),
        col("v").getItem(2).as("v2"), col("v").getItem(3).as("v3"))
    val prb = prbBase
      .select(col("*"),
        posexplode(BandJoin.chunksArrayB(Seq("v0", "v1", "v2", "v3").map(col),
          chunkBits)).as(Seq("band_idx", "chunk")))
      .withColumn("mask", explode(lit(BandJoin.masksB(tol, chunkBits))))
      .withColumn("band_val",
        bandValTyped(col("chunk").bitwiseXOR(col("mask")), chunkBits))
      .drop("chunk", "mask")
      .select(col("band_idx"), col("band_val"), col("ord").as("q_ord"),
        col("q_low"), col("v0"), col("v1"), col("v2"), col("v3"))

    val vh = Seq("v0", "v1", "v2", "v3").map(col)
    val ch = Seq("c0", "c1", "c2", "c3").map(col)
    // per-side limit: either side low-confidence ⇒ exact only (F2)
    prb.hint("shuffle_hash").join(idx, Seq("band_idx", "band_val"))
      .where(col("q_ord") =!= col("c_ord"))
      .withColumn("dist", BandJoin.hammingCols(vh, ch))
      .where(col("dist") <=
        when(col("q_low") || col("c_low"), lit(0)).otherwise(lit(threshold)))
      .groupBy(col("q_ord").as("a"), col("c_ord").as("b"))
      .agg(min("dist").as("dist"))
  }
}
