package graft.lsh

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
 * Semantics match the full-join path including the low-quality gate
 * (scanner.rs:1579-1594): low-confidence rows are indexed and probed at
 * per-side limit 0 (exact match only), confident rows at the threshold.
 */
object BandIndex {

  /** Explode `sig` into the persisted index layout:
    * (band_idx, band_val, ord, h0..h3, low_conf), range-partitioned and
    * sorted by the band key. */
  def build(sig: DataFrame, path: String, numPartitions: Int = 32): Unit = {
    val rows = sig.filter(col("has_pdq"))
      .select(col("ord"), col("h0"), col("h1"), col("h2"), col("h3"),
        col("low_conf"),
        posexplode(BandJoin.chunksArray(Seq("h0", "h1", "h2", "h3").map(col)))
          .as(Seq("band_idx", "band_val")))
    rows
      .repartitionByRange(numPartitions, col("band_idx"), col("band_val"))
      .sortWithinPartitions("band_idx", "band_val")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Append a delta's band keys to an existing index (Iceberg-commit
    * analog; file-level range stats still prune because each appended file
    * is itself range-partitioned). */
  def append(sig: DataFrame, path: String, numPartitions: Int = 32): Unit =
    sig.filter(col("has_pdq"))
      .select(col("ord"), col("h0"), col("h1"), col("h2"), col("h3"),
        col("low_conf"),
        posexplode(BandJoin.chunksArray(Seq("h0", "h1", "h2", "h3").map(col)))
          .as(Seq("band_idx", "band_val")))
      .repartitionByRange(numPartitions, col("band_idx"), col("band_val"))
      .sortWithinPartitions("band_idx", "band_val")
      .write.mode(SaveMode.Append).parquet(path)

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
    val tol = threshold / BandJoin.NumChunks
    val idx = spark.read.parquet(path)
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
        posexplode(BandJoin.chunksArray(Seq("v0", "v1", "v2", "v3").map(col)))
          .as(Seq("band_idx", "chunk")))
      .withColumn("mask", explode(lit(BandJoin.masks(tol))))
      .withColumn("band_val", col("chunk").bitwiseXOR(col("mask")))
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
