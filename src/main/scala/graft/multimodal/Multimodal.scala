package graft.multimodal

import graft.kernel.{ImageCodec, Pdq}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media blob. */
final case class MediaRow(
    media_id: String,
    kind: String,           // image | audio | video
    bytes: Array[Byte],
    fmt: String,            // png/jpg | wav-stub | mp4-stub
    meta_w: Int, meta_h: Int,
    meta_sample_rate: Int,  // audio
    meta_duration_ms: Long)

final case class MediaFeatures(
    media_id: String,
    kind: String,
    ok: Boolean,
    feature: Array[Float],  // fixed-width embedding-ish feature vector
    frames_sampled: Int,
    decode_note: String)

/**
 * Multimodal columns for a training-data pipeline: media as opaque
 * `binary` with typed metadata columns, processed by per-partition batch
 * kernels (the Scala analog of `mapInPandas` batches — one JVM-side
 * iterator pass, codecs initialized once per partition).
 *
 * Image decode/resize/feature-extract is REAL (ImageIO + the PDQ
 * pipeline's box resampler). Audio decode and video frame-sampling are
 * STUBS — the codecs aren't in this container — implemented as
 * deterministic byte-derived fakes behind the same batch interface, so
 * the Spark-side plumbing (schema, partitioning, batch shape, null
 * behavior) is real and tested while the codec call is one function to
 * swap.
 */
object Multimodal {
  final val FeatureDim = 32

  /** Image: decode, area-resize to 16×16 luma, normalized float feature. */
  def imageFeature(bytes: Array[Byte], fmt: String, w: Int, h: Int): Option[Array[Float]] =
    ImageCodec.decode(bytes, fmt, w, h).map { d =>
      val small = Pdq.boxResize(d.luma601, d.w, d.h, 8, 4) // 32 values
      small.map(_ / 255.0f)
    }

  /** STUB audio decode: deterministic pseudo-PCM from the bytes (stands in
    * for a real WAV/FLAC decoder; signature and batch shape are real). */
  def audioFeatureStub(bytes: Array[Byte], sampleRate: Int): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) / 128.0f) / math.max(bytes.length / FeatureDim, 1)
      i += 1
    }
    out
  }

  /** STUB video frame-sample: pretends to sample one frame per second of
    * metadata duration, features derived from byte windows. */
  def videoFramesStub(bytes: Array[Byte], durationMs: Long): (Array[Float], Int) = {
    val frames = math.max((durationMs / 1000).toInt, 1)
    val feat = new Array[Float](FeatureDim)
    var f = 0
    while (f < math.min(frames, 16)) {
      val off = (bytes.length.toLong * f / math.max(frames, 1)).toInt
      var i = 0
      while (i < FeatureDim && off + i < bytes.length) {
        feat(i) += bytes(off + i) / 128.0f / math.min(frames, 16)
        i += 1
      }
      f += 1
    }
    (feat, frames)
  }

  /** The batch kernel: one pass per partition, per-kind dispatch. */
  def features(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        m.kind match {
          case "image" =>
            imageFeature(m.bytes, m.fmt, m.meta_w, m.meta_h) match {
              case Some(f) => MediaFeatures(m.media_id, m.kind, ok = true, f, 1, "imageio")
              case None => MediaFeatures(m.media_id, m.kind, ok = false,
                Array.empty, 0, s"decode-failed:${m.fmt}")
            }
          case "audio" =>
            MediaFeatures(m.media_id, m.kind, ok = true,
              audioFeatureStub(m.bytes, m.meta_sample_rate), 1, "stub-pcm")
          case "video" =>
            val (f, n) = videoFramesStub(m.bytes, m.meta_duration_ms)
            MediaFeatures(m.media_id, m.kind, ok = true, f, n, "stub-frames")
          case other =>
            MediaFeatures(m.media_id, m.kind, ok = false, Array.empty, 0,
              s"unknown-kind:$other")
        }
      }
    }
  }

  /** Seeded hyperplanes for sign-random-projection bucketing:
    * tables × planes gaussian vectors of FeatureDim (driver-tiny,
    * broadcast as literals inside the expression tree). */
  private def hyperplanes(planes: Int, tables: Int, seed: Long): Array[Array[Array[Double]]] = {
    val r = new java.util.Random(seed)
    Array.fill(tables, planes, FeatureDim)(r.nextGaussian())
  }

  /**
   * Cosine near-dup over the feature column — BUCKETED, never all-pairs
   * (the round-1 brute-force theta join was a 10⁹-row non-starter; this is
   * the qAnnLshBuckets/qEmbedNearDup shape). Hyperplane LSH: per table,
   * the bucket key packs the sign bits of `planes` random projections;
   * candidates meet in an equi-join on (table, bucket) — cost follows
   * bucket occupancy, not n² — and are verified with the EXACT cosine
   * inside the join. Multi-table OR-construction recovers pairs a single
   * table splits; rows per table are linear (n × tables, no mask blowup).
   *
   * Collision probability per table: (1 − θ/π)^planes — at cos ≥ 0.95
   * (θ ≤ 18°) and 8 planes ≈ 0.43/table, 8 tables ⇒ miss < 1%; real
   * near-dups (cos ≥ 0.99) collide with ≥ 1−10⁻⁵. MultimodalSpec gates
   * bucketed == brute-force on the fixture corpus.
   */
  def cosinePairs(feats: DataFrame, minCos: Double, planes: Int = 8,
                  tables: Int = 8, seed: Long = 42L): DataFrame = {
    val hp = hyperplanes(planes, tables, seed)
    val ok = feats.where(col("ok"))
      .select(col("media_id"), col("feature"))

    // bucket key per (row, table): Σ_j [dot(f, plane_tj) > 0] << j,
    // all in built-in array expressions (zip_with/aggregate) — codegen'd
    def dotLit(f: Column, plane: Array[Double]): Column =
      aggregate(zip_with(f, lit(plane), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
    def bucketKey(f: Column, t: Int): Column =
      (0 until planes).map { j =>
        when(dotLit(f, hp(t)(j)) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)

    // round 6: the squared norm is a per-ROW constant — compute it once
    // before the table explode instead of once per collision (a pair
    // colliding in k tables previously paid 2k norm folds of FeatureDim
    // multiply-adds each); same expression over the same values, so the
    // float result is bit-identical
    val keyed = ok
      .withColumn("nrm", aggregate(transform(col("feature"), x => x * x),
        lit(0.0), (acc, v) => acc + v))
      .select(col("media_id"), col("feature"), col("nrm"),
        posexplode(array((0 until tables).map(t =>
          bucketKey(col("feature"), t)): _*)).as(Seq("table", "bucket")))

    val a = keyed.select(col("media_id").as("a"), col("feature").as("fa"),
      col("nrm").as("na"), col("table"), col("bucket"))
    val b = keyed.select(col("media_id").as("b"), col("feature").as("fb"),
      col("nrm").as("nb"), col("table"), col("bucket"))
    // both sides scale with n — keep it a shuffled join on the bucket key
    a.hint("shuffle_hash").join(b, Seq("table", "bucket"))
      .where(col("a") < col("b"))
      .withColumn("dot", aggregate(zip_with(col("fa"), col("fb"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v))
      .where(col("dot") > 0 &&
        col("dot") * col("dot") >= col("na") * col("nb") * (minCos * minCos))
      // a pair can meet in several tables — one row per pair
      .groupBy("a", "b").agg(max("dot").as("dot"))
  }
}
