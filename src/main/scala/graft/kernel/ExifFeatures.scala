package graft.kernel

import graft.model.ImageRow
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One EXIF-features row per image — the `feature_db` side table analog
  * (db.rs:705, SURVEY.md §1.3): typed columns promoted from the parsed
  * APP1 block, extracted from the IMAGE BYTES (not pre-extracted input
  * columns — this is what completes S8). */
final case class ExifFeatureRow(
    image_id: String,
    has_exif: Boolean,
    orientation: Option[Int],
    exif_str: Option[String],
    exif_ts: Option[Long],
    lat: Option[Double],
    lon: Option[Double],
    n_tags: Int)

object ExifFeatures {
  /** mapPartitions EXIF extraction — row-local, shuffle-free, linear at
    * any scale (the enrichment pass of scanner.rs:2566-2731 as a batch
    * job over the same table). */
  def features(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      it.map { row =>
        Exif.fromJpeg(row.bytes) match {
          case Some(e) => ExifFeatureRow(row.image_id, has_exif = true,
            e.orientation, e.dateTimeOriginal, e.timestamp, e.lat, e.lon,
            e.tags.size)
          case None => ExifFeatureRow(row.image_id, has_exif = false,
            None, None, None, None, None, 0)
        }
      }
    }.toDF()
  }
}
