package graft.tools

import graft.Pipeline
import graft.functions.{Geo, SearchQuery}
import org.apache.spark.sql.functions._

/**
 * EXIF search over a completed run — the §3.2 view-mode search surface
 * (scanner.rs search_index + exif_types pseudo-tags) as a batch CLI:
 *
 *   runMain graft.tools.SearchCli <workDir> "<query>" [limit]
 *
 * Reads `<workDir>/signatures` (the committed kernel table: EXIF columns
 * were parsed in-kernel from the bytes) and applies the reference's
 * query language with its tag aliases, e.g.:
 *
 *   "alt:>0 orientation:2-8"            sun above horizon, rotated
 *   "datetime_original:>1600000000"     taken after an epoch
 *   "lat:<0 timezone:>=8"               southern hemisphere, far east
 *   "id:contains:rot90 quality:>=80"    substring + quality floor
 *
 * Sun position / solar timezone derive on the fly from GPS + timestamp
 * (P18); country/subdivision need a polygon table and are a library
 * call (Geo.withCountry), not a CLI default — no boundary data ships in
 * this environment.
 */
object SearchCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SearchCli <workDir> \"<query>\" [limit]")
    val workDir = args(0)
    val query = args(1)
    val limit = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = Pipeline.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")

    val sig = spark.read.parquet(s"$workDir/signatures")
      .select(col("image_id"), col("fmt"), col("quality"),
        col("orientation"), col("exif_ts"),
        col("gps_lat").as("lat"), col("gps_lon").as("lon"))
    val enriched = Geo.withSunPosition(sig, "lon", "lat", "exif_ts")
      .withColumn("tz_offset_hours", round(col("lon") / 15.0, 0).cast("int"))

    val aliases = Map(
      "id" -> col("image_id"), "fmt" -> col("fmt"),
      "quality" -> col("quality"),
      "orientation" -> col("orientation"),
      "datetime_original" -> col("exif_ts"),
      "lat" -> col("lat"), "lon" -> col("lon"),
      "timezone" -> col("tz_offset_hours"),
      "sun_azimuth" -> col("sun_azimuth"),
      "sun_altitude" -> col("sun_altitude"))

    val hits = enriched.where(SearchQuery.predicate(query, aliases))
      .orderBy("image_id")
    val total = hits.count()
    hits.limit(limit).collect().foreach { r =>
      val ori = Option(r.getAs[Any]("orientation")).map(_.toString).getOrElse("-")
      val ts = Option(r.getAs[Any]("exif_ts")).map(_.toString).getOrElse("-")
      val alt = Option(r.getAs[Any]("sun_altitude"))
        .map(v => f"${v.asInstanceOf[Double]}%.1f").getOrElse("-")
      println(f"${r.getAs[String]("image_id")}%-28s fmt=${r.getAs[String]("fmt")}%-8s " +
        f"q=${r.getAs[Int]("quality")}%3d ori=$ori%-2s ts=$ts%-12s alt=$alt")
    }
    if (total > limit) println(s"... ${total - limit} more")
    println(s"== $total matches for '$query' ==")
    spark.stop()
  }
}
