package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Geo derivations (SURVEY.md P17/P18, out of the dedup critical path):
 *
 *  - country/subdivision from GPS: ray-casting point-in-polygon against a
 *    broadcast boundary table (the reference bundles ODbL polygons and
 *    scans them per point, exif_extract.rs:441-480; Spark-first = broadcast
 *    the small boundary table and keep the scan distributed)
 *  - solar azimuth/altitude from GPS + epoch seconds: the standard NOAA
 *    low-accuracy solar position algorithm (Meeus, Astronomical Algorithms
 *    ch. 25 — public formulas; the reference uses the solar-positioning
 *    crate, position.rs:49-127)
 */
object Geo {
  /** Ray-casting point-in-polygon; polygon = flat [lon0,lat0,lon1,lat1,…]. */
  def pointInPolygon(lon: Double, lat: Double, poly: Array[Double]): Boolean = {
    var inside = false
    val n = poly.length / 2
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = poly(2 * i); val yi = poly(2 * i + 1)
      val xj = poly(2 * j); val yj = poly(2 * j + 1)
      if (((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  private val pipUdf = udf(
    (lon: Double, lat: Double, poly: Seq[Double]) =>
      pointInPolygon(lon, lat, poly.toArray))

  /**
   * Attach `country` to rows with (lonCol, latCol) by broadcast-joining a
   * small boundary table `countries(country string, poly array<double>)`.
   * Cross join + PiP filter: boundary tables are hundreds of rows — the
   * broadcast keeps the big side un-shuffled.
   */
  def withCountry(points: DataFrame, countries: DataFrame,
                  lonCol: String, latCol: String): DataFrame = {
    val hit = points.join(broadcast(countries),
        pipUdf(col(lonCol), col(latCol), col("poly")), "left")
      .drop("poly")
    hit
  }

  // --- solar position (NOAA low-accuracy, all angles degrees) ---

  final case class SunPos(azimuth: Double, altitude: Double)

  /** Solar azimuth (deg clockwise from north) and altitude for a GPS
    * position at epoch seconds UTC. Accuracy ~0.01-0.1°, plenty for the
    * reference's derived EXIF tags (exif_types.rs:62-74). */
  def sunPosition(lon: Double, lat: Double, epochSec: Long): SunPos = {
    import math._
    val jd = epochSec / 86400.0 + 2440587.5
    val d = jd - 2451545.0 // days since J2000
    val g = toRadians((357.529 + 0.98560028 * d) % 360) // mean anomaly
    val q = (280.459 + 0.98564736 * d) % 360 // mean longitude
    val l = toRadians(q + 1.915 * sin(g) + 0.020 * sin(2 * g)) // ecliptic lon
    val e = toRadians(23.439 - 0.00000036 * d) // obliquity
    val ra = atan2(cos(e) * sin(l), cos(l)) // right ascension
    val dec = asin(sin(e) * sin(l)) // declination
    val gmst = (18.697374558 + 24.06570982441908 * d) % 24 // sidereal h
    val lst = gmst + lon / 15.0 // local sidereal hours
    var ha = toRadians(lst * 15) - ra // hour angle
    while (ha > Pi) ha -= 2 * Pi
    while (ha < -Pi) ha += 2 * Pi
    val latR = toRadians(lat)
    val alt = asin(sin(latR) * sin(dec) + cos(latR) * cos(dec) * cos(ha))
    val az = atan2(-sin(ha), tan(dec) * cos(latR) - sin(latR) * cos(ha))
    SunPos((toDegrees(az) + 360) % 360, toDegrees(alt))
  }

  private val sunUdf = udf((lon: Double, lat: Double, epoch: Long) => {
    val p = sunPosition(lon, lat, epoch)
    (p.azimuth, p.altitude)
  })

  def withSunPosition(df: DataFrame, lonCol: String, latCol: String,
                      epochCol: String): DataFrame =
    df.withColumn("_sun", sunUdf(col(lonCol), col(latCol), col(epochCol)))
      .withColumn("sun_azimuth", round(col("_sun._1"), 4))
      .withColumn("sun_altitude", round(col("_sun._2"), 4))
      .drop("_sun")

  /** GPS DMS rational triplet → signed decimal degrees (P15,
    * exif_extract.rs:48-91). */
  def dmsToDecimal(deg: Double, min: Double, sec: Double, ref: String): Double = {
    val v = deg + min / 60.0 + sec / 3600.0
    if (ref == "S" || ref == "W") -v else v
  }
}
