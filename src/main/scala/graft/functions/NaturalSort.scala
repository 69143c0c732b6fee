package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Natural-order sort key (the reference's natord comparison,
 * scanner.rs:2026-2038 / sort_files :2040-2109): digit runs compare
 * numerically, text case-insensitively — "img2" < "img10".
 *
 * Implemented as a sortable-key transform: every digit run is left-padded
 * with zeros to fixed width, the rest lowercased. A pure `Column`
 * expression pipeline (regexp over split), no UDF — stays in codegen.
 */
object NaturalSort {
  private val Width = 12

  /** Sortable key column: lowercase, digit runs zero-padded to 12. */
  def key(c: Column): Column = {
    // split into alternating text/digit runs, pad the digit runs, re-join
    val parts = split(lower(c), "(?<=\\D)(?=\\d)|(?<=\\d)(?=\\D)")
    array_join(
      transform(parts, p =>
        when(p.rlike("^\\d+$"), lpad(p, Width, "0")).otherwise(p)),
      "")
  }

  /** exif-date comparator (scanner.rs:2078-2095): rows WITH an EXIF
    * timestamp first (ordered by it), rows without after (ordered by
    * mtime); `desc` flips both inner orders but keeps with-EXIF first. */
  def exifDateOrder(exifTs: Column, date: Column, desc: Boolean): Seq[Column] =
    if (desc) Seq(exifTs.isNull.asc, exifTs.desc_nulls_last, date.desc)
    else Seq(exifTs.isNull.asc, exifTs.asc_nulls_last, date.asc)

  /** Haversine distance (km) — the GUI layer's `location` sort key
    * (scanner.rs:2101: distance to the current GPS state). */
  def haversineKm(lat: Column, lon: Column, refLat: Double, refLon: Double): Column = {
    val toRad = math.Pi / 180.0
    val dLat = (lat - refLat) * toRad
    val dLon = (lon - refLon) * toRad
    val a = pow(sin(dLat / 2), 2) +
      cos(lat * toRad) * cos(lit(refLat * toRad)) * pow(sin(dLon / 2), 2)
    lit(6371.0) * lit(2.0) * asin(sqrt(a))
  }

  /** The reference's 12 sort orders (scanner.rs:2040-2109), as sort
    * Columns. `exifTs` may be null per row (exif-date fallback to mtime);
    * `location` sorts by distance to (refLat, refLon) with GPS-less rows
    * last — the reference defers this exact computation to its GUI layer.
    * Unknown orders fall back to name-natural like the reference. */
  def order(sortOrder: String, name: Column, date: Column, size: Column,
            exifTs: Column = lit(null), lat: Column = lit(null),
            lon: Column = lit(null), refLat: Double = 0.0, refLon: Double = 0.0,
            seed: Long = 42L): Seq[Column] = sortOrder match {
    case "name" => Seq(name.asc)
    case "name-desc" => Seq(name.desc)
    case "name-natural" | "natural" => Seq(key(name).asc)
    case "name-natural-desc" | "natural-desc" => Seq(key(name).desc)
    case "date" => Seq(date.asc)
    case "date-desc" => Seq(date.desc)
    case "size" => Seq(size.asc)
    case "size-desc" => Seq(size.desc)
    case "exif-date" => exifDateOrder(exifTs, date, desc = false)
    case "exif-date-desc" => exifDateOrder(exifTs, date, desc = true)
    case "location" =>
      Seq((lat.isNull || lon.isNull).asc,
        haversineKm(lat, lon, refLat, refLon).asc_nulls_last)
    case "random" => Seq(rand(seed).asc)
    case _ => Seq(key(name).asc) // reference fallback: name-natural
  }
}
