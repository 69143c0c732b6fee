package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's EXIF search predicate language (search_index.rs:700-909),
 * re-expressed as a tiny parser producing Catalyst `Column` predicates —
 * pure translation, no custom plan nodes (SURVEY.md §2.9).
 *
 * Grammar: whitespace/';'-separated conjunctive terms, each one of
 *   tag:value            implicit op: numeric → Equals, else Contains
 *   tag:min-max          numeric range (open-ended `min-` allowed)
 *   tag:op:value         op ∈ = == eq | ~ contains like | re regex |
 *                        < lt | <= le lte | > gt | >= ge gte
 * Tag names resolve through a caller-supplied alias map (the analog of
 * resolve_tag_alias, search_index.rs:859-909).
 */
object SearchQuery {
  final case class Criterion(tag: String, op: String, value: String)

  private val opAliases = Map(
    "=" -> "eq", "==" -> "eq", "eq" -> "eq",
    "~" -> "contains", "contains" -> "contains", "like" -> "contains",
    "re" -> "regex", "regex" -> "regex",
    "<" -> "lt", "lt" -> "lt",
    "<=" -> "le", "le" -> "le", "lte" -> "le",
    ">" -> "gt", "gt" -> "gt",
    ">=" -> "ge", "ge" -> "ge", "gte" -> "ge")

  /** The reference's built-in tag alias table (resolve_tag_name,
    * search_index.rs:859-909), alias → canonical tag name. Canonical names
    * are what callers key their column maps by. */
  val canonicalAliases: Map[String, String] = {
    def m(canonical: String, aliases: String*) = aliases.map(_ -> canonical)
    (m("sun_azimuth", "sunazimuth", "sun_azimuth", "sun_az", "azimuth", "az",
        "sunposition", "sun_position", "sun") ++
      m("sun_altitude", "sunaltitude", "sun_altitude", "sun_alt", "altitude",
        "alt", "elevation") ++
      m("country", "country", "derivedcountry") ++
      m("subdivision", "subdivision", "state", "province", "region") ++
      m("timezone", "timezone", "tz") ++
      m("iso", "iso", "isospeed") ++
      m("fnumber", "aperture", "fnumber", "f") ++
      m("exposure_time", "exposure", "exposuretime", "shutter") ++
      m("focal_length", "focal", "focallength", "fl") ++
      m("focal_length_35mm", "focal35", "focallength35", "focallength35mm", "fl35") ++
      m("make", "make", "manufacturer", "brand") ++
      m("model", "model", "camera") ++
      m("lens_model", "lens", "lensmodel") ++
      m("lens_make", "lensmake") ++
      m("datetime_original", "date", "datetime", "datetimeoriginal") ++
      m("software", "software", "app") ++
      m("artist", "artist", "photographer") ++
      m("copyright", "copyright") ++
      m("orientation", "orientation") ++
      m("width", "width", "imagewidth") ++
      m("height", "height", "imageheight") ++
      m("flash", "flash") ++
      m("white_balance", "whitebalance", "wb") ++
      m("metering_mode", "metering", "meteringmode") ++
      m("exposure_program", "exposureprogram", "program") ++
      m("exposure_bias", "exposurebias", "ev", "bias") ++
      m("lat", "gps", "gpslat", "gpslatitude", "lat", "latitude") ++
      m("lon", "gpslon", "gpslongitude", "lon", "longitude") ++
      m("gps_altitude", "gpsalt", "gpsaltitude")).toMap
  }

  /** Alias → canonical tag name; unknown names pass through unchanged
    * (callers may define custom tags). */
  def resolveTag(name: String): String = {
    val l = name.toLowerCase
    canonicalAliases.getOrElse(l, l)
  }

  private val rangeRe = "^(-?\\d+(?:\\.\\d+)?)-(-?\\d+(?:\\.\\d+)?)?$".r
  private val numRe = "^-?\\d+(\\.\\d+)?$".r

  /** parse_search_query analog (search_index.rs:700-734). */
  def parse(query: String): Seq[Criterion] =
    query.split("[\\s;]+").filter(_.nonEmpty).toSeq.flatMap { term =>
      term.split(":", 3) match {
        case Array(tag, value) =>
          value match {
            // convenience shorthand: tag:>5 / tag:<=2.8 (op glued to value)
            case v if v.startsWith(">=") => Seq(Criterion(tag, "ge", v.drop(2)))
            case v if v.startsWith("<=") => Seq(Criterion(tag, "le", v.drop(2)))
            case v if v.startsWith(">") => Seq(Criterion(tag, "gt", v.drop(1)))
            case v if v.startsWith("<") => Seq(Criterion(tag, "lt", v.drop(1)))
            case rangeRe(min, max) if max != null => Seq(Criterion(tag, "range", s"$min:$max"))
            case rangeRe(min, _) => Seq(Criterion(tag, "ge", min))
            case v if numRe.matches(v) => Seq(Criterion(tag, "eq", v))
            case v => Seq(Criterion(tag, "contains", v))
          }
        case Array(tag, op, value) if opAliases.contains(op) =>
          Seq(Criterion(tag, opAliases(op), value))
        case _ => Nil
      }
    }

  /** Conjunctive Column predicate over `aliases: tagName → column`; tag
    * names resolve through [[canonicalAliases]] first, so "aperture:>2.8"
    * finds the caller's "fnumber" column (search_index.rs:859-909). */
  def predicate(query: String, aliases: Map[String, Column]): Column =
    parse(query).map { c =>
      val resolved = resolveTag(c.tag)
      val col = aliases.getOrElse(resolved, aliases.getOrElse(c.tag.toLowerCase,
        throw new IllegalArgumentException(s"unknown search tag: ${c.tag}")))
      c.op match {
        case "eq" if numRe.matches(c.value) => col === lit(c.value.toDouble)
        case "eq" => col === lit(c.value)
        case "contains" => lower(col.cast("string")).contains(c.value.toLowerCase)
        case "regex" => col.cast("string").rlike(c.value)
        case "lt" => col < lit(c.value.toDouble)
        case "le" => col <= lit(c.value.toDouble)
        case "gt" => col > lit(c.value.toDouble)
        case "ge" => col >= lit(c.value.toDouble)
        case "range" =>
          val Array(mn, mx) = c.value.split(":")
          col >= lit(mn.toDouble) && col <= lit(mx.toDouble)
      }
    }.reduceOption(_ && _).getOrElse(lit(true))
}
