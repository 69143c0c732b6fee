package graft.kernel

import java.nio.charset.StandardCharsets

/** Parsed EXIF record — the Spark analog of the reference's
  * `ImageFeatures` (image_features.rs:13-23): promoted typed fields for
  * the searchable tags plus a tag→string map for the long tail
  * (exif_types.rs:12-35 ExifValue rendered to string). */
final case class ExifData(
    orientation: Option[Int],           // tag 0x0112, values 1-8
    dateTimeOriginal: Option[String],   // tag 0x9003, "YYYY:MM:DD HH:MM:SS"
    timestamp: Option[Long],            // ^ parsed to epoch seconds (UTC)
    lat: Option[Double],                // GPS 0x0001/0x0002 DMS → signed decimal
    lon: Option[Double],                // GPS 0x0003/0x0004
    tags: Map[Int, String])

/**
 * Pure-JVM EXIF reader + writer over JPEG APP1 segments — completes S8
 * (the reference parses EXIF out of the file bytes, scanner.rs:107-192 via
 * kamadak-exif; here a from-scratch TIFF-IFD walk). Both byte orders
 * (II/MM), IFD0 + ExifIFD (0x8769) + GPS IFD (0x8825), inline and
 * offset-addressed values, types BYTE/ASCII/SHORT/LONG/RATIONAL/
 * SRATIONAL.
 *
 * The writer builds a little-endian APP1 segment from typed fields and
 * splices it after SOI — used by Synth to embed deterministic EXIF in its
 * JPEGs so the parser is exercised on real image bytes (round-trip gated
 * by ExifSpec).
 */
object Exif {
  // --- tag ids (exif_types.rs / TIFF 6.0) ---
  final val TagMake = 0x010f
  final val TagOrientation = 0x0112
  final val TagExifIfd = 0x8769
  final val TagGpsIfd = 0x8825
  final val TagDateTimeOriginal = 0x9003
  final val GpsLatRef = 0x0001
  final val GpsLat = 0x0002
  final val GpsLonRef = 0x0003
  final val GpsLon = 0x0004

  // ======================== parsing ========================

  /**
   * Container-aware EXIF extraction — S8 for every format family the
   * kernel decodes, not just JPEG (scanner.rs:162-192 parses EXIF from
   * file bytes for all formats; raw_exif.rs:1-358 walks RAW containers):
   *
   *  - JPEG: the APP1 "Exif" segment (a TIFF block inside the marker)
   *  - TIFF: the file IS the TIFF-IFD stream — parse at offset 0
   *  - RAW (NEF/DNG/CR2/ARW/…): TIFF-based containers — parse at offset
   *    0; non-TIFF RAW falls back to scanning for an embedded "Exif\0\0"
   *    block (the in-preview APP1)
   *  - HEIC/HEIF/AVIF/JXL: ISOBMFF box walk ([[Isobmff.exif]]) — the HEIF
   *    'Exif' meta-item or the JXL container's Exif box; the pixel codec
   *    is env-blocked, the metadata layout is public bytes (round 5)
   *  - anything else: sniff the magic bytes and use whichever applies
   */
  def fromBytes(bytes: Array[Byte], fmt: String): Option[ExifData] = {
    def tiffAt0 = parseTiff(bytes, 0, bytes.length)
    def isTiffHeader = bytes.length >= 8 &&
      ((bytes(0) == 'I' && bytes(1) == 'I') || (bytes(0) == 'M' && bytes(1) == 'M'))
    fmt.toLowerCase match {
      case "jpg" | "jpeg" => fromJpeg(bytes)
      case "tiff" | "tif" => tiffAt0
      // ISOBMFF containers (HEIC/AVIF Exif item, JXL-container Exif box):
      // the pixel tier is env-blocked but the metadata is plain box layout
      case "heic" | "heif" | "avif" | "jxl" => Isobmff.exif(bytes)
      // RIFF container: the EXIF chunk is a plain TIFF payload (S8)
      case "webp" => Webp.exif(bytes)
      case f if ImageCodec.RawFormats(f) =>
        if (isTiffHeader) tiffAt0.orElse(scanEmbeddedExif(bytes))
        else scanEmbeddedExif(bytes)
      case _ =>
        if (bytes.length >= 2 && bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte)
          fromJpeg(bytes)
        else if (isTiffHeader) tiffAt0
        else if (Isobmff.looksIsobmff(bytes)) Isobmff.exif(bytes)
        else if (Webp.looksWebp(bytes)) Webp.exif(bytes)
        else None
    }
  }

  /** Scan for an embedded "Exif\0\0" marker anywhere in the container and
    * parse the TIFF block that follows (the RAW fallback path). */
  private def scanEmbeddedExif(bytes: Array[Byte]): Option[ExifData] = {
    var i = 0
    val limit = bytes.length - 10
    while (i < limit) {
      if (bytes(i) == 'E' && bytes(i + 1) == 'x' && bytes(i + 2) == 'i' &&
        bytes(i + 3) == 'f' && bytes(i + 4) == 0 && bytes(i + 5) == 0) {
        val r = parseTiff(bytes, i + 6, bytes.length)
        if (r.isDefined) return r
      }
      i += 1
    }
    None
  }

  /** Extract EXIF from a JPEG byte stream (APP1 "Exif\0\0" segment). */
  def fromJpeg(bytes: Array[Byte]): Option[ExifData] = {
    if (bytes.length < 4 || bytes(0) != 0xff.toByte || bytes(1) != 0xd8.toByte)
      return None
    var i = 2
    while (i + 4 <= bytes.length && bytes(i) == 0xff.toByte) {
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xda || marker == 0xd9) return None // SOS/EOI: no APP1
      val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      if (marker == 0xe1 && len >= 8 &&
        i + 4 + 6 <= bytes.length &&
        bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
        bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0) {
        val tiffStart = i + 10
        val tiffEnd = math.min(i + 2 + len, bytes.length)
        return parseTiff(bytes, tiffStart, tiffEnd)
      }
      i += 2 + len
    }
    None
  }

  /** Parse a TIFF-IFD block in bytes[start, end). */
  def parseTiff(b: Array[Byte], start: Int, end: Int): Option[ExifData] = {
    if (start + 8 > end) return None
    val little = b(start) == 'I' && b(start + 1) == 'I'
    val big = b(start) == 'M' && b(start + 1) == 'M'
    if (!little && !big) return None

    // p < start guards offsets that wrapped negative through .toInt on a
    // crafted 32-bit value (fuzz-found: Index -1 AIOOBE in the kernel)
    def u16(off: Int): Int = {
      val p = start + off
      if (p < start || p + 2 > end) return -1
      if (little) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    }
    def u32(off: Int): Long = {
      val p = start + off
      if (p < start || p + 4 > end) return -1L
      val v =
        if (little) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
          ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
        else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
          ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      v
    }
    if (u16(2) != 42) return None

    val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 7 -> 1, 9 -> 4, 10 -> 8)

    /** One IFD's entries as tag → rendered string (plus raw access). */
    def readIfd(ifdOff: Long): Seq[(Int, Int, Long, Long)] = {
      // (tag, type, count, valueOffsetWithinTiff) — value offset points at
      // the value bytes whether inline or remote
      if (ifdOff < 0 || start + ifdOff + 2 > end) return Seq.empty
      val n = u16(ifdOff.toInt)
      if (n < 0 || n > 512) return Seq.empty
      (0 until n).flatMap { k =>
        val e = ifdOff.toInt + 2 + 12 * k
        val tag = u16(e)
        val typ = u16(e + 2)
        val cnt = u32(e + 4)
        if (tag < 0 || typ < 0 || cnt < 0) None
        else {
          val sz = typeSize.getOrElse(typ, 1).toLong * cnt
          val valOff = if (sz <= 4) e + 8L else u32(e + 8)
          Some((tag, typ, cnt, valOff))
        }
      }
    }

    def ascii(valOff: Long, cnt: Long): Option[String] = {
      if (valOff < 0 || valOff > (end - start).toLong) return None
      val p = start + valOff.toInt
      val len = math.min(cnt, (end - p).toLong).toInt
      if (len <= 0) None
      else Some(new String(b, p, len, StandardCharsets.US_ASCII)
        .takeWhile(_ != '\u0000').trim)
    }
    def shortVal(valOff: Long): Option[Int] = {
      val v = u16(valOff.toInt)
      if (v < 0) None else Some(v)
    }
    // `signed`: SRATIONAL (type 10) numerator/denominator are s32 — read
    // as u32 they render e.g. ExposureBias -1/3 as 4294967295/3
    def rationals(valOff: Long, cnt: Long, signed: Boolean = false): Option[Array[Double]] =
      if (valOff < 0 || start + valOff + 8 * cnt > end) None
      else Some((0L until cnt).map { k =>
        val numU = u32(valOff.toInt + 8 * k.toInt)
        val denU = u32(valOff.toInt + 8 * k.toInt + 4)
        val num = if (signed) numU.toInt.toDouble else numU.toDouble
        val den = if (signed) denU.toInt.toDouble else denU.toDouble
        if (den == 0.0) 0.0 else num / den
      }.toArray)

    def render(tag: Int, typ: Int, cnt: Long, valOff: Long): Option[String] =
      typ match {
        case 2 => ascii(valOff, cnt)
        case 3 => shortVal(valOff).map(_.toString)
        case 4 => Some(u32(valOff.toInt).toString)
        case 5 | 10 => rationals(valOff, cnt, signed = typ == 10).map(_.mkString(","))
        case 1 | 7 => Some(s"bytes[$cnt]")
        case _ => None
      }

    val ifd0 = readIfd(u32(4))
    val exifIfd = ifd0.find(_._1 == TagExifIfd)
      .map(e => readIfd(u32(e._4.toInt))).getOrElse(Seq.empty)
    val gpsIfd = ifd0.find(_._1 == TagGpsIfd)
      .map(e => readIfd(u32(e._4.toInt))).getOrElse(Seq.empty)

    val all = ifd0 ++ exifIfd
    val tags = (all ++ gpsIfd.map { case (t, ty, c, o) => (0xf000 | t, ty, c, o) })
      .flatMap { case (t, ty, c, o) => render(t, ty, c, o).map(t -> _) }.toMap

    val orientation = ifd0.find(_._1 == TagOrientation)
      .flatMap(e => shortVal(e._4)).filter(v => v >= 1 && v <= 8)
    val dto = exifIfd.find(_._1 == TagDateTimeOriginal)
      .flatMap(e => ascii(e._4, e._3))
    val ts = dto.flatMap(parseExifTimestamp)

    def gpsCoord(refTag: Int, valTag: Int, neg: String): Option[Double] =
      for {
        refE <- gpsIfd.find(_._1 == refTag)
        ref <- ascii(refE._4, refE._3)
        valE <- gpsIfd.find(_._1 == valTag)
        dms <- rationals(valE._4, valE._3) if dms.length == 3
      } yield {
        val dec = dms(0) + dms(1) / 60.0 + dms(2) / 3600.0
        if (ref == neg) -dec else dec
      }

    Some(ExifData(orientation, dto, ts,
      gpsCoord(GpsLatRef, GpsLat, "S"), gpsCoord(GpsLonRef, GpsLon, "W"), tags))
  }

  /** "YYYY:MM:DD HH:MM:SS" → epoch seconds, UTC (helper_exif.rs:25-110). */
  def parseExifTimestamp(s: String): Option[Long] =
    try {
      val f = java.time.format.DateTimeFormatter.ofPattern("yyyy:MM:dd HH:mm:ss")
      Some(java.time.LocalDateTime.parse(s.trim, f)
        .toEpochSecond(java.time.ZoneOffset.UTC))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ======================== writing ========================

  private final class LeBuf {
    val out = new java.io.ByteArrayOutputStream()
    def size: Int = out.size()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def bytes(b: Array[Byte]): Unit = out.write(b)
  }

  /** DMS split for the writer: decimal degrees → (deg, min, sec×100/100). */
  private[kernel] def toDms(dec: Double): (Long, Long, Long, Long) = {
    val a = math.abs(dec)
    val d = a.toLong
    val mFull = (a - d) * 60.0
    val m = mFull.toLong
    val sNum = math.round((mFull - m) * 60.0 * 10000.0)
    (d, m, sNum, 10000L)
  }

  /**
   * Build a complete APP1 segment (FF E1 len "Exif\0\0" + little-endian
   * TIFF) carrying orientation, DateTimeOriginal, GPS lat/lon and Make —
   * the fixture-generation path (deterministic, offset-exact).
   */
  def buildApp1(orientation: Int, dateTimeOriginal: String,
                lat: Option[Double] = None, lon: Option[Double] = None,
                make: String = "graft-synth"): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"orientation $orientation")
    val makeB = (make + "\u0000").getBytes(StandardCharsets.US_ASCII)
    val dtoB = (dateTimeOriginal + "\u0000").getBytes(StandardCharsets.US_ASCII)
    val hasGps = lat.isDefined && lon.isDefined

    // layout (offsets within TIFF block):
    //   0: header (8)
    //   8: IFD0: count + 4 entries + next (2 + 4*12 + 4 = 54)
    //   62: ExifIFD: 2 + 1*12 + 4 = 18 → data
    //   80: GPS IFD (if present): 2 + 4*12 + 4 = 54
    //   then data heap: make, dto, lat rationals (24), lon rationals (24)
    val ifd0Entries = if (hasGps) 4 else 3
    val ifd0Off = 8
    val ifd0Size = 2 + ifd0Entries * 12 + 4
    val exifOff = ifd0Off + ifd0Size
    val exifSize = 2 + 1 * 12 + 4
    val gpsOff = exifOff + exifSize
    val gpsSize = if (hasGps) 2 + 4 * 12 + 4 else 0
    var heap = gpsOff + gpsSize
    val makeOff = heap; heap += makeB.length
    val dtoOff = heap; heap += dtoB.length
    val latOff = heap; if (hasGps) heap += 24
    val lonOff = heap; if (hasGps) heap += 24

    val t = new LeBuf
    // TIFF header
    t.u8('I'); t.u8('I'); t.u16(42); t.u32(ifd0Off)
    // IFD0
    t.u16(ifd0Entries)
    def entry(tag: Int, typ: Int, cnt: Long, inlineOrOff: Long,
              inlineShort: Boolean = false): Unit = {
      t.u16(tag); t.u16(typ); t.u32(cnt)
      if (inlineShort) { t.u16(inlineOrOff.toInt); t.u16(0) } else t.u32(inlineOrOff)
    }
    entry(TagMake, 2, makeB.length, makeOff)
    entry(TagOrientation, 3, 1, orientation, inlineShort = true)
    entry(TagExifIfd, 4, 1, exifOff)
    if (hasGps) entry(TagGpsIfd, 4, 1, gpsOff)
    t.u32(0) // next IFD
    // Exif IFD
    t.u16(1)
    entry(TagDateTimeOriginal, 2, dtoB.length, dtoOff)
    t.u32(0)
    // GPS IFD
    if (hasGps) {
      val la = lat.get; val lo = lon.get
      t.u16(4)
      val laRef = if (la < 0) 'S' else 'N'
      val loRef = if (lo < 0) 'W' else 'E'
      // ASCII count 2 fits inline (ref char + NUL), little-endian value slot
      t.u16(GpsLatRef); t.u16(2); t.u32(2); t.u8(laRef); t.u8(0); t.u16(0)
      entry(GpsLat, 5, 3, latOff)
      t.u16(GpsLonRef); t.u16(2); t.u32(2); t.u8(loRef); t.u8(0); t.u16(0)
      entry(GpsLon, 5, 3, lonOff)
      t.u32(0)
    }
    // data heap
    t.bytes(makeB)
    t.bytes(dtoB)
    if (hasGps) {
      for (v <- Seq(lat.get, lon.get)) {
        val (d, m, sn, sd) = toDms(v)
        t.u32(d); t.u32(1); t.u32(m); t.u32(1); t.u32(sn); t.u32(sd)
      }
    }
    require(t.size == heap, s"exif writer layout drift: ${t.size} != $heap")

    val tiff = t.out.toByteArray
    val payload = "Exif\u0000\u0000".getBytes(StandardCharsets.US_ASCII) ++ tiff
    val len = payload.length + 2
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write(payload)
    seg.toByteArray
  }

  /** Insert an APP1 segment immediately after SOI of a JPEG. */
  def spliceIntoJpeg(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && jpeg(0) == 0xff.toByte && jpeg(1) == 0xd8.toByte,
      "not a JPEG")
    val out = new Array[Byte](jpeg.length + app1.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }
}
