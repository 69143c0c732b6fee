package graft.kernel

import java.nio.charset.StandardCharsets

/** EXIF payload for the TIFF writer (same fields as [[Exif.buildApp1]]). */
final case class TiffExif(orientation: Int, dateTimeOriginal: String,
                          lat: Option[Double] = None, lon: Option[Double] = None)

/**
 * Minimal baseline-TIFF writer (little-endian, uncompressed RGB, one strip)
 * with EXIF tags carried IN THE TIFF IFD itself — the fixture counterpart
 * of the reference's TIFF/RAW EXIF handling (scanner.rs:162-192 parses EXIF
 * from the container for every format; raw_exif.rs:1-358 walks the RAW
 * container's TIFF block). A TIFF file IS a TIFF-IFD stream, so the same
 * [[Exif.parseTiff]] that reads JPEG APP1 payloads reads these files at
 * offset 0 — which is exactly the production parse path this writer exists
 * to exercise on real bytes.
 *
 * `bitsPerSample` 8 or 16; 16-bit samples are the 8-bit values widened
 * v*257 (the image-crate u8→u16 convention the reference's to_rgba16 uses,
 * scanner.rs:1393-1406), little-endian as the header declares. The JDK's
 * bundled TIFF ImageIO plugin decodes both depths.
 */
object Tiff {
  private final class Buf {
    val out = new java.io.ByteArrayOutputStream()
    def size: Int = out.size()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def bytes(b: Array[Byte]): Unit = out.write(b)
  }

  def encode(d: DecodedImage, bitsPerSample: Int = 8,
             exif: Option[TiffExif] = None): Array[Byte] = {
    require(bitsPerSample == 8 || bitsPerSample == 16, s"bits $bitsPerSample")
    val sampleBytes = bitsPerSample / 8
    val stripLen = d.w * d.h * 3 * sampleBytes
    val hasExif = exif.isDefined
    val hasGps = exif.exists(e => e.lat.isDefined && e.lon.isDefined)
    val dtoB = exif.map(e =>
      e.dateTimeOriginal.getBytes(StandardCharsets.US_ASCII) :+ 0.toByte)
      .getOrElse(Array.emptyByteArray)

    // IFD0 entry count: 9 baseline + orientation/exif-ptr/gps-ptr
    val n0 = 9 + (if (hasExif) 2 else 0) + (if (hasGps) 1 else 0)
    val ifd0Off = 8
    val ifd0Size = 2 + n0 * 12 + 4
    val exifOff = ifd0Off + ifd0Size
    val exifSize = if (hasExif) 2 + 1 * 12 + 4 else 0
    val gpsOff = exifOff + exifSize
    val gpsSize = if (hasGps) 2 + 4 * 12 + 4 else 0
    var heap = gpsOff + gpsSize
    val bpsOff = heap; heap += 6 // 3 × u16
    val dtoOff = heap; heap += dtoB.length
    val latOff = heap; if (hasGps) heap += 24
    val lonOff = heap; if (hasGps) heap += 24
    val stripOff = heap

    val t = new Buf
    t.u8('I'); t.u8('I'); t.u16(42); t.u32(ifd0Off)
    def entry(tag: Int, typ: Int, cnt: Long, inlineOrOff: Long,
              inlineShort: Boolean = false): Unit = {
      t.u16(tag); t.u16(typ); t.u32(cnt)
      if (inlineShort) { t.u16(inlineOrOff.toInt); t.u16(0) } else t.u32(inlineOrOff)
    }
    // IFD0 — tags strictly ascending (TIFF 6.0 requirement)
    t.u16(n0)
    entry(256, 4, 1, d.w)                       // ImageWidth
    entry(257, 4, 1, d.h)                       // ImageLength
    entry(258, 3, 3, bpsOff)                    // BitsPerSample
    entry(259, 3, 1, 1, inlineShort = true)     // Compression = none
    entry(262, 3, 1, 2, inlineShort = true)     // Photometric = RGB
    entry(273, 4, 1, stripOff)                  // StripOffsets
    if (hasExif)
      entry(Exif.TagOrientation, 3, 1, exif.get.orientation, inlineShort = true)
    entry(277, 3, 1, 3, inlineShort = true)     // SamplesPerPixel
    entry(278, 4, 1, d.h)                       // RowsPerStrip
    entry(279, 4, 1, stripLen)                  // StripByteCounts
    if (hasExif) entry(Exif.TagExifIfd, 4, 1, exifOff)
    if (hasGps) entry(Exif.TagGpsIfd, 4, 1, gpsOff)
    t.u32(0)
    if (hasExif) {
      t.u16(1)
      entry(Exif.TagDateTimeOriginal, 2, dtoB.length, dtoOff)
      t.u32(0)
    }
    if (hasGps) {
      val la = exif.get.lat.get; val lo = exif.get.lon.get
      t.u16(4)
      t.u16(Exif.GpsLatRef); t.u16(2); t.u32(2)
      t.u8(if (la < 0) 'S' else 'N'); t.u8(0); t.u16(0)
      entry(Exif.GpsLat, 5, 3, latOff)
      t.u16(Exif.GpsLonRef); t.u16(2); t.u32(2)
      t.u8(if (lo < 0) 'W' else 'E'); t.u8(0); t.u16(0)
      entry(Exif.GpsLon, 5, 3, lonOff)
      t.u32(0)
    }
    // heap
    t.u16(bitsPerSample); t.u16(bitsPerSample); t.u16(bitsPerSample)
    t.bytes(dtoB)
    if (hasGps) {
      for (v <- Seq(exif.get.lat.get, exif.get.lon.get)) {
        val (deg, min, sn, sd) = Exif.toDms(v)
        t.u32(deg); t.u32(1); t.u32(min); t.u32(1); t.u32(sn); t.u32(sd)
      }
    }
    require(t.size == stripOff, s"tiff writer layout drift: ${t.size} != $stripOff")
    // strip: RGB interleaved. At 16-bit, native rgba16 samples are written
    // when the image carries them (true >8-bit content, e.g. low-byte
    // precision an 8-bit file can't hold); otherwise 8-bit widens v·257.
    // Note a 16-bit file whose samples are EXACTLY v·257 pixel-hashes
    // identically to its 8-bit conversion — that is correct reference
    // behavior (to_rgba16 of the 8-bit file produces the same buffer).
    var i = 0
    while (i < d.argb.length) {
      if (sampleBytes == 2 && d.rgba16 != null) {
        t.u16(d.rgba16(4 * i) & 0xffff)
        t.u16(d.rgba16(4 * i + 1) & 0xffff)
        t.u16(d.rgba16(4 * i + 2) & 0xffff)
      } else {
        val p = d.argb(i)
        var c = 16
        while (c >= 0) {
          val v = (p >> c) & 0xff
          if (sampleBytes == 1) t.u8(v)
          else t.u16(v * 257) // widen u8→u16
          c -= 8
        }
      }
      i += 1
    }
    t.out.toByteArray
  }

  /** Deterministic true-16-bit variant of an 8-bit image: every sample's
    * high byte stays the 8-bit value (same argb, same PDQ) while the low
    * byte carries position-derived jitter only 16 bits can represent —
    * the fixture for the RGBA16 pixel-hash depth axis. */
  def with16BitJitter(d: DecodedImage): DecodedImage = {
    val r16 = new Array[Short](4 * d.argb.length)
    var i = 0
    while (i < d.argb.length) {
      val p = d.argb(i)
      @inline def s(v: Int, salt: Int): Short =
        (((v & 0xff) << 8) | ((v + 37 * salt + i) & 0xff)).toShort
      r16(4 * i) = s(p >> 16, 1)
      r16(4 * i + 1) = s(p >> 8, 2)
      r16(4 * i + 2) = s(p, 3)
      r16(4 * i + 3) = 0xffff.toShort
      i += 1
    }
    DecodedImage(d.w, d.h, d.argb, r16)
  }

  /**
   * RAW-container fixture (the NEF/DNG shape, raw_exif.rs semantics): the
   * container IS a TIFF stream at offset 0 — here a small thumbnail strip
   * plus the EXIF tags — followed by a full-size embedded JPEG preview,
   * which is what the decode tier extracts and hashes
   * (scanner.rs:1353-1380). EXIF must come from the container TIFF, not
   * the preview (the preview here carries none — proving the path).
   */
  def encodeRawContainer(thumb: DecodedImage, previewJpeg: Array[Byte],
                         exif: Option[TiffExif]): Array[Byte] =
    encode(thumb, 8, exif) ++ previewJpeg
}
