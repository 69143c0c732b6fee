package graft.kernel

/**
 * Header-only resolution probe (S7, scanner.rs:1026-1096): image dimensions
 * read straight off the container bytes, no pixel decode. The reference
 * probes RAW via rsraw, HEIC via a libheif handle, TIFF via its decoder's
 * `dimensions()`, and everything else via `ImageReader::into_dimensions` —
 * all metadata-only paths. This is the Spark-side analog as pure byte
 * parsing (no ImageIO reader instantiation, so it is cheap enough to run
 * per-row in the kernel's mapPartitions alongside the hash work), and it
 * additionally covers the formats whose DECODE tier is env-blocked here
 * (scanner.rs:553-708 — JXL, HEIC/AVIF, PDF): their headers are plain
 * public byte layouts, so dimensions, unlike pixels, need no codec.
 *
 * Per-format notes:
 *  - RAW containers report the dims of the largest embedded JPEG preview's
 *    SOF header — the same stream [[ImageCodec.extractLargestJpegPreview]]
 *    decodes, so probe and decode agree (scanner.rs:1353-1380 hashes that
 *    preview).
 *  - PDF reports page 1's MediaBox at the decode tier's 2× render scale
 *    (scanner.rs:553-708 renders page 1 at 2.0), so a future PDF decode
 *    produces exactly the probed dims.
 *  - JXL parses the codestream SizeHeader (ISO/IEC 18181-1 §D.3; LSB-first
 *    bit packing), in both bare-codestream and ISOBMFF-container form.
 *  - HEIC/AVIF walks meta→iprp→ipco and takes the largest `ispe` (the
 *    primary image's full-resolution property; smaller ispe entries are
 *    thumbnails/alpha aux images).
 */
object HeaderDims {

  /** Dims from header bytes, or None when the bytes carry none (truncated,
    * corrupt, or a headerless format like gray-raw). */
  def probe(bytes: Array[Byte], fmt: String): Option[(Int, Int)] = {
    val f = if (fmt == null) "" else fmt.toLowerCase
    val byFmt =
      try {
        f match {
          case "png" => png(bytes)
          case "jpg" | "jpeg" => jpegSof(bytes, 0)
          case "gif" => gif(bytes)
          case "bmp" => bmp(bytes)
          case "tiff" | "tif" => tiffIfd0(bytes)
          case "jxl" => jxl(bytes)
          case "heic" | "heif" | "avif" => isobmffIspe(bytes)
          case "webp" => Webp.headerDims(bytes)
          case "qoi" => SmallFormats.Qoi.headerDims(bytes)
          case "pnm" | "pgm" | "ppm" => SmallFormats.Pnm.headerDims(bytes)
          case "ff" | "farbfeld" => SmallFormats.Farbfeld.headerDims(bytes)
          case "ico" => SmallFormats.Ico.headerDims(bytes)
          case "hdr" => SmallFormats.Hdr.headerDims(bytes)
          case "dds" => SmallFormats.Dds.headerDims(bytes)
          case "pdf" => pdfMediaBox(bytes)
          case ff if ImageCodec.RawFormats(ff) => rawLargestPreview(bytes)
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    // mislabeled rows: sniff the actual magic bytes (the S5 fallback tier
    // applied to the header probe — scanner.rs:713-735's guessed format)
    byFmt.orElse(sniff(bytes)).filter { case (w, h) => w > 0 && h > 0 }
  }

  private def sniff(b: Array[Byte]): Option[(Int, Int)] =
    try {
      if (b.length < 12) None
      else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
        png(b)
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) jpegSof(b, 0)
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') gif(b)
      else if (b(0) == 'B' && b(1) == 'M') bmp(b)
      else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
               (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) tiffIfd0(b)
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0x0a) jxl(b)
      else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')
        isobmffIspe(b)
      else if (b(4) == 'J' && b(5) == 'X' && b(6) == 'L' && b(7) == ' ') jxl(b)
      else if (Webp.looksWebp(b)) Webp.headerDims(b)
      else if (SmallFormats.Qoi.looks(b)) SmallFormats.Qoi.headerDims(b)
      else if (SmallFormats.Pnm.looks(b)) SmallFormats.Pnm.headerDims(b)
      else if (SmallFormats.Farbfeld.looks(b)) SmallFormats.Farbfeld.headerDims(b)
      else if (SmallFormats.Ico.looks(b)) SmallFormats.Ico.headerDims(b)
      else if (SmallFormats.Hdr.looks(b)) SmallFormats.Hdr.headerDims(b)
      else if (SmallFormats.Dds.looks(b)) SmallFormats.Dds.headerDims(b)
      else if (PdfImages.looksPdf(b)) pdfMediaBox(b) // incl. 1 KiB junk rule
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- fixed-layout formats -------------------------------------------

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def png(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length < 24 || (b(0) & 0xff) != 0x89 || b(12) != 'I' || b(13) != 'H' ||
      b(14) != 'D' || b(15) != 'R') None
    else Some((be32(b, 16).toInt, be32(b, 20).toInt))

  private def gif(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length < 10 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F') None
    else Some((le16(b, 6), le16(b, 8)))

  private def bmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') None
    else {
      val hdr = le32(b, 14)
      if (hdr == 12) Some((le16(b, 18), le16(b, 20))) // BITMAPCOREHEADER
      else Some((le32(b, 18).toInt, math.abs(le32(b, 22).toInt)))
    }

  /** Marker walk to the first SOFn (C0-CF minus C4/C8/CC): dims live in the
    * frame header — precision u8, height u16be, width u16be. */
  private def jpegSof(b: Array[Byte], start: Int): Option[(Int, Int)] = {
    if (b.length < start + 4 || (b(start) & 0xff) != 0xff ||
      (b(start + 1) & 0xff) != 0xd8) return None
    var i = start + 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced
      val m = b(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) { i += 2 } // bare marker
      else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 9 >= b.length) return None
          return Some((be16(b, i + 7), be16(b, i + 5)))
        }
        if (m == 0xda) return None // scan data before any SOF: give up
        i += 2 + len
      }
    }
    None
  }

  /** IFD0 tags 256/257 (ImageWidth/ImageLength), SHORT or LONG, either
    * byte order. */
  private def tiffIfd0(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 8) return None
    val little = b(0) == 'I' && b(1) == 'I'
    if (!little && !(b(0) == 'M' && b(1) == 'M')) return None
    def u16(i: Int) = if (little) le16(b, i) else be16(b, i)
    def u32(i: Int) = if (little) le32(b, i) else be32(b, i)
    if (u16(2) != 42) return None
    val ifd = u32(4).toInt
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd)
    var w = -1L; var h = -1L
    var e = 0
    while (e < n && ifd + 2 + 12 * e + 12 <= b.length) {
      val off = ifd + 2 + 12 * e
      val tag = u16(off); val typ = u16(off + 2)
      val value = typ match {
        case 3 => u16(off + 8).toLong // SHORT, left-justified in value slot
        case 4 => u32(off + 8) // LONG
        case _ => -1L
      }
      if (tag == 256) w = value
      if (tag == 257) h = value
      e += 1
    }
    if (w > 0 && h > 0) Some((w.toInt, h.toInt)) else None
  }

  /** RAW containers: dims of the largest embedded JPEG preview's SOF —
    * header-only, the same selection [[ImageCodec.extractLargestJpegPreview]]
    * makes with full decodes. */
  private def rawLargestPreview(b: Array[Byte]): Option[(Int, Int)] = {
    var best: Option[(Int, Int)] = None
    var i = 0
    while (i < b.length - 2) {
      if (b(i) == 0xff.toByte && b(i + 1) == 0xd8.toByte &&
        b(i + 2) == 0xff.toByte) {
        jpegSof(b, i).foreach { d =>
          if (best.forall(p => p._1.toLong * p._2 < d._1.toLong * d._2))
            best = Some(d)
        }
      }
      i += 1
    }
    // TIFF-based containers whose previews are stripped: fall back to IFD dims
    best.orElse(tiffIfd0(b))
  }

  // ---- ISOBMFF (HEIC / AVIF / JXL container) --------------------------

  /** Walk `meta`→`iprp`→`ipco`, return the largest `ispe`
    * (ItemSpatialExtents: FullBox, then width/height u32be). */
  private def isobmffIspe(b: Array[Byte]): Option[(Int, Int)] = {
    var best: Option[(Int, Int)] = None
    def walk(from: Long, to: Long, depth: Int): Unit = {
      var i = from
      while (i + 8 <= to && depth < 8) {
        var size = be32(b, i.toInt)
        val name = new String(b, i.toInt + 4, 4, "ISO-8859-1")
        var hdr = 8L
        if (size == 1) { // 64-bit largesize
          if (i + 16 > to) return
          size = (be32(b, i.toInt + 8) << 32) | be32(b, i.toInt + 12)
          hdr = 16L
        } else if (size == 0) size = to - i // box extends to end
        if (size < hdr || i + size > to) return
        name match {
          case "meta" => walk(i + hdr + 4, i + size, depth + 1) // FullBox
          case "iprp" | "ipco" => walk(i + hdr, i + size, depth + 1)
          case "ispe" if size >= hdr + 12 =>
            val w = be32(b, (i + hdr + 4).toInt).toInt
            val h = be32(b, (i + hdr + 8).toInt).toInt
            if (best.forall(p => p._1.toLong * p._2 < w.toLong * h))
              best = Some((w, h))
          case _ =>
        }
        i += size
      }
    }
    walk(0L, b.length.toLong, 0)
    best
  }

  // ---- JXL ------------------------------------------------------------

  /** LSB-first bit reader (JXL codestream bit packing). */
  private final class BitReader(b: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def u(n: Int): Int = {
      var v = 0; var got = 0
      while (got < n) {
        require(bytePos < b.length, "jxl header truncated")
        val bit = (b(bytePos) >> bitPos) & 1
        v |= bit << got
        got += 1; bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      }
      v
    }
  }

  /** SizeHeader (ISO/IEC 18181-1 §D.3): small-mode 8-multiples or a
    * 4-selector U32 per axis; the 3-bit ratio derives xsize from ysize. */
  private def jxlSizeHeader(r: BitReader): Option[(Int, Int)] = {
    def u32size(): Int = r.u(2) match {
      case 0 => r.u(9) + 1
      case 1 => r.u(13) + 1
      case 2 => r.u(18) + 1
      case _ => r.u(30) + 1
    }
    val small = r.u(1) == 1
    val ysize = if (small) 8 * (r.u(5) + 1) else u32size()
    val ratio = r.u(3)
    val xsize = ratio match {
      case 0 => if (small) 8 * (r.u(5) + 1) else u32size()
      case 1 => ysize
      case 2 => ysize * 12 / 10
      case 3 => ysize * 4 / 3
      case 4 => ysize * 3 / 2
      case 5 => ysize * 16 / 9
      case 6 => ysize * 5 / 4
      case _ => ysize * 2
    }
    Some((xsize, ysize))
  }

  private def jxl(b: Array[Byte]): Option[(Int, Int)] = {
    // bare codestream: FF 0A then SizeHeader (≥1 payload byte; the reader
    // throws on truncation and probe() maps that to None)
    if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0x0a)
      return jxlSizeHeader(new BitReader(b, 2))
    // ISOBMFF container (00 00 00 0C 'JXL ' 0D 0A 87 0A …): the codestream
    // lives in a 'jxlc' box, or split across 'jxlp' boxes (first jxlp
    // carries a 4-byte part index before the codestream bytes)
    if (b.length < 12 || b(4) != 'J' || b(5) != 'X' || b(6) != 'L' || b(7) != ' ')
      return None
    var i = 0L
    while (i + 8 <= b.length) {
      var size = be32(b, i.toInt)
      val name = new String(b, i.toInt + 4, 4, "ISO-8859-1")
      var hdr = 8L
      if (size == 1) {
        if (i + 16 > b.length) return None
        size = (be32(b, i.toInt + 8) << 32) | be32(b, i.toInt + 12)
        hdr = 16L
      } else if (size == 0) size = b.length - i
      if (size < hdr || i + size > b.length) return None
      val payload = (i + hdr).toInt
      if (name == "jxlc" && size >= hdr + 2)
        return jxlSizeHeader(new BitReader(b, payload + 2)) // skip FF 0A
      if (name == "jxlp" && size >= hdr + 6)
        return jxlSizeHeader(new BitReader(b, payload + 4 + 2)) // idx + FF 0A
      i += size
    }
    None
  }

  // ---- PDF ------------------------------------------------------------

  /** First /MediaBox [x0 y0 x1 y1], reported at the decode tier's 2× render
    * scale (scanner.rs:553-708 renders page 1 at 2.0). */
  private def pdfMediaBox(b: Array[Byte]): Option[(Int, Int)] = {
    // same leading-junk rule as the decode tier (ISO 32000 §7.5.2 allows
    // %PDF- anywhere in the first 1 KiB): the probe must accept exactly
    // the files PdfImages.looksPdf accepts, or S7 and S4 disagree
    if (!PdfImages.looksPdf(b)) return None
    val s = new String(b, "ISO-8859-1")
    val k = s.indexOf("/MediaBox")
    if (k < 0) return None
    val open = s.indexOf('[', k)
    val close = if (open < 0) -1 else s.indexOf(']', open)
    if (open < 0 || close < 0) return None
    val nums = s.substring(open + 1, close).trim
      .split("\\s+").filter(_.nonEmpty).flatMap(t => t.toDoubleOption)
    if (nums.length != 4) return None
    val w = math.round((nums(2) - nums(0)) * 2.0).toInt
    val h = math.round((nums(3) - nums(1)) * 2.0).toInt
    Some((w, h))
  }
}
