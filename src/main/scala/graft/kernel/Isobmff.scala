package graft.kernel

/**
 * ISOBMFF (ISO/IEC 14496-12) metadata walker for the codec-blocked
 * still-image containers: HEIC/HEIF/AVIF (ISO/IEC 23008-12) and the JPEG XL
 * container (ISO/IEC 18181-2). The reference reads these formats' pixels
 * AND metadata through libheif / jxl-oxide (scanner.rs:553-708,
 * exif_extract.rs); this environment has no JVM codec for the PIXELS, but
 * the metadata lives in plain public box layouts no codec is needed for:
 *
 *  - HEIF: the EXIF payload is a `meta` item of type 'Exif' — located via
 *    `iinf` (item infos: item_ID by 4cc type) + `iloc` (extent offsets /
 *    lengths; construction_method 0 = absolute file offsets, 1 = offsets
 *    into the meta's `idat` box). The item content is an ExifDataBlock
 *    (23008-12 A.2.1): u32 `exif_tiff_header_offset`, then the payload.
 *  - JPEG XL container: a top-level `Exif` box with the same
 *    ExifDataBlock shape (18181-2 §9.3).
 *
 * Dimensions for these formats ride the `ispe` property / codestream
 * SizeHeader ([[HeaderDims]]). So the S7 (header dims) and S8 (EXIF) tiers
 * are REAL for HEIC/AVIF/JXL; only the pixel tier stays an honest
 * `unsupported` stub until a JVM codec exists.
 *
 * Also hosts the fixture ENCODER ([[encodeHeicShell]]): a minimal
 * spec-conformant HEIC container `[ftyp][meta: hdlr pitm iinf iprp
 * (idat) iloc][mdat]` wrapping an undecodable opaque pixel payload plus a
 * real Exif item — Synth's `heicmeta` variant class, which puts this
 * parser inside the DuckDB-oracled q_img_exif / q_img_decode_meta /
 * q_img_enriched surface on every corpus run (both iloc construction
 * methods are emitted, alternating per group).
 */
object Isobmff {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  /** One parsed box: payload span [payloadStart, end). */
  private final case class Box(name: String, payloadStart: Int, end: Int)

  /** Children of the byte span [from, to); stops at the first malformed
    * header (size smaller than its own header or overrunning the span). */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[Box] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Box]
    var i = from.toLong
    var ok = true
    while (ok && i + 8 <= to) {
      var size = be32(b, i.toInt)
      var hdr = 8L
      if (size == 1) { // 64-bit largesize
        if (i + 16 > to) return out.toSeq
        size = (be32(b, (i + 8).toInt) << 32) | be32(b, (i + 12).toInt)
        hdr = 16L
      } else if (size == 0) size = to - i // extends to end of span
      if (size < hdr || i + size > to) ok = false
      else {
        out += Box(fourcc(b, i.toInt + 4), (i + hdr).toInt, (i + size).toInt)
        i += size
      }
    }
    out.toSeq
  }

  /** True when the bytes open like an ISOBMFF file: `ftyp` at offset 4
    * (HEIC/AVIF/MP4 family) or the JXL signature box. */
  def looksIsobmff(b: Array[Byte]): Boolean =
    b.length >= 12 && {
      val n = fourcc(b, 4)
      n == "ftyp" || n == "JXL "
    }

  /** EXIF from an ISOBMFF container: the HEIF `Exif` meta-item, or the JXL
    * container's top-level `Exif` box. Never throws (defense-in-depth like
    * the other container parsers — one corrupt file must not fail a task). */
  def exif(b: Array[Byte]): Option[ExifData] =
    try {
      val top = boxes(b, 0, b.length)
      top.find(_.name == "meta").flatMap(m => exifFromMeta(b, m, top))
        .orElse(top.find(_.name == "Exif")
          .flatMap(e => exifDataBlock(b, e.payloadStart, e.end)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ExifDataBlock (23008-12 A.2.1): u32 `exif_tiff_header_offset`, then
    * the payload. Writers disagree on whether the offset lands on the
    * "Exif\u0000\u0000" marker or the TIFF header itself — accept both,
    * then fall back to an in-range marker scan (the same leniency the
    * reference inherits from its EXIF crate). */
  private def exifDataBlock(b: Array[Byte], start: Int, end: Int): Option[ExifData] = {
    if (end - start < 8) return None
    val off = be32(b, start)
    val at = start + 4 + off
    def tiffAt(p: Long): Option[ExifData] =
      if (p >= start + 4 && p + 8 <= end) Exif.parseTiff(b, p.toInt, end)
      else None
    def exifMagicAt(p: Long): Boolean =
      p >= 0 && p + 6 <= end &&
        b(p.toInt) == 'E' && b(p.toInt + 1) == 'x' && b(p.toInt + 2) == 'i' &&
        b(p.toInt + 3) == 'f' && b(p.toInt + 4) == 0 && b(p.toInt + 5) == 0
    val direct = if (exifMagicAt(at)) tiffAt(at + 6) else tiffAt(at)
    direct.orElse {
      var i = start + 4
      var found: Option[ExifData] = None
      while (found.isEmpty && i + 6 <= end) {
        if (exifMagicAt(i)) found = Exif.parseTiff(b, i + 6, end)
        i += 1
      }
      found
    }
  }

  /** Locate and parse the `Exif` item inside a `meta` box. */
  private def exifFromMeta(b: Array[Byte], meta: Box, top: Seq[Box]): Option[ExifData] = {
    // meta is a FullBox: 4 bytes version/flags before its children
    val kids = boxes(b, meta.payloadStart + 4, meta.end)
    for {
      iinf <- kids.find(_.name == "iinf")
      exifId <- exifItemId(b, iinf)
      iloc <- kids.find(_.name == "iloc")
      extents <- locate(b, iloc, exifId)
      data <- resolveExtents(b, extents, kids)
      parsed <- exifDataBlock(data, 0, data.length)
    } yield parsed
  }

  /** `iinf` → the item_ID of the first `infe` of item_type 'Exif' (infe
    * version ≥ 2 — the only form HEIF brands emit). */
  private def exifItemId(b: Array[Byte], iinf: Box): Option[Int] = {
    val v = b(iinf.payloadStart) & 0xff
    val countLen = if (v == 0) 2 else 4
    val childrenFrom = iinf.payloadStart + 4 + countLen
    boxes(b, childrenFrom, iinf.end).iterator
      .filter(_.name == "infe")
      .flatMap { e =>
        val ev = b(e.payloadStart) & 0xff
        if (ev < 2 || e.end - e.payloadStart < 12) None
        else {
          val q = e.payloadStart + 4
          val (id, after) =
            if (ev == 2) (be16(b, q), q + 2) else (be32(b, q).toInt, q + 4)
          // item_protection_index u16, then item_type 4cc
          if (after + 6 > e.end) None
          else if (fourcc(b, after + 2) == "Exif") Some(id) else None
        }
      }.nextOption()
  }

  /** One iloc extent resolved against the item's construction method. */
  private final case class Extent(method: Int, offset: Long, length: Long)

  /** `iloc` (versions 0-2): the target item's extents, offsets already
    * including its base_offset. */
  private def locate(b: Array[Byte], iloc: Box, itemId: Int): Option[Seq[Extent]] = {
    val v = b(iloc.payloadStart) & 0xff
    var p = iloc.payloadStart + 4
    if (p + 2 > iloc.end) return None
    val offSize = (b(p) >> 4) & 0xf
    val lenSize = b(p) & 0xf
    val baseSize = (b(p + 1) >> 4) & 0xf
    val idxSize = if (v == 1 || v == 2) b(p + 1) & 0xf else 0
    p += 2
    if (!Set(0, 4, 8)(offSize) || !Set(0, 4, 8)(lenSize) ||
      !Set(0, 4, 8)(baseSize) || !Set(0, 4, 8)(idxSize)) return None
    val itemCount =
      if (v < 2) { val c = be16(b, p); p += 2; c }
      else { val c = be32(b, p).toInt; p += 4; c }
    def readN(n: Int): Long = {
      val r = n match {
        case 0 => 0L
        case 4 => be32(b, p)
        case _ => (be32(b, p) << 32) | be32(b, p + 4)
      }
      p += n; r
    }
    var it = 0
    while (it < itemCount && p < iloc.end) {
      val id =
        if (v < 2) { val x = be16(b, p); p += 2; x }
        else { val x = be32(b, p).toInt; p += 4; x }
      val method =
        if (v == 1 || v == 2) { val m = be16(b, p) & 0xf; p += 2; m } else 0
      p += 2 // data_reference_index (0 = this file; external refs unsupported)
      val base = readN(baseSize)
      val extCount = be16(b, p); p += 2
      val extents = Seq.fill(extCount) {
        if (idxSize > 0) readN(idxSize)
        val off = readN(offSize)
        val len = readN(lenSize)
        Extent(method, base + off, len)
      }
      if (id == itemId) return Some(extents).filter(_.nonEmpty)
      it += 1
    }
    None
  }

  /** Concatenate an item's extents into one contiguous payload.
    * construction_method 0 reads absolute file offsets, 1 reads offsets
    * into the meta's `idat` box; method 2 (item indirection) and external
    * data references are not emitted by still-image writers — None. */
  private def resolveExtents(b: Array[Byte], extents: Seq[Extent],
                             metaKids: Seq[Box]): Option[Array[Byte]] = {
    val idat = metaKids.find(_.name == "idat")
    val out = new java.io.ByteArrayOutputStream()
    extents.foreach { e =>
      val abs = e.method match {
        case 0 => e.offset
        case 1 => idat.map(_.payloadStart + e.offset).getOrElse(return None)
        case _ => return None
      }
      if (abs < 0 || e.length <= 0 || abs + e.length > b.length) return None
      out.write(b, abs.toInt, e.length.toInt)
    }
    Some(out.toByteArray).filter(_.length >= 8)
  }

  // ---- fixture encoder --------------------------------------------------

  private def be32a(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16a(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mkBox(name: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32a(body.length + 8L) ++ name.getBytes("ISO-8859-1") ++ body
  }
  private def mkFull(name: String, version: Int, payload: Array[Byte]*): Array[Byte] =
    mkBox(name, be32a(version.toLong << 24) +: payload: _*)

  /**
   * Minimal spec-conformant HEIC/AVIF shell: `ftyp` + `meta` (hdlr 'pict',
   * pitm, iinf with an hvc1 primary item + optional Exif item, iprp with
   * the primary's `ispe`, iloc) + `mdat`. The primary item's payload is
   * the caller's opaque bytes (no JVM HEVC codec exists to make real ones,
   * and none is needed: the decode tier must report `unsupported` while
   * the dims/EXIF tiers read the container) — so this is exactly the
   * fixture the metadata tiers need and honestly NOT a decodable image.
   *
   * `exifInIdat` = construction_method 1: the Exif item lives in the
   * meta's `idat` box with an iloc v1 idat-relative extent; otherwise
   * method 0 with absolute file offsets (iloc v0), the common camera
   * layout. Both paths are emitted by Synth so the oracled corpus
   * exercises both.
   */
  def encodeHeicShell(w: Int, h: Int, exifPayload: Option[Array[Byte]],
                      pixelPayload: Array[Byte], brand: String = "heic",
                      exifInIdat: Boolean = false): Array[Byte] = {
    require(brand.length == 4, s"brand must be a 4cc: '$brand'")
    val ftyp = mkBox("ftyp", brand.getBytes("ISO-8859-1"), be32a(0L),
      "mif1".getBytes("ISO-8859-1"), brand.getBytes("ISO-8859-1"))
    // ExifDataBlock: u32 tiff_header_offset. Callers pass the APP1-style
    // payload ("Exif\0\0" + TIFF), so offset 6 lands exactly on the TIFF
    // header as 23008-12 A.2.1 intends (the round-5 first cut doubled the
    // marker; the parser's leniency absorbed it, but conformant is better).
    val exifItem = exifPayload.map(p => be32a(6L) ++ p)

    def meta(pixOff: Long, exifOff: Long): Array[Byte] = {
      val hdlr = mkFull("hdlr", 0, be32a(0L),
        "pict".getBytes("ISO-8859-1"), be32a(0L), be32a(0L), be32a(0L),
        Array[Byte](0))
      val pitm = mkFull("pitm", 0, be16a(1))
      def infe(id: Int, typ: String) = mkFull("infe", 2,
        be16a(id), be16a(0), typ.getBytes("ISO-8859-1"), Array[Byte](0))
      val infes = infe(1, "hvc1") +: exifItem.map(_ => infe(2, "Exif")).toSeq
      val iinf = mkFull("iinf", 0, be16a(infes.length), infes.flatten.toArray)
      val ispe = mkFull("ispe", 0, be32a(w.toLong), be32a(h.toLong))
      val ipco = mkBox("ipco", ispe)
      // associate property 1 (the ispe) with item 1, essential
      val ipma = mkFull("ipma", 0, be32a(1L), be16a(1),
        Array[Byte](1), Array[Byte](0x81.toByte))
      val iprp = mkBox("iprp", ipco, ipma)
      val idat = exifItem.filter(_ => exifInIdat).map(e => mkBox("idat", e))
      val iloc =
        if (exifInIdat) {
          // v1: items carry a construction_method; Exif offsets are
          // idat-relative (method 1), pixels stay file-absolute (method 0)
          def item(id: Int, method: Int, off: Long, len: Long) =
            be16a(id) ++ be16a(method) ++ be16a(0) ++ be16a(1) ++
              be32a(off) ++ be32a(len)
          val items = item(1, 0, pixOff, pixelPayload.length.toLong) ++
            exifItem.map(e => item(2, 1, 0L, e.length.toLong)).getOrElse(Array.empty[Byte])
          mkFull("iloc", 1, Array[Byte](0x44, 0x00),
            be16a(1 + exifItem.size), items)
        } else {
          def item(id: Int, off: Long, len: Long) =
            be16a(id) ++ be16a(0) ++ be16a(1) ++ be32a(off) ++ be32a(len)
          val items = item(1, pixOff, pixelPayload.length.toLong) ++
            exifItem.map(e => item(2, exifOff, e.length.toLong)).getOrElse(Array.empty[Byte])
          mkFull("iloc", 0, Array[Byte](0x44, 0x00),
            be16a(1 + exifItem.size), items)
        }
      mkFull("meta", 0,
        (Seq(hdlr, pitm, iinf, iprp) ++ idat.toSeq :+ iloc).flatten.toArray)
    }

    // two-pass: box sizes are offset-independent (fixed-width u32 slots),
    // so build once to learn the meta length, then again with real offsets
    val metaLen = meta(0L, 0L).length
    val mdatPayloadStart = ftyp.length + metaLen + 8L
    val pixOff = mdatPayloadStart
    val exifOff = mdatPayloadStart + pixelPayload.length
    val mdatExif = exifItem.filter(_ => !exifInIdat)
    val mdat = mkBox("mdat",
      pixelPayload, mdatExif.getOrElse(Array.empty[Byte]))
    val out = ftyp ++ meta(pixOff, exifOff) ++ mdat
    require(out.length == mdatPayloadStart + mdat.length - 8,
      "heic shell layout drift")
    out
  }

  /** LSB-first bit writer (the encode mirror of [[HeaderDims]]' JXL bit
    * reader — ISO/IEC 18181-1 codestream bit packing). */
  private final class BitWriter {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var bitPos = 0
    def u(v: Int, n: Int): Unit = {
      var got = 0
      while (got < n) {
        cur |= ((v >> got) & 1) << bitPos
        got += 1; bitPos += 1
        if (bitPos == 8) { out += cur.toByte; cur = 0; bitPos = 0 }
      }
    }
    def bytes: Array[Byte] =
      if (bitPos > 0) (out :+ cur.toByte).toArray else out.toArray
  }

  /**
   * Minimal spec-conformant JXL container (ISO/IEC 18181-2): signature box
   * + `ftyp` + optional `Exif` box (ExifDataBlock, §9.3) + `jxlc` whose
   * codestream opens FF 0A then a REAL SizeHeader (18181-1 §D.3: small=0,
   * selector-1 13-bit sizes, ratio=0 → explicit xsize) encoding (w, h),
   * followed by the caller's opaque payload — no JVM codec exists to make
   * real frame bytes, and none is needed: the decode tier must report
   * `unsupported` while the dims (S7) and EXIF (S8) tiers read the
   * container. Synth's `jxlmeta` variant class.
   */
  def encodeJxlContainer(w: Int, h: Int, exifPayload: Option[Array[Byte]],
                         codestreamPayload: Array[Byte]): Array[Byte] = {
    require(w >= 1 && w <= 8192 && h >= 1 && h <= 8192,
      s"dims outside the selector-1 range: ${w}x$h")
    val bw = new BitWriter
    bw.u(0, 1)                    // small = 0
    bw.u(1, 2); bw.u(h - 1, 13)   // ysize: U32 selector 1 (13-bit)
    bw.u(0, 3)                    // ratio = 0 → explicit xsize
    bw.u(1, 2); bw.u(w - 1, 13)   // xsize: U32 selector 1
    val sig = mkBox("JXL ", Array(0x0d, 0x0a, 0x87, 0x0a).map(_.toByte))
    val ftyp = mkBox("ftyp", "jxl ".getBytes("ISO-8859-1"), be32a(0L),
      "jxl ".getBytes("ISO-8859-1"))
    // ExifDataBlock: offset 6 = past the "Exif\0\0" the APP1-style
    // payload opens with, landing exactly on the TIFF header
    val exifBox = exifPayload.map(p => mkBox("Exif", be32a(6L), p))
      .getOrElse(Array.empty[Byte])
    val jxlc = mkBox("jxlc", Array(0xff.toByte, 0x0a.toByte), bw.bytes,
      codestreamPayload)
    sig ++ ftyp ++ exifBox ++ jxlc
  }
}
