package graft.kernel

import scala.collection.mutable.ArrayBuffer

/**
 * WebP tier (S4/S5/S7/S8): RIFF container parse + a full pure-JVM VP8L
 * (lossless) pixel decoder, per the public WebP container spec and the
 * VP8L lossless bitstream spec (RFC 9649). The reference decodes WebP via
 * its image-crate generic fallback (scanner.rs:713, extension list
 * scanner.rs:2278); the JVM ships no WebP codec, so — like the PDF tier —
 * the feasible slice is implemented from the public spec and the
 * infeasible slice (VP8 lossy: full DCT + boolean-coder reconstruction)
 * stays an honest `unsupported`, with dims (S7) and EXIF (S8) still real
 * for every WebP flavor:
 *
 *  - 'VP8L' (lossless): full decode — Huffman (simple + code-length-coded),
 *    meta-Huffman groups, color cache, LZ77 backrefs with the 120-entry 2D
 *    distance map, and all 4 transforms (predictor ×14 modes, color,
 *    subtract-green, color-indexing incl. sub-byte bundling).
 *  - 'VP8 ' (lossy): header dims from the keyframe header; pixels
 *    `unsupported` (no JVM codec tier — same contract as JXL/HEIC).
 *  - 'VP8X' (extended): canvas dims; EXIF chunk routed to the TIFF-IFD
 *    parser ([[Exif.parseTiff]]); inner VP8L decodes, inner VP8 doesn't.
 *
 * The encoder half ([[encodeLossless]]/[[encodeVp8x]]) exists for the
 * synthetic corpus and specs: the container has no WebP writer either, so
 * fixtures must be self-made. Encoder and decoder share only the canonical
 * Huffman assignment and the distance table; the spec pins the shared
 * constants with hand-computed cases so a table typo cannot roundtrip
 * invisibly.
 */
object Webp {

  final val StatusOk = "ok"
  final val StatusError = "error"
  final val StatusUnsupported = "unsupported"

  // ---- RIFF container ---------------------------------------------------

  def looksWebp(b: Array[Byte]): Boolean =
    b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  /** (fourcc, payloadStart, payloadLen) for each top-level chunk. */
  private[kernel] def chunks(b: Array[Byte]): Seq[(String, Int, Int)] =
    subChunks(b, 12, b.length)

  /** Chunk walk over an arbitrary range — the top-level RIFF body, or an
    * ANMF frame's nested image-data chunks. */
  private[kernel] def subChunks(b: Array[Byte], from: Int,
                                until: Int): Seq[(String, Int, Int)] = {
    val out = ArrayBuffer.empty[(String, Int, Int)]
    var i = from
    val end = math.min(until, b.length)
    while (i + 8 <= end) {
      val cc = new String(b, i, 4, "ISO-8859-1")
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > end) return out.toSeq // truncated tail
      out += ((cc, i + 8, len))
      i += 8 + len + (len & 1) // chunks are even-padded
    }
    out.toSeq
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Dims without pixel decode (S7): VP8X canvas, else VP8L header, else
    * VP8 keyframe header. */
  def headerDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (!looksWebp(b)) return None
    val cs = chunks(b)
    cs.collectFirst { case ("VP8X", s, l) if l >= 10 =>
      (1 + le24(b, s + 4), 1 + le24(b, s + 7))
    }.orElse(cs.collectFirst { case ("VP8L", s, l) if l >= 5 &&
      (b(s) & 0xff) == 0x2f =>
      val bits = (le32(b, s + 1).toLong & 0xffffffffL)
      val w = (bits & 0x3fff).toInt + 1
      val h = ((bits >> 14) & 0x3fff).toInt + 1
      (w, h)
    }).orElse(cs.collectFirst { case ("VP8 ", s, l) if l >= 10 &&
      (b(s) & 1) == 0 && // keyframe
      (b(s + 3) & 0xff) == 0x9d && (b(s + 4) & 0xff) == 0x01 &&
      (b(s + 5) & 0xff) == 0x2a =>
      (le16(b, s + 6) & 0x3fff, le16(b, s + 8) & 0x3fff)
    })
  }

  /** EXIF chunk (S8): TIFF payload, with or without the "Exif\0\0"
    * prefix some writers include. */
  def exif(b: Array[Byte]): Option[ExifData] = {
    if (!looksWebp(b)) return None
    chunks(b).collectFirst { case ("EXIF", s, l) if l >= 8 =>
      val off = if (b(s) == 'E' && b(s + 1) == 'x' && b(s + 2) == 'i' &&
        b(s + 3) == 'f' && b(s + 4) == 0 && b(s + 5) == 0) 6 else 0
      Exif.parseTiff(b, s + off, s + l)
    }.flatten
  }

  /** Pixel tier: VP8L decodes fully (still or the first animation frame,
    * composited onto the VP8X canvas); VP8 lossy is `unsupported`; corrupt
    * bytes under either flavor are `error`. */
  def decodeWithStatus(b: Array[Byte]): (Option[DecodedImage], String) = {
    if (!looksWebp(b)) return (None, StatusError)
    val cs = chunks(b)
    // animated: the image chunks live INSIDE the first ANMF frame; the
    // decoded result is frame 1 on the canvas — what a generic decoder
    // (the reference's image-crate path) returns for an animation
    val frame = cs.collectFirst { case ("ANMF", s, l) if l >= 24 =>
      (subChunks(b, s + 16, s + l),
        le24(b, s) * 2, le24(b, s + 3) * 2) // frame x, y (stored halved)
    }
    val (imgChunks, fx, fy) = frame.getOrElse((cs, 0, 0))
    imgChunks.collectFirst { case ("VP8L", s, l) => (s, l) } match {
      case Some((s, l)) =>
        try {
          val d = decodeVp8l(b, s, s + l)
          val canvas = if (frame.isDefined) headerDims(b) else None
          canvas match {
            case Some((cw, ch)) if cw != d.w || ch != d.h || fx != 0 || fy != 0 =>
              // composite the frame at its offset on a transparent canvas
              val out = new Array[Int](cw * ch)
              var y = 0
              while (y < d.h) {
                var x = 0
                while (x < d.w) {
                  val cx = fx + x; val cy = fy + y
                  if (cx < cw && cy < ch) out(cy * cw + cx) = d.argb(y * d.w + x)
                  x += 1
                }
                y += 1
              }
              (Some(DecodedImage(cw, ch, out)), StatusOk)
            case _ => (Some(d), StatusOk)
          }
        } catch { case scala.util.control.NonFatal(_) => (None, StatusError) }
      case None =>
        if (imgChunks.exists(_._1 == "VP8 ")) (None, StatusUnsupported)
        else (None, StatusError)
    }
  }

  // ---- bit I/O ----------------------------------------------------------

  private final class Err(msg: String) extends RuntimeException(msg, null, false, false)
  @inline private def fail(msg: String): Nothing = throw new Err(msg)

  /** LSB-first bit reader over b[from, until). */
  private final class BitReader(b: Array[Byte], from: Int, until: Int) {
    private var bitPos: Long = from.toLong * 8
    private val endBit: Long = until.toLong * 8
    def bits(n: Int): Int = {
      if (bitPos + n > endBit) fail("eof")
      var v = 0
      var i = 0
      while (i < n) {
        val p = bitPos + i
        v |= (((b((p >> 3).toInt) >> (p & 7).toInt) & 1) << i)
        i += 1
      }
      bitPos += n
      v
    }
    def bit(): Int = {
      if (bitPos >= endBit) fail("eof")
      val v = (b((bitPos >> 3).toInt) >> (bitPos & 7).toInt) & 1
      bitPos += 1
      v
    }
  }

  /** LSB-first bit writer. */
  private[kernel] final class BitWriter {
    private val buf = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= (((v >> i) & 1) << nb)
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i += 1
      }
    }
    /** Huffman codes are walked MSB-first from the root. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      val out = new Array[Byte](buf.length + (if (nb > 0) 1 else 0))
      var i = 0
      while (i < buf.length) { out(i) = buf(i); i += 1 }
      if (nb > 0) out(buf.length) = cur.toByte
      out
    }
  }

  // ---- Huffman ----------------------------------------------------------

  /** Binary decode tree over a flat primitive array (node n's children at
    * 2n / 2n+1 — no boxing in the per-bit hot loop); leaf = -(sym+2),
    * empty = -1, else child node index. A single-symbol tree is a 0-bit
    * code: [[read]] consumes nothing. */
  private final class HTree {
    private[Webp] var nodes: Array[Int] = { val a = new Array[Int](32); a(0) = -1; a(1) = -1; a }
    private[Webp] var nNodes = 1
    private[Webp] var loneSymbol = -1 // >=0: 0-bit code
    def read(br: BitReader): Int = {
      if (loneSymbol >= 0) return loneSymbol
      val ns = nodes
      var n = 0
      while (true) {
        val c = ns(2 * n + br.bit())
        if (c <= -2) return -c - 2
        if (c == -1) fail("bad code")
        n = c
      }
      -1
    }
    private[Webp] def insert(code: Int, len: Int, sym: Int): Unit = {
      var n = 0
      var i = len - 1
      while (i >= 0) {
        val slot = 2 * n + ((code >> i) & 1)
        var c = nodes(slot)
        if (i == 0) {
          if (c != -1) fail("oversubscribed")
          nodes(slot) = -(sym + 2)
        } else {
          if (c <= -2) fail("oversubscribed")
          if (c == -1) {
            c = nNodes
            nNodes += 1
            if (2 * nNodes > nodes.length) {
              val grown = new Array[Int](nodes.length * 2)
              System.arraycopy(nodes, 0, grown, 0, nodes.length)
              nodes = grown
            }
            nodes(2 * c) = -1; nodes(2 * c + 1) = -1
            nodes(slot) = c
          }
          n = c
        }
        i -= 1
      }
    }
  }

  /** Canonical tree from per-symbol lengths: codes assigned in (len, sym)
    * order, exactly the assignment [[canonicalCodes]] writes. */
  private def buildTree(lens: Array[Int]): HTree = {
    val t = new HTree
    var nz = 0
    var lone = -1
    var kraft = 0L
    var s = 0
    while (s < lens.length) {
      if (lens(s) > 0) {
        nz += 1; lone = s
        if (lens(s) > 15) fail("len>15")
        kraft += 1L << (15 - lens(s))
      }
      s += 1
    }
    if (nz == 0) fail("empty code")
    if (nz == 1) { t.loneSymbol = lone; return t }
    if (kraft != (1L << 15)) fail("incomplete code")
    for ((sym, code, len) <- canonicalCodes(lens)) t.insert(code, len, sym)
    t
  }

  /** (sym, code, len) in canonical order. */
  private[graft] def canonicalCodes(lens: Array[Int]): Seq[(Int, Int, Int)] = {
    val syms = (0 until lens.length).filter(lens(_) > 0)
      .sortBy(s => (lens(s), s))
    var code = 0
    var prevLen = 0
    syms.map { s =>
      code <<= (lens(s) - prevLen)
      prevLen = lens(s)
      val r = (s, code, lens(s))
      code += 1
      r
    }
  }

  /** 2-symbol simple code: read order fixes the bit assignment (s0 -> 0,
    * s1 -> 1), NOT symbol order — the libwebp read semantics. */
  private def simpleTree(s0: Int, s1: Int): HTree = {
    val t = new HTree
    if (s1 < 0) { t.loneSymbol = s0; return t }
    t.nodes(0) = -(s0 + 2)
    t.nodes(1) = -(s1 + 2)
    t
  }

  /** Code-length-code symbol order (spec kCodeLengthCodeOrder). */
  private[kernel] final val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readHuffmanCode(br: BitReader, alphabet: Int): HTree = {
    if (br.bit() == 1) { // simple
      val n = br.bit() + 1
      val firstIs8 = br.bit()
      val s0 = br.bits(if (firstIs8 == 1) 8 else 1)
      val s1 = if (n == 2) br.bits(8) else -1
      if (s0 >= alphabet || s1 >= alphabet) fail("simple sym out of range")
      simpleTree(s0, s1)
    } else {
      val numCl = 4 + br.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      val clTree = buildTree(clLens)
      var maxSymbols =
        if (br.bit() == 1) {
          val nbits = 2 + 2 * br.bits(3)
          2 + br.bits(nbits)
        } else alphabet
      val lens = new Array[Int](alphabet)
      var sym = 0
      var prevLen = 8
      while (sym < alphabet && maxSymbols > 0) {
        maxSymbols -= 1
        val s = clTree.read(br)
        if (s < 16) {
          lens(sym) = s; sym += 1
          if (s != 0) prevLen = s
        } else {
          val (rep, fillLen) = s match {
            case 16 => (3 + br.bits(2), prevLen)
            case 17 => (3 + br.bits(3), 0)
            case _  => (11 + br.bits(7), 0)
          }
          if (sym + rep > alphabet) fail("repeat overflow")
          var r = 0
          while (r < rep) { lens(sym) = fillLen; sym += 1; r += 1 }
        }
      }
      buildTree(lens)
    }
  }

  /** Spec hook: write the code for `freq`'s Huffman lengths, read it back,
    * and check every used symbol decodes to itself via its canonical code —
    * the writer/reader pair exercised in isolation (WebpSpec fuzz). */
  private[graft] def huffRoundtrip(freq: Array[Long], useMaxSymbols: Boolean): Boolean = {
    val lens = huffLengths(freq, 15)
    val bw = new BitWriter
    writeHuffmanCode(bw, lens, useMaxSymbols)
    val bytes = bw.toBytes
    val br = new BitReader(bytes, 0, bytes.length)
    val tree = readHuffmanCode(br, freq.length)
    // verify every used symbol decodes back to itself via its canonical code
    val nz = (0 until lens.length).filter(lens(_) > 0)
    if (nz.size == 1) return tree.read(br) == nz.head
    canonicalCodes(lens).forall { case (sym, code, len) =>
      val bw2 = new BitWriter
      bw2.writeCode(code, len)
      val bs = bw2.toBytes
      val br2 = new BitReader(bs, 0, bs.length)
      tree.read(br2) == sym
    }
  }

  // ---- LZ77 prefix values + 2D distance map -----------------------------

  private def lz77Value(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val eb = (code - 2) >> 1
      val off = (2 + (code & 1)) << eb
      off + br.bits(eb) + 1
    }

  /** (code, extraBits, extraVal) such that decode(code, extraVal) == v. */
  private[graft] def prefixEncode(v: Int): (Int, Int, Int) = {
    val x = v - 1
    if (x < 4) (x, 0, 0)
    else {
      val n = 31 - Integer.numberOfLeadingZeros(x)
      val second = (x >> (n - 1)) & 1
      val eb = n - 1
      (2 * n + second, eb, x - ((2 + second) << eb))
    }
  }

  /** Close-neighborhood offsets for distance codes 1..120 (spec order);
    * flattened (dx, dy) pairs. */
  private[kernel] final val DistTable: Array[Int] = Array(
    0, 1, 1, 0, 1, 1, -1, 1, 0, 2, 2, 0, 1, 2, -1, 2,
    2, 1, -2, 1, 2, 2, -2, 2, 0, 3, 3, 0, 1, 3, -1, 3,
    3, 1, -3, 1, 2, 3, -2, 3, 3, 2, -3, 2, 0, 4, 4, 0,
    1, 4, -1, 4, 4, 1, -4, 1, 3, 3, -3, 3, 2, 4, -2, 4,
    4, 2, -4, 2, 0, 5, 3, 4, -3, 4, 4, 3, -4, 3, 5, 0,
    1, 5, -1, 5, 5, 1, -5, 1, 2, 5, -2, 5, 5, 2, -5, 2,
    4, 4, -4, 4, 3, 5, -3, 5, 5, 3, -5, 3, 0, 6, 6, 0,
    1, 6, -1, 6, 6, 1, -6, 1, 2, 6, -2, 6, 6, 2, -6, 2,
    4, 5, -4, 5, 5, 4, -5, 4, 3, 6, -3, 6, 6, 3, -6, 3,
    0, 7, 7, 0, 1, 7, -1, 7, 5, 5, -5, 5, 7, 1, -7, 1,
    4, 6, -4, 6, 6, 4, -6, 4, 2, 7, -2, 7, 7, 2, -7, 2,
    3, 7, -3, 7, 7, 3, -7, 3, 5, 6, -5, 6, 6, 5, -6, 5,
    8, 0, 4, 7, -4, 7, 7, 4, -7, 4, 8, 1, 8, 2, 6, 6,
    -6, 6, 8, 3, 5, 7, -5, 7, 7, 5, -7, 5, 8, 4, 6, 7,
    -6, 7, 7, 6, -7, 6, 8, 5, 7, 7, -7, 7, 8, 6, 8, 7)

  private[graft] def planeCodeToDistance(w: Int, code: Int): Int =
    if (code > 120) code - 120
    else {
      val dx = DistTable(2 * (code - 1))
      val dy = DistTable(2 * (code - 1) + 1)
      math.max(1, dy * w + dx)
    }

  /** Inverse map for the encoder: (dx, dy) -> plane code, or dist+120. */
  private lazy val planeCodeOf: Map[(Int, Int), Int] =
    (0 until 120).map(i => (DistTable(2 * i), DistTable(2 * i + 1)) -> (i + 1)).toMap

  private[kernel] final val HashMul = 0x1e35a7bd
  @inline private def cacheHash(px: Int, bits: Int): Int =
    (HashMul * px) >>> (32 - bits)

  // ---- VP8L decode ------------------------------------------------------

  private final val MaxDim = 1 << 14

  /** Decode a VP8L codestream at b[from, until). Throws on corrupt data. */
  private[kernel] def decodeVp8l(b: Array[Byte], from: Int, until: Int): DecodedImage = {
    if (until - from < 5 || (b(from) & 0xff) != 0x2f) fail("bad VP8L signature")
    val br = new BitReader(b, from + 1, until)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit() // alpha hint
    if (br.bits(3) != 0) fail("bad version")
    val argb = decodeImageStream(br, w, h)
    DecodedImage(w, h, argb)
  }

  private def divCeil(a: Int, b: Int): Int = (a + b - 1) / b

  private sealed trait Transform
  private final case class PredictorT(bits: Int, data: Array[Int], w: Int) extends Transform
  private final case class ColorT(bits: Int, data: Array[Int], w: Int) extends Transform
  private case object SubGreenT extends Transform
  private final case class IndexT(n: Int, palette: Array[Int], widthBits: Int,
                                  origW: Int) extends Transform

  /** Top-level ARGB image: transforms + spatially-coded pixels. */
  private def decodeImageStream(br: BitReader, w: Int, h: Int): Array[Int] = {
    if (w > MaxDim || h > MaxDim || w.toLong * h > 64L * 1024 * 1024)
      fail("dims out of range")
    var curW = w
    val transforms = ArrayBuffer.empty[Transform]
    var seen = 0
    while (br.bit() == 1) {
      val t = br.bits(2)
      if ((seen & (1 << t)) != 0) fail("duplicate transform")
      seen |= 1 << t
      t match {
        case 0 =>
          val bits = br.bits(3) + 2
          val data = decodePixels(br, divCeil(curW, 1 << bits), divCeil(h, 1 << bits),
            allowMeta = false)
          transforms += PredictorT(bits, data, curW)
        case 1 =>
          val bits = br.bits(3) + 2
          val data = decodePixels(br, divCeil(curW, 1 << bits), divCeil(h, 1 << bits),
            allowMeta = false)
          transforms += ColorT(bits, data, curW)
        case 2 =>
          transforms += SubGreenT
        case 3 =>
          val n = br.bits(8) + 1
          val deltas = decodePixels(br, n, 1, allowMeta = false)
          val palette = new Array[Int](n)
          var acc = 0
          var i = 0
          while (i < n) { // component-wise prefix sum, mod 256 per lane
            acc = addPixels(acc, deltas(i)); palette(i) = acc; i += 1
          }
          val widthBits = if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
          transforms += IndexT(n, palette, widthBits, curW)
          curW = divCeil(curW, 1 << widthBits)
      }
    }
    var px = decodePixels(br, curW, h, allowMeta = true)
    var ti = transforms.length - 1
    while (ti >= 0) {
      px = transforms(ti) match {
        case PredictorT(bits, data, tw) => inversePredictor(px, tw, h, bits, data)
        case ColorT(bits, data, tw) => inverseColor(px, tw, h, bits, data)
        case SubGreenT => inverseSubGreen(px)
        case IndexT(n, palette, wb, origW) => inverseIndex(px, origW, h, n, palette, wb)
      }
      ti -= 1
    }
    px
  }

  /** Entropy-coded image: color cache + (optional) meta-Huffman + the
    * literal/backref/cache symbol loop. Shared by the ARGB image and every
    * sub-image (transform data, huffman image, palette). */
  private def decodePixels(br: BitReader, w: Int, h: Int, allowMeta: Boolean): Array[Int] = {
    if (w <= 0 || h <= 0) fail("bad subimage dims")
    val cacheBits = if (br.bit() == 1) {
      val cb = br.bits(4)
      if (cb < 1 || cb > 11) fail("bad cache bits")
      cb
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0

    var metaImg: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (allowMeta && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaW = divCeil(w, 1 << metaBits)
      metaImg = decodePixels(br, metaW, divCeil(h, 1 << metaBits), allowMeta = false)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        val g = (metaImg(i) >> 8) & 0xffff
        if (g > mx) mx = g
        i += 1
      }
      numGroups = mx + 1
      if (numGroups > 1024) fail("too many huffman groups")
    }

    val greenT = new Array[HTree](numGroups)
    val redT = new Array[HTree](numGroups)
    val blueT = new Array[HTree](numGroups)
    val alphaT = new Array[HTree](numGroups)
    val distT = new Array[HTree](numGroups)
    var g = 0
    while (g < numGroups) {
      greenT(g) = readHuffmanCode(br, 256 + 24 + cacheSize)
      redT(g) = readHuffmanCode(br, 256)
      blueT(g) = readHuffmanCode(br, 256)
      alphaT(g) = readHuffmanCode(br, 256)
      distT(g) = readHuffmanCode(br, 40)
      g += 1
    }

    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    val n = w * h
    val out = new Array[Int](n)
    var pos = 0
    var x = 0
    var y = 0
    @inline def groupAt(): Int =
      if (metaImg == null) 0
      else (metaImg((y >> metaBits) * metaW + (x >> metaBits)) >> 8) & 0xffff
    @inline def insert(px: Int): Unit =
      if (cache != null) cache(cacheHash(px, cacheBits)) = px
    @inline def advance(k: Int): Unit = {
      pos += k
      x += k
      while (x >= w) { x -= w; y += 1 }
    }
    while (pos < n) {
      val gi = groupAt()
      val s = greenT(gi).read(br)
      if (s < 256) {
        val r = redT(gi).read(br)
        val bl = blueT(gi).read(br)
        val a = alphaT(gi).read(br)
        val px = (a << 24) | (r << 16) | (s << 8) | bl
        out(pos) = px
        insert(px)
        advance(1)
      } else if (s < 280) {
        val len = lz77Value(br, s - 256)
        val distVal = lz77Value(br, distT(gi).read(br))
        val dist = planeCodeToDistance(w, distVal)
        if (dist > pos || pos + len > n) fail("backref out of range")
        var k = 0
        while (k < len) {
          val px = out(pos + k - dist)
          out(pos + k) = px
          insert(px)
          k += 1
        }
        advance(len)
      } else {
        val idx = s - 280
        if (cache == null || idx >= cacheSize) fail("cache miss")
        out(pos) = cache(idx)
        advance(1)
      }
    }
    out
  }

  // ---- inverse transforms ----------------------------------------------

  @inline private def addPixels(a: Int, b: Int): Int = {
    val ag = (a & 0xff00ff00) + (b & 0xff00ff00)
    val rb = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    (ag & 0xff00ff00) | (rb & 0x00ff00ff)
  }
  @inline private def subPixels(a: Int, b: Int): Int = {
    // borrow-buffered lane subtraction (the libwebp VP8LSubPixels form):
    // the 0xff filler lanes absorb a borrow so it can't cross channels
    val ag = (0x00ff00ff + (a & 0xff00ff00) - (b & 0xff00ff00)) & 0xff00ff00
    val rb = (0xff00ff00 + (a & 0x00ff00ff) - (b & 0x00ff00ff)) & 0x00ff00ff
    ag | rb
  }

  @inline private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def select(t: Int, l: Int, tl: Int): Int = {
    @inline def sub3(a: Int, b: Int, c: Int): Int =
      math.abs(b - c) - math.abs(a - c)
    val d = sub3((t >>> 24), (l >>> 24), (tl >>> 24)) +
      sub3((t >> 16) & 0xff, (l >> 16) & 0xff, (tl >> 16) & 0xff) +
      sub3((t >> 8) & 0xff, (l >> 8) & 0xff, (tl >> 8) & 0xff) +
      sub3(t & 0xff, l & 0xff, tl & 0xff)
    if (d <= 0) t else l
  }

  @inline private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    @inline def c(sh: Int): Int =
      clip255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    @inline def c(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      clip255(a + (a - b) / 2)
    }
    (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
  }

  /** Mode-m prediction from already-reconstructed neighbors; shared by the
    * decoder's inverse and the encoder's forward subtract. Border rules per
    * spec: (0,0) -> 0xff000000, top row -> L, left column -> T, and the TR
    * of a rightmost-column pixel is the leftmost pixel of the SAME row. */
  private[kernel] def predict(out: Array[Int], w: Int, x: Int, y: Int, mode: Int): Int = {
    if (x == 0 && y == 0) return 0xff000000
    val pos = y * w + x
    if (y == 0) return out(pos - 1) // L
    if (x == 0) return out(pos - w) // T
    val l = out(pos - 1)
    val t = out(pos - w)
    val tl = out(pos - w - 1)
    val tr = if (x == w - 1) out(y * w) else out(pos - w + 1)
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(t, l, tl)
      case 12 => clampAddSubFull(l, t, tl)
      case 13 => clampAddSubHalf(l, t, tl)
      case _ => fail(s"bad predictor mode $mode")
    }
  }

  private def inversePredictor(res: Array[Int], w: Int, h: Int, bits: Int,
                               data: Array[Int]): Array[Int] = {
    val tw = divCeil(w, 1 << bits)
    val out = new Array[Int](res.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val mode = (data((y >> bits) * tw + (x >> bits)) >> 8) & 0xff
        if (mode > 13) fail("bad predictor mode")
        out(y * w + x) = addPixels(res(y * w + x), predict(out, w, x, y, mode))
        x += 1
      }
      y += 1
    }
    out
  }

  @inline private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def inverseColor(px: Array[Int], w: Int, h: Int, bits: Int,
                           data: Array[Int]): Array[Int] = {
    val tw = divCeil(w, 1 << bits)
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = data((y >> bits) * tw + (x >> bits))
        val g2r = m & 0xff
        val g2b = (m >> 8) & 0xff
        val r2b = (m >> 16) & 0xff
        val p = px(y * w + x)
        val g = (p >> 8) & 0xff
        var r = (p >> 16) & 0xff
        var b = p & 0xff
        r = (r + ctDelta(g2r, g)) & 0xff
        b = (b + ctDelta(g2b, g)) & 0xff
        b = (b + ctDelta(r2b, r)) & 0xff
        out(y * w + x) = (p & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
    out
  }

  /** Forward color transform (encoder): exact mirror of [[inverseColor]]
    * — blue subtracts the red delta computed from the ORIGINAL red, which
    * the inverse has restored by the time it adds it back. */
  private def forwardColor(px: Array[Int], w: Int, h: Int, bits: Int,
                           data: Array[Int]): Array[Int] = {
    val tw = divCeil(w, 1 << bits)
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = data((y >> bits) * tw + (x >> bits))
        val g2r = m & 0xff
        val g2b = (m >> 8) & 0xff
        val r2b = (m >> 16) & 0xff
        val p = px(y * w + x)
        val g = (p >> 8) & 0xff
        val r0 = (p >> 16) & 0xff
        val b0 = p & 0xff
        val r = (r0 - ctDelta(g2r, g)) & 0xff
        val b = (b0 - ctDelta(g2b, g) - ctDelta(r2b, r0)) & 0xff
        out(y * w + x) = (p & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
    out
  }

  private def inverseSubGreen(px: Array[Int]): Array[Int] = {
    val out = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = ((p >> 16) + g) & 0xff
      val b = (p + g) & 0xff
      out(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
    out
  }

  private def inverseIndex(px: Array[Int], w: Int, h: Int, n: Int,
                           palette: Array[Int], widthBits: Int): Array[Int] = {
    val packedW = divCeil(w, 1 << widthBits)
    val out = new Array[Int](w * h)
    val per = 1 << widthBits
    val bitsPer = 8 >> widthBits
    val mask = (1 << bitsPer) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val packed = (px(y * packedW + (x >> widthBits)) >> 8) & 0xff
        val sub = x & (per - 1)
        val idx = (packed >> (sub * bitsPer)) & mask
        out(y * w + x) = if (idx < n) palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- encoder ----------------------------------------------------------

  /** Depth-limited Huffman lengths: plain two-node-merge Huffman with a
    * deterministic (freq, id) tie-break; if the deepest code exceeds
    * `maxLen`, halve the spread and retry (converges to a balanced tree). */
  private[kernel] def huffLengths(freq: Array[Long], maxLen: Int): Array[Int] = {
    val n = freq.length
    val lens = new Array[Int](n)
    val nz = (0 until n).filter(freq(_) > 0)
    if (nz.isEmpty) return lens
    if (nz.size == 1) { lens(nz.head) = 1; return lens }
    var f = freq.clone()
    var done = false
    while (!done) {
      // ordered merge: (freq, id); leaf ids < n, internal ids >= n
      val ord: Ordering[(Long, Int)] =
        Ordering.by((t: (Long, Int)) => (-t._1, -t._2))
      val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](ord)
      val leftC = scala.collection.mutable.Map.empty[Int, Int]
      val rightC = scala.collection.mutable.Map.empty[Int, Int]
      var nextId = n
      nz.foreach(s => if (f(s) > 0) pq.enqueue((f(s), s)))
      // after halving, some freqs may hit 0: clamp to 1 so symbols stay coded
      nz.foreach(s => if (f(s) == 0) pq.enqueue((1L, s)))
      while (pq.size > 1) {
        val (fa, a) = pq.dequeue()
        val (fb, bb) = pq.dequeue()
        leftC(nextId) = a; rightC(nextId) = bb
        pq.enqueue((fa + fb, nextId))
        nextId += 1
      }
      val root = pq.dequeue()._2
      var maxDepth = 0
      def walk(node: Int, depth: Int): Unit =
        if (node < n) {
          lens(node) = depth
          if (depth > maxDepth) maxDepth = depth
        } else {
          walk(leftC(node), depth + 1)
          walk(rightC(node), depth + 1)
        }
      walk(root, 0)
      if (maxDepth <= maxLen) done = true
      else f = f.map(v => if (v > 0) math.max(1L, v >> 2) else 0L)
    }
    lens
  }

  /** Write one Huffman code (the decoder-side [[readHuffmanCode]] mirror):
    * 0 or 1 used symbols -> simple 1-symbol; 2 symbols of length 1 ->
    * simple 2-symbol; else the code-length-coded normal form with 17/18
    * zero-runs, 16 repeats, and (optionally) the max_symbols short-stop. */
  private[kernel] def writeHuffmanCode(bw: BitWriter, lens: Array[Int],
                                       useMaxSymbols: Boolean = false): Unit = {
    val nz = (0 until lens.length).filter(lens(_) > 0)
    if (nz.size <= 1) {
      val s = if (nz.isEmpty) 0 else nz.head
      // simple codes carry symbols in ≤8 bits; a lone symbol ≥256 cannot
      // occur by construction (a stream's first green token is always a
      // literal <256, and the other four alphabets are ≤256 wide)
      require(s <= 255, s"lone symbol $s needs >8 bits")
      bw.writeBits(1, 1) // simple
      bw.writeBits(0, 1) // 1 symbol
      if (s <= 1) { bw.writeBits(0, 1); bw.writeBits(s, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(s, 8) }
      return
    }
    // the 8-bit symbol field bounds the simple form; bigger symbols (green
    // length/cache codes) take the normal form, whose canonical (len, sym)
    // assignment for two length-1 codes matches the simple read order
    if (nz.size == 2 && lens(nz(0)) == 1 && lens(nz(1)) == 1 && nz(1) <= 255) {
      // canonical assignment: smaller symbol first -> code 0 (read order
      // IS the bit assignment, so this must match canonicalCodes)
      bw.writeBits(1, 1)
      bw.writeBits(1, 1) // 2 symbols
      val s0 = nz(0)
      if (s0 <= 1) { bw.writeBits(0, 1); bw.writeBits(s0, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(s0, 8) }
      bw.writeBits(nz(1), 8)
      return
    }
    bw.writeBits(0, 1) // normal
    // tokenize lengths: literals, 16 (repeat prev nonzero), 17/18 (zeros).
    // WITHOUT max_symbols the decoder keeps reading tokens until the WHOLE
    // alphabet is covered, so trailing zeros must be emitted as runs; WITH
    // max_symbols the stream stops after the last nonzero and the decoder
    // zero-fills the rest.
    final case class Tok(sym: Int, extra: Int, extraBits: Int)
    val toks = ArrayBuffer.empty[Tok]
    val last = if (useMaxSymbols) nz.last else lens.length - 1
    var i = 0
    var prevLen = 8
    while (i <= last) {
      val v = lens(i)
      if (v == 0) {
        var run = 0
        while (i + run <= last && lens(i + run) == 0) run += 1
        var left = run
        while (left > 0) {
          if (left >= 11) {
            val take = math.min(left, 138)
            toks += Tok(18, take - 11, 7); left -= take
          } else if (left >= 3) {
            val take = math.min(left, 10)
            toks += Tok(17, take - 3, 3); left -= take
          } else {
            toks += Tok(0, 0, 0); left -= 1
          }
        }
        i += run
      } else {
        var run = 1
        while (i + run <= last && lens(i + run) == v) run += 1
        var emitted = 0
        // first occurrence is a literal (sets prevLen for 16-repeats)
        toks += Tok(v, 0, 0)
        prevLen = v
        emitted = 1
        var left = run - 1
        while (left > 0) {
          if (left >= 3) {
            val take = math.min(left, 6)
            toks += Tok(16, take - 3, 2); left -= take
          } else {
            toks += Tok(v, 0, 0); left -= 1
          }
        }
        i += run
      }
    }
    // code-length-code over the 19-symbol alphabet
    val clFreq = new Array[Long](19)
    toks.foreach(t => clFreq(t.sym) += 1)
    val clLens = huffLengths(clFreq, 7)
    // how many kOrder slots must be written to cover every nonzero length
    var numCl = 19
    while (numCl > 4 && clLens(ClOrder(numCl - 1)) == 0) numCl -= 1
    bw.writeBits(numCl - 4, 4)
    var k = 0
    while (k < numCl) { bw.writeBits(clLens(ClOrder(k)), 3); k += 1 }
    val clCodes = new Array[(Int, Int)](19)
    canonicalCodes(clLens).foreach { case (s, c, l) => clCodes(s) = (c, l) }
    // lone-symbol CL code is 0-bit: nothing to write per token
    val clLone = clLens.count(_ > 0) == 1
    if (useMaxSymbols) {
      bw.writeBits(1, 1)
      val t = toks.length
      var nbitsSel = 0
      while ((1L << (2 + 2 * nbitsSel)) < (t - 2 + 1) && nbitsSel < 7) nbitsSel += 1
      bw.writeBits(nbitsSel, 3)
      bw.writeBits(t - 2, 2 + 2 * nbitsSel)
    } else bw.writeBits(0, 1)
    toks.foreach { t =>
      if (!clLone) {
        val (c, l) = clCodes(t.sym)
        bw.writeCode(c, l)
      }
      if (t.extraBits > 0) bw.writeBits(t.extra, t.extraBits)
    }
  }

  /** Encoder configuration for one entropy-coded image. `topLevel` must be
    * true ONLY for the spatially-coded main image: sub-images (transform
    * data, palette, huffman image) carry no meta-Huffman presence bit. */
  private final case class EmitCfg(cacheBits: Int, lz77: Boolean,
                                   metaBits: Int, // 0 = no meta-Huffman
                                   useMaxSymbols: Boolean,
                                   topLevel: Boolean)

  private sealed trait Token { def group: Int }
  private final case class TLit(group: Int, a: Int, r: Int, g: Int, b: Int) extends Token
  private final case class TCache(group: Int, idx: Int) extends Token
  private final case class TCopy(group: Int, lenCode: Int, lenEb: Int, lenEv: Int,
                                 distCode: Int, distEb: Int, distEv: Int) extends Token

  /** Tokenize + write one entropy-coded image (the [[decodePixels]]
    * mirror). Backrefs: runs against dist 1 (plane code 2) and dist w
    * (plane code 1). */
  private def emitImage(bw: BitWriter, px: Array[Int], w: Int, h: Int,
                        cfg: EmitCfg): Unit = {
    val n = px.length
    require(n == w * h, "pixel count mismatch")
    val cacheSize = if (cfg.cacheBits > 0) 1 << cfg.cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val cacheUsed = if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    val metaBits = cfg.metaBits
    val metaW = if (metaBits > 0) divCeil(w, 1 << metaBits) else 0
    @inline def groupAt(pos: Int): Int =
      if (metaBits == 0) 0
      else {
        val x = pos % w
        val y = pos / w
        (((x >> metaBits) + (y >> metaBits)) & 1)
      }
    val numGroups = if (metaBits == 0) 1 else 2
    @inline def insert(p: Int): Unit = if (cache != null) {
      val hsh = cacheHash(p, cfg.cacheBits)
      cache(hsh) = p
      cacheUsed(hsh) = true
    }
    // pass 1: tokens
    val toks = ArrayBuffer.empty[Token]
    var pos = 0
    while (pos < n) {
      val gi = groupAt(pos)
      var copied = false
      if (cfg.lz77 && pos > 0) {
        // run against the previous pixel (dist 1) or the row above (dist w)
        var best = 0
        var bestDist = 0
        var d = 1
        while (d <= 2) {
          val dist = if (d == 1) 1 else w
          if (dist <= pos) {
            var run = 0
            val cap = math.min(4096, n - pos)
            while (run < cap && px(pos + run) == px(pos + run - dist)) run += 1
            if (run > best) { best = run; bestDist = dist }
          }
          d += 1
        }
        if (best >= 4) {
          val (lc, leb, lev) = prefixEncode(best)
          val planeCode =
            if (bestDist == 1) planeCodeOf((1, 0))
            else planeCodeOf((0, 1))
          val (dc, deb, dev) = prefixEncode(planeCode)
          toks += TCopy(gi, lc, leb, lev, dc, deb, dev)
          var k = 0
          while (k < best) { insert(px(pos + k)); k += 1 }
          pos += best
          copied = true
        }
      }
      if (!copied) {
        val p = px(pos)
        val hsh = if (cache != null) cacheHash(p, cfg.cacheBits) else -1
        if (cache != null && cacheUsed(hsh) && cache(hsh) == p) {
          toks += TCache(gi, hsh)
        } else {
          toks += TLit(gi, (p >>> 24), (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        }
        insert(p)
        pos += 1
      }
    }
    // header bits: cache, then meta image
    if (cfg.cacheBits > 0) {
      bw.writeBits(1, 1)
      bw.writeBits(cfg.cacheBits, 4)
    } else bw.writeBits(0, 1)
    require(metaBits == 0 || cfg.topLevel, "meta-Huffman only at top level")
    if (metaBits > 0) {
      bw.writeBits(1, 1)
      bw.writeBits(metaBits - 2, 3)
      val metaH = divCeil(h, 1 << metaBits)
      val metaPx = new Array[Int](metaW * metaH)
      var my = 0
      while (my < metaH) {
        var mx = 0
        while (mx < metaW) {
          val group = (mx + my) & 1
          metaPx(my * metaW + mx) = 0xff000000 | (group << 8)
          mx += 1
        }
        my += 1
      }
      emitImage(bw, metaPx, metaW, metaH,
        EmitCfg(0, lz77 = false, 0, useMaxSymbols = false, topLevel = false))
    } else if (cfg.topLevel) bw.writeBits(0, 1)
    // histograms per group
    val greenF = Array.fill(numGroups)(new Array[Long](256 + 24 + cacheSize))
    val redF = Array.fill(numGroups)(new Array[Long](256))
    val blueF = Array.fill(numGroups)(new Array[Long](256))
    val alphaF = Array.fill(numGroups)(new Array[Long](256))
    val distF = Array.fill(numGroups)(new Array[Long](40))
    toks.foreach {
      case TLit(g, a, r, gg, b) =>
        greenF(g)(gg) += 1; redF(g)(r) += 1; blueF(g)(b) += 1; alphaF(g)(a) += 1
      case TCache(g, idx) => greenF(g)(256 + 24 + idx) += 1
      case TCopy(g, lc, _, _, dc, _, _) =>
        greenF(g)(256 + lc) += 1; distF(g)(dc) += 1
    }
    val greenC = new Array[Array[(Int, Int)]](numGroups)
    val redC = new Array[Array[(Int, Int)]](numGroups)
    val blueC = new Array[Array[(Int, Int)]](numGroups)
    val alphaC = new Array[Array[(Int, Int)]](numGroups)
    val distC = new Array[Array[(Int, Int)]](numGroups)
    var g = 0
    while (g < numGroups) {
      def emitCode(freq: Array[Long], maxSyms: Boolean): Array[(Int, Int)] = {
        val lens = huffLengths(freq, 15)
        writeHuffmanCode(bw, lens, maxSyms)
        val codes = new Array[(Int, Int)](freq.length)
        canonicalCodes(lens).foreach { case (s, c, l) => codes(s) = (c, l) }
        // the 2-symbol simple path assigns read order = ascending symbol,
        // which canonicalCodes also produces for equal lengths — aligned
        codes
      }
      greenC(g) = emitCode(greenF(g), cfg.useMaxSymbols)
      redC(g) = emitCode(redF(g), maxSyms = false)
      blueC(g) = emitCode(blueF(g), maxSyms = false)
      alphaC(g) = emitCode(alphaF(g), maxSyms = false)
      distC(g) = emitCode(distF(g), maxSyms = false)
      g += 1
    }
    @inline def put(codes: Array[(Int, Int)], sym: Int, lone: Boolean): Unit =
      if (!lone) { val (c, l) = codes(sym); bw.writeCode(c, l) }
    def isLone(freq: Array[Long]): Boolean = freq.count(_ > 0) <= 1
    val greenLone = greenF.map(isLone)
    val redLone = redF.map(isLone)
    val blueLone = blueF.map(isLone)
    val alphaLone = alphaF.map(isLone)
    val distLone = distF.map(isLone)
    toks.foreach {
      case TLit(gi2, a, r, gg, b) =>
        put(greenC(gi2), gg, greenLone(gi2))
        put(redC(gi2), r, redLone(gi2))
        put(blueC(gi2), b, blueLone(gi2))
        put(alphaC(gi2), a, alphaLone(gi2))
      case TCache(gi2, idx) =>
        put(greenC(gi2), 256 + 24 + idx, greenLone(gi2))
      case TCopy(gi2, lc, leb, lev, dc, deb, dev) =>
        put(greenC(gi2), 256 + lc, greenLone(gi2))
        if (leb > 0) bw.writeBits(lev, leb)
        put(distC(gi2), dc, distLone(gi2))
        if (deb > 0) bw.writeBits(dev, deb)
    }
  }

  /** Encode a VP8L codestream exercising a chosen feature path:
    *  - 0: plain literals (no transform, no cache, no LZ77)
    *  - 1: subtract-green + LZ77 + color cache + 2-group meta-Huffman +
    *       the max_symbols short-stop on the green code
    *  - 2: color-indexing (palette, sub-byte bundling when small) + LZ77
    *  - 3: predictor transform (4px blocks cycling all 14 modes) + LZ77
    *  - 4: color transform (8px blocks, varying multipliers) + cache
    * Falls back from 2 to 1 when the image has >256 distinct colors. */
  private[kernel] def encodeVp8lPayload(d: DecodedImage, mode: Int): Array[Byte] = {
    require(d.w >= 1 && d.w <= MaxDim && d.h >= 1 && d.h <= MaxDim,
      s"dims out of VP8L range: ${d.w}x${d.h}")
    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(d.w - 1, 14)
    bw.writeBits(d.h - 1, 14)
    val hasAlpha = d.argb.exists(p => (p >>> 24) != 0xff)
    bw.writeBits(if (hasAlpha) 1 else 0, 1)
    bw.writeBits(0, 3) // version
    val w = d.w
    val h = d.h
    mode match {
      case 1 =>
        bw.writeBits(1, 1); bw.writeBits(2, 2) // subtract-green
        bw.writeBits(0, 1) // end of transforms
        val sg = forwardSubGreen(d.argb)
        emitImage(bw, sg, w, h, EmitCfg(6, lz77 = true, metaBits = 3,
          useMaxSymbols = true, topLevel = true))
      case 2 =>
        val distinct = distinctColors(d.argb, 257)
        if (distinct.length > 256)
          return encodeVp8lPayload(d, 1) // palette infeasible — take path 1
        val palette = distinct.sorted
        val idxOf = palette.zipWithIndex.toMap
        val nCol = palette.length
        val widthBits = if (nCol <= 2) 3 else if (nCol <= 4) 2
          else if (nCol <= 16) 1 else 0
        bw.writeBits(1, 1); bw.writeBits(3, 2) // color-indexing
        bw.writeBits(nCol - 1, 8)
        val deltas = new Array[Int](nCol)
        var prev = 0
        var i = 0
        while (i < nCol) { deltas(i) = subPixels(palette(i), prev); prev = palette(i); i += 1 }
        emitImage(bw, deltas, nCol, 1,
          EmitCfg(0, lz77 = false, 0, useMaxSymbols = false, topLevel = false))
        bw.writeBits(0, 1) // end of transforms
        val packedW = divCeil(w, 1 << widthBits)
        val per = 1 << widthBits
        val bitsPer = 8 >> widthBits
        val packed = new Array[Int](packedW * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < packedW) {
            var v = 0
            var s = 0
            while (s < per) {
              val srcX = x * per + s
              if (srcX < w) v |= idxOf(d.argb(y * w + srcX)) << (s * bitsPer)
              s += 1
            }
            packed(y * packedW + x) = 0xff000000 | (v << 8)
            x += 1
          }
          y += 1
        }
        emitImage(bw, packed, packedW, h,
          EmitCfg(0, lz77 = true, 0, useMaxSymbols = false, topLevel = true))
      case 3 =>
        val bits = 2 // 4px blocks
        val tw = divCeil(w, 1 << bits)
        val th = divCeil(h, 1 << bits)
        val data = new Array[Int](tw * th)
        var by = 0
        while (by < th) {
          var bx = 0
          while (bx < tw) {
            data(by * tw + bx) = 0xff000000 | (((bx + by * 3) % 14) << 8)
            bx += 1
          }
          by += 1
        }
        bw.writeBits(1, 1); bw.writeBits(0, 2) // predictor
        bw.writeBits(bits - 2, 3)
        emitImage(bw, data, tw, th,
          EmitCfg(0, lz77 = false, 0, useMaxSymbols = false, topLevel = false))
        bw.writeBits(0, 1) // end of transforms
        // forward: residual = px - predict(reconstructed originals)
        val res = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val m = (data((y >> bits) * tw + (x >> bits)) >> 8) & 0xff
            res(y * w + x) = subPixels(d.argb(y * w + x), predict(d.argb, w, x, y, m))
            x += 1
          }
          y += 1
        }
        emitImage(bw, res, w, h,
          EmitCfg(0, lz77 = true, 0, useMaxSymbols = false, topLevel = true))
      case 4 =>
        val bits = 3 // 8px blocks
        val tw = divCeil(w, 1 << bits)
        val th = divCeil(h, 1 << bits)
        val data = new Array[Int](tw * th)
        var i = 0
        while (i < data.length) {
          // varying signed 3.5-fixed multipliers, exercising sign handling
          val g2r = (i * 37 + 16) & 0xff
          val g2b = (i * 59 + 200) & 0xff
          val r2b = (i * 83 + 100) & 0xff
          data(i) = 0xff000000 | (r2b << 16) | (g2b << 8) | g2r
          i += 1
        }
        bw.writeBits(1, 1); bw.writeBits(1, 2) // color transform
        bw.writeBits(bits - 2, 3)
        emitImage(bw, data, tw, th,
          EmitCfg(0, lz77 = false, 0, useMaxSymbols = false, topLevel = false))
        bw.writeBits(0, 1) // end of transforms
        val fwd = forwardColor(d.argb, w, h, bits, data)
        emitImage(bw, fwd, w, h,
          EmitCfg(4, lz77 = false, 0, useMaxSymbols = false, topLevel = true))
      case _ =>
        bw.writeBits(0, 1) // no transforms
        emitImage(bw, d.argb, w, h,
          EmitCfg(0, lz77 = false, 0, useMaxSymbols = false, topLevel = true))
    }
    bw.toBytes
  }

  private def forwardSubGreen(px: Array[Int]): Array[Int] = {
    val out = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) - g) & 0xff
      val b = ((p & 0xff) - g) & 0xff
      out(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
    out
  }

  /** Up to `cap` distinct colors (deterministic order-agnostic). */
  private def distinctColors(px: Array[Int], cap: Int): Array[Int] = {
    val seen = new java.util.TreeSet[Integer]()
    var i = 0
    while (i < px.length && seen.size <= cap) { seen.add(px(i)); i += 1 }
    val out = new Array[Int](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length + (payload.length & 1))
    out(0) = fourcc(0).toByte; out(1) = fourcc(1).toByte
    out(2) = fourcc(2).toByte; out(3) = fourcc(3).toByte
    val l = payload.length
    out(4) = (l & 0xff).toByte; out(5) = ((l >> 8) & 0xff).toByte
    out(6) = ((l >> 16) & 0xff).toByte; out(7) = ((l >> 24) & 0xff).toByte
    System.arraycopy(payload, 0, out, 8, l)
    out
  }

  private def riff(inner: Array[Byte]*): Array[Byte] = {
    val body = inner.map(_.length).sum + 4
    val out = new Array[Byte](8 + body)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    out(4) = (body & 0xff).toByte; out(5) = ((body >> 8) & 0xff).toByte
    out(6) = ((body >> 16) & 0xff).toByte; out(7) = ((body >> 24) & 0xff).toByte
    out(8) = 'W'; out(9) = 'E'; out(10) = 'B'; out(11) = 'P'
    var off = 12
    inner.foreach { c => System.arraycopy(c, 0, out, off, c.length); off += c.length }
    out
  }

  /** Simple-form lossless WebP: RIFF + one VP8L chunk. */
  def encodeLossless(d: DecodedImage, mode: Int): Array[Byte] =
    riff(chunk("VP8L", encodeVp8lPayload(d, mode)))

  /** Extended-form lossless WebP: VP8X (canvas dims + EXIF flag) + VP8L +
    * EXIF chunk ("Exif\0\0"-prefixed TIFF or bare TIFF, stored as given). */
  def encodeVp8x(d: DecodedImage, mode: Int,
                 exifPayload: Option[Array[Byte]]): Array[Byte] = {
    val flags = if (exifPayload.isDefined) 0x08 else 0x00
    val vp8x = new Array[Byte](10)
    vp8x(0) = flags.toByte
    val wm = d.w - 1
    val hm = d.h - 1
    vp8x(4) = (wm & 0xff).toByte; vp8x(5) = ((wm >> 8) & 0xff).toByte
    vp8x(6) = ((wm >> 16) & 0xff).toByte
    vp8x(7) = (hm & 0xff).toByte; vp8x(8) = ((hm >> 8) & 0xff).toByte
    vp8x(9) = ((hm >> 16) & 0xff).toByte
    val cs = Seq(chunk("VP8X", vp8x), chunk("VP8L", encodeVp8lPayload(d, mode))) ++
      exifPayload.map(p => chunk("EXIF", p))
    riff(cs: _*)
  }

  /** Animated lossless WebP: VP8X (ANIM + optional EXIF flags) + ANIM +
    * one ANMF per frame, each wrapping a VP8L codestream. All frames are
    * full-canvas at (0,0); frame 1 is what the decode tier returns. */
  def encodeAnimated(frames: Seq[DecodedImage], mode: Int,
                     exifPayload: Option[Array[Byte]] = None,
                     canvas: Option[(Int, Int)] = None,
                     at: (Int, Int) = (0, 0)): Array[Byte] = {
    require(frames.nonEmpty, "animation needs at least one frame")
    val (cw, ch) = canvas.getOrElse((frames.head.w, frames.head.h))
    val (fx, fy) = at
    require(fx % 2 == 0 && fy % 2 == 0, "ANMF offsets are stored halved")
    val flags = 0x02 | (if (exifPayload.isDefined) 0x08 else 0x00) // A | E
    val vp8x = new Array[Byte](10)
    vp8x(0) = flags.toByte
    val cwm = cw - 1; val chm = ch - 1
    vp8x(4) = (cwm & 0xff).toByte; vp8x(5) = ((cwm >> 8) & 0xff).toByte
    vp8x(6) = ((cwm >> 16) & 0xff).toByte
    vp8x(7) = (chm & 0xff).toByte; vp8x(8) = ((chm >> 8) & 0xff).toByte
    vp8x(9) = ((chm >> 16) & 0xff).toByte
    val anim = new Array[Byte](6) // bg color 0, loop count 0 (infinite)
    val anmfs = frames.map { f =>
      val inner = chunk("VP8L", encodeVp8lPayload(f, mode))
      val hdr = new Array[Byte](16)
      @inline def put24(off: Int, v: Int): Unit = {
        hdr(off) = (v & 0xff).toByte; hdr(off + 1) = ((v >> 8) & 0xff).toByte
        hdr(off + 2) = ((v >> 16) & 0xff).toByte
      }
      put24(0, fx / 2); put24(3, fy / 2)
      put24(6, f.w - 1); put24(9, f.h - 1)
      put24(12, 100) // duration ms
      chunk("ANMF", hdr ++ inner)
    }
    val cs = Seq(chunk("VP8X", vp8x), chunk("ANIM", anim)) ++ anmfs ++
      exifPayload.map(p => chunk("EXIF", p))
    riff(cs: _*)
  }

  /** Minimal VP8 (lossy) keyframe header carrying real dims over an opaque
    * body — the `unsupported`-pixels / real-dims fixture (same honesty
    * contract as the HEIC shell). With an EXIF payload the stream takes
    * the extended (VP8X) form so the metadata tiers stay real. */
  def encodeLossyStub(w: Int, h: Int, body: Array[Byte],
                      exifPayload: Option[Array[Byte]] = None): Array[Byte] = {
    val payload = new Array[Byte](10 + body.length)
    payload(0) = 0 // keyframe, version 0, show_frame 0, size 0
    payload(3) = 0x9d.toByte; payload(4) = 0x01; payload(5) = 0x2a
    payload(6) = (w & 0xff).toByte; payload(7) = ((w >> 8) & 0x3f).toByte
    payload(8) = (h & 0xff).toByte; payload(9) = ((h >> 8) & 0x3f).toByte
    System.arraycopy(body, 0, payload, 10, body.length)
    exifPayload match {
      case None => riff(chunk("VP8 ", payload))
      case Some(ex) =>
        val vp8x = new Array[Byte](10)
        vp8x(0) = 0x08.toByte // EXIF flag
        val wm = w - 1; val hm = h - 1
        vp8x(4) = (wm & 0xff).toByte; vp8x(5) = ((wm >> 8) & 0xff).toByte
        vp8x(6) = ((wm >> 16) & 0xff).toByte
        vp8x(7) = (hm & 0xff).toByte; vp8x(8) = ((hm >> 8) & 0xff).toByte
        vp8x(9) = ((hm >> 16) & 0xff).toByte
        riff(chunk("VP8X", vp8x), chunk("VP8 ", payload), chunk("EXIF", ex))
    }
  }
}
