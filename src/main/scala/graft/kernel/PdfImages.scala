package graft.kernel

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/**
 * PDF image-XObject extraction — the pure-JVM PDF decode tier.
 *
 * The reference renders PDF page 1 at 2× with a full renderer
 * (scanner.rs:583-625). No PDF renderer ships in a JVM, but the dominant
 * real-world duplicate-bearing PDFs — scanned documents and photo
 * exports — are a page wrapping one image XObject, and those streams ARE
 * decodable with what the JVM has: `/DCTDecode` payloads are literal
 * JPEG bytes (ImageIO), `/FlateDecode` is zlib (`java.util.zip.Inflater`)
 * plus the PNG/TIFF predictors, `/ASCIIHex`, `/ASCII85` and
 * `/RunLength` are trivial transforms. So this tier mirrors the RAW
 * path's contract (scanner.rs:1353-1380 — decode the LARGEST embedded
 * image): find every `<<dict>> stream…endstream` span, decode the image
 * XObjects we have codecs for, keep the largest by pixel area.
 *
 * Honest difference vs the reference, stated: the reference hashes the
 * 2× page RENDER (vector content, fonts and all); this tier hashes the
 * largest embedded raster at its native resolution. For image-wrapping
 * pages the two agree up to PDQ's own scale normalization; for
 * text/vector-only pages this tier has nothing to decode and reports the
 * row `unsupported` — visible per-fmt in `_metrics`, never silent.
 *
 * Codec-less stream filters (`/JPXDecode`, `/JBIG2Decode`,
 * `/CCITTFaxDecode`, `/LZWDecode`) are flagged so the caller can report
 * `unsupported` rather than `error` when they are all a file offers.
 */
object PdfImages {

  /** Decode outcome: the largest decodable embedded image, plus whether
    * any image stream was skipped for lack of a JVM codec (drives the
    * ok / unsupported / error trichotomy in ImageCodec): `sawCodecless`
    * = an image stream needed a codec the JVM lacks (→ unsupported);
    * `sawCorrupt` = an image stream with a SUPPORTED chain failed to
    * decode (→ error — same contract as a truncated JPEG under any
    * other tier). */
  final case class Extract(image: Option[DecodedImage], sawCodecless: Boolean,
                           sawCorrupt: Boolean)

  private val CodeclessFilters =
    Set("JPXDecode", "JBIG2Decode", "CCITTFaxDecode", "LZWDecode")

  /** Thrown inside a decode chain when a SUPPORTED filter hits a
    * parameter combination this tier has no path for (e.g. predictor 2
    * over sub-byte samples) — mapped to Left(true) = `unsupported`, NOT
    * `error`, because the bytes are not corrupt. */
  private final class NoCodec
    extends RuntimeException("no codec for this parameter combination",
      null, false, false)

  /** Streams tried per file and pixel-area ceiling — bounds on
    * adversarial inputs, same spirit as the RAW path's take(8). */
  private val MaxStreams = 32
  private val MaxPixels = 100000000L

  /** `%PDF-` header anywhere in the first 1 KiB (ISO 32000 §7.5.2 allows
    * leading junk; some generators emit it). */
  def looksPdf(bytes: Array[Byte]): Boolean = {
    val lim = math.min(bytes.length - 5, 1019)
    var i = 0
    while (i <= lim) {
      if (bytes(i) == '%' && bytes(i + 1) == 'P' && bytes(i + 2) == 'D' &&
        bytes(i + 3) == 'F' && bytes(i + 4) == '-') return true
      i += 1
    }
    false
  }

  def extract(bytes: Array[Byte]): Extract = {
    if (!looksPdf(bytes))
      return Extract(None, sawCodecless = false, sawCorrupt = false)
    // ISO-8859-1 maps bytes 1:1 to chars: string indexes == byte offsets
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    // cap AFTER restricting to /Image dicts — content/font/metadata
    // streams must not consume the decode budget (a 25-page scan carries
    // dozens of non-raster streams before its images; discovery is a
    // linear scan either way, only DECODE work needs bounding)
    val streams =
      findStreams(s).filter(_._1.contains("/Image")).take(MaxStreams)
    var best: Option[DecodedImage] = None
    var codecless = false
    var corrupt = false
    streams.foreach { case (dict, from, to) =>
      decodeImageStream(s, dict, bytes, from, to) match {
        case Right(img) =>
          if (best.forall(b => b.w.toLong * b.h < img.w.toLong * img.h))
            best = Some(img)
        case Left(noCodec) =>
          codecless ||= noCodec
          corrupt ||= !noCodec
      }
    }
    Extract(best, codecless, corrupt)
  }

  // ---- stream discovery ------------------------------------------------

  /** All `<<dict>> stream … endstream` spans: (dict text, data start,
    * data end). The dict is found by a backward `<< >>` depth scan from
    * the `>>` that precedes the `stream` keyword — streams cannot nest
    * and image XObjects cannot live inside object streams (PDF 32000
    * §7.5.7), so a flat scan sees every candidate. */
  private[kernel] def findStreams(s: String): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var idx = s.indexOf("stream")
    while (idx >= 0) {
      var trueKeyword = false
      var payloadEnd = 0
      var j = idx - 1
      while (j >= 0 && (s(j) == ' ' || s(j) == '\r' || s(j) == '\n' || s(j) == '\t')) j -= 1
      val dictEnd = j // index of the closing '>' (second of ">>")
      if (dictEnd >= 1 && s(dictEnd) == '>' && s(dictEnd - 1) == '>') {
        var depth = 1
        var k = dictEnd - 2
        var dictStart = -1
        while (k >= 1 && depth > 0) {
          if (s(k) == '>' && s(k - 1) == '>') { depth += 1; k -= 2 }
          else if (s(k) == '<' && s(k - 1) == '<') {
            depth -= 1
            if (depth == 0) dictStart = k - 1 else k -= 2
          }
          else k -= 1
        }
        if (dictStart >= 0) {
          var d = idx + "stream".length
          if (d < s.length && s(d) == '\r') d += 1
          if (d < s.length && s(d) == '\n') d += 1
          val dict = s.substring(dictStart, dictEnd + 1)
          // a direct /Length slices the payload EXACTLY — trusted when the
          // endstream keyword actually follows it (modulo EOL), which is
          // the one mechanism PDF gives a writer whose BINARY payload
          // embeds the letters "endstream"; the first-occurrence scan is
          // only the fallback for writers that omitted /Length, and its
          // EOL-trim can eat a real trailing \r/\n sample byte
          def endstreamAt(p0: Int): Boolean = {
            var p = p0
            while (p < s.length &&
              (s(p) == ' ' || s(p) == '\r' || s(p) == '\n' || s(p) == '\t')) p += 1
            s.startsWith("endstream", p)
          }
          val byLength = "/Length\\s+(\\d+)(?!\\s+\\d+\\s+R)".r
            .findFirstMatchIn(dict).map(_.group(1).toInt)
            .filter(l => l >= 0 && d.toLong + l <= s.length && endstreamAt(d + l))
          val e = byLength.map(d + _).orElse {
            val end = s.indexOf("endstream", d)
            if (end <= d) None
            else {
              // trim the EOL that belongs to the endstream keyword
              var t = end
              if (t > d && s(t - 1) == '\n') t -= 1
              if (t > d && s(t - 1) == '\r') t -= 1
              Some(t)
            }
          }
          e.foreach { ee =>
            out += ((dict, d, ee))
            payloadEnd = ee
            trueKeyword = true
          }
        }
      }
      // a true keyword advances past its payload END (binary data can
      // embed both "stream" and "endstream"); a false match steps one
      idx =
        if (trueKeyword) {
          val next = s.indexOf("endstream", payloadEnd)
          if (next < 0) s.indexOf("stream", payloadEnd)
          else s.indexOf("stream", next + 9)
        } else s.indexOf("stream", idx + 1)
    }
    out.toSeq
  }

  // ---- dict parsing ----------------------------------------------------

  private def nameValue(dict: String, key: String): Option[String] =
    ("/" + key + "\\s*/([A-Za-z0-9]+)").r.findFirstMatchIn(dict).map(_.group(1))

  /** Integer value: direct (`/Width 640`) or a simple indirect reference
    * (`/Width 7 0 R`) resolved by scanning for `7 0 obj <int>`. */
  private def intValue(whole: String, dict: String, key: String): Option[Int] = {
    // Indirect FIRST, and the direct digits possessive (`\d++`): a
    // backtracking `(\d+)` would shrink its capture on "/Width 10 0 R"
    // until the negative lookahead passed (capturing 1 from "10"), so a
    // multi-digit object number parsed as a truncated literal. With the
    // possessive match an indirect reference can only resolve via the
    // object scan — and an unresolvable one yields None, never a guess.
    val direct = ("/" + key + "\\s+(\\d++)(?!\\s+\\d+\\s+R)").r
    val indirect = ("/" + key + "\\s+(\\d+)\\s+(\\d+)\\s+R").r
    indirect.findFirstMatchIn(dict).flatMap { m =>
      val pat = ("(?<![0-9])" + m.group(1) + "\\s+" + m.group(2) +
        "\\s+obj\\s+(\\d+)").r
      pat.findFirstMatchIn(whole).map(_.group(1).toInt)
    }.orElse(direct.findFirstMatchIn(dict).map(_.group(1).toInt))
  }

  /** The text to scan for predictor parameters: the inline
    * `/DecodeParms <<…>>` (or array) body when present, an empty string
    * when the stream carries no parms at all (defaults apply), or the
    * resolved object body for an indirect `/DecodeParms N G R` — None
    * when that reference is present but unresolvable. */
  private def predictorParams(dict: String, whole: String): Option[String] = {
    "/DecodeParms\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(dict) match {
      case Some(m) =>
        val pat = ("(?s)(?<![0-9])" + m.group(1) + "\\s+" + m.group(2) +
          "\\s+obj\\b(.*?)endobj").r
        pat.findFirstMatchIn(whole).map(_.group(1))
      case None =>
        "(?s)/DecodeParms\\s*(<<.*?>>|\\[.*?\\])".r.findFirstMatchIn(dict)
          .map(_.group(1)).orElse(Some(""))
    }
  }

  /** Filter chain, in application order. `/Filter /Name`, `/Filter
    * [/A /B]`, or an indirect `/Filter N G R` resolved by scanning for
    * `N G obj <name-or-array>`. Returns Some(Nil) when the key is ABSENT
    * (a legitimate uncompressed stream) and None when it is present but
    * unresolvable — the caller must NOT treat unresolvable as raw, or
    * compressed bytes get hashed as garbage pixels with status ok. */
  private[kernel] def filters(dict: String, whole: String): Option[Seq[String]] = {
    val k = dict.indexOf("/Filter")
    if (k < 0) return Some(Seq.empty)
    val rest = dict.substring(k + "/Filter".length)
    val t = rest.dropWhile(c => c == ' ' || c == '\r' || c == '\n' || c == '\t')
    def names(text: String) =
      "/([A-Za-z0-9]+)".r.findAllMatchIn(text).map(_.group(1)).toSeq
    if (t.startsWith("[")) {
      val close = t.indexOf(']')
      if (close < 0) None
      else {
        val body = t.substring(1, close)
        // array entries may themselves be indirect refs (/Filter [3 0 R])
        // — names() would see none and report "no filter", hashing
        // compressed bytes as pixels; refs inside an array are
        // unresolvable here, so the whole chain is
        if ("\\d+\\s+\\d+\\s+R".r.findFirstIn(body).isDefined) None
        else Some(names(body))
      }
    } else if (t.startsWith("/"))
      Some("^/([A-Za-z0-9]+)".r.findFirstMatchIn(t).map(_.group(1)).toSeq)
    else
      "^(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(t).flatMap { m =>
        val objPat = ("(?<![0-9])" + m.group(1) + "\\s+" + m.group(2) +
          "\\s+obj\\s*((?:/[A-Za-z0-9]+)|(?:\\[[^\\]]*\\]))").r
        objPat.findFirstMatchIn(whole).map(om => names(om.group(1)))
      }
  }

  // ---- stream decode ---------------------------------------------------

  /** Left(true) = undecodable for lack of a codec (→ unsupported);
    * Left(false) = an image stream whose supported chain failed to
    * decode — truncated/garbled payload, malformed dims (→ error);
    * Right = decoded. */
  private def decodeImageStream(whole: String, dict: String,
                                bytes: Array[Byte], from: Int,
                                to: Int): Either[Boolean, DecodedImage] = {
    val chain = filters(dict, whole) match {
      case None => return Left(true) // present-but-unresolvable filter
      case Some(c) => c
    }
    if (chain.exists(CodeclessFilters)) return Left(true)
    val w = intValue(whole, dict, "Width").getOrElse(-1)
    val h = intValue(whole, dict, "Height").getOrElse(-1)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return Left(false)
    var data = java.util.Arrays.copyOfRange(bytes, from, to)
    try {
      chain.foreach {
        case "ASCIIHexDecode" => data = asciiHex(data)
        case "ASCII85Decode" => data = ascii85(data)
        case "RunLengthDecode" => data = runLength(data)
        case "FlateDecode" =>
          data = inflate(data)
          // /DecodeParms may be an indirect reference; an unresolvable
          // one means the predictor is UNKNOWN — decoding the samples
          // raw would be silently wrong, so that is `unsupported`, the
          // same never-fall-through contract as /Filter
          val ptext = predictorParams(dict, whole).getOrElse(throw new NoCodec)
          val pred = "/Predictor\\s+(\\d+)".r.findFirstMatchIn(ptext)
            .map(_.group(1).toInt).getOrElse(1)
          if (pred >= 2) {
            val colors = "/Colors\\s+(\\d+)".r.findFirstMatchIn(ptext)
              .map(_.group(1).toInt).getOrElse(1)
            val pbpc = "/BitsPerComponent\\s+(\\d+)".r
              .findFirstMatchIn(ptext).map(_.group(1).toInt).getOrElse(8)
            val cols = "/Columns\\s+(\\d+)".r.findFirstMatchIn(ptext)
              .map(_.group(1).toInt).getOrElse(w)
            data = if (pred >= 10) pngUnpredict(data, cols, colors, pbpc)
            else tiffUnpredict(data, cols, colors, pbpc)
          }
        case "DCTDecode" =>
          // terminal: the remaining bytes are a JPEG
          val img = ImageIO.read(new ByteArrayInputStream(data))
          return if (img == null) Left(false)
          else Right(ImageCodec.fromBuffered(img))
        case _ => return Left(true) // unknown filter — no codec here
      }
      // no DCT terminal: `data` is raw samples — reconstruct from shape
      rawSamples(data, w, h, dict, whole).toRight(left = false)
    } catch {
      case _: NoCodec => Left(true)
      case scala.util.control.NonFatal(_) => Left(false)
    }
  }

  /** Raw (post-Flate) samples → pixels. Components come from /ColorSpace
    * when it names a device space; otherwise (ICCBased and friends, whose
    * resolution needs full object graph walking) they are INFERRED from
    * byte count — sampleBytes / (w·h·bpc/8) is exact for intact streams. */
  private def rawSamples(data: Array[Byte], w: Int, h: Int,
                         dict: String, whole: String): Option[DecodedImage] = {
    // `whole` resolves an indirect /BitsPerComponent N G R (legal, same
    // as Width/Height); scanning only the dict could never find the
    // target object and would silently default a 16-bit image to 8
    val bpc = intValue(whole, dict, "BitsPerComponent").getOrElse(8)
    val csName = nameValue(dict, "ColorSpace")
    val comps = csName match {
      case Some("DeviceRGB") => 3
      case Some("DeviceGray") => 1
      case Some("DeviceCMYK") => 4
      case _ =>
        if (bpc == 1) 1
        else {
          val perComp = h.toLong * w * bpc / 8
          if (perComp <= 0) return None
          val guess = (data.length / perComp).toInt
          if (guess >= 1 && guess <= 4) guess else return None
        }
    }
    val argb = new Array[Int](w * h)
    (bpc, comps) match {
      case (1, 1) =>
        val rowBytes = (w + 7) / 8
        if (data.length < rowBytes.toLong * h) return None
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val bit = (data(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
            val g = if (bit == 1) 255 else 0 // PDF default /Decode [0 1]: 1 = white for gray
            argb(y * w + x) = 0xff000000 | (g << 16) | (g << 8) | g
            x += 1
          }
          y += 1
        }
      case (8, 1) =>
        if (data.length < w.toLong * h) return None
        var i = 0
        while (i < argb.length) {
          val g = data(i) & 0xff
          argb(i) = 0xff000000 | (g << 16) | (g << 8) | g
          i += 1
        }
      case (8, 3) =>
        if (data.length < 3L * w * h) return None
        var i = 0
        while (i < argb.length) {
          argb(i) = 0xff000000 | ((data(3 * i) & 0xff) << 16) |
            ((data(3 * i + 1) & 0xff) << 8) | (data(3 * i + 2) & 0xff)
          i += 1
        }
      case (8, 4) =>
        if (data.length < 4L * w * h) return None
        var i = 0
        while (i < argb.length) {
          val c = data(4 * i) & 0xff; val m = data(4 * i + 1) & 0xff
          val yl = data(4 * i + 2) & 0xff; val k = data(4 * i + 3) & 0xff
          val r = (255 - c) * (255 - k) / 255
          val g = (255 - m) * (255 - k) / 255
          val b = (255 - yl) * (255 - k) / 255
          argb(i) = 0xff000000 | (r << 16) | (g << 8) | b
          i += 1
        }
      case (16, c) if c == 1 || c == 3 =>
        if (data.length < 2L * c * w * h) return None
        var i = 0
        while (i < argb.length) {
          // high byte of each 16-bit big-endian sample
          def hi(comp: Int) = data(2 * (c * i + comp)) & 0xff
          val (r, g, b) =
            if (c == 1) { val v = hi(0); (v, v, v) } else (hi(0), hi(1), hi(2))
          argb(i) = 0xff000000 | (r << 16) | (g << 8) | b
          i += 1
        }
      case _ => return None
    }
    Some(DecodedImage(w, h, argb))
  }

  // ---- filters ----------------------------------------------------------

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(1024, data.length * 4))
    val buf = new Array[Byte](65536)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (n == 0 && inf.needsDictionary()) throw new java.io.IOException("zlib dict")
      if (out.size() > (1 << 30)) throw new java.io.IOException("inflate bomb")
    }
    inf.end()
    out.toByteArray
  }

  /** PNG predictor undo (predictor ≥ 10): each row is one filter-type
    * byte + rowBytes of filtered samples (RFC 2083 §6). */
  private[kernel] def pngUnpredict(data: Array[Byte], columns: Int,
                                   colors: Int, bpc: Int): Array[Byte] = {
    val rowBytes = (columns * colors * bpc + 7) / 8
    val bpp = math.max(1, colors * bpc / 8)
    val rows = data.length / (rowBytes + 1)
    val out = new Array[Byte](rows * rowBytes)
    var y = 0
    while (y < rows) {
      val ft = data(y * (rowBytes + 1)) & 0xff
      val src = y * (rowBytes + 1) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val raw = data(src + x) & 0xff
        val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val up = if (y > 0) out(dst - rowBytes + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) out(dst - rowBytes + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => raw
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** TIFF predictor 2: horizontal differencing over 8- or 16-bit samples
    * (big-endian shorts per ISO 32000 §7.4.4.4). Sub-byte sample widths
    * have no undo path here — throwing NoCodec keeps them `unsupported`
    * rather than silently hashing still-differenced samples as pixels. */
  private[kernel] def tiffUnpredict(data: Array[Byte], columns: Int,
                                    colors: Int, bpc: Int): Array[Byte] = bpc match {
    case 8 =>
      val rowBytes = columns * colors
      val out = data.clone()
      var y = 0
      while ((y + 1) * rowBytes <= out.length) {
        var x = colors
        while (x < rowBytes) {
          out(y * rowBytes + x) =
            ((out(y * rowBytes + x) + out(y * rowBytes + x - colors)) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    case 16 =>
      val rowShorts = columns * colors
      val out = data.clone()
      var y = 0
      while ((y + 1).toLong * rowShorts * 2 <= out.length) {
        var x = colors
        while (x < rowShorts) {
          val i = (y * rowShorts + x) * 2
          val p = i - colors * 2
          val v = (((out(i) & 0xff) << 8) | (out(i + 1) & 0xff)) +
            (((out(p) & 0xff) << 8) | (out(p + 1) & 0xff))
          out(i) = ((v >> 8) & 0xff).toByte
          out(i + 1) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    case _ => throw new NoCodec
  }

  private def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2)
    var hiNibble = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c == '>') { done = true; -1 }
        else -1
      if (v >= 0) {
        if (hiNibble < 0) hiNibble = v
        else { out.write((hiNibble << 4) | v); hiNibble = -1 }
      }
      i += 1
    }
    if (hiNibble >= 0) out.write(hiNibble << 4) // odd count: pad 0 per spec
    out.toByteArray
  }

  private def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length)
    var tuple = 0L
    var count = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && count == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) {
          out.write(((tuple >> 24) & 0xff).toInt); out.write(((tuple >> 16) & 0xff).toInt)
          out.write(((tuple >> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; count = 0
        }
      }
      i += 1
    }
    if (count > 0) {
      var j = count
      while (j < 5) { tuple = tuple * 85 + 84; j += 1 }
      val full = Array(((tuple >> 24) & 0xff).toInt, ((tuple >> 16) & 0xff).toInt,
        ((tuple >> 8) & 0xff).toInt, (tuple & 0xff).toInt)
      full.take(count - 1).foreach(out.write)
    }
    out.toByteArray
  }

  // ---- fixture-side writer ----------------------------------------------
  // The reference app never writes PDFs; this is the synth-corpus / spec
  // encoder (same role Tiff.encode plays for the TIFF tier): a valid
  // one-page document wrapping one image XObject, with a /MediaBox sized
  // at half the pixel dims so the header probe's 2× render scale
  // (HeaderDims.pdfMediaBox) reports exactly the decoded dimensions.

  def encodeImagePdf(payload: Array[Byte], w: Int, h: Int, filter: String,
                     colorSpace: String = "DeviceRGB", bpc: Int = 8,
                     decodeParms: Option[String] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 1024)
    def ascii(t: String): Unit =
      out.write(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = new Array[Int](6)
    ascii("%PDF-1.5\n%âãÏÓ\n")
    // locale-proof halving (the f interpolator is locale-sensitive)
    def half(v: Int) = if (v % 2 == 0) s"${v / 2}" else s"${v / 2}.5"
    val mbW = half(w); val mbH = half(h)
    offsets(1) = out.size()
    ascii("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    ascii("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offsets(3) = out.size()
    ascii(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $mbW $mbH] " +
      "/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    offsets(4) = out.size()
    val parms = decodeParms.map(p => s" /DecodeParms $p").getOrElse("")
    ascii(s"4 0 obj\n<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"/ColorSpace /$colorSpace /BitsPerComponent $bpc /Filter /$filter$parms " +
      s"/Length ${payload.length} >>\nstream\n")
    out.write(payload)
    ascii("\nendstream\nendobj\n")
    offsets(5) = out.size()
    val content = s"q $mbW 0 0 $mbH 0 0 cm /Im0 Do Q"
    ascii(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    val xref = out.size()
    ascii("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach { i =>
      val t = offsets(i).toString // zero-pad by hand: %d localizes digits
      ascii("0" * (10 - t.length) + t + " 00000 n \n")
    }
    ascii(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** Flate-compressed RGB payload with the PNG Up predictor per row —
    * exercises the predictor undo on every decode. */
  def flateRgbPayload(img: DecodedImage): Array[Byte] = {
    val w = img.w; val h = img.h
    val filtered = new Array[Byte](h * (3 * w + 1))
    var y = 0
    while (y < h) {
      filtered(y * (3 * w + 1)) = 2 // PNG filter: Up
      var x = 0
      while (x < w) {
        val p = img.argb(y * w + x)
        val up = if (y > 0) img.argb((y - 1) * w + x) else 0
        val base = y * (3 * w + 1) + 1 + 3 * x
        filtered(base) = ((((p >> 16) & 0xff) - ((up >> 16) & 0xff)) & 0xff).toByte
        filtered(base + 1) = ((((p >> 8) & 0xff) - ((up >> 8) & 0xff)) & 0xff).toByte
        filtered(base + 2) = (((p & 0xff) - (up & 0xff)) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    deflate(filtered)
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](65536)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }

  private def runLength(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val len = data(i) & 0xff
      if (len == 128) done = true
      else if (len < 128) {
        val n = len + 1
        out.write(data, i + 1, math.min(n, data.length - i - 1))
        i += 1 + n
      } else {
        if (i + 1 < data.length) {
          val n = 257 - len
          var k = 0
          while (k < n) { out.write(data(i + 1)); k += 1 }
        }
        i += 2
      }
    }
    out.toByteArray
  }
}
