package graft

import graft.kernel.{DecodedImage, HeaderDims, ImageCodec, PdfImages}
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/**
 * PDF image-XObject decode tier (S4's JVM-feasible slice; the reference
 * renders page 1 via a full renderer, scanner.rs:583-625 — here the
 * contract is the RAW-preview one: decode the LARGEST embedded raster).
 */
class PdfImagesSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): DecodedImage = {
    val argb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      0xff000000 | ((x * 255 / math.max(1, w - 1)) << 16) |
        ((y * 255 / math.max(1, h - 1)) << 8) | ((x + y) % 256)
    }
    DecodedImage(w, h, argb)
  }

  test("DCT XObject: pixels equal a direct decode of the embedded JPEG") {
    val img = gradient(100, 64)
    val jpeg = ImageCodec.encodeJpeg(img, 0.9f)
    val pdf = PdfImages.encodeImagePdf(jpeg, 100, 64, "DCTDecode")
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "pdf", 100, 64)
    assert(status == "ok" && dec.get.w == 100 && dec.get.h == 64)
    val direct = ImageCodec.fromBuffered(
      javax.imageio.ImageIO.read(new ByteArrayInputStream(jpeg)))
    assert(dec.get.argb.sameElements(direct.argb),
      "PDF-extracted JPEG decode differs from direct decode of the payload")
  }

  test("Flate XObject with PNG Up predictor: pixel-exact round trip") {
    val img = gradient(57, 43) // odd dims: exercises the .5 MediaBox
    val pdf = PdfImages.encodeImagePdf(
      PdfImages.flateRgbPayload(img), 57, 43, "FlateDecode",
      decodeParms = Some("<< /Predictor 15 /Colors 3 /Columns 57 >>"))
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "pdf", 57, 43)
    assert(status == "ok")
    assert(dec.get.argb.sameElements(img.argb), "Flate+predictor not lossless")
  }

  test("header probe and decode agree on dimensions (S7 vs S4)") {
    val img = gradient(57, 43)
    val pdf = PdfImages.encodeImagePdf(
      ImageCodec.encodeJpeg(img, 0.9f), 57, 43, "DCTDecode")
    assert(HeaderDims.probe(pdf, "pdf").contains((57, 43)))
  }

  test("largest of several XObjects wins (RAW-preview contract)") {
    val small = gradient(16, 12)
    val large = gradient(80, 60)
    def obj(n: Int, img: DecodedImage) =
      s"$n 0 obj\n<< /Subtype /Image /Width ${img.w} /Height ${img.h} " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode " +
        s"/DecodeParms << /Predictor 15 /Colors 3 /Columns ${img.w} >> >>\nstream\n" +
        new String(PdfImages.flateRgbPayload(img), ISO_8859_1) +
        "\nendstream\nendobj\n"
    val pdf = ("%PDF-1.5\n" + obj(1, small) + obj(2, large)).getBytes(ISO_8859_1)
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(status == "ok" && dec.get.w == 80 && dec.get.h == 60)
    assert(dec.get.argb.sameElements(large.argb))
  }

  test("indirect /Width reference resolves (N G obj scan)") {
    val img = gradient(24, 10)
    val pdf = ("%PDF-1.5\n7 0 obj 24\nendobj\n8 0 obj 10\nendobj\n" +
      "4 0 obj\n<< /Subtype /Image /Width 7 0 R /Height 8 0 R " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 15 /Colors 3 /Columns 24 >> >>\nstream\n" +
      new String(PdfImages.flateRgbPayload(img), ISO_8859_1) +
      "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(status == "ok" && dec.get.w == 24 && dec.get.h == 10)
  }

  test("indirect refs with MULTI-DIGIT object numbers resolve (regex must not backtrack '10 0 R' into width 1)") {
    val img = gradient(24, 10)
    val pdf = ("%PDF-1.5\n12 0 obj 24\nendobj\n130 0 obj 10\nendobj\n" +
      "4 0 obj\n<< /Subtype /Image /Width 12 0 R /Height 130 0 R " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 15 /Colors 3 /Columns 24 >> >>\nstream\n" +
      new String(PdfImages.flateRgbPayload(img), ISO_8859_1) +
      "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(status == "ok" && dec.get.w == 24 && dec.get.h == 10)
    assert(dec.get.argb.sameElements(img.argb))
  }

  test("indirect /DecodeParms resolves; unresolvable one is unsupported, never raw-decoded") {
    val img = gradient(24, 10)
    def pdf(parmsRef: String, parmsObj: String) =
      ("%PDF-1.5\n" + parmsObj +
        "4 0 obj\n<< /Subtype /Image /Width 24 /Height 10 " +
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode " +
        s"/DecodeParms $parmsRef >>\nstream\n" +
        new String(PdfImages.flateRgbPayload(img), ISO_8859_1) +
        "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    // resolvable: predictor params live in their own object
    val ok = pdf("9 0 R",
      "9 0 obj\n<< /Predictor 15 /Colors 3 /Columns 24 >>\nendobj\n")
    val (dec, status) = ImageCodec.decodeWithStatus(ok, "pdf", 0, 0)
    assert(status == "ok" && dec.get.argb.sameElements(img.argb))
    // unresolvable: the predictor is unknown — decoding the samples raw
    // would be silently wrong pixels, so the tier must refuse
    val (dec2, status2) =
      ImageCodec.decodeWithStatus(pdf("99 0 R", ""), "pdf", 0, 0)
    assert(dec2.isEmpty && status2 == "unsupported")
  }

  test("mislabeled decodable bytes under a pdf label get the S5 sniff (PNG decodes; junk stays error)") {
    val img = gradient(20, 14)
    val png = ImageCodec.encodePng(img)
    val (dec, status) = ImageCodec.decodeWithStatus(png, "pdf", 20, 14)
    assert(status == "ok" && dec.get.argb.sameElements(img.argb))
    val (dec2, status2) = ImageCodec.decodeWithStatus(
      Array.tabulate[Byte](64)(i => (i * 7).toByte), "pdf", 0, 0)
    assert(dec2.isEmpty && status2 == "error")
  }

  test("header probe honors the 1 KiB leading-junk rule like the decode tier") {
    val img = gradient(57, 43)
    val pdf = PdfImages.encodeImagePdf(
      ImageCodec.encodeJpeg(img, 0.9f), 57, 43, "DCTDecode")
    val junk = ("% junk prologue\n" * 3).getBytes(ISO_8859_1) ++ pdf
    assert(PdfImages.extract(junk).image.isDefined) // decode tier accepts
    assert(HeaderDims.probe(junk, "pdf").contains((57, 43))) // probe must too
  }

  test("1-bit bilevel gray (scanned-document shape)") {
    // 10×4, rows packed MSB-first, padded to byte boundary: vertical bars
    val w = 10; val h = 4
    val rowBytes = (w + 7) / 8
    val raw = new Array[Byte](rowBytes * h)
    (0 until h).foreach { y =>
      raw(y * rowBytes) = 0xaa.toByte // 10101010
      raw(y * rowBytes + 1) = 0x80.toByte // 10......
    }
    val pdf = ("%PDF-1.5\n4 0 obj\n<< /Subtype /Image /Width 10 /Height 4 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /FlateDecode >>\nstream\n" +
      new String(PdfImages.deflate(raw), ISO_8859_1) +
      "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(status == "ok")
    val a = dec.get.argb
    assert((a(0) & 0xffffff) == 0xffffff && (a(1) & 0xffffff) == 0x000000,
      "bit 1 must be white, bit 0 black (PDF default /Decode [0 1])")
    assert((a(8) & 0xffffff) == 0xffffff && (a(9) & 0xffffff) == 0x000000)
  }

  test("ASCIIHex chained before DCT applies in order") {
    val img = gradient(20, 15)
    val jpeg = ImageCodec.encodeJpeg(img, 0.9f)
    val hexed = jpeg.flatMap(b => f"${b & 0xff}%02x".getBytes(ISO_8859_1)) :+ '>'.toByte
    val pdf = ("%PDF-1.5\n4 0 obj\n<< /Subtype /Image /Width 20 /Height 15 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
      "/Filter [/ASCIIHexDecode /DCTDecode] >>\nstream\n" +
      new String(hexed, ISO_8859_1) + "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(status == "ok" && dec.get.w == 20 && dec.get.h == 15)
  }

  test("JPX-only file is unsupported, not error; rasterless PDF unsupported; junk error") {
    val jpx = ("%PDF-1.5\n4 0 obj\n<< /Subtype /Image /Width 10 /Height 10 " +
      "/Filter /JPXDecode /Length 4 >>\nstream\nabcd\nendstream\nendobj\n")
      .getBytes(ISO_8859_1)
    assert(ImageCodec.decodeWithStatus(jpx, "pdf", 0, 0)._2 == "unsupported")
    // a text-only page: valid PDF, nothing this tier can hash without a
    // renderer — surfaced as unsupported in _metrics, never silently ok
    val textOnly = ("%PDF-1.5\n5 0 obj\n<< /Length 20 >>\nstream\n" +
      "BT /F1 12 Tf (hi) Tj ET\nendstream\nendobj\n").getBytes(ISO_8859_1)
    assert(ImageCodec.decodeWithStatus(textOnly, "pdf", 0, 0)._2 == "unsupported")
    assert(ImageCodec.decodeWithStatus("not a pdf at all".getBytes(ISO_8859_1),
      "pdf", 0, 0)._2 == "error")
  }

  test("mislabeled PDF bytes decode via the sniff fallback (S5)") {
    val img = gradient(40, 30)
    val pdf = PdfImages.encodeImagePdf(
      ImageCodec.encodeJpeg(img, 0.9f), 40, 30, "DCTDecode")
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "xyz", 40, 30)
    assert(status == "ok" && dec.get.w == 40 && dec.get.h == 30)
  }

  test("indirect /Filter resolves; unresolvable indirect is unsupported, never raw") {
    val img = gradient(24, 10)
    val payload = new String(PdfImages.flateRgbPayload(img), ISO_8859_1)
    def doc(filterRef: String, defs: String) =
      (s"%PDF-1.5\n$defs" +
        s"4 0 obj\n<< /Subtype /Image /Width 24 /Height 10 " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter $filterRef " +
        "/DecodeParms << /Predictor 15 /Colors 3 /Columns 24 >> >>\nstream\n" +
        payload + "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val resolved = doc("9 0 R", "9 0 obj /FlateDecode\nendobj\n")
    val (dec, st) = ImageCodec.decodeWithStatus(resolved, "pdf", 0, 0)
    assert(st == "ok" && dec.get.argb.sameElements(img.argb))
    // dangling reference: MUST NOT fall through to raw-sample decoding —
    // compressed bytes hashed as pixels would be silently wrong dedup
    val dangling = doc("9 0 R", "")
    assert(ImageCodec.decodeWithStatus(dangling, "pdf", 0, 0)._2 == "unsupported")
  }

  test("corrupt raster stream is error, not unsupported (RAW-tier parity)") {
    // garbage bytes under a DCTDecode filter: a raster is PRESENT but its
    // payload doesn't decode — data corruption, not a missing codec
    val pdf = PdfImages.encodeImagePdf(Array.fill[Byte](500)(7), 30, 20, "DCTDecode")
    assert(ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)._2 == "error")
  }

  test("header junk before %PDF- is tolerated (ISO 32000 first-1KiB rule)") {
    val img = gradient(18, 12)
    val clean = PdfImages.encodeImagePdf(ImageCodec.encodeJpeg(img, 0.9f), 18, 12, "DCTDecode")
    val junked = ("ï»¿GARBAGE-PREAMBLE\n").getBytes(ISO_8859_1) ++ clean
    val (dec, st) = ImageCodec.decodeWithStatus(junked, "pdf", 0, 0)
    assert(st == "ok" && dec.get.w == 18)
    assert(PdfImages.looksPdf(junked))
  }

  test("exact /Length beats the endstream EOL trim for raw sample data") {
    // unfiltered 8-bit gray whose LAST byte is \r — the trim heuristic
    // would eat it; the direct /Length slices exactly
    val w = 4; val h = 2
    val raw = Array[Byte](10, 20, 30, 40, 50, 60, 70, 0x0d)
    val pdf = ("%PDF-1.5\n4 0 obj\n<< /Subtype /Image /Width 4 /Height 2 " +
      s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length ${raw.length} >>\nstream\n" +
      new String(raw, ISO_8859_1) + "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, st) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(st == "ok" && dec.get.w == w && dec.get.h == h)
    assert((dec.get.argb(7) & 0xff) == 0x0d, "trailing CR byte was trimmed away")
  }

  test("/Filter array of indirect refs is unsupported, never raw") {
    // /Filter [9 0 R]: names() sees no /Name inside the array — treating
    // that as "no filter" would hash zlib bytes as gray pixels with ok
    val img = gradient(24, 10)
    val pdf = ("%PDF-1.5\n9 0 obj /FlateDecode\nendobj\n" +
      "4 0 obj\n<< /Subtype /Image /Width 24 /Height 10 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter [9 0 R] " +
      "/DecodeParms << /Predictor 15 /Colors 3 /Columns 24 >> >>\nstream\n" +
      new String(PdfImages.flateRgbPayload(img), ISO_8859_1) +
      "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    assert(ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)._2 == "unsupported")
  }

  test("TIFF predictor 2 over 16-bit samples undoes differencing; sub-byte is unsupported") {
    val w = 12; val h = 5
    val img = gradient(w, h)
    // truth samples: 16-bit BE per component, hi byte = the 8-bit channel
    val comps = Array.tabulate(w * h * 3) { j =>
      val p = img.argb(j / 3)
      ((j % 3: @unchecked) match {
        case 0 => (p >> 16) & 0xff
        case 1 => (p >> 8) & 0xff
        case 2 => p & 0xff
      }) << 8
    }
    val diffed = new Array[Byte](comps.length * 2)
    (0 until h).foreach { y =>
      (0 until w * 3).foreach { x =>
        val i = y * w * 3 + x
        val v = if (x < 3) comps(i) else (comps(i) - comps(i - 3)) & 0xffff
        diffed(2 * i) = ((v >> 8) & 0xff).toByte
        diffed(2 * i + 1) = (v & 0xff).toByte
      }
    }
    val pdf = PdfImages.encodeImagePdf(PdfImages.deflate(diffed), w, h,
      "FlateDecode", bpc = 16, decodeParms =
        Some(s"<< /Predictor 2 /Colors 3 /Columns $w /BitsPerComponent 16 >>"))
    val (dec, st) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(st == "ok", "16-bit predictor-2 stream must decode")
    assert(dec.get.argb.sameElements(img.argb),
      "still-differenced 16-bit samples leaked through as pixels")
    // predictor 2 over 4-bit samples: no undo path — must be unsupported,
    // not a silent pass-through of differenced samples
    val sub = PdfImages.encodeImagePdf(PdfImages.deflate(new Array[Byte](w * h)),
      w, h, "FlateDecode", colorSpace = "DeviceGray", bpc = 4, decodeParms =
        Some(s"<< /Predictor 2 /Colors 1 /Columns $w /BitsPerComponent 4 >>"))
    assert(ImageCodec.decodeWithStatus(sub, "pdf", 0, 0)._2 == "unsupported")
  }

  test("indirect /BitsPerComponent resolves against the whole document") {
    // 16-bit gray via /BitsPerComponent 9 0 R: resolving against only the
    // dict would default to 8 and misread every other byte as a sample
    val w = 16; val h = 6
    val img = gradient(w, h)
    val raw = new Array[Byte](2 * w * h)
    (0 until w * h).foreach { i =>
      raw(2 * i) = ((img.argb(i) >> 16) & 0xff).toByte // hi byte = gray
      raw(2 * i + 1) = 0x5a
    }
    val pdf = ("%PDF-1.5\n9 0 obj 16\nendobj\n" +
      s"4 0 obj\n<< /Subtype /Image /Width $w /Height $h " +
      "/ColorSpace /DeviceGray /BitsPerComponent 9 0 R /Filter /FlateDecode >>\nstream\n" +
      new String(PdfImages.deflate(raw), ISO_8859_1) +
      "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, st) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(st == "ok" && dec.get.w == w && dec.get.h == h)
    val g0 = (img.argb(w + 3) >> 16) & 0xff
    assert((dec.get.argb(w + 3) & 0xff) == g0,
      "indirect /BitsPerComponent fell back to 8 — samples misread")
  }

  test("decode budget is spent on /Image dicts only (raster after 40 content streams)") {
    val filler = (1 to 40).map { i =>
      s"${i + 10} 0 obj\n<< /Length 12 >>\nstream\nBT (x) Tj ET\nendstream\nendobj\n"
    }.mkString
    val img = gradient(26, 14)
    val pdf = ("%PDF-1.5\n" + filler +
      "4 0 obj\n<< /Subtype /Image /Width 26 /Height 14 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 15 /Colors 3 /Columns 26 >> >>\nstream\n" +
      new String(PdfImages.flateRgbPayload(img), ISO_8859_1) +
      "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, st) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(st == "ok" && dec.get.w == 26,
      "non-image streams consumed the MaxStreams budget")
  }

  test("mislabeled corrupt PDF is error, not unsupported (trichotomy survives the sniff path)") {
    // same bytes, two labels, one verdict: a present-but-garbled raster
    val pdf = PdfImages.encodeImagePdf(Array.fill[Byte](500)(7), 30, 20, "DCTDecode")
    assert(ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)._2 == "error")
    assert(ImageCodec.decodeWithStatus(pdf, "bin", 0, 0)._2 == "error",
      "the sniff fallback hid corrupt bytes as unsupported")
  }

  test("xref offsets are ASCII digits under a localized-digit default locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(
        java.util.Locale.forLanguageTag("ar-EG-u-nu-arab"))
      val pdf = PdfImages.encodeImagePdf(
        ImageCodec.encodeJpeg(gradient(18, 12), 0.9f), 18, 12, "DCTDecode")
      val s = new String(pdf, ISO_8859_1)
      val x = s.indexOf("xref")
      assert(x >= 0)
      val entries = "([^ \\n]{10}) 00000 n".r
        .findAllMatchIn(s.substring(x)).map(_.group(1)).toSeq
      assert(entries.size == 5)
      entries.foreach(e => assert(e.forall(c => c >= '0' && c <= '9'),
        s"xref offset '$e' carries non-ASCII digits"))
    } finally java.util.Locale.setDefault(prev)
  }

  test("/Length extends a payload past embedded 'endstream' bytes") {
    // legal raw gray stream whose SAMPLE DATA spells "endstream" — the
    // first-occurrence scan would truncate it; the direct /Length must win
    val w = 8; val h = 4
    val raw = Array.tabulate[Byte](w * h)(i => (i * 7 % 251).toByte)
    "endstream".getBytes(ISO_8859_1).zipWithIndex.foreach {
      case (b, i) => raw(10 + i) = b
    }
    val pdf = ("%PDF-1.5\n4 0 obj\n<< /Subtype /Image /Width 8 /Height 4 " +
      s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length ${raw.length} >>\nstream\n" +
      new String(raw, ISO_8859_1) + "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, st) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(st == "ok" && dec.get.w == w && dec.get.h == h)
    assert((dec.get.argb(10) & 0xff) == ('e'.toInt & 0xff),
      "payload truncated at the embedded endstream marker")
    assert((dec.get.argb(w * h - 1) & 0xff) == ((w * h - 1) * 7 % 251),
      "tail samples lost")
  }

  test("ICCBased-wrapped RGB: component count inferred from byte length") {
    val img = gradient(30, 20)
    val raw = new Array[Byte](3 * 30 * 20)
    (0 until 30 * 20).foreach { i =>
      raw(3 * i) = ((img.argb(i) >> 16) & 0xff).toByte
      raw(3 * i + 1) = ((img.argb(i) >> 8) & 0xff).toByte
      raw(3 * i + 2) = (img.argb(i) & 0xff).toByte
    }
    val pdf = ("%PDF-1.5\n4 0 obj\n<< /Subtype /Image /Width 30 /Height 20 " +
      "/ColorSpace [/ICCBased 9 0 R] /BitsPerComponent 8 /Filter /FlateDecode >>\nstream\n" +
      new String(PdfImages.deflate(raw), ISO_8859_1) +
      "\nendstream\nendobj\n").getBytes(ISO_8859_1)
    val (dec, status) = ImageCodec.decodeWithStatus(pdf, "pdf", 0, 0)
    assert(status == "ok")
    assert(dec.get.argb.sameElements(img.argb))
  }
}
