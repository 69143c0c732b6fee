package graft

import graft.kernel.{DecodedImage, Exif, HeaderDims, ImageCodec, Webp}
import org.scalatest.funsuite.AnyFunSuite

/**
 * WebP tier: full VP8L lossless roundtrip across every encoder feature
 * path, container dims (VP8L / VP8X / lossy VP8), the EXIF chunk, and the
 * honest-`unsupported` contract for lossy pixels. Shared encoder/decoder
 * constants (distance table, cache hash, canonical assignment) are pinned
 * with hand-computed spec values so a typo cannot roundtrip invisibly.
 */
class WebpSpec extends AnyFunSuite {

  /** Deterministic photo-like test image: smooth gradients + texture +
    * a flat patch (exercises literals, runs, and the color cache). */
  private def photo(w: Int, h: Int, seed: Int): DecodedImage = {
    val argb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (x > w / 2 && y > h / 2) 0xff336699 // flat quadrant: runs
      else {
        val r = (x * 7 + seed * 13) % 256
        val g = (y * 5 + (x >> 3) * 11) % 256
        val b = ((x + y) * 3 + seed) % 256
        0xff000000 | (r << 16) | (g << 8) | b
      }
    }
    DecodedImage(w, h, argb)
  }

  private def palette4(w: Int, h: Int): DecodedImage = {
    val colors = Array(0xff000000, 0xffffffff, 0xffcc2244, 0xff2244cc)
    DecodedImage(w, h, Array.tabulate(w * h)(i => colors((i % w + i / w) % 4)))
  }

  private def roundtrip(d: DecodedImage, mode: Int): Unit = {
    val bytes = Webp.encodeLossless(d, mode)
    val (dec, status) = Webp.decodeWithStatus(bytes)
    assert(status == "ok", s"mode $mode decode status $status")
    assert(dec.get.w == d.w && dec.get.h == d.h, s"mode $mode dims")
    assert(dec.get.argb.sameElements(d.argb), s"mode $mode not lossless")
  }

  test("mode 0 (plain literals) is pixel-exact") {
    roundtrip(photo(61, 47, 1), 0)
  }

  test("mode 1 (subtract-green + LZ77 + cache + meta-Huffman + max_symbols)") {
    roundtrip(photo(80, 64, 2), 1)
    roundtrip(photo(33, 9, 3), 1) // dims not multiples of the meta block
  }

  test("mode 2 (color-indexing): bundled small palettes and a 200-color one") {
    roundtrip(palette4(50, 40), 2)     // 4 colors -> 2-bit bundling
    val bw = DecodedImage(37, 23, Array.tabulate(37 * 23)(i =>
      if ((i / 37 + i % 37) % 2 == 0) 0xff000000 else 0xffffffff))
    roundtrip(bw, 2)                   // 2 colors -> 3-bit bundling (8 px/byte)
    val many = DecodedImage(40, 30, Array.tabulate(40 * 30)(i =>
      0xff000000 | ((i % 200) * 83 % 256 << 16) | ((i % 200) << 8) | (i % 200)))
    roundtrip(many, 2)                 // ~200 colors -> no bundling
  }

  test("mode 2 falls back when the image exceeds 256 colors") {
    roundtrip(photo(90, 70, 4), 2) // photo has > 256 distinct colors
  }

  test("mode 3 (predictor transform, all 14 modes across blocks)") {
    roundtrip(photo(100, 80, 5), 3)
    roundtrip(photo(13, 11, 6), 3) // partial edge blocks + rightmost-TR rule
  }

  test("mode 4 (color transform, varying signed multipliers)") {
    roundtrip(photo(64, 48, 7), 4)
    roundtrip(photo(23, 17, 8), 4)
  }

  test("1x1 and single-row/column images") {
    for (m <- 0 to 4) {
      roundtrip(DecodedImage(1, 1, Array(0xff123456)), m)
      roundtrip(DecodedImage(19, 1, Array.tabulate(19)(i => 0xff000000 | i)), m)
      roundtrip(DecodedImage(1, 13, Array.tabulate(13)(i => 0xff000000 | (i << 16))), m)
    }
  }

  test("alpha pixels survive (alpha_hint + 4-channel coding)") {
    val d = DecodedImage(20, 20, Array.tabulate(400)(i =>
      ((i % 255) << 24) | (0x40 << 16) | ((i * 3 % 256) << 8) | 0x99))
    for (m <- Seq(0, 1, 3, 4)) roundtrip(d, m)
  }

  test("header dims: VP8L, VP8X canvas, and lossy VP8 keyframe") {
    val d = photo(120, 90, 9)
    assert(Webp.headerDims(Webp.encodeLossless(d, 0)).contains((120, 90)))
    assert(Webp.headerDims(Webp.encodeVp8x(d, 0, None)).contains((120, 90)))
    val lossy = Webp.encodeLossyStub(640, 480, Array.fill(64)(0x5a.toByte))
    assert(Webp.headerDims(lossy).contains((640, 480)))
    assert(HeaderDims.probe(lossy, "webp").contains((640, 480)))
    // sniff path: webp bytes under a wrong label still probe
    assert(HeaderDims.probe(Webp.encodeLossless(d, 1), "png").contains((120, 90)))
  }

  test("EXIF chunk roundtrips through the TIFF-IFD parser (S8)") {
    val app1 = Exif.buildApp1(6, "2021:07:04 08:30:00",
      Some(20.8911), Some(-156.5047))
    val exifPayload = java.util.Arrays.copyOfRange(app1, 4, app1.length)
    val bytes = Webp.encodeVp8x(photo(40, 30, 10), 1, Some(exifPayload))
    val ex = Exif.fromBytes(bytes, "webp")
    assert(ex.isDefined, "no EXIF parsed from VP8X container")
    assert(ex.get.orientation.contains(6))
    assert(ex.get.dateTimeOriginal.contains("2021:07:04 08:30:00"))
    assert(ex.get.lat.exists(v => math.abs(v - 20.8911) < 1e-4))
    assert(ex.get.lon.exists(v => math.abs(v - -156.5047) < 1e-4))
    // pixels of the VP8X-wrapped VP8L still decode
    val (dec, status) = ImageCodec.decodeWithStatus(bytes, "webp", 40, 30)
    assert(status == "ok" && dec.get.argb.sameElements(photo(40, 30, 10).argb))
  }

  test("lossy VP8 pixels are unsupported, corrupt bytes are error") {
    val lossy = Webp.encodeLossyStub(64, 48, Array.fill(32)(1.toByte))
    assert(ImageCodec.decodeWithStatus(lossy, "webp", 64, 48)._2 == "unsupported")
    val good = Webp.encodeLossless(photo(30, 20, 11), 1)
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x55).toByte
    val (dec, status) = ImageCodec.decodeWithStatus(bad, "webp", 30, 20)
    // a mid-stream bit flip must never silently yield wrong pixels of the
    // right shape AND claim ok with matching content — either it errors or
    // decodes to something (both acceptable); junk under the label errors
    assert(status == "ok" || status == "error")
    val junk = Array.fill(100)(0x42.toByte)
    assert(ImageCodec.decodeWithStatus(junk, "webp", 10, 10)._2 == "error")
    val truncated = java.util.Arrays.copyOf(good, good.length / 2)
    assert(ImageCodec.decodeWithStatus(truncated, "webp", 30, 20)._2 == "error")
  }

  test("mislabeled rows: webp under png label and png under webp label") {
    val d = photo(44, 33, 12)
    val webp = Webp.encodeLossless(d, 1)
    // webp bytes under a generic/unknown label sniff to the webp tier
    val (dec1, s1) = ImageCodec.decodeWithStatus(webp, "bin", 44, 33)
    assert(s1 == "ok" && dec1.get.argb.sameElements(d.argb))
    // png bytes under a webp label decode via the ImageIO sniff
    val png = ImageCodec.encodePng(d)
    val (dec2, s2) = ImageCodec.decodeWithStatus(png, "webp", 44, 33)
    assert(s2 == "ok" && dec2.get.argb.sameElements(d.argb))
  }

  test("distance table spec anchors (hand-computed, not table-derived)") {
    // plane code 1 = (0,1) -> one row up; 2 = (1,0) -> previous pixel;
    // 4 = (-1,1) -> up-right; codes > 120 are literal distances + 120
    assert(Webp.planeCodeToDistance(100, 1) == 100)
    assert(Webp.planeCodeToDistance(100, 2) == 1)
    assert(Webp.planeCodeToDistance(100, 4) == 99)
    assert(Webp.planeCodeToDistance(100, 121) == 1)
    assert(Webp.planeCodeToDistance(100, 320) == 200)
    // prefix code spec anchors: v=1..4 are codes 0..3 with no extra bits;
    // v=5 -> code 4, 1 extra bit, value 0; v=7 -> code 5 extra 0
    assert(Webp.prefixEncode(1) == ((0, 0, 0)))
    assert(Webp.prefixEncode(4) == ((3, 0, 0)))
    assert(Webp.prefixEncode(5) == ((4, 1, 0)))
    assert(Webp.prefixEncode(7) == ((5, 1, 0)))
    assert(Webp.prefixEncode(9) == ((6, 2, 0)))
  }

  test("canonical code assignment anchor (DEFLATE-style, (len, sym) order)") {
    // lengths: a=2, b=1, c=3, d=3 -> b:0, a:10, c:110, d:111
    val codes = Webp.canonicalCodes(Array(2, 1, 3, 3)).map {
      case (s, c, l) => s -> ((c, l))
    }.toMap
    assert(codes(1) == ((0, 1)))
    assert(codes(0) == ((2, 2)))
    assert(codes(2) == ((6, 3)))
    assert(codes(3) == ((7, 3)))
  }

  test("animated WebP: frame 1 decodes, canvas composite, EXIF intact") {
    val d = photo(48, 36, 14)
    val d2 = photo(48, 36, 15)
    // full-canvas 2-frame animation: decode == frame 1 exactly
    val anim = Webp.encodeAnimated(Seq(d, d2), 1)
    val (dec, st) = Webp.decodeWithStatus(anim)
    assert(st == "ok" && dec.get.w == 48 && dec.get.h == 36)
    assert(dec.get.argb.sameElements(d.argb), "animation frame 1 mismatch")
    assert(Webp.headerDims(anim).contains((48, 36)))
    // frame smaller than the canvas at an offset: composited, transparent
    // elsewhere (what a generic still decode of an animation shows)
    val small = photo(20, 10, 16)
    val off = Webp.encodeAnimated(Seq(small), 0, canvas = Some((64, 40)),
      at = (8, 6))
    val (dec2, st2) = Webp.decodeWithStatus(off)
    assert(st2 == "ok" && dec2.get.w == 64 && dec2.get.h == 40)
    assert(dec2.get.argb(0) == 0, "outside the frame must stay transparent")
    assert(dec2.get.argb(6 * 64 + 8) == small.argb(0), "offset composite")
    assert(dec2.get.argb(15 * 64 + 27) == small.argb(9 * 20 + 19),
      "frame bottom-right lands at canvas (27,15)")
    // EXIF rides the animated container too
    val app1 = Exif.buildApp1(3, "2022:01:02 03:04:05", Some(1.5), Some(2.5))
    val withExif = Webp.encodeAnimated(Seq(d), 2,
      Some(java.util.Arrays.copyOfRange(app1, 4, app1.length)))
    val ex = Exif.fromBytes(withExif, "webp")
    assert(ex.exists(_.orientation.contains(3)))
    val (dec3, st3) = Webp.decodeWithStatus(withExif)
    assert(st3 == "ok" && dec3.get.argb.sameElements(d.argb))
  }

  test("byte-parser fuzz: mutated and junk streams never escape the status contract") {
    val rnd = new scala.util.Random(7)
    val d = photo(40, 30, 17)
    val seeds: Seq[Array[Byte]] = Seq(
      Webp.encodeLossless(d, 1),
      Webp.encodeVp8x(d, 3, Some(java.util.Arrays.copyOfRange(
        Exif.buildApp1(1, "2020:01:01 00:00:00", None, None), 4, 200))),
      Webp.encodeAnimated(Seq(d), 2),
      Webp.encodeLossyStub(99, 77, Array.fill(40)(3.toByte)))
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    for (trial <- 0 until 400) {
      val base = seeds(trial % seeds.length)
      val b = base.clone()
      // 1-8 random byte mutations anywhere (headers, huffman streams, EXIF)
      for (_ <- 0 to rnd.nextInt(8)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val (dec, st) = ImageCodec.decodeWithStatus(b, "webp", d.w, d.h)
      assert(Set("ok", "error", "unsupported")(st), s"trial $trial status $st")
      assert(dec.isEmpty || (dec.get.w > 0 && dec.get.h > 0), s"trial $trial dims")
      Webp.headerDims(b) // must not throw
      // the kernel must absorb the row whole (decode + EXIF + hash)
      val sig = graft.kernel.SignatureKernel.computeOne(
        graft.model.ImageRow(s"fz$trial", b, d.w, d.h, "webp", "c", 0L), sha)
      assert(sig.content_hash != null)
      // truncations at arbitrary points
      val t = java.util.Arrays.copyOf(base, 1 + rnd.nextInt(base.length))
      assert(Set("ok", "error", "unsupported")(
        ImageCodec.decodeWithStatus(t, "webp", d.w, d.h)._2), s"trial $trial trunc")
    }
  }

  test("Huffman writer/reader fuzz: 600 random histograms roundtrip") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 600) {
      val alpha = Seq(40, 256, 280)(trial % 3)
      val freq = new Array[Long](alpha)
      for (_ <- 0 until 1 + rnd.nextInt(alpha)) freq(rnd.nextInt(alpha)) = 1 + rnd.nextInt(1000)
      freq(rnd.nextInt(math.min(alpha, 256))) = 1 // streams always hold a sub-256 symbol
      assert(Webp.huffRoundtrip(freq, trial % 5 == 0),
        s"huffman roundtrip failed: trial $trial alpha $alpha")
    }
  }

  test("signature kernel end-to-end: webp row gets PDQ + pixel hash") {
    val d = photo(96, 72, 13)
    val bytes = Webp.encodeLossless(d, 1)
    val row = graft.model.ImageRow("w1", bytes, d.w, d.h, "webp", "cap", 0L)
    val sig = graft.kernel.SignatureKernel.computeOne(
      row, java.security.MessageDigest.getInstance("SHA-256"))
    assert(sig.has_pdq, "webp row did not produce a PDQ signature")
    assert(sig.decode_status == "ok")
    // lossless: pixel hash must equal the PNG encoding of the same pixels
    val png = ImageCodec.encodePng(d)
    val rowPng = graft.model.ImageRow("p1", png, d.w, d.h, "png", "cap", 0L)
    val sigPng = graft.kernel.SignatureKernel.computeOne(
      rowPng, java.security.MessageDigest.getInstance("SHA-256"))
    assert(java.util.Arrays.equals(sig.pixel_hash, sigPng.pixel_hash),
      "lossless webp and png of identical pixels must share a pixel hash")
  }
}
