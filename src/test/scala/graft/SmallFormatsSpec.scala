package graft

import graft.kernel.{DecodedImage, HeaderDims, ImageCodec, SmallFormats}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Small-format tiers (QOI / PNM / farbfeld / ICO — the reference's
 * image-crate fallback extensions, scanner.rs:2278): lossless roundtrips,
 * header-dims agreement, the 16-bit rgba16 hash path for native deep-color
 * sources, mislabel sniffing, and the ok/error/unsupported contract.
 */
class SmallFormatsSpec extends AnyFunSuite {

  private def photo(w: Int, h: Int, seed: Int): DecodedImage = {
    val argb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (x > w / 2 && y > h / 2) 0xff887766
      else 0xff000000 | (((x * 7 + seed) % 256) << 16) |
        (((y * 5 + seed * 3) % 256) << 8) | ((x + y + seed) % 256)
    }
    DecodedImage(w, h, argb)
  }

  test("QOI: lossless roundtrip incl. runs, index hits, diff/luma, alpha") {
    for ((d, label) <- Seq(
      (photo(61, 43, 1), "photo"),
      (DecodedImage(1, 1, Array(0xff010203)), "1x1"),
      (DecodedImage(10, 10, Array.fill(100)(0xff336699)), "flat-runs"),
      (DecodedImage(16, 4, Array.tabulate(64)(i =>
        ((i * 37 % 255) << 24) | (0x102030 + i))), "alpha"))) {
      val enc = SmallFormats.Qoi.encode(d)
      val dec = SmallFormats.Qoi.decode(enc)
      assert(dec.isDefined, label)
      assert(dec.get.argb.sameElements(d.argb), s"$label not lossless")
      assert(SmallFormats.Qoi.headerDims(enc).contains((d.w, d.h)), label)
    }
  }

  test("QOI: long runs split at 62 (the spec cap)") {
    val d = DecodedImage(300, 2, Array.fill(600)(0xffaabbcc))
    val dec = SmallFormats.Qoi.decode(SmallFormats.Qoi.encode(d))
    assert(dec.get.argb.sameElements(d.argb))
  }

  test("PNM: P6 roundtrip, P5 gray, comments, and 16-bit maxval") {
    val d = photo(33, 21, 2)
    val p6 = SmallFormats.Pnm.encode(d)
    assert(SmallFormats.Pnm.decode(p6).get.argb.sameElements(d.argb))
    assert(SmallFormats.Pnm.headerDims(p6).contains((33, 21)))
    // header comments survive
    val commented = ("P6\n# a comment\n33 21\n# another\n255\n").getBytes("US-ASCII") ++
      p6.drop("P6\n33 21\n255\n".length)
    assert(SmallFormats.Pnm.decode(commented).get.argb.sameElements(d.argb))
    // P5 gray: decodes to the luma plane
    val p5 = SmallFormats.Pnm.encode(d, gray = true)
    val g = SmallFormats.Pnm.decode(p5).get
    assert(g.w == 33 && g.h == 21)
    assert((g.argb(0) & 0xff) == ((g.argb(0) >> 8) & 0xff), "gray channels equal")
    // 16-bit maxval: two BE bytes per sample, rgba16 non-null (deep path)
    val hdr = "P6\n2 1\n65535\n".getBytes("US-ASCII")
    val deep = hdr ++ Array[Byte](
      0x12, 0x34, 0x56, 0x78, 0x0a.toByte, 0xbc.toByte, // px0 rgb16
      0xff.toByte, 0xff.toByte, 0, 0, 0x80.toByte, 0) // px1
    val dd = SmallFormats.Pnm.decode(deep).get
    assert(dd.rgba16 != null, "16-bit PNM must carry native samples")
    assert((dd.rgba16(0) & 0xffff) == 0x1234)
    assert((dd.rgba16(4) & 0xffff) == 0xffff)
    assert(((dd.argb(0) >> 16) & 0xff) == 0x12)
  }

  test("farbfeld: native 16-bit roundtrip; shares PNG's pixel hash on 8-bit sources") {
    val d = photo(24, 18, 3)
    val ff = SmallFormats.Farbfeld.encode(d)
    val dec = SmallFormats.Farbfeld.decode(ff).get
    assert(dec.argb.sameElements(d.argb))
    assert(dec.rgba16 != null)
    assert(SmallFormats.Farbfeld.headerDims(ff).contains((24, 18)))
    // the v*257 widening makes the ff pixel hash equal the png row's hash
    // (same DecodedImage.pixelHashBytes stream) — cross-format 16-bit axis
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    val viaFf = sha.digest(dec.pixelHashBytes)
    sha.reset()
    val viaPng = sha.digest(ImageCodec.decode(
      ImageCodec.encodePng(d), "png", d.w, d.h).get.pixelHashBytes)
    assert(java.util.Arrays.equals(viaFf, viaPng),
      "farbfeld(v*257) and png of identical pixels must share a pixel hash")
  }

  test("ICO: PNG-flavored entry decodes; BMP 32bpp entry decodes; largest wins") {
    val d = photo(48, 48, 4)
    val ico = SmallFormats.Ico.encodePng(d)
    val dec = SmallFormats.Ico.decode(ico).get
    assert(dec.argb.sameElements(d.argb))
    assert(SmallFormats.Ico.headerDims(ico).contains((48, 48)))
    // hand-built 2x2 BMP-flavored entry (32bpp, bottom-up, no AND mask use)
    val bmp = new Array[Byte](6 + 16 + 40 + 16 + 4)
    bmp(2) = 1; bmp(4) = 1 // icon, 1 entry
    bmp(6) = 2; bmp(7) = 2 // 2x2
    def le32(at: Int, v: Int): Unit = {
      bmp(at) = (v & 0xff).toByte; bmp(at + 1) = ((v >> 8) & 0xff).toByte
      bmp(at + 2) = ((v >> 16) & 0xff).toByte; bmp(at + 3) = ((v >> 24) & 0xff).toByte
    }
    le32(14, 40 + 16 + 4) // size
    le32(18, 22) // offset
    val ih = 22
    le32(ih, 40); le32(ih + 4, 2); le32(ih + 8, 4) // header, w=2, doubled h=4
    bmp(ih + 12) = 1 // planes
    bmp(ih + 14) = 32 // bpp
    // pixels BGRA bottom-up: row1 = (red, green), row0 = (blue, white)
    val px = Array(
      Array(255, 0, 0, 255), Array(255, 255, 255, 255), // bottom row: blue, white
      Array(0, 0, 255, 255), Array(0, 255, 0, 255)) // top row: red, green
    for ((p, i) <- px.zipWithIndex; (v, j) <- p.zipWithIndex)
      bmp(ih + 40 + 4 * i + j) = v.toByte
    val db = SmallFormats.Ico.decode(bmp).get
    assert(db.w == 2 && db.h == 2)
    assert(db.argb(0) == 0xffff0000, f"top-left ${db.argb(0)}%08x") // red
    assert(db.argb(1) == 0xff00ff00, "top-right green")
    assert(db.argb(2) == 0xff0000ff, "bottom-left blue")
    assert(db.argb(3) == 0xffffffff, "bottom-right white")
  }

  test("codec dispatch: labeled decode, mislabel sniff, junk is error") {
    val d = photo(30, 20, 5)
    for ((bytes, fmt) <- Seq(
      (SmallFormats.Qoi.encode(d), "qoi"),
      (SmallFormats.Pnm.encode(d), "pnm"),
      (SmallFormats.Farbfeld.encode(d), "ff"),
      (SmallFormats.Ico.encodePng(d), "ico"))) {
      val (dec, st) = ImageCodec.decodeWithStatus(bytes, fmt, d.w, d.h)
      assert(st == "ok" && dec.get.argb.sameElements(d.argb), fmt)
      // same bytes under an unknown label: the S5 sniff still decodes them
      val (dec2, st2) = ImageCodec.decodeWithStatus(bytes, "bin", d.w, d.h)
      assert(st2 == "ok" && dec2.get.argb.sameElements(d.argb), s"$fmt sniff")
      assert(HeaderDims.probe(bytes, "png").contains((d.w, d.h)), s"$fmt probe sniff")
      // truncation: error, not a crash
      val t = java.util.Arrays.copyOf(bytes, math.max(4, bytes.length / 3))
      assert(ImageCodec.decodeWithStatus(t, fmt, d.w, d.h)._2 == "error", s"$fmt trunc")
    }
    // exr: honest unsupported via the generic branch
    assert(ImageCodec.decodeWithStatus(Array.fill(64)(9.toByte), "exr", 8, 8)._2
      == "unsupported")
  }

  test("DDS: uncompressed lossless; DXT1 exact on 2-color blocks; DXT5 alpha anchor") {
    val d = photo(37, 29, 7)
    val un = SmallFormats.Dds.encodeUncompressed(d)
    assert(SmallFormats.Dds.headerDims(un).contains((37, 29)))
    assert(SmallFormats.Dds.decode(un).get.argb.sameElements(d.argb))
    assert(ImageCodec.decodeWithStatus(un, "dds", 37, 29)._2 == "ok")
    assert(ImageCodec.decodeWithStatus(un, "bin", 37, 29)._2 == "ok", "sniff")
    // 2 distinct 565-representable colors per 4x4 block -> DXT1 is exact
    val cA = 0xff000000 | (((8 * 255) / 31) << 16) | (((33 * 255) / 63) << 8) | ((2 * 255) / 31)
    val cB = 0xff000000 | (((25 * 255) / 31) << 16) | (((10 * 255) / 63) << 8) | ((29 * 255) / 31)
    val blocky = DecodedImage(16, 8, Array.tabulate(16 * 8) { i =>
      val bx = (i % 16) / 4; val by2 = (i / 16) / 4
      if ((bx + by2 + (i % 2)) % 2 == 0) cA else cB
    })
    val dxt1 = SmallFormats.Dds.encodeDxt1(blocky)
    val dec1 = SmallFormats.Dds.decode(dxt1).get
    assert(dec1.argb.sameElements(blocky.argb), "DXT1 2-color blocks must be exact")
    // photo through DXT1: lossy but close (recompress-like)
    val dxtP = SmallFormats.Dds.decode(SmallFormats.Dds.encodeDxt1(d)).get
    var errSum = 0L
    for (i <- d.argb.indices; sh <- Seq(16, 8, 0))
      errSum += math.abs(((d.argb(i) >> sh) & 0xff) - ((dxtP.argb(i) >> sh) & 0xff))
    val mean = errSum.toDouble / (d.argb.length * 3)
    assert(mean < 12.0, s"DXT1 mean abs error $mean too high")
    // hand-built 4x4 DXT5 block: alpha a0=255 a1=0, idx0 everywhere ->
    // alpha 255; color c0=white c1=black lut=0 -> white
    val b5 = new Array[Byte](128 + 16)
    System.arraycopy(SmallFormats.Dds.encodeDxt1(DecodedImage(4, 4,
      Array.fill(16)(0xffffffff))), 0, b5, 0, 128) // reuse a valid header
    b5(84) = 'D'; b5(85) = 'X'; b5(86) = 'T'; b5(87) = '5'
    b5(128) = 255.toByte; b5(129) = 0 // a0, a1
    // alpha indices all 0 (bytes 130-135 zero); color: c0 = white 0xffff
    b5(136) = 0xff.toByte; b5(137) = 0xff.toByte // c0 = 565 white
    b5(138) = 0; b5(139) = 0 // c1 = black
    val d5 = SmallFormats.Dds.decode(b5).get
    assert(d5.w == 4 && d5.h == 4)
    assert(d5.argb.forall(_ == 0xffffffff), "DXT5 anchor: opaque white")
    // DX10-extended / BC7 fourCC: honest unsupported under the dds label
    val bc7 = b5.clone(); bc7(84) = 'D'; bc7(85) = 'X'; bc7(86) = '1'; bc7(87) = '0'
    assert(ImageCodec.decodeWithStatus(bc7, "dds", 4, 4)._2 == "unsupported")
  }

  test("Radiance HDR: RGBE roundtrip within shared-exponent tolerance") {
    val d = photo(40, 26, 6)
    val hdr = SmallFormats.Hdr.encode(d)
    assert(SmallFormats.Hdr.headerDims(hdr).contains((40, 26)))
    val dec = SmallFormats.Hdr.decode(hdr).get
    assert(dec.w == 40 && dec.h == 26)
    assert(dec.rgba16 != null, "HDR is a deep-color source")
    // shared-exponent quantization: each 8-bit channel within +-2
    var maxErr = 0
    for (i <- d.argb.indices; sh <- Seq(16, 8, 0)) {
      val want = (d.argb(i) >> sh) & 0xff
      val got = (dec.argb(i) >> sh) & 0xff
      maxErr = math.max(maxErr, math.abs(want - got))
    }
    assert(maxErr <= 2, s"RGBE error $maxErr > 2")
    // narrow image: flat (non-RLE) scanline path
    val narrow = photo(5, 7, 8)
    val dn = SmallFormats.Hdr.decode(SmallFormats.Hdr.encode(narrow)).get
    assert(dn.w == 5 && dn.h == 7)
    // labeled + sniffed dispatch, truncation is error
    assert(ImageCodec.decodeWithStatus(hdr, "hdr", 40, 26)._2 == "ok")
    assert(ImageCodec.decodeWithStatus(hdr, "bin", 40, 26)._2 == "ok")
    assert(HeaderDims.probe(hdr, "hdr").contains((40, 26)))
    val t = java.util.Arrays.copyOf(hdr, hdr.length / 2)
    assert(ImageCodec.decodeWithStatus(t, "hdr", 40, 26)._2 == "error")
    // black pixels (e=0) decode to black
    val black = DecodedImage(12, 9, Array.fill(108)(0xff000000))
    val db = SmallFormats.Hdr.decode(SmallFormats.Hdr.encode(black)).get
    assert(db.argb.forall(_ == 0xff000000))
  }
}
