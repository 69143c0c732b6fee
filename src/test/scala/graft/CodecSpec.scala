package graft

import graft.kernel.{DecodedImage, ImageCodec}
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Decode tiers added in round 2: real TIFF via the JDK ImageIO plugin and
  * RAW embedded-JPEG preview extraction (scanner.rs:1353-1380 semantics,
  * codec-free byte scan), plus the decode-status taxonomy. */
class CodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): DecodedImage = {
    val argb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255) / math.max(w - 1, 1)
        val g = (y * 255) / math.max(h - 1, 1)
        val b = ((x + y) * 255) / math.max(w + h - 2, 1)
        argb(y * w + x) = 0xff000000 | (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, argb)
  }

  private def encodeTiff(d: DecodedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    assert(ImageIO.write(ImageCodec.toBuffered(d), "tiff", ios),
      "JDK TIFF writer missing")
    ios.close()
    bos.toByteArray
  }

  test("TIFF decodes losslessly through the JDK ImageIO tier (S4 real)") {
    val src = gradient(64, 48)
    val bytes = encodeTiff(src)
    val (decoded, status) = ImageCodec.decodeWithStatus(bytes, "tiff", 64, 48)
    assert(status == "ok")
    val d = decoded.get
    assert(d.w == 64 && d.h == 48)
    // TIFF is lossless — pixel-exact round trip
    assert(d.argb.sameElements(src.argb), "TIFF round trip not pixel-exact")
  }

  test("RAW preview: largest embedded JPEG is found and decoded (S6)") {
    val small = ImageCodec.encodeJpeg(gradient(16, 12), 0.9f)
    val large = ImageCodec.encodeJpeg(gradient(120, 90), 0.9f)
    // fake RAW container: TIFF-ish magic + junk + small preview + junk +
    // large preview + trailing junk (zeros contain no JPEG markers)
    val bos = new ByteArrayOutputStream()
    bos.write(Array[Byte]('I', 'I', 42, 0))
    bos.write(new Array[Byte](257))
    bos.write(small)
    bos.write(new Array[Byte](64))
    bos.write(large)
    bos.write(new Array[Byte](33))
    val raw = bos.toByteArray

    val preview = ImageCodec.extractLargestJpegPreview(raw)
    assert(preview.isDefined, "no preview extracted")
    assert(preview.get.w == 120 && preview.get.h == 90,
      s"picked ${preview.get.w}x${preview.get.h}, wanted the 120x90 preview")

    // the kernel path: any reference RAW ext dispatches to the preview tier
    for (fmt <- Seq("nef", "cr2", "arw", "dng")) {
      val (d, status) = ImageCodec.decodeWithStatus(raw, fmt, 120, 90)
      assert(status == "ok" && d.get.w == 120, s"fmt $fmt failed")
    }
    // PSNR vs the original scene: same decode as a plain JPEG round trip
    val direct = ImageCodec.decode(large, "jpg", 120, 90).get
    assert(ImageCodec.psnr(preview.get, direct) == Double.PositiveInfinity,
      "preview decode differs from decoding the embedded JPEG directly")
  }

  test("nested-SOI preview: thumbnail inside EXIF no longer truncates the span") {
    // a full-size preview whose own APP1 embeds a thumbnail JPEG: the
    // nested SOI used to cut the outer stream before its scan data, so
    // only the thumbnail decoded (round-2 ADVICE). Both span variants +
    // max-decoded-area selection must recover the full preview.
    val big = ImageCodec.encodeJpeg(gradient(100, 80), 0.9f)
    val thumb = ImageCodec.encodeJpeg(gradient(10, 8), 0.9f)
    val seg = new java.io.ByteArrayOutputStream()
    val len = thumb.length + 2
    seg.write(0xff); seg.write(0xe1)
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write(thumb)
    val nested = graft.kernel.Exif.spliceIntoJpeg(big, seg.toByteArray)
    val container = Array[Byte]('I', 'I', 42, 0) ++ new Array[Byte](64) ++ nested
    val d = ImageCodec.extractLargestJpegPreview(container)
    assert(d.isDefined && d.get.w == 100 && d.get.h == 80,
      s"picked ${d.map(x => (x.w, x.h))} — nested SOI truncated the outer stream")
  }

  test("RAW with no embedded JPEG reports error, unknown fmt reports unsupported") {
    val junk = new Array[Byte](1024)
    assert(ImageCodec.decodeWithStatus(junk, "nef", 10, 10)._2 == "error")
    assert(ImageCodec.decodeWithStatus(junk, "jxl", 10, 10)._2 == "unsupported")
    // pdf is a REAL tier since round 5: junk bytes under a pdf label are
    // an error (same contract as nef); rasterless-but-valid PDFs stay
    // unsupported — see PdfImagesSpec
    assert(ImageCodec.decodeWithStatus(junk, "pdf", 10, 10)._2 == "error")
  }

  test("guessed-format fallback (S5): mislabeled-but-decodable rows decode") {
    val png = ImageCodec.encodePng(gradient(24, 18))
    // claimed fmt has no dedicated tier — ImageIO sniffs the magic bytes
    val (d, status) = ImageCodec.decodeWithStatus(png, "jxl", 24, 18)
    assert(status == "ok" && d.get.w == 24, "sniff fallback failed")
    val (d2, status2) = ImageCodec.decodeWithStatus(png, "webp", 24, 18)
    assert(status2 == "ok" && d2.get.h == 18)
  }

  test("hand-written TIFF (kernel/Tiff) decodes losslessly and carries EXIF in-IFD") {
    val src = gradient(40, 30)
    val exif = graft.kernel.TiffExif(6, "2021:07:04 12:30:45",
      Some(-33.5), Some(151.25))
    val bytes = graft.kernel.Tiff.encode(src, 8, Some(exif))
    val (decoded, status) = ImageCodec.decodeWithStatus(bytes, "tiff", 40, 30)
    assert(status == "ok", s"decode status $status")
    assert(decoded.get.argb.sameElements(src.argb), "8-bit TIFF not lossless")
    val e = graft.kernel.Exif.fromBytes(bytes, "tiff")
    assert(e.isDefined, "no EXIF parsed from TIFF container")
    assert(e.get.orientation.contains(6))
    assert(e.get.dateTimeOriginal.contains("2021:07:04 12:30:45"))
    assert(math.abs(e.get.lat.get - -33.5) < 1e-4, s"lat ${e.get.lat}")
    assert(math.abs(e.get.lon.get - 151.25) < 1e-4, s"lon ${e.get.lon}")
  }

  test("16-bit TIFF: same argb/PDQ as its 8-bit conversion, different pixel hash") {
    val src = gradient(48, 36)
    // widened-only 16-bit file (samples exactly v·257): pixel-hash stream
    // EQUALS the 8-bit source's widened stream — correct reference
    // behavior (to_rgba16 of the 8-bit file is the same buffer)
    val widened = graft.kernel.Tiff.encode(src, 16)
    val (dw, stw) = ImageCodec.decodeWithStatus(widened, "tiff", 48, 36)
    assert(stw == "ok" && dw.get.rgba16 != null, "16-bit raster not captured")
    assert(dw.get.argb.sameElements(src.argb))
    assert(dw.get.pixelHashBytes.sameElements(src.pixelHashBytes),
      "widened 16-bit samples should hash like the widened 8-bit source")
    // true 16-bit content (low-byte jitter): same argb ⇒ same PDQ, but the
    // pixel hash must see the extra precision (scanner.rs:1393-1406)
    val t16 = graft.kernel.Tiff.encode(graft.kernel.Tiff.with16BitJitter(src), 16)
    val (d16, st) = ImageCodec.decodeWithStatus(t16, "tiff", 48, 36)
    assert(st == "ok" && d16.get.rgba16 != null)
    assert(d16.get.argb.sameElements(src.argb),
      "argb of a jittered 16-bit TIFF must equal the 8-bit source")
    assert(!d16.get.pixelHashBytes.sameElements(src.pixelHashBytes),
      "16-bit precision must reach the pixel hash (scanner.rs:1393-1406)")
  }

  test("USHORT_565/555 rasters (16-bit BMP class) decode via getRGB, not all-black") {
    // round-3 ADVICE (medium): these ride a TYPE_USHORT transfer buffer
    // but carry 5/6-bit samples — the 16-bit fast path treated them as
    // 16-bit, making (r>>8)<<16 = 0 for every pixel (flat black argb, one
    // shared PDQ, false duplicate groups feeding the deletion manifest)
    for (imgType <- Seq(java.awt.image.BufferedImage.TYPE_USHORT_565_RGB,
      java.awt.image.BufferedImage.TYPE_USHORT_555_RGB)) {
      val src = new java.awt.image.BufferedImage(32, 24, imgType)
      val g = src.createGraphics()
      g.setPaint(new java.awt.GradientPaint(0, 0, java.awt.Color.WHITE,
        32, 24, java.awt.Color.RED))
      g.fillRect(0, 0, 32, 24)
      g.dispose()
      val d = ImageCodec.fromBuffered(src)
      assert(d.rgba16 == null, s"type $imgType is not a 16-bit-sample raster")
      assert(d.argb.exists(p => (p & 0xffffff) != 0),
        s"type $imgType decoded all-black — USHORT fast path mis-gated")
      // and the decode matches the ColorModel-correct getRGB values
      val want = src.getRGB(0, 0, 32, 24, null, 0, 32)
      assert(d.argb.sameElements(want), s"type $imgType diverges from getRGB")
    }
  }

  test("A5 subgroups: 16-bit TIFF splits pixel-identical counts, not groups") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    import spark.implicits._
    val src = gradient(64, 48)
    val png = ImageCodec.encodePng(src)
    // true 16-bit content: low bytes carry precision an 8-bit file can't
    val t16 = graft.kernel.Tiff.encode(graft.kernel.Tiff.with16BitJitter(src), 16)
    val images = Seq(
      ("a-png", png, 64, 48, "png", "cap", 0L),
      ("b-pngcopy", png, 64, 48, "png", "cap", 0L),
      ("c-tiff16", t16, 64, 48, "tiff", "cap", 0L))
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    val dir = java.nio.file.Files.createTempDirectory("graft-a5").toString
    val grouped = graft.Pipeline.run(spark, images, s"$dir/work")
    val rows = grouped.select("image_id", "comp", "pixel_count_dup")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.size == 3, s"all three must group (identical PDQ): $rows")
    assert(rows.values.map(_._1).toSet.size == 1, "one component expected")
    assert(rows("a-png")._2 == 2 && rows("b-pngcopy")._2 == 2,
      s"png pair pixel-identical: $rows")
    assert(rows("c-tiff16")._2 == 1,
      s"16-bit member must sit in its own pixel subgroup: $rows")
  }

  test("RAW container fixture: preview decode + container EXIF (not preview EXIF)") {
    val src = gradient(96, 72)
    val exif = graft.kernel.TiffExif(3, "2019:01:15 08:00:00", Some(45.0), Some(-120.5))
    val thumb = gradient(12, 9)
    val raw = graft.kernel.Tiff.encodeRawContainer(thumb,
      ImageCodec.encodeJpeg(src, 0.9f), Some(exif))
    val (d, status) = ImageCodec.decodeWithStatus(raw, "nef", 96, 72)
    assert(status == "ok" && d.get.w == 96 && d.get.h == 72,
      s"preview decode failed: $status ${d.map(x => (x.w, x.h))}")
    val e = graft.kernel.Exif.fromBytes(raw, "nef")
    assert(e.isDefined, "no EXIF from RAW container")
    assert(e.get.orientation.contains(3))
    assert(e.get.dateTimeOriginal.contains("2019:01:15 08:00:00"))
    assert(math.abs(e.get.lat.get - 45.0) < 1e-4)
    assert(math.abs(e.get.lon.get - -120.5) < 1e-4)
  }

  test("status taxonomy: truncated JPEG is error, not unsupported") {
    val good = ImageCodec.encodeJpeg(gradient(32, 32), 0.8f)
    val truncated = java.util.Arrays.copyOf(good, 20)
    assert(ImageCodec.decodeWithStatus(truncated, "jpg", 32, 32)._2 == "error")
    assert(ImageCodec.decodeWithStatus(good, "jpg", 32, 32)._2 == "ok")
  }
}
