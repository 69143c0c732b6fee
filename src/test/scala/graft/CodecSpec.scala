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

  test("RAW with no embedded JPEG reports error, unknown fmt reports unsupported") {
    val junk = new Array[Byte](1024)
    assert(ImageCodec.decodeWithStatus(junk, "nef", 10, 10)._2 == "error")
    assert(ImageCodec.decodeWithStatus(junk, "jxl", 10, 10)._2 == "unsupported")
    assert(ImageCodec.decodeWithStatus(junk, "pdf", 10, 10)._2 == "unsupported")
  }

  test("guessed-format fallback (S5): mislabeled-but-decodable rows decode") {
    val png = ImageCodec.encodePng(gradient(24, 18))
    // claimed fmt has no dedicated tier — ImageIO sniffs the magic bytes
    val (d, status) = ImageCodec.decodeWithStatus(png, "jxl", 24, 18)
    assert(status == "ok" && d.get.w == 24, "sniff fallback failed")
    val (d2, status2) = ImageCodec.decodeWithStatus(png, "webp", 24, 18)
    assert(status2 == "ok" && d2.get.h == 18)
  }

  test("status taxonomy: truncated JPEG is error, not unsupported") {
    val good = ImageCodec.encodeJpeg(gradient(32, 32), 0.8f)
    val truncated = java.util.Arrays.copyOf(good, 20)
    assert(ImageCodec.decodeWithStatus(truncated, "jpg", 32, 32)._2 == "error")
    assert(ImageCodec.decodeWithStatus(good, "jpg", 32, 32)._2 == "ok")
  }
}
