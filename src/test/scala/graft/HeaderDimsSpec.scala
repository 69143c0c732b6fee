package graft

import graft.kernel.{HeaderDims, ImageCodec, Tiff}
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level header-dims probe (S7) — every parser exercised on real
  * encoder output where the env has an encoder, and on hand-assembled
  * spec-conformant bytes for the codec-blocked formats (JXL / HEIC / PDF):
  * their DECODE tier stays an honest `unsupported` stub, but dimensions
  * live in public byte layouts no codec is needed for. */
class HeaderDimsSpec extends AnyFunSuite {
  private val img = Synth.baseImage(42L, nearFlat = false)

  test("png / jpg / tiff / raw-container dims match the encoded image") {
    assert(HeaderDims.probe(ImageCodec.encodePng(img), "png")
      .contains((img.w, img.h)))
    assert(HeaderDims.probe(ImageCodec.encodeJpeg(img, 0.7f), "jpg")
      .contains((img.w, img.h)))
    assert(HeaderDims.probe(Tiff.encode(img, 8, None), "tiff")
      .contains((img.w, img.h)))
    val thumb = Synth.resizeScale(img, 16.0 / math.max(img.w, img.h))
    val raw = Tiff.encodeRawContainer(thumb, ImageCodec.encodeJpeg(img, 0.9f), None)
    // RAW reports the largest embedded preview's SOF dims — the stream the
    // decode tier hashes, not the thumbnail the IFD describes
    assert(HeaderDims.probe(raw, "nef").contains((img.w, img.h)))
  }

  test("jpg with spliced EXIF APP1 still reaches SOF") {
    val jpeg = ImageCodec.encodeJpeg(img, 0.7f)
    val withExif = graft.kernel.Exif.spliceIntoJpeg(jpeg,
      graft.kernel.Exif.buildApp1(1, "2024:01:02 03:04:05", None, None))
    assert(HeaderDims.probe(withExif, "jpg").contains((img.w, img.h)))
  }

  test("bmp and gif via ImageIO encoders") {
    val buf = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (fmt <- Seq("bmp", "gif")) {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(buf, fmt, baos)
      assert(HeaderDims.probe(baos.toByteArray, fmt).contains((17, 9)), fmt)
    }
  }

  test("jxl bare codestream: small-mode SizeHeader (hard-coded bit layout)") {
    // FF 0A | small=1, ysize_div8=3 (→32), ratio=1 (1:1) — LSB-first bits
    // 1,11000,001 pack to bytes 0x47 0x00
    val b = Array(0xff, 0x0a, 0x47, 0x00).map(_.toByte)
    assert(HeaderDims.probe(b, "jxl").contains((32, 32)))
  }

  test("jxl: non-small U32 sizes and ratio derivation, bare + container") {
    // bit-writer mirroring the LSB-first convention pinned by the
    // hard-coded case above
    class W { // LSB-first bit writer
      private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
      def u(v: Int, n: Int): this.type = { (0 until n).foreach(i => bits += ((v >> i) & 1)); this }
      def bytes: Array[Byte] = bits.grouped(8).map(g =>
        g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
    }
    // small=0; ysize: selector 0, u(9)=256 → 257; ratio=3 → xsize=257*4/3=342
    val hdr = new W().u(0, 1).u(0, 2).u(256, 9).u(3, 3).bytes
    val bare = Array(0xff.toByte, 0x0a.toByte) ++ hdr
    assert(HeaderDims.probe(bare, "jxl").contains((342, 257)))
    // ISOBMFF container: signature box, ftyp, then jxlc wrapping the stream
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val size = payload.length + 8
      Array[Byte](((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
        ((size >> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        name.getBytes("ISO-8859-1") ++ payload
    }
    val container = box("JXL ", Array(0x0d, 0x0a, 0x87, 0x0a).map(_.toByte)) ++
      box("ftyp", "jxl ".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "jxl ".getBytes) ++
      box("jxlc", bare)
    assert(HeaderDims.probe(container, "jxl").contains((342, 257)))
  }

  test("heic/avif: largest ispe in meta→iprp→ipco wins") {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val size = payload.length + 8
      Array[Byte](((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
        ((size >> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        name.getBytes("ISO-8859-1") ++ payload
    }
    def be(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def ispe(w: Int, h: Int) = box("ispe", Array[Byte](0, 0, 0, 0) ++ be(w) ++ be(h))
    val heic = box("ftyp", "heic".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
      box("meta", Array[Byte](0, 0, 0, 0) ++ // FullBox version/flags
        box("iprp", box("ipco",
          ispe(160, 90) ++ // thumbnail property
          ispe(4032, 3024)))) // primary image
    assert(HeaderDims.probe(heic, "heic").contains((4032, 3024)))
    assert(HeaderDims.probe(heic, "avif").contains((4032, 3024)))
    // sniffed via ftyp when mislabeled
    assert(HeaderDims.probe(heic, "jpg").contains((4032, 3024)))
  }

  test("pdf: MediaBox at the decode tier's 2x render scale") {
    val pdf = ("%PDF-1.7\n1 0 obj\n<< /Type /Page " +
      "/MediaBox [0 0 612 792] >>\nendobj\ntrailer\n%%EOF").getBytes
    assert(HeaderDims.probe(pdf, "pdf").contains((1224, 1584)))
  }

  test("mislabel sniff, truncation, and headerless bytes") {
    val png = ImageCodec.encodePng(img)
    assert(HeaderDims.probe(png, "jpg").contains((img.w, img.h))) // sniffed
    assert(HeaderDims.probe(png.take(10), "png").isEmpty)
    assert(HeaderDims.probe(Array[Byte](1, 2, 3), "png").isEmpty)
    assert(HeaderDims.probe(Synth.grayRawBytes(img), "gray-raw").isEmpty)
  }
}
