package graft.kernel

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Decoded image: row-major pixels. `argb` is packed 0xAARRGGBB. */
final case class DecodedImage(w: Int, h: Int, argb: Array[Int]) {
  /** Rec.601 integer luma plane as floats 0-255 (pdqhash.rs:268-284). */
  def luma601: Array[Float] = {
    val out = new Array[Float](argb.length)
    var i = 0
    while (i < argb.length) { out(i) = Pdq.luma601(argb(i)).toFloat; i += 1 }
    out
  }
  /** Canonical RGBA byte stream for pixel-hashing (scanner.rs:1393-1406
    * hashes the decoded pixel buffer so recompressed copies differ but
    * bit-identical decodes collide). */
  def rgbaBytes: Array[Byte] = {
    val out = new Array[Byte](argb.length * 4)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      out(4 * i) = ((p >> 16) & 0xff).toByte
      out(4 * i + 1) = ((p >> 8) & 0xff).toByte
      out(4 * i + 2) = (p & 0xff).toByte
      out(4 * i + 3) = ((p >> 24) & 0xff).toByte
      i += 1
    }
    out
  }
}

/**
 * Tiered decode kernel (scanner.rs:461-735 simplified): per-format dispatch
 * on the `fmt` column — `png`/`jpg` via ImageIO, `gray-raw` as a raw w×h
 * 8-bit gray plane. Decode failures return None (the row flows on with
 * null signature, mirroring the reference's decode-failure path).
 *
 * The heavier codecs the reference supports (JXL/PDF/TIFF/RAW,
 * scanner.rs:553-735) are not available in this container; their dispatch
 * slots are stubbed to None and documented — the Spark-side plumbing
 * (schema, per-row try-fallback, fmt dispatch) is identical.
 */
object ImageCodec {
  // in-memory ImageInputStreams: the default file-backed cache serializes
  // parallel decodes on temp-dir I/O
  javax.imageio.ImageIO.setUseCache(false)

  def decode(bytes: Array[Byte], fmt: String, w: Int, h: Int): Option[DecodedImage] =
    try {
      fmt match {
        case "gray-raw" =>
          if (bytes.length < w * h || w <= 0 || h <= 0) None
          else {
            val argb = new Array[Int](w * h)
            var i = 0
            while (i < w * h) {
              val g = bytes(i) & 0xff
              argb(i) = 0xff000000 | (g << 16) | (g << 8) | g
              i += 1
            }
            Some(DecodedImage(w, h, argb))
          }
        case "png" | "jpg" | "jpeg" | "bmp" | "gif" =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          if (img == null) None else Some(fromBuffered(img))
        // JXL / PDF / TIFF / RAW decode tiers (scanner.rs:553-735): codecs
        // absent in this environment — plumbing kept, decode stubbed.
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def fromBuffered(img: BufferedImage): DecodedImage = {
    val w = img.getWidth; val h = img.getHeight
    // fast paths: read the backing raster directly — getRGB goes through a
    // per-pixel ColorModel conversion that costs ~25% of decode time
    img.getType match {
      case BufferedImage.TYPE_3BYTE_BGR =>
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        val argb = new Array[Int](w * h)
        var i = 0
        while (i < argb.length) {
          val b = data(3 * i) & 0xff
          val g = data(3 * i + 1) & 0xff
          val r = data(3 * i + 2) & 0xff
          argb(i) = 0xff000000 | (r << 16) | (g << 8) | b
          i += 1
        }
        DecodedImage(w, h, argb)
      case BufferedImage.TYPE_BYTE_GRAY =>
        // raw gray values, not getRGB's GRAY→sRGB colorspace remap — the
        // raw plane is what the luma pipeline wants (pdqhash.rs:280)
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        val argb = new Array[Int](w * h)
        var i = 0
        while (i < argb.length) {
          val v = data(i) & 0xff
          argb(i) = 0xff000000 | (v << 16) | (v << 8) | v
          i += 1
        }
        DecodedImage(w, h, argb)
      case BufferedImage.TYPE_INT_RGB =>
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferInt].getData
        val argb = new Array[Int](w * h)
        var i = 0
        while (i < argb.length) { argb(i) = 0xff000000 | data(i); i += 1 }
        DecodedImage(w, h, argb)
      case _ =>
        DecodedImage(w, h, img.getRGB(0, 0, w, h, null, 0, w))
    }
  }

  def toBuffered(d: DecodedImage): BufferedImage = {
    val img = new BufferedImage(d.w, d.h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, d.w, d.h, d.argb, 0, d.w)
    img
  }

  def encodePng(d: DecodedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(toBuffered(d), "png", bos)
    bos.toByteArray
  }

  /** JPEG at explicit quality (0-1) — the Kaanapali fixture recipe is
    * `-quality 70` ⇒ 0.70f (reference tests/…720p.jpg.txt). */
  def encodeJpeg(d: DecodedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(toBuffered(d), null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** Peak signal-to-noise ratio between two decodes (the per-row decode
    * invariant: PSNR ≥ 40 dB for lossy round-trips, exact for lossless). */
  def psnr(a: DecodedImage, b: DecodedImage): Double = {
    require(a.w == b.w && a.h == b.h, "psnr: dimension mismatch")
    var se = 0.0
    var i = 0
    while (i < a.argb.length) {
      val pa = a.argb(i); val pb = b.argb(i)
      var c = 0
      while (c < 3) {
        val d = ((pa >> (8 * c)) & 0xff) - ((pb >> (8 * c)) & 0xff)
        se += d.toDouble * d
        c += 1
      }
      i += 1
    }
    val mse = se / (a.argb.length * 3.0)
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }
}
