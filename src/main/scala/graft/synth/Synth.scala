package graft.synth

import graft.kernel.{DecodedImage, ImageCodec, PHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.Random

/** One generated row + its hidden ground truth. */
final case class SynthRow(
    image_id: String, bytes: Array[Byte], w: Int, h: Int, fmt: String,
    caption: String, phash: Long, part: Int,
    group_id: Long, variant: String)

/**
 * Deterministic synthetic image+caption corpus (seed=42, FIXTURES.md §2).
 * Mirrors the reference's fixture recipes: exact copies, JPEG q70
 * recompression and 0.5× resize (the Kaanapali `magick -resize -quality 70`
 * recipe), the 8 dihedral pixel transforms (hamminghash.rs:415-481), plus
 * unrelated images, near-flat low-quality images (quality<50 gate,
 * scanner.rs:1579-1594) and caption-dup pairs (MinHash axis).
 *
 * Generation is distributed: spark.range over base ids → mapPartitions;
 * every row derives only from its base id, so any scale factor produces
 * the same prefix (resumable, idempotent, no driver-side loops).
 */
object Synth {
  val Seed = 42L

  private val words = Array(
    "sunrise", "beach", "mountain", "forest", "river", "harbor", "skyline",
    "desert", "meadow", "lighthouse", "bridge", "canyon", "glacier", "island",
    "valley", "waterfall", "orchard", "village", "castle", "garden", "autumn",
    "winter", "golden", "misty", "quiet", "vivid", "ancient", "distant",
    "over", "under", "beside", "through", "against", "toward", "morning",
    "evening", "light", "shadow", "stone", "water")

  private[graft] def rng(baseId: Long, salt: Long): Random =
    new Random(Seed * 0x9e3779b97f4a7c15L + baseId * 0x165667b19e3779f9L + salt)

  /** Deterministic caption: 8–13 words drawn from the bank. */
  def caption(baseId: Long): String = {
    val r = rng(baseId, 7)
    val n = 8 + r.nextInt(6)
    (0 until n).map(_ => words(r.nextInt(words.length))).mkString(" ")
  }

  /** Caption with `edits` words replaced — controlled shingle overlap. */
  def captionEdited(baseId: Long, edits: Int): String = {
    val r = rng(baseId, 11)
    val toks = caption(baseId).split(" ")
    var e = 0
    while (e < edits && toks.nonEmpty) {
      toks(r.nextInt(toks.length)) = words(r.nextInt(words.length))
      e += 1
    }
    toks.mkString(" ")
  }

  // --- procedural base images ---

  private def pack(r: Int, g: Int, b: Int): Int =
    0xff000000 | (clamp(r) << 16) | (clamp(g) << 8) | clamp(b)
  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Additive coarse value noise (±45, 5×5 grid) — makes low-entropy
    * families (gradient/sinusoid) globally distinct per base so unrelated
    * bases never fall within PDQ threshold of each other. */
  private def distinctify(argb: Array[Int], w: Int, h: Int, r: Random): Unit = {
    val gn = 5
    val grid = Array.fill(gn * gn)(r.nextInt(91) - 45)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gx = x.toDouble * (gn - 1) / w; val gy = y.toDouble * (gn - 1) / h
        val x0 = gx.toInt; val y0 = gy.toInt
        val fx = gx - x0; val fy = gy - y0
        val x1 = math.min(x0 + 1, gn - 1); val y1 = math.min(y0 + 1, gn - 1)
        val d = ((grid(y0 * gn + x0) * (1 - fx) + grid(y0 * gn + x1) * fx) * (1 - fy) +
          (grid(y1 * gn + x0) * (1 - fx) + grid(y1 * gn + x1) * fx) * fy).toInt
        val p = argb(y * w + x)
        argb(y * w + x) = pack(((p >> 16) & 0xff) + d, ((p >> 8) & 0xff) + d, (p & 0xff) + d)
        x += 1
      }
      y += 1
    }
  }

  /** Multi-octave fractal value noise (bilinear-interpolated grids 3,5,9,17
    * with decaying amplitude): geometric families (checkerboards, sinusoids,
    * gradients) have spectrally-sparse DCTs, leaving 100+ of the 256 PDQ
    * coefficients ≈0 — the binarization median lands in that tie cluster and
    * f32 noise decorrelates dihedral variants. Natural photos have 1/f
    * spectra; this gives the synthetic bases the same property. Low/mid
    * frequency ⇒ survives JPEG q70 and 0.5× resize. */
  private def fractalNoise(argb: Array[Int], w: Int, h: Int, r: Random): Unit = {
    val octaves = Array((3, 40), (5, 28), (9, 20), (17, 14))
    val field = new Array[Int](w * h)
    for ((gn, amp) <- octaves) {
      val grid = Array.fill(gn * gn)(r.nextInt(2 * amp + 1) - amp)
      var y = 0
      while (y < h) {
        val gy = y.toDouble * (gn - 1) / h
        val y0 = gy.toInt; val fy = gy - y0
        val y1 = math.min(y0 + 1, gn - 1)
        var x = 0
        while (x < w) {
          val gx = x.toDouble * (gn - 1) / w
          val x0 = gx.toInt; val fx = gx - x0
          val x1 = math.min(x0 + 1, gn - 1)
          val d = ((grid(y0 * gn + x0) * (1 - fx) + grid(y0 * gn + x1) * fx) * (1 - fy) +
            (grid(y1 * gn + x0) * (1 - fx) + grid(y1 * gn + x1) * fx) * fy).toInt
          field(y * w + x) += d
          x += 1
        }
        y += 1
      }
    }
    var i = 0
    while (i < argb.length) {
      val p = argb(i); val d = field(i)
      argb(i) = pack(((p >> 16) & 0xff) + d, ((p >> 8) & 0xff) + d, (p & 0xff) + d)
      i += 1
    }
  }

  /** Stretch channel range to [8,247]: low-contrast images cluster DCT
    * coefficients at the median, where f32 summation-order noise between a
    * physically-transformed buffer and the sign-flip-derived variant flips
    * bits (the reference shares this; its fixtures are high-contrast). */
  private def normalizeContrast(argb: Array[Int]): Unit = {
    var mn = 255; var mx = 0
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      var c = 0
      while (c < 3) {
        val v = (p >> (8 * c)) & 0xff
        if (v < mn) mn = v
        if (v > mx) mx = v
        c += 1
      }
      i += 1
    }
    val range = mx - mn
    if (range < 120 && range > 0) {
      i = 0
      while (i < argb.length) {
        val p = argb(i)
        argb(i) = pack(
          8 + (((p >> 16) & 0xff) - mn) * 239 / range,
          8 + (((p >> 8) & 0xff) - mn) * 239 / range,
          8 + ((p & 0xff) - mn) * 239 / range)
        i += 1
      }
    }
  }

  /** Procedural base image, family chosen by the base id's rng. Families
    * keep contrast after JPEG q70 + the 64×64 PDQ blur (value noise is
    * coarse-grid interpolated, not per-pixel). */
  def baseImage(baseId: Long, nearFlat: Boolean): DecodedImage = {
    val r = rng(baseId, 1)
    // Sizes stay in PDQ's dihedral-robust regime: (a) not multiples of 128
    // — the decimation lattice ((2i+1)·n)/128 (pdqhash.rs:428-443) samples
    // disjoint pixel sets under mirroring when 128 | n; (b) Jarosz window
    // ceil(n/64) odd (pdqhash.rs:246-247) — even windows are half-pixel
    // direction-asymmetric. Natural photos blur over both; synthetic
    // hard-edged images don't.
    val dims = Array(132, 179, 187, 273, 320)
    val w = dims(r.nextInt(5))
    val h = dims(r.nextInt(5))
    val argb = new Array[Int](w * h)
    if (nearFlat) {
      // near-flat: constant colour + faint ramp ⇒ PDQ quality < 50.
      // Ramp direction/extent varies per base so different flat bases do
      // not collapse onto one identical hash quite as often (reference
      // semantics still group them at distance 0 when they do).
      val base = 90 + r.nextInt(80)
      val horiz = r.nextBoolean()
      val levels = 2 + r.nextInt(3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val t = if (horiz) (x * levels) / w else (y * levels) / h
          val v = base + t
          argb(y * w + x) = pack(v, v, v)
          x += 1
        }
        y += 1
      }
      return DecodedImage(w, h, argb)
    }
    val family = r.nextInt(5)
    family match {
      case 0 => // angled linear gradient between two colours
        val c0 = Array.fill(3)(r.nextInt(256)); val c1 = Array.fill(3)(r.nextInt(256))
        val ang = r.nextDouble() * math.Pi
        val (dx, dy) = (math.cos(ang), math.sin(ang))
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val t = ((x * dx + y * dy) / (w * math.abs(dx) + h * math.abs(dy) + 1e-9) + 1.0) / 2.0
            argb(y * w + x) = pack(
              (c0(0) + t * (c1(0) - c0(0))).toInt,
              (c0(1) + t * (c1(1) - c0(1))).toInt,
              (c0(2) + t * (c1(2) - c0(2))).toInt)
            x += 1
          }
          y += 1
        }
        distinctify(argb, w, h, r)
      case 1 => // checkerboard — big cells (≥ dim/6) and moderate contrast:
        // a full-contrast hard-edged board is 100% edges at one frequency,
        // the pathological case for every blur-based perceptual hash (the
        // rescale blur-window phase shift alone flips >40 bits). Keeping the
        // board amplitude under the fractal-noise floor keeps the spectrum
        // photo-like while the board stays clearly visible.
        val cell = math.max(w, h) / 6 + r.nextInt(16)
        val c0 = Array.fill(3)(60 + r.nextInt(136))
        val c1 = c0.map(v => clamp(v + r.nextInt(121) - 60))
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val c = if (((x / cell) + (y / cell)) % 2 == 0) c0 else c1
            argb(y * w + x) = pack(c(0), c(1), c(2))
            x += 1
          }
          y += 1
        }
      case 2 => // coarse value noise, bilinear-interpolated 9×9 grid
        val gn = 9
        val grid = Array.fill(gn * gn * 3)(r.nextInt(256))
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val gx = x.toDouble * (gn - 1) / w; val gy = y.toDouble * (gn - 1) / h
            val x0 = gx.toInt; val y0 = gy.toInt
            val fx = gx - x0; val fy = gy - y0
            val px = new Array[Int](3)
            var c = 0
            while (c < 3) {
              val v00 = grid((y0 * gn + x0) * 3 + c)
              val v10 = grid((y0 * gn + math.min(x0 + 1, gn - 1)) * 3 + c)
              val v01 = grid((math.min(y0 + 1, gn - 1) * gn + x0) * 3 + c)
              val v11 = grid((math.min(y0 + 1, gn - 1) * gn + math.min(x0 + 1, gn - 1)) * 3 + c)
              px(c) = ((v00 * (1 - fx) + v10 * fx) * (1 - fy) + (v01 * (1 - fx) + v11 * fx) * fy).toInt
              c += 1
            }
            argb(y * w + x) = pack(px(0), px(1), px(2))
            x += 1
          }
          y += 1
        }
      case 3 => // shapes over a gradient
        val bg0 = r.nextInt(256); val bg1 = r.nextInt(256)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = bg0 + (bg1 - bg0) * y / h
            argb(y * w + x) = pack(v, v, (v + 60) % 256)
            x += 1
          }
          y += 1
        }
        val nShapes = 3 + r.nextInt(5)
        var s = 0
        while (s < nShapes) {
          val cx = r.nextInt(w); val cy = r.nextInt(h)
          val rad = 10 + r.nextInt(math.min(w, h) / 3)
          val col = (r.nextInt(256), r.nextInt(256), r.nextInt(256))
          val circle = r.nextBoolean()
          var yy = math.max(cy - rad, 0)
          while (yy < math.min(cy + rad, h)) {
            var xx = math.max(cx - rad, 0)
            while (xx < math.min(cx + rad, w)) {
              val inside = if (circle)
                (xx - cx) * (xx - cx) + (yy - cy) * (yy - cy) <= rad * rad
              else true
              if (inside) argb(yy * w + xx) = pack(col._1, col._2, col._3)
              xx += 1
            }
            yy += 1
          }
          s += 1
        }
      case _ => // sinusoidal interference pattern
        val f1 = 2 + r.nextInt(8); val f2 = 2 + r.nextInt(8)
        val ph = r.nextDouble() * math.Pi * 2
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = 128 + (127 * math.sin(f1 * math.Pi * x / w + ph) *
              math.cos(f2 * math.Pi * y / h)).toInt
            argb(y * w + x) = pack(v, 40 + v * 3 / 4, 255 - v)
            x += 1
          }
          y += 1
        }
        distinctify(argb, w, h, r)
    }
    fractalNoise(argb, w, h, r)
    normalizeContrast(argb)
    DecodedImage(w, h, argb)
  }

  // --- pixel-domain transforms (the fixtures the dihedral hashes must match) ---

  def rotate90(d: DecodedImage): DecodedImage = {
    val out = new Array[Int](d.w * d.h)
    val (nw, nh) = (d.h, d.w)
    var y = 0
    while (y < d.h) {
      var x = 0
      while (x < d.w) { out(x * nw + (nw - 1 - y)) = d.argb(y * d.w + x); x += 1 }
      y += 1
    }
    DecodedImage(nw, nh, out)
  }
  def rotate180(d: DecodedImage): DecodedImage = {
    val out = new Array[Int](d.w * d.h)
    var i = 0
    while (i < out.length) { out(out.length - 1 - i) = d.argb(i); i += 1 }
    DecodedImage(d.w, d.h, out)
  }
  def rotate270(d: DecodedImage): DecodedImage = rotate90(rotate180(d))
  def flipH(d: DecodedImage): DecodedImage = {
    val out = new Array[Int](d.w * d.h)
    var y = 0
    while (y < d.h) {
      var x = 0
      while (x < d.w) { out(y * d.w + (d.w - 1 - x)) = d.argb(y * d.w + x); x += 1 }
      y += 1
    }
    DecodedImage(d.w, d.h, out)
  }
  def flipV(d: DecodedImage): DecodedImage = {
    val out = new Array[Int](d.w * d.h)
    var y = 0
    while (y < d.h) {
      System.arraycopy(d.argb, y * d.w, out, (d.h - 1 - y) * d.w, d.w)
      y += 1
    }
    DecodedImage(d.w, d.h, out)
  }

  /** Fractional area-average downscale per channel — the Kaanapali fixture
    * recipe is `magick -resize 1280x720` ≈ 0.56×; exact 0.5× phase-locks
    * onto checkerboard cells and aliases. */
  def resizeScale(d: DecodedImage, scale: Double): DecodedImage = {
    val nw = math.max((d.w * scale).toInt, 1)
    val nh = math.max((d.h * scale).toInt, 1)
    val planes = Array.ofDim[Float](3, d.w * d.h)
    var i = 0
    while (i < d.argb.length) {
      val p = d.argb(i)
      planes(0)(i) = ((p >> 16) & 0xff).toFloat
      planes(1)(i) = ((p >> 8) & 0xff).toFloat
      planes(2)(i) = (p & 0xff).toFloat
      i += 1
    }
    val res = planes.map(pl => graft.kernel.Pdq.boxResize(pl, d.w, d.h, nw, nh))
    val out = new Array[Int](nw * nh)
    i = 0
    while (i < out.length) {
      out(i) = pack(math.round(res(0)(i)), math.round(res(1)(i)), math.round(res(2)(i)))
      i += 1
    }
    DecodedImage(nw, nh, out)
  }

  /** Remove a fractional border (the crop5 stress class — borderline for
    * PDQ, excluded from the recall denominator, FIXTURES.md §2). */
  /** Per-channel photometric transform: contrast `scale` around mid-gray
    * plus brightness `offset`, clipped to [0,255]. */
  def photometric(d: DecodedImage, scale: Double, offset: Int): DecodedImage = {
    val out = new Array[Int](d.argb.length)
    var i = 0
    while (i < out.length) {
      val p = d.argb(i)
      @inline def adj(c: Int): Int = {
        val v = math.round((c - 128) * scale + 128 + offset).toInt
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      out(i) = 0xff000000 | (adj((p >> 16) & 0xff) << 16) |
        (adj((p >> 8) & 0xff) << 8) | adj(p & 0xff)
      i += 1
    }
    DecodedImage(d.w, d.h, out)
  }

  def cropBorder(d: DecodedImage, frac: Double): DecodedImage = {
    val dx = (d.w * frac).toInt; val dy = (d.h * frac).toInt
    val nw = d.w - 2 * dx; val nh = d.h - 2 * dy
    val out = new Array[Int](nw * nh)
    var y = 0
    while (y < nh) {
      System.arraycopy(d.argb, (y + dy) * d.w + dx, out, y * nw, nw)
      y += 1
    }
    DecodedImage(nw, nh, out)
  }

  def grayRawBytes(d: DecodedImage): Array[Byte] = {
    val out = new Array[Byte](d.w * d.h)
    var i = 0
    while (i < out.length) { out(i) = graft.kernel.Pdq.luma601(d.argb(i)).toByte; i += 1 }
    out
  }

  private def phashOf(d: DecodedImage): Long = {
    val gray = d.luma601
    PHash.hashGray(gray, d.w, d.h)
  }

  /** Deterministic EXIF for a row: orientation/timestamp/GPS derived from
    * (group, variant) so the parser (kernel/Exif.scala) is exercised on
    * real JPEG bytes and round-trip-checkable (S8). */
  private[graft] def exifFor(group: Long, variant: String): graft.kernel.ExifData = {
    val orientation = (math.abs(variant.hashCode) % 8) + 1
    val epoch = 1500000000L + group * 86400L + (math.abs(variant.hashCode) % 86400)
    val dto = java.time.LocalDateTime
      .ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy:MM:dd HH:mm:ss"))
    val lat = -60.0 + (group % 120L).toDouble + 0.25
    val lon = -150.0 + ((group * 7L) % 300L).toDouble + 0.5
    graft.kernel.ExifData(Some(orientation), Some(dto),
      graft.kernel.Exif.parseExifTimestamp(dto), Some(lat), Some(lon), Map.empty)
  }

  /** Deterministic opaque bytes (LCG over the id hash) standing in for a
    * coded payload no JVM codec can decode — unique per id so content
    * hashes differ, never decodable or magic-byte-sniffed. */
  private def opaquePayload(id: String, n: Int): Array[Byte] = {
    var x = id.hashCode.toLong * 6364136223846793005L + 1442695040888963407L
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >> 33).toByte
    }
  }

  private def encRow(id: String, d: DecodedImage, fmt: String, cap: String,
                     group: Long, variant: String): SynthRow = {
    def tiffExif = {
      val ex = exifFor(group, variant)
      graft.kernel.TiffExif(ex.orientation.get, ex.dateTimeOriginal.get,
        ex.lat, ex.lon)
    }
    val bytes = fmt match {
      case "png" => ImageCodec.encodePng(d)
      case "jpg" | "jpg90" =>
        val jpeg = ImageCodec.encodeJpeg(d, if (fmt == "jpg") 0.70f else 0.90f)
        val ex = exifFor(group, variant)
        graft.kernel.Exif.spliceIntoJpeg(jpeg, graft.kernel.Exif.buildApp1(
          ex.orientation.get, ex.dateTimeOriginal.get, ex.lat, ex.lon))
      // TIFF rows carry EXIF in the TIFF IFD itself (no APP1 wrapper) —
      // the container-aware parse path (Exif.fromBytes) on real bytes
      case "tiff" => graft.kernel.Tiff.encode(d, 8, Some(tiffExif))
      case "tiff16" => graft.kernel.Tiff.encode(
        graft.kernel.Tiff.with16BitJitter(d), 16, Some(tiffExif))
      // RAW container: TIFF header + EXIF tags + a small thumbnail strip,
      // then the full-size embedded JPEG preview the decode tier extracts
      case "nef" =>
        val thumb = resizeScale(d, 16.0 / math.max(d.w, d.h))
        graft.kernel.Tiff.encodeRawContainer(thumb,
          ImageCodec.encodeJpeg(d, 0.90f), Some(tiffExif))
      case "gray-raw" => grayRawBytes(d)
      // PDF wrapping one image XObject (the decode tier's renderer-free
      // target shape): DCT = a literal JPEG payload; every third group a
      // FlateDecode raster with the PNG Up predictor (lossless pixels,
      // different bytes) so both filter paths flow through the pipeline
      // HEIC shell: real ISOBMFF metadata (ispe dims + Exif item — S7/S8
      // tiers on real container bytes) around an opaque payload the decode
      // tier honestly reports `unsupported` for (no JVM HEVC codec).
      // Alternating iloc construction methods: absolute file offsets
      // (cameras) and idat-relative (some editors).
      case "heic" =>
        val ex = exifFor(group, variant)
        val app1 = graft.kernel.Exif.buildApp1(ex.orientation.get,
          ex.dateTimeOriginal.get, ex.lat, ex.lon)
        // strip the APP1 marker+len: the ExifDataBlock payload is
        // "Exif  " + TIFF
        val exifPayload = java.util.Arrays.copyOfRange(app1, 4, app1.length)
        graft.kernel.Isobmff.encodeHeicShell(d.w, d.h, Some(exifPayload),
          opaquePayload(id, 256), exifInIdat = group % 2 == 1)
      // JXL container: real SizeHeader dims + Exif box (S7/S8 on real
      // container bytes) around an opaque codestream tail — same honesty
      // contract as the HEIC shell (no JVM JXL codec).
      case "jxl" =>
        val ex = exifFor(group, variant)
        val app1 = graft.kernel.Exif.buildApp1(ex.orientation.get,
          ex.dateTimeOriginal.get, ex.lat, ex.lon)
        val exifPayload = java.util.Arrays.copyOfRange(app1, 4, app1.length)
        graft.kernel.Isobmff.encodeJxlContainer(d.w, d.h, Some(exifPayload),
          opaquePayload(id, 256))
      // WebP lossless (VP8X + EXIF + VP8L): REAL pixels through the
      // pure-JVM VP8L tier — same pixels as the orig, so it groups via
      // PDQ dist 0 AND shares the PNG rows' pixel hash (the cross-format
      // exact-dup axis). The encoder feature path cycles per group so all
      // five VP8L modes (literals / subtract-green+LZ77+cache+meta /
      // palette / predictor / color-transform) appear in the corpus.
      case "webp" =>
        val ex = exifFor(group, variant)
        val app1 = graft.kernel.Exif.buildApp1(ex.orientation.get,
          ex.dateTimeOriginal.get, ex.lat, ex.lon)
        val exifPayload = java.util.Arrays.copyOfRange(app1, 4, app1.length)
        graft.kernel.Webp.encodeVp8x(d, ((group % 5) + 5).toInt % 5, Some(exifPayload))
      // Lossy VP8 under VP8X: real dims + EXIF chunk, opaque coded body —
      // the honest-`unsupported` fixture for the codec-less VP8 slice
      // (same contract as heicmeta/jxlmeta).
      case "webplossy" =>
        val ex = exifFor(group, variant)
        val app1 = graft.kernel.Exif.buildApp1(ex.orientation.get,
          ex.dateTimeOriginal.get, ex.lat, ex.lon)
        val exifPayload = java.util.Arrays.copyOfRange(app1, 4, app1.length)
        graft.kernel.Webp.encodeLossyStub(d.w, d.h, opaquePayload(id, 256),
          Some(exifPayload))
      // Animated lossless WebP (~4% of bases): VP8X ANIM + two ANMF
      // frames, each a full VP8L codestream; frame 1 = the base pixels
      // (the decode tier returns frame 1 on the canvas, so it groups at
      // dist 0), frame 2 = the 180-rotation (real multi-frame container).
      case "webpanim" =>
        val ex = exifFor(group, variant)
        val app1 = graft.kernel.Exif.buildApp1(ex.orientation.get,
          ex.dateTimeOriginal.get, ex.lat, ex.lon)
        val exifPayload = java.util.Arrays.copyOfRange(app1, 4, app1.length)
        graft.kernel.Webp.encodeAnimated(Seq(d, rotate180(d)),
          ((group % 5) + 6).toInt % 5, Some(exifPayload))
      // QOI: lossless, no metadata container — groups at PDQ dist 0 and
      // shares the PNG rows' pixel hash (8-bit cross-format exact axis)
      case "qoi" => graft.kernel.SmallFormats.Qoi.encode(d)
      // farbfeld: ALWAYS 16-bit (v*257 widened) — the native deep-color
      // container whose pixel hash equals the png rows' widened stream
      case "ffeld" => graft.kernel.SmallFormats.Farbfeld.encode(d)
      // Radiance HDR: shared-exponent RGBE (~plus/minus 2/255 per channel)
      // — decodes through the RGBE tier and groups like `recompress`
      case "hdrimg" => graft.kernel.SmallFormats.Hdr.encode(d)
      // DDS uncompressed A8R8G8B8: lossless — third cross-format exact axis
      case "ddsimg" => graft.kernel.SmallFormats.Dds.encodeUncompressed(d)
      case "pdf" =>
        if (group % 3 == 0)
          graft.kernel.PdfImages.encodeImagePdf(
            graft.kernel.PdfImages.flateRgbPayload(d), d.w, d.h,
            "FlateDecode", decodeParms =
              Some(s"<< /Predictor 15 /Colors 3 /Columns ${d.w} >>"))
        else
          graft.kernel.PdfImages.encodeImagePdf(
            ImageCodec.encodeJpeg(d, 0.90f), d.w, d.h, "DCTDecode")
    }
    val storedFmt =
      if (fmt == "jpg90") "jpg" else if (fmt == "tiff16") "tiff"
      else if (fmt == "webplossy" || fmt == "webpanim") "webp"
      else if (fmt == "ffeld") "ff"
      else if (fmt == "hdrimg") "hdr"
      else if (fmt == "ddsimg") "dds" else fmt
    // header dims + phash come from what a reader of the *encoded* row sees
    val dec = ImageCodec.decode(bytes, storedFmt, d.w, d.h).getOrElse(d)
    SynthRow(id, bytes, d.w, d.h, storedFmt, cap, phashOf(dec),
      (id.hashCode & 0x7fffffff) % 32, group, variant)
  }

  /** All rows for one base id. Class schedule (rng-driven, FIXTURES.md §2):
    *  - ~10% near-flat bases: orig + exact copy (exact-only matching)
    *  - ~20% unrelated singletons (precision guard)
    *  - ~5%  caption-dup pairs: same caption, unrelated pixels
    *  - rest: orig + 1..4 variants from {exact, recompress, resize,
    *    rot90, rot180, rot270, fliph, flipv, gray-raw} */
  def rowsForBase(baseId: Long): Seq[SynthRow] = {
    val r = rng(baseId, 3)
    val roll = r.nextInt(100)
    val cap = caption(baseId)
    def id(v: String) = f"img-$baseId%08d-$v"
    if (roll < 10) {
      val img = baseImage(baseId, nearFlat = true)
      // byte-identical copy: same group via content-hash/exact path
      val o = encRow(id("flat"), img, "png", cap, baseId, "flat")
      Seq(o, o.copy(image_id = id("flatcopy"), variant = "flatcopy",
        part = (id("flatcopy").hashCode & 0x7fffffff) % 32))
    } else if (roll < 30) {
      Seq(encRow(id("solo"), baseImage(baseId, nearFlat = false), "png", cap, baseId, "unrelated"))
    } else if (roll < 35) {
      // two unrelated images sharing one caption (MinHash hit, PDQ reject)
      val a = baseImage(baseId, nearFlat = false)
      val b = baseImage(-baseId - 1000000, nearFlat = false)
      Seq(
        encRow(id("capA"), a, "png", cap, baseId, "caption-dup"),
        encRow(id("capB"), b, "png", cap, 2000000000L + baseId, "caption-dup"))
    } else {
      val img = baseImage(baseId, nearFlat = false)
      val orig = encRow(id("orig"), img, "png", cap, baseId, "orig")
      // periodic families (1 checkerboard, 4 sinusoid) skip the resize
      // class: resampling shifts the sampling lattice's phase against the
      // pattern and PDQ distance jumps past threshold (measured: sinusoid
      // 179×132 at 0.75 → dist 54) — reference-faithful, excluded like crop5
      val rFam = rng(baseId, 1)
      rFam.nextInt(5); rFam.nextInt(5)
      val famDraw = rFam.nextInt(5)
      val isBoard = famDraw == 1 || famDraw == 4
      val all = Vector("exact", "recompress", "resize", "rot90", "rot180",
        "rot270", "fliph", "flipv", "gray-raw", "bright", "contrast")
      val n = 1 + r.nextInt(4)
      val chosen0 = r.ints(0, all.size).distinct().limit(n).toArray.toSeq.map(all)
        .map(v => if (v == "resize" && isBoard) "recompress" else v).distinct
      // ~12% of bases also get a crop5 stress variant (may legitimately
      // miss at threshold 40; never counted in the recall denominator)
      val chosen1 = if (r.nextInt(100) < 12) chosen0 :+ "crop5" else chosen0
      // ~8%: a 16-bit TIFF of the SAME pixels (same PDQ/groups; pixel
      // hash must differ — the RGBA16 depth axis, scanner.rs:1393-1406)
      val chosen2 = if (r.nextInt(100) < 8) chosen1 :+ "tiff16" else chosen1
      // ~10%: a RAW container whose embedded JPEG preview is the image
      // (decode tier S6 + container EXIF on real bytes)
      val chosen3 = if (r.nextInt(100) < 10) chosen2 :+ "rawprev" else chosen2
      // ~8%: a PDF wrapping the image as an XObject (decode tier S4's
      // JVM-feasible slice; drawn after the round-4 classes so they keep
      // their rng stream across corpus versions)
      val chosen4 = if (r.nextInt(100) < 8) chosen3 :+ "pdfwrap" else chosen3
      // ~8%: a HEIC shell carrying real ISOBMFF metadata (ispe dims +
      // Exif item) around an opaque payload — the S7/S8 metadata tiers
      // for the env-blocked pixel codec (round 5; same rng-stability rule)
      val chosen5 = if (r.nextInt(100) < 8) chosen4 :+ "heicmeta" else chosen4
      // ~6%: a JXL container — SizeHeader dims + Exif box, opaque
      // codestream tail (round 5b; drawn LAST, same rng-stability rule)
      val chosen6 = if (r.nextInt(100) < 6) chosen5 :+ "jxlmeta" else chosen5
      // ~8%: a lossless WebP (VP8X + EXIF + VP8L) of the SAME pixels — the
      // round-5c decode tier on real bytes (drawn after jxlmeta, same
      // rng-stability rule: new classes always draw LAST)
      val chosen7 = if (r.nextInt(100) < 8) chosen6 :+ "webp" else chosen6
      // ~5%: a lossy-VP8 shell — dims + EXIF real, pixels unsupported
      val chosen8 = if (r.nextInt(100) < 5) chosen7 :+ "webplossy" else chosen7
      // ~4%: an animated lossless WebP (2 ANMF frames; frame 1 = base)
      val chosen9 = if (r.nextInt(100) < 4) chosen8 :+ "webpanim" else chosen8
      // ~5% qoi + ~4% farbfeld: the remaining image-crate fallback formats
      // with JVM-feasible codecs (scanner.rs:2278) — drawn LAST, rng rule
      val chosenA = if (r.nextInt(100) < 5) chosen9 :+ "qoi" else chosen9
      val chosenB = if (r.nextInt(100) < 4) chosenA :+ "ffeld" else chosenA
      // ~3%: Radiance HDR (RGBE, new-RLE scanlines) — lossy-ish like jpg
      val chosenC = if (r.nextInt(100) < 3) chosenB :+ "hdrimg" else chosenB
      // ~3%: uncompressed DDS — lossless, groups at dist 0
      val chosen = if (r.nextInt(100) < 3) chosenC :+ "ddsimg" else chosenC
      val vs = chosen.map {
        case "exact" => orig.copy(image_id = id("exact"), variant = "exact",
          part = (id("exact").hashCode & 0x7fffffff) % 32)
        case "recompress" => encRow(id("recompress"), img, "jpg", cap, baseId, "recompress")
        case "resize" =>
          // the Kaanapali fixture recipe (1280→720 = 0.5625) applies to
          // real-photo sizes; an already-tiny original lands near PDQ's
          // own 64×64 grid where that scale is a categorically harsher
          // transform (measured: 179px×0.5625 → dist 62) — small bases
          // get the milder 0.75
          val rs = if (math.min(img.w, img.h) >= 256) 0.5625 else 0.75
          encRow(id("resize"), resizeScale(img, rs), "jpg90",
            captionEdited(baseId, 1), baseId, "resize")
        case "rot90" => encRow(id("rot90"), rotate90(img), "png", cap, baseId, "rot90")
        case "rot180" => encRow(id("rot180"), rotate180(img), "png", cap, baseId, "rot180")
        case "rot270" => encRow(id("rot270"), rotate270(img), "png", cap, baseId, "rot270")
        case "fliph" => encRow(id("fliph"), flipH(img), "png", captionEdited(baseId, 2), baseId, "fliph")
        case "flipv" => encRow(id("flipv"), flipV(img), "png", cap, baseId, "flipv")
        case "crop5" => encRow(id("crop5"), cropBorder(img, 0.05), "jpg90",
          cap, baseId, "crop5")
        // photometric classes: PDQ drops the DC coefficient (pdqhash.rs:316
        // freq offset 1) and binarizes against the median, so brightness
        // shifts and contrast scaling are near-invariant up to clipping —
        // the lossy-variant realism axis the fixtures lack
        case "bright" => encRow(id("bright"), photometric(img, 1.0, 24), "jpg90",
          cap, baseId, "bright")
        case "contrast" => encRow(id("contrast"), photometric(img, 1.25, 0), "tiff",
          captionEdited(baseId, 3), baseId, "contrast")
        case "tiff16" => encRow(id("t16"), img, "tiff16", cap, baseId, "tiff16")
        case "rawprev" => encRow(id("raw"), img, "nef", cap, baseId, "rawprev")
        case "pdfwrap" => encRow(id("pdf"), img, "pdf", cap, baseId, "pdfwrap")
        // metadata-only row: dims + EXIF real, pixels honestly unsupported
        // — can only ever group via content hash (unique bytes → never),
        // so it is excluded from the recall denominator like crop5
        case "heicmeta" => encRow(id("heic"), img, "heic", cap, baseId, "heicmeta")
        // same metadata-only contract as heicmeta (excluded from the
        // recall denominator; dims + EXIF real, pixels unsupported)
        case "jxlmeta" => encRow(id("jxl"), img, "jxl", cap, baseId, "jxlmeta")
        // lossless — full grouping member, IN the recall denominator
        case "webp" => encRow(id("webp"), img, "webp", cap, baseId, "webp")
        // metadata-only contract (like heicmeta): excluded from recall
        case "webplossy" => encRow(id("webpl"), img, "webplossy", cap, baseId, "webplossy")
        // frame 1 == base pixels: full grouping member, IN the denominator
        case "webpanim" => encRow(id("webpa"), img, "webpanim", cap, baseId, "webpanim")
        case "qoi" => encRow(id("qoi"), img, "qoi", cap, baseId, "qoi")
        case "ffeld" => encRow(id("ff"), img, "ffeld", cap, baseId, "ffeld")
        case "hdrimg" => encRow(id("hdr"), img, "hdrimg", cap, baseId, "hdrimg")
        case "ddsimg" => encRow(id("dds"), img, "ddsimg", cap, baseId, "ddsimg")
        case "gray-raw" => encRow(id("gray"), DecodedImage(img.w, img.h,
          grayRawBytes(img).map { b => val g = b & 0xff; 0xff000000 | (g << 16) | (g << 8) | g }),
          "gray-raw", cap, baseId, "gray-raw")
      }
      orig +: vs
    }
  }

  /** Generate and write the corpus: `<dir>/images` (the input_hint-shaped
    * table, hash-partitioned by `part`) + `<dir>/truth` sidecar. */
  def generate(spark: SparkSession, nBases: Long, dir: String): Unit = {
    import spark.implicits._
    val rows = spark.range(0, nBases, 1, math.max(spark.sparkContext.defaultParallelism, 1).toInt)
      .as[Long]
      .mapPartitions(_.flatMap(rowsForBase))
    rows.cache()
    rows.select($"image_id", $"bytes", $"w", $"h", $"fmt", $"caption", $"phash", $"part")
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/images")
    rows.select($"image_id", $"group_id", $"variant")
      .write.mode("overwrite").parquet(s"$dir/truth")
    rows.unpersist()
    // mix provenance sidecar: corpora outlive code revisions behind their
    // _SUCCESS markers, so the recipe travels with the data (Bench embeds
    // it in BENCH_r{N} JSON)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mixOut = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_mix"), true)
    mixOut.write(("synth rowsForBase r5h: ~10% flat, ~20% unrelated, " +
      "~5% caption-dup, rest orig+1..4 variants (exif jpg/tiff) + ~8% tiff16 " +
      "+ ~10% raw-preview + ~8% pdfwrap (DCT/Flate) + ~8% heicmeta " +
      "(ISOBMFF metadata shell) + ~6% jxlmeta (JXL container) + ~8% webp " +
      "(VP8X+EXIF+VP8L lossless) + ~5% webplossy (VP8 shell) + ~4% " +
      "webpanim (2-frame ANMF lossless) + ~5% qoi + ~4% farbfeld " +
      "(native 16-bit) + ~3% hdrimg (RGBE) + ~3% ddsimg " +
      "(uncompressed DDS)").getBytes("UTF-8"))
    mixOut.close()
  }

  /** images table reader (drops the partition column). */
  def readImages(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/images")
      .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")

  /** In-memory images frame for base ids [from, until) — input_hint
    * schema, distributed synthesis (bench/delta tooling). */
  def imagesDF(spark: SparkSession, from: Long, until: Long): DataFrame = {
    import spark.implicits._
    spark.range(from, until, 1,
        math.max(spark.sparkContext.defaultParallelism, 1).toInt)
      .as[Long]
      .mapPartitions(_.flatMap(rowsForBase))
      .select($"image_id", $"bytes", $"w", $"h", $"fmt", $"caption", $"phash")
  }
}
