package graft.kernel

/**
 * Small-format decode tiers (S2/S5): the reference's extension list names
 * qoi / pnm / ff (farbfeld) / ico among its image-crate fallback formats
 * (scanner.rs:2278, 713-735); the JVM has no codec for any of them, but
 * each is a tiny public fixed layout, so — like the WebP/PDF tiers — the
 * feasible slice is implemented from the spec:
 *
 *  - QOI (qoiformat.org spec): full decode + encode — run/index/diff/luma
 *    ops, the 64-slot color index, 3- and 4-channel headers.
 *  - PNM (netpbm): P5 gray / P6 RGB, binary, maxval ≤ 255 one byte per
 *    sample, > 255 two BE bytes per sample — a native 16-bit source that
 *    feeds the rgba16 pixel-hash path like 16-bit TIFF.
 *  - farbfeld (suckless spec): 8-byte magic + BE32 dims + BE16 RGBA —
 *    ALWAYS 16-bit, the simplest native deep-color container.
 *  - ICO: entry directory -> largest icon; PNG-flavored entries decode
 *    via ImageIO, BMP-flavored (doubled-height BITMAPINFOHEADER) are
 *    parsed directly at 32/24 bpp with the 1-bit AND mask applied.
 *
 *  - Radiance HDR (RGBE): flat and new-RLE scanlines, shared-exponent
 *    float -> clamp [0,1] -> u16 (the image-crate Rgb32F -> to_rgba16
 *    display conversion the reference hashes).
 *
 * DDS / EXR stay honest `unsupported` (block-compressed / half-float
 * formats whose faithful decode needs real texture/color pipelines).
 */
object SmallFormats {

  // ---------------- QOI ----------------

  object Qoi {
    def looks(b: Array[Byte]): Boolean =
      b.length >= 14 && b(0) == 'q' && b(1) == 'o' && b(2) == 'i' && b(3) == 'f'

    def headerDims(b: Array[Byte]): Option[(Int, Int)] =
      if (!looks(b)) None
      else Some((be32(b, 4), be32(b, 8)))

    def decode(b: Array[Byte]): Option[DecodedImage] = {
      if (!looks(b)) return None
      val w = be32(b, 4)
      val h = be32(b, 8)
      val channels = b(12) & 0xff
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024 ||
        (channels != 3 && channels != 4)) return None
      val n = w * h
      val out = new Array[Int](n)
      val index = new Array[Int](64)
      var r = 0; var g = 0; var bl = 0; var a = 255
      var p = 14
      var i = 0
      @inline def hash(): Int = (r * 3 + g * 5 + bl * 7 + a * 11) % 64
      while (i < n) {
        if (p >= b.length) return None
        val op = b(p) & 0xff
        p += 1
        if (op == 0xfe) { // RGB
          if (p + 3 > b.length) return None
          r = b(p) & 0xff; g = b(p + 1) & 0xff; bl = b(p + 2) & 0xff; p += 3
        } else if (op == 0xff) { // RGBA
          if (p + 4 > b.length) return None
          r = b(p) & 0xff; g = b(p + 1) & 0xff; bl = b(p + 2) & 0xff
          a = b(p + 3) & 0xff; p += 4
        } else (op >> 6) match {
          case 0 => // INDEX
            val v = index(op & 0x3f)
            a = v >>> 24; r = (v >> 16) & 0xff; g = (v >> 8) & 0xff; bl = v & 0xff
          case 1 => // DIFF
            r = (r + ((op >> 4) & 3) - 2) & 0xff
            g = (g + ((op >> 2) & 3) - 2) & 0xff
            bl = (bl + (op & 3) - 2) & 0xff
          case 2 => // LUMA
            if (p >= b.length) return None
            val dg = (op & 0x3f) - 32
            val b2 = b(p) & 0xff; p += 1
            g = (g + dg) & 0xff
            r = (r + dg + ((b2 >> 4) & 0xf) - 8) & 0xff
            bl = (bl + dg + (b2 & 0xf) - 8) & 0xff
          case _ => // RUN (op 0xfe/0xff already handled)
            val run = (op & 0x3f) + 1
            if (i + run > n) return None
            val px = (a << 24) | (r << 16) | (g << 8) | bl
            var k = 0
            while (k < run) { out(i + k) = px; k += 1 }
            index(hash()) = px
            i += run - 1 // the shared pixel-store below adds the last one
            // fall through: out(i) already set; store once more harmlessly
        }
        val px = (a << 24) | (r << 16) | (g << 8) | bl
        out(i) = px
        index(hash()) = px
        i += 1
      }
      Some(DecodedImage(w, h, out))
    }

    def encode(d: DecodedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(14 + d.argb.length)
      out.write('q'); out.write('o'); out.write('i'); out.write('f')
      writeBe32(out, d.w); writeBe32(out, d.h)
      val hasAlpha = d.argb.exists(p => (p >>> 24) != 0xff)
      out.write(if (hasAlpha) 4 else 3)
      out.write(0) // sRGB
      val index = new Array[Int](64)
      var prev = 0xff000000
      var i = 0
      val n = d.argb.length
      while (i < n) {
        val px = d.argb(i)
        if (px == prev) {
          var run = 1
          while (run < 62 && i + run < n && d.argb(i + run) == px) run += 1
          out.write(0xc0 | (run - 1))
          i += run
        } else {
          val a = px >>> 24; val r = (px >> 16) & 0xff
          val g = (px >> 8) & 0xff; val bl = px & 0xff
          val h = (r * 3 + g * 5 + bl * 7 + a * 11) % 64
          if (index(h) == px) out.write(h)
          else {
            index(h) = px
            val pa = prev >>> 24
            if (a == pa) {
              val dr = ((r - ((prev >> 16) & 0xff)) << 24) >> 24
              val dg = ((g - ((prev >> 8) & 0xff)) << 24) >> 24
              val db = ((bl - (prev & 0xff)) << 24) >> 24
              if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
                out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
              else if (dg >= -32 && dg <= 31 && dr - dg >= -8 && dr - dg <= 7 &&
                db - dg >= -8 && db - dg <= 7) {
                out.write(0x80 | (dg + 32))
                out.write(((dr - dg + 8) << 4) | (db - dg + 8))
              } else {
                out.write(0xfe); out.write(r); out.write(g); out.write(bl)
              }
            } else {
              out.write(0xff); out.write(r); out.write(g); out.write(bl); out.write(a)
            }
          }
          prev = px
          i += 1
        }
      }
      var k = 0
      while (k < 7) { out.write(0); k += 1 }
      out.write(1)
      out.toByteArray
    }
  }

  // ---------------- PNM (P5 / P6, binary) ----------------

  object Pnm {
    def looks(b: Array[Byte]): Boolean =
      b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6')

    /** (w, h, maxval, dataOffset, isGray) after whitespace/comment skip. */
    private def header(b: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] = {
      if (!looks(b)) return None
      var p = 2
      def token(): Option[Int] = {
        while (p < b.length &&
          (b(p) == ' ' || b(p) == '\t' || b(p) == '\n' || b(p) == '\r' || b(p) == '#')) {
          if (b(p) == '#') { while (p < b.length && b(p) != '\n') p += 1 }
          else p += 1
        }
        var v = 0
        var any = false
        while (p < b.length && b(p) >= '0' && b(p) <= '9') {
          v = v * 10 + (b(p) - '0'); p += 1; any = true
          if (v > (1 << 26)) return None
        }
        if (any) Some(v) else None
      }
      for {
        w <- token(); h <- token(); mx <- token()
        if p < b.length // single whitespace before data
      } yield { p += 1; (w, h, mx, p, b(1) == '5') }
    }

    def headerDims(b: Array[Byte]): Option[(Int, Int)] =
      header(b).map { case (w, h, _, _, _) => (w, h) }

    def decode(b: Array[Byte]): Option[DecodedImage] =
      header(b).flatMap { case (w, h, mx, off, gray) =>
        if (w <= 0 || h <= 0 || mx <= 0 || mx > 65535 ||
          w.toLong * h > 64L * 1024 * 1024) return None
        val n = w * h
        val samplesPerPx = if (gray) 1 else 3
        val bytesPerSample = if (mx > 255) 2 else 1
        if (off + n.toLong * samplesPerPx * bytesPerSample > b.length) return None
        val argb = new Array[Int](n)
        val rgba16 = if (bytesPerSample == 2) new Array[Short](n * 4) else null
        var i = 0
        var p = off
        @inline def sample(): Int =
          if (bytesPerSample == 1) { val v = b(p) & 0xff; p += 1; v }
          else { val v = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff); p += 2; v }
        while (i < n) {
          val (r16, g16, b16) =
            if (gray) { val v = sample(); (v, v, v) }
            else (sample(), sample(), sample())
          // scale to full range (the netpbm maxval semantics)
          @inline def to8(v: Int): Int = (v * 255 + mx / 2) / mx
          argb(i) = 0xff000000 | (to8(r16) << 16) | (to8(g16) << 8) | to8(b16)
          if (rgba16 != null) {
            @inline def to16(v: Int): Short = ((v.toLong * 65535 + mx / 2) / mx).toShort
            rgba16(4 * i) = to16(r16); rgba16(4 * i + 1) = to16(g16)
            rgba16(4 * i + 2) = to16(b16); rgba16(4 * i + 3) = -1 // 0xffff
          }
          i += 1
        }
        Some(DecodedImage(w, h, argb, rgba16))
      }

    /** P6 (maxval 255) from argb, or P5 gray when `gray`. */
    def encode(d: DecodedImage, gray: Boolean = false): Array[Byte] = {
      val hdr = s"P${if (gray) 5 else 6}\n${d.w} ${d.h}\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](hdr.length + d.argb.length * (if (gray) 1 else 3))
      System.arraycopy(hdr, 0, out, 0, hdr.length)
      var i = 0
      var p = hdr.length
      while (i < d.argb.length) {
        val px = d.argb(i)
        if (gray) { out(p) = (Pdq.luma601(px) & 0xff).toByte; p += 1 }
        else {
          out(p) = ((px >> 16) & 0xff).toByte
          out(p + 1) = ((px >> 8) & 0xff).toByte
          out(p + 2) = (px & 0xff).toByte
          p += 3
        }
        i += 1
      }
      out
    }
  }

  // ---------------- farbfeld ----------------

  object Farbfeld {
    def looks(b: Array[Byte]): Boolean =
      b.length >= 16 && b(0) == 'f' && b(1) == 'a' && b(2) == 'r' && b(3) == 'b' &&
        b(4) == 'f' && b(5) == 'e' && b(6) == 'l' && b(7) == 'd'

    def headerDims(b: Array[Byte]): Option[(Int, Int)] =
      if (!looks(b)) None else Some((be32(b, 8), be32(b, 12)))

    def decode(b: Array[Byte]): Option[DecodedImage] = {
      if (!looks(b)) return None
      val w = be32(b, 8)
      val h = be32(b, 12)
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      val n = w * h
      if (16 + n.toLong * 8 > b.length) return None
      val argb = new Array[Int](n)
      val rgba16 = new Array[Short](n * 4) // native 16-bit: the rgba16 hash path
      var i = 0
      while (i < n) {
        val p = 16 + i * 8
        val r = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
        val g = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        val bl = ((b(p + 4) & 0xff) << 8) | (b(p + 5) & 0xff)
        val a = ((b(p + 6) & 0xff) << 8) | (b(p + 7) & 0xff)
        rgba16(4 * i) = r.toShort; rgba16(4 * i + 1) = g.toShort
        rgba16(4 * i + 2) = bl.toShort; rgba16(4 * i + 3) = a.toShort
        argb(i) = ((a >> 8) << 24) | ((r >> 8) << 16) | ((g >> 8) << 8) | (bl >> 8)
        i += 1
      }
      Some(DecodedImage(w, h, argb, rgba16))
    }

    /** 8-bit source widened v -> v*257 (the image-crate u8->u16 convention,
      * scanner.rs:1393-1406), so a farbfeld of the same pixels shares the
      * PNG rows' rgba16 pixel hash — the 16-bit cross-format exact axis. */
    def encode(d: DecodedImage): Array[Byte] = {
      val out = new Array[Byte](16 + d.argb.length * 8)
      "farbfeld".getBytes("US-ASCII").copyToArray(out)
      writeBe32At(out, 8, d.w); writeBe32At(out, 12, d.h)
      var i = 0
      while (i < d.argb.length) {
        val px = d.argb(i)
        val p = 16 + i * 8
        @inline def put(off: Int, v8: Int): Unit = {
          out(p + off) = v8.toByte; out(p + off + 1) = v8.toByte // v*257 BE
        }
        put(0, (px >> 16) & 0xff); put(2, (px >> 8) & 0xff)
        put(4, px & 0xff); put(6, px >>> 24)
        i += 1
      }
      out
    }
  }

  // ---------------- ICO ----------------

  object Ico {
    def looks(b: Array[Byte]): Boolean =
      b.length >= 6 && b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0 &&
        le16(b, 4) > 0

    /** Directory entries: (w, h, offset, size), 0-dims meaning 256. */
    private def entries(b: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
      if (!looks(b)) return Nil
      val count = le16(b, 4)
      (0 until math.min(count, 64)).flatMap { i =>
        val e = 6 + 16 * i
        if (e + 16 > b.length) None
        else {
          val w = if ((b(e) & 0xff) == 0) 256 else b(e) & 0xff
          val h = if ((b(e + 1) & 0xff) == 0) 256 else b(e + 1) & 0xff
          val size = le32(b, e + 8)
          val off = le32(b, e + 12)
          if (off < 0 || size <= 0 || off.toLong + size > b.length) None
          else Some((w, h, off, size))
        }
      }
    }

    def headerDims(b: Array[Byte]): Option[(Int, Int)] =
      entries(b).sortBy { case (w, h, _, _) => -(w * h) }.headOption
        .map { case (w, h, _, _) => (w, h) }

    /** Decode the LARGEST entry (the RAW-preview contract): PNG-flavored
      * entries via ImageIO, BMP-flavored (doubled-height header, bottom-up
      * rows, optional 1-bit AND mask) at 32/24 bpp. */
    def decode(b: Array[Byte]): Option[DecodedImage] = {
      entries(b).sortBy { case (w, h, _, _) => -(w * h) }.view.flatMap {
        case (_, _, off, size) =>
          if (size >= 8 && (b(off) & 0xff) == 0x89 && b(off + 1) == 'P')
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b, off, size)))
              .map(ImageCodec.fromBuffered)
          else decodeBmpEntry(b, off, size)
      }.headOption
    }

    private def decodeBmpEntry(b: Array[Byte], off: Int, size: Int): Option[DecodedImage] = {
      if (size < 40 || le32(b, off) != 40) return None // BITMAPINFOHEADER only
      val w = le32(b, off + 4)
      val doubled = le32(b, off + 8)
      val h = doubled / 2 // XOR + AND masks stacked
      val bpp = le16(b, off + 14)
      val compression = le32(b, off + 16)
      if (w <= 0 || h <= 0 || w > 1024 || h > 1024 || compression != 0 ||
        (bpp != 32 && bpp != 24)) return None
      val xorRow = (w * bpp / 8 + 3) & ~3
      val andRow = ((w + 31) / 32) * 4
      val xorBase = off + 40
      if (xorBase + xorRow.toLong * h > b.length) return None
      val andBase = xorBase + xorRow * h
      val hasAnd = andBase + andRow.toLong * h <= off + size
      val argb = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val srcRow = xorBase + (h - 1 - y) * xorRow // bottom-up
        var x = 0
        while (x < w) {
          val p = srcRow + x * (bpp / 8)
          val bl = b(p) & 0xff
          val g = b(p + 1) & 0xff
          val r = b(p + 2) & 0xff
          var a = if (bpp == 32) b(p + 3) & 0xff else 0xff
          if (bpp == 24 && hasAnd) {
            val andByte = b(andBase + (h - 1 - y) * andRow + x / 8) & 0xff
            if (((andByte >> (7 - (x % 8))) & 1) == 1) a = 0
          }
          argb(y * w + x) = (a << 24) | (r << 16) | (g << 8) | bl
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(w, h, argb))
    }

    /** ICO wrapping one PNG-flavored entry (the modern writer shape). */
    def encodePng(d: DecodedImage): Array[Byte] = {
      require(d.w <= 256 && d.h <= 256, "ICO entries cap at 256px")
      val png = ImageCodec.encodePng(d)
      val out = new Array[Byte](6 + 16 + png.length)
      out(2) = 1 // type icon
      out(4) = 1 // one entry
      out(6) = (d.w & 0xff).toByte // 256 -> 0
      out(7) = (d.h & 0xff).toByte
      writeLe32At(out, 14, png.length)
      writeLe32At(out, 18, 22)
      System.arraycopy(png, 0, out, 22, png.length)
      out
    }
  }

  // ---------------- Radiance HDR (RGBE) ----------------

  object Hdr {
    def looks(b: Array[Byte]): Boolean =
      b.length >= 10 && b(0) == '#' && b(1) == '?' // "#?RADIANCE" / "#?RGBE"

    /** (w, h, dataOffset) from the header + standard "-Y h +X w" line. */
    private def header(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (!looks(b)) return None
      var p = 0
      def line(): Option[String] = {
        val start = p
        while (p < b.length && b(p) != '\n') p += 1
        if (p >= b.length) None
        else { val s = new String(b, start, p - start, "US-ASCII"); p += 1; Some(s) }
      }
      line() // magic
      var l = line()
      var guard = 0
      while (l.exists(_.nonEmpty) && guard < 64) { l = line(); guard += 1 }
      line().flatMap { res =>
        val m = "-Y (\\d+) \\+X (\\d+)".r.findFirstMatchIn(res)
        m.map(g => (g.group(2).toInt, g.group(1).toInt, p))
      }
    }

    def headerDims(b: Array[Byte]): Option[(Int, Int)] =
      header(b).map { case (w, h, _) => (w, h) }

    /** RGBE scanlines (flat or new-RLE) -> linear float -> clamp [0,1] ->
      * u16 (the image-crate Rgb32F -> to_rgba16 display conversion, the
      * buffer scanner.rs:1393-1406 hashes) + 8-bit argb. */
    def decode(b: Array[Byte]): Option[DecodedImage] =
      header(b).flatMap { case (w, h, off) =>
        if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
        val n = w * h
        val argb = new Array[Int](n)
        val rgba16 = new Array[Short](n * 4)
        var p = off
        val row = new Array[Byte](w * 4) // interleaved RGBE for one scanline
        var y = 0
        while (y < h) {
          if (p + 4 > b.length) return None
          val newRle = (b(p) & 0xff) == 2 && (b(p + 1) & 0xff) == 2 &&
            ((((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)) == w) && w >= 8 && w < 0x8000
          if (newRle) {
            p += 4
            var c = 0
            while (c < 4) { // four component planes, RLE
              var x = 0
              while (x < w) {
                if (p >= b.length) return None
                val cnt = b(p) & 0xff; p += 1
                if (cnt > 128) { // run
                  if (p >= b.length || x + (cnt - 128) > w) return None
                  val v = b(p); p += 1
                  var k = 0
                  while (k < cnt - 128) { row(4 * (x + k) + c) = v; k += 1 }
                  x += cnt - 128
                } else { // literals
                  if (cnt == 0 || p + cnt > b.length || x + cnt > w) return None
                  var k = 0
                  while (k < cnt) { row(4 * (x + k) + c) = b(p + k); k += 1 }
                  p += cnt
                  x += cnt
                }
              }
              c += 1
            }
          } else {
            if (p + w * 4 > b.length) return None
            System.arraycopy(b, p, row, 0, w * 4)
            p += w * 4
          }
          var x = 0
          while (x < w) {
            val e = row(4 * x + 3) & 0xff
            val i = y * w + x
            if (e == 0) {
              argb(i) = 0xff000000
              rgba16(4 * i + 3) = -1
            } else {
              val scale = ExpTable(e)
              @inline def comp(c: Int): Int = {
                val f = (row(4 * x + c) & 0xff) * scale
                val cl = if (f < 0) 0.0 else if (f > 1) 1.0 else f
                (cl * 65535.0 + 0.5).toInt
              }
              val r = comp(0); val g = comp(1); val bl = comp(2)
              rgba16(4 * i) = r.toShort; rgba16(4 * i + 1) = g.toShort
              rgba16(4 * i + 2) = bl.toShort; rgba16(4 * i + 3) = -1
              argb(i) = 0xff000000 | ((r >> 8) << 16) | ((g >> 8) << 8) | (bl >> 8)
            }
            x += 1
          }
          y += 1
        }
        Some(DecodedImage(w, h, argb, rgba16))
      }

    /** 2^(e-136) for each exponent byte — hoisted out of the per-pixel
      * loop (math.pow per pixel measured 4.4 ms/img on the canary). */
    private val ExpTable: Array[Double] =
      Array.tabulate(256)(e => math.pow(2.0, e - 128 - 8))

    /** Encode 8-bit argb as new-RLE RGBE (v/255 linear, shared exponent).
      * Lossy by construction (~±2/255 on non-max channels): an hdr of the
      * same pixels groups like `recompress`, not via pixel hash. */
    def encode(d: DecodedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(64 + d.argb.length * 4)
      out.write("#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n".getBytes("US-ASCII"))
      out.write(s"-Y ${d.h} +X ${d.w}\n".getBytes("US-ASCII"))
      val w = d.w
      val useRle = w >= 8 && w < 0x8000
      val row = new Array[Byte](w * 4)
      var y = 0
      while (y < d.h) {
        var x = 0
        while (x < w) {
          val px = d.argb(y * w + x)
          val r = ((px >> 16) & 0xff) / 255.0
          val g = ((px >> 8) & 0xff) / 255.0
          val bl = (px & 0xff) / 255.0
          val mx = math.max(r, math.max(g, bl))
          if (mx < 1e-9) { row(4 * x) = 0; row(4 * x + 1) = 0; row(4 * x + 2) = 0; row(4 * x + 3) = 0 }
          else {
            val e = math.getExponent(mx) + 1 // frexp: mx = m * 2^e, m in [0.5,1)
            val s2 = math.pow(2.0, 8 - e) // c = round(v * 2^(8-e)), decode multiplies 2^(e-8)
            @inline def q(v: Double): Byte = {
              val c = (v * s2 + 0.5).toInt
              (if (c > 255) 255 else c).toByte
            }
            row(4 * x) = q(r); row(4 * x + 1) = q(g); row(4 * x + 2) = q(bl)
            row(4 * x + 3) = (e + 128).toByte
          }
          x += 1
        }
        if (useRle) {
          out.write(2); out.write(2); out.write((w >> 8) & 0xff); out.write(w & 0xff)
          var c = 0
          while (c < 4) {
            var x2 = 0
            while (x2 < w) {
              // find a run of >= 4 identical bytes, else emit literals
              var runStart = x2
              var found = false
              while (runStart < w && !found) {
                var rl = 1
                while (runStart + rl < w && rl < 127 &&
                  row(4 * (runStart + rl) + c) == row(4 * runStart + c)) rl += 1
                if (rl >= 4) found = true else runStart += rl
              }
              val litEnd = if (found) runStart else w
              var lit = x2
              while (lit < litEnd) {
                val take = math.min(128, litEnd - lit)
                out.write(take)
                var k = 0
                while (k < take) { out.write(row(4 * (lit + k) + c)); k += 1 }
                lit += take
              }
              x2 = litEnd
              if (found) {
                var rl = 1
                while (runStart + rl < w && rl < 127 &&
                  row(4 * (runStart + rl) + c) == row(4 * runStart + c)) rl += 1
                out.write(128 + rl)
                out.write(row(4 * runStart + c))
                x2 = runStart + rl
              }
            }
            c += 1
          }
        } else out.write(row)
        y += 1
      }
      out.toByteArray
    }
  }

  // ---------------- DDS (DirectDraw Surface) ----------------

  object Dds {
    def looks(b: Array[Byte]): Boolean =
      b.length >= 128 && b(0) == 'D' && b(1) == 'D' && b(2) == 'S' && b(3) == ' ' &&
        le32(b, 4) == 124

    def headerDims(b: Array[Byte]): Option[(Int, Int)] =
      if (!looks(b)) None else Some((le32(b, 16), le32(b, 12)))

    /** Top mip level only (the image a generic decoder returns): DXT1/3/5
      * block decompression and uncompressed mask-described RGB(A). DX10
      * extended headers and exotic formats return None (-> `error` under a
      * dds label; the honest `unsupported` case no longer exists for DDS
      * since the classic encodings all decode). */
    def decode(b: Array[Byte]): Option[DecodedImage] = {
      if (!looks(b)) return None
      val h = le32(b, 12)
      val w = le32(b, 16)
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      val pfFlags = le32(b, 80)
      val fourCc = new String(b, 84, 4, "ISO-8859-1")
      val data = 128
      if ((pfFlags & 0x4) != 0) { // DDPF_FOURCC
        fourCc match {
          case "DXT1" => decodeBc(b, data, w, h, bytesPerBlock = 8, alphaMode = 0)
          case "DXT3" => decodeBc(b, data, w, h, bytesPerBlock = 16, alphaMode = 3)
          case "DXT5" => decodeBc(b, data, w, h, bytesPerBlock = 16, alphaMode = 5)
          case _ => None // DX10 / BC4-7: out of the classic set
        }
      } else if ((pfFlags & 0x40) != 0) { // DDPF_RGB (+ optional alpha)
        val bpp = le32(b, 88)
        if (bpp != 24 && bpp != 32) return None
        val rm = le32(b, 92); val gm = le32(b, 96)
        val bm = le32(b, 100); val am = le32(b, 104)
        val stride = bpp / 8
        if (data + w.toLong * h * stride > b.length) return None
        @inline def ext(v: Int, mask: Int): Int = {
          if (mask == 0) return 0xff
          val sh = Integer.numberOfTrailingZeros(mask)
          val bits = Integer.bitCount(mask)
          val raw = (v & mask) >>> sh
          if (bits >= 8) raw >>> (bits - 8)
          else (raw * 255) / ((1 << bits) - 1)
        }
        val argb = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val p = data + i * stride
          var v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16)
          if (stride == 4) v |= (b(p + 3) & 0xff) << 24
          val a = if ((pfFlags & 0x1) != 0 && am != 0) ext(v, am) else 0xff
          argb(i) = (a << 24) | (ext(v, rm) << 16) | (ext(v, gm) << 8) | ext(v, bm)
          i += 1
        }
        Some(DecodedImage(w, h, argb))
      } else None
    }

    private def rgb565(v: Int): Int = {
      val r = (v >> 11) & 0x1f; val g = (v >> 5) & 0x3f; val bl = v & 0x1f
      (((r * 255) / 31) << 16) | (((g * 255) / 63) << 8) | ((bl * 255) / 31)
    }

    @inline private def mix(a: Int, b: Int, wa: Int, wb: Int, div: Int): Int = {
      @inline def c(sh: Int): Int =
        ((((a >> sh) & 0xff) * wa + (((b >> sh) & 0xff)) * wb) / div) << sh
      c(16) | c(8) | c(0)
    }

    /** alphaMode: 0 = DXT1 (1-bit via 3-color mode), 3 = explicit 4-bit,
      * 5 = interpolated 3-bit indices. */
    private def decodeBc(b: Array[Byte], data: Int, w: Int, h: Int,
                         bytesPerBlock: Int, alphaMode: Int): Option[DecodedImage] = {
      val bw = (w + 3) / 4
      val bh = (h + 3) / 4
      if (data + bw.toLong * bh * bytesPerBlock > b.length) return None
      val argb = new Array[Int](w * h)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val blk = data + (by * bw + bx) * bytesPerBlock
          val cOff = blk + (if (alphaMode == 0) 0 else 8)
          val c0v = le16(b, cOff); val c1v = le16(b, cOff + 2)
          val c0 = rgb565(c0v); val c1 = rgb565(c1v)
          val fourColor = alphaMode != 0 || c0v > c1v // DXT3/5 always 4-color
          val pal = new Array[Int](4)
          pal(0) = 0xff000000 | c0
          pal(1) = 0xff000000 | c1
          if (fourColor) {
            pal(2) = 0xff000000 | mix(c0, c1, 2, 1, 3)
            pal(3) = 0xff000000 | mix(c0, c1, 1, 2, 3)
          } else {
            pal(2) = 0xff000000 | mix(c0, c1, 1, 1, 2)
            pal(3) = 0x00000000 // transparent black
          }
          val lut = le32(b, cOff + 4)
          // DXT5 alpha palette
          var a0 = 0; var a1 = 0; var aBits = 0L
          if (alphaMode == 5) {
            a0 = b(blk) & 0xff; a1 = b(blk + 1) & 0xff
            var k = 0
            while (k < 6) { aBits |= (b(blk + 2 + k) & 0xffL) << (8 * k); k += 1 }
          }
          var py = 0
          while (py < 4) {
            var px = 0
            while (px < 4) {
              val x = bx * 4 + px; val y = by * 4 + py
              if (x < w && y < h) {
                val idx = (lut >>> (2 * (py * 4 + px))) & 3
                var col = pal(idx)
                if (alphaMode == 3) {
                  val nib = py * 4 + px
                  val av = (b(blk + nib / 2) >> ((nib % 2) * 4)) & 0xf
                  col = (col & 0xffffff) | ((av * 17) << 24)
                } else if (alphaMode == 5) {
                  val ai = ((aBits >>> (3 * (py * 4 + px))) & 7).toInt
                  val a =
                    if (ai == 0) a0
                    else if (ai == 1) a1
                    else if (a0 > a1) ((8 - ai) * a0 + (ai - 1) * a1) / 7
                    else if (ai == 6) 0
                    else if (ai == 7) 255
                    else ((6 - ai) * a0 + (ai - 1) * a1) / 5
                  col = (col & 0xffffff) | (a << 24)
                }
                argb(y * w + x) = col
              }
              px += 1
            }
            py += 1
          }
          bx += 1
        }
        by += 1
      }
      Some(DecodedImage(w, h, argb))
    }

    /** Uncompressed A8R8G8B8 (lossless — the corpus fixture shape). */
    def encodeUncompressed(d: DecodedImage): Array[Byte] = {
      val out = new Array[Byte](128 + d.argb.length * 4)
      out(0) = 'D'; out(1) = 'D'; out(2) = 'S'; out(3) = ' '
      writeLe32At(out, 4, 124)
      writeLe32At(out, 8, 0x1 | 0x2 | 0x4 | 0x1000) // caps|h|w|pixelformat
      writeLe32At(out, 12, d.h); writeLe32At(out, 16, d.w)
      writeLe32At(out, 76, 32) // pf size
      writeLe32At(out, 80, 0x40 | 0x1) // DDPF_RGB | DDPF_ALPHAPIXELS
      writeLe32At(out, 88, 32)
      writeLe32At(out, 92, 0x00ff0000); writeLe32At(out, 96, 0x0000ff00)
      writeLe32At(out, 100, 0x000000ff); writeLe32At(out, 104, 0xff000000)
      writeLe32At(out, 108, 0x1000) // caps: texture
      var i = 0
      while (i < d.argb.length) {
        writeLe32At(out, 128 + 4 * i, d.argb(i))
        i += 1
      }
      out
    }

    /** DXT1 with min/max-luma endpoints — EXACT when every 4x4 block holds
      * at most 2 distinct colors (the spec's exactness fixture), lossy like
      * a recompress otherwise. */
    def encodeDxt1(d: DecodedImage): Array[Byte] = {
      val bw = (d.w + 3) / 4
      val bh = (d.h + 3) / 4
      val out = new Array[Byte](128 + bw * bh * 8)
      out(0) = 'D'; out(1) = 'D'; out(2) = 'S'; out(3) = ' '
      writeLe32At(out, 4, 124)
      writeLe32At(out, 8, 0x1 | 0x2 | 0x4 | 0x1000)
      writeLe32At(out, 12, d.h); writeLe32At(out, 16, d.w)
      writeLe32At(out, 76, 32)
      writeLe32At(out, 80, 0x4) // DDPF_FOURCC
      out(84) = 'D'; out(85) = 'X'; out(86) = 'T'; out(87) = '1'
      writeLe32At(out, 108, 0x1000)
      def to565(px: Int): Int = {
        val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val bl = px & 0xff
        (((r * 31 + 127) / 255) << 11) | (((g * 63 + 127) / 255) << 5) | ((bl * 31 + 127) / 255)
      }
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          // gather block pixels (edge blocks replicate the last pixel)
          val pix = new Array[Int](16)
          var k = 0
          while (k < 16) {
            val x = math.min(bx * 4 + k % 4, d.w - 1)
            val y = math.min(by * 4 + k / 4, d.h - 1)
            pix(k) = d.argb(y * d.w + x) & 0xffffff
            k += 1
          }
          @inline def luma(p: Int): Int =
            ((p >> 16) & 0xff) * 3 + ((p >> 8) & 0xff) * 6 + (p & 0xff)
          var lo = pix(0); var hi = pix(0)
          pix.foreach { p =>
            if (luma(p) < luma(lo)) lo = p
            if (luma(p) > luma(hi)) hi = p
          }
          var c0 = to565(hi); var c1 = to565(lo)
          if (c0 < c1) { val t = c0; c0 = c1; c1 = t } // force 4-color mode
          val blk = 128 + (by * bw + bx) * 8
          out(blk) = (c0 & 0xff).toByte; out(blk + 1) = ((c0 >> 8) & 0xff).toByte
          out(blk + 2) = (c1 & 0xff).toByte; out(blk + 3) = ((c1 >> 8) & 0xff).toByte
          val pal =
            if (c0 == c1) Array(rgb565(c0), rgb565(c1), rgb565(c0), rgb565(c1))
            else Array(rgb565(c0), rgb565(c1),
              mix(rgb565(c0), rgb565(c1), 2, 1, 3), mix(rgb565(c0), rgb565(c1), 1, 2, 3))
          var lut = 0
          k = 0
          while (k < 16) {
            @inline def dist(a: Int, b2: Int): Int = {
              val dr = ((a >> 16) & 0xff) - ((b2 >> 16) & 0xff)
              val dg = ((a >> 8) & 0xff) - ((b2 >> 8) & 0xff)
              val db = (a & 0xff) - (b2 & 0xff)
              dr * dr + dg * dg + db * db
            }
            var best = 0
            var bd = dist(pix(k), pal(0))
            var j = 1
            while (j < 4) {
              val dj = dist(pix(k), pal(j))
              if (dj < bd) { bd = dj; best = j }
              j += 1
            }
            lut |= best << (2 * k)
            k += 1
          }
          writeLe32At(out, blk + 4, lut)
          bx += 1
        }
        by += 1
      }
      out
    }
  }

  // ---------------- shared byte helpers ----------------

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def writeBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 24) & 0xff); o.write((v >> 16) & 0xff)
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def writeBe32At(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = ((v >> 24) & 0xff).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
    b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
  }
  private def writeLe32At(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }
}
