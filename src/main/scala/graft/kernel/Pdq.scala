package graft.kernel

/**
 * PDQ perceptual hash — pure-JVM implementation of the 256-bit DCT hash
 * semantics used by the reference engine (reference: pdqhash.rs, which in
 * turn follows facebook/ThreatExchange PDQ).
 *
 * Pipeline (pdqhash.rs:166-262):
 *   luma(Rec.601) → [box-resize to ≤512 keeping aspect] → 2×Jarosz box blur
 *   → decimate to 64×64 → quality metric → DCT 64→16×16 (frequency offset 1,
 *   DC dropped) → median binarize → 256-bit pack.
 *
 * All loops are ported line-faithfully where f32 accumulation order is
 * bit-significant (pdqhash.rs:306-336, 445-460). Pure functions, no Spark —
 * unit-testable and usable from a mapPartitions kernel.
 */
object Pdq {
  final val MinHashableDim = 5        // pdqhash.rs:17
  final val NumJaroszPasses = 2       // pdqhash.rs:18
  final val DownsampleDims = 512      // pdqhash.rs:19
  final val BufferWH = 64             // pdqhash.rs:20
  final val OutWH = 16                // pdqhash.rs:21
  final val OutN = OutWH * OutWH      // 256 coefficients
  final val HashBytes = OutN / 8      // 32 bytes
  final val DctFreqOffset = 1         // pdqhash.rs:31 — drop DC

  /** DCT matrix 16×64, frequency offset 1 (pdqhash.rs:287-304). Computed
    * once per JVM (executor-singleton). */
  lazy val dctMatrix: Array[Array[Float]] = {
    val m = Array.ofDim[Float](OutWH, BufferWH)
    val invSqrtCols = (1.0 / math.sqrt(BufferWH.toDouble)).toFloat
    val sqrt2 = math.sqrt(2.0).toFloat
    var i = 0
    while (i < OutWH) {
      val freq = (i + DctFreqOffset).toFloat
      val norm = if (freq == 0.0f) invSqrtCols else invSqrtCols * sqrt2
      var j = 0
      while (j < BufferWH) {
        val angle = (math.Pi.toFloat * freq * (2.0f * j + 1.0f)) / (2.0f * BufferWH)
        m(i)(j) = norm * math.cos(angle.toDouble).toFloat
        j += 1
      }
      i += 1
    }
    m
  }

  /** Rec.601 integer luma: (299r + 587g + 114b + 500) / 1000
    * (pdqhash.rs:268-284). Input packed ARGB/RGB ints. */
  def luma601(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (299 * r + 587 * g + 114 * b + 500) / 1000
  }

  /** Aspect-preserving integer target dims, ≥1px (pdqhash.rs:224-235). */
  def targetDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    if (w == 0 || h == 0) (math.max(w, 1), math.max(h, 1))
    else if (w > h) (maxDim, math.max((h.toLong * maxDim / w).toInt, 1))
    else (math.max((w.toLong * maxDim / h).toInt, 1), maxDim)
  }

  /** Box (area-average) resample of a grayscale image — the role of
    * fast_image_resize's Box convolution filter (pdqhash.rs:36, 203-220).
    * Exact pixel parity with the Rust resizer is not required: the next
    * stage is a box blur down to 64×64 anyway; ≤512px inputs skip this. */
  def boxResize(src: Array[Float], w: Int, h: Int, nw: Int, nh: Int): Array[Float] = {
    val dst = new Array[Float](nw * nh)
    val sx = w.toDouble / nw
    val sy = h.toDouble / nh
    var oy = 0
    while (oy < nh) {
      val y0 = oy * sy; val y1 = (oy + 1) * sy
      var ox = 0
      while (ox < nw) {
        val x0 = ox * sx; val x1 = (ox + 1) * sx
        var acc = 0.0; var area = 0.0
        var iy = math.floor(y0).toInt
        val iyEnd = math.min(math.ceil(y1).toInt, h)
        while (iy < iyEnd) {
          val wy = math.min(y1, iy + 1.0) - math.max(y0, iy.toDouble)
          var ix = math.floor(x0).toInt
          val ixEnd = math.min(math.ceil(x1).toInt, w)
          while (ix < ixEnd) {
            val wx = math.min(x1, ix + 1.0) - math.max(x0, ix.toDouble)
            acc += src(iy * w + ix) * wx * wy
            area += wx * wy
            ix += 1
          }
          iy += 1
        }
        dst(oy * nw + ox) = (acc / area).toFloat
        ox += 1
      }
      oy += 1
    }
    dst
  }

  /** Two-phase sliding box average along one line — faithful port of
    * box_one_d_float (pdqhash.rs:341-396); accumulation order preserved. */
  def boxOneD(in: Array[Float], inStart: Int, out: Array[Float], outStart: Int,
              vecLen: Int, stride: Int, winSize0: Int): Unit = {
    val winSize = math.min(math.max(winSize0, 1), math.max(vecLen, 1))
    val halfWin = (winSize + 2) / 2
    val phase1 = halfWin - 1
    val phase2 = winSize - halfWin + 1
    val phase3 = math.max(vecLen - winSize, 0)
    val phase4 = halfWin - 1
    var li = inStart; var ri = inStart; var oi = outStart
    var sum = 0.0f; var currWin = 0.0f
    var k = 0
    while (k < phase1) { sum += in(ri); currWin += 1.0f; ri += stride; k += 1 }
    k = 0
    while (k < phase2) {
      sum += in(ri); currWin += 1.0f
      out(oi) = sum / currWin
      ri += stride; oi += stride; k += 1
    }
    k = 0
    while (k < phase3) {
      sum += in(ri); sum -= in(li)
      out(oi) = sum / currWin
      li += stride; ri += stride; oi += stride; k += 1
    }
    k = 0
    while (k < phase4) {
      sum -= in(li); currWin -= 1.0f
      out(oi) = sum / currWin
      li += stride; oi += stride; k += 1
    }
  }

  /** Jarosz filter: nreps × (row box pass + col box pass), window
    * ceil(dim/64) (pdqhash.rs:246-247, 410-426). Mutates buf. */
  def jarosz(buf: Array[Float], rows: Int, cols: Int,
             wRows: Int, wCols: Int, nreps: Int): Unit = {
    val tmp = new Array[Float](buf.length)
    var rep = 0
    while (rep < nreps) {
      var i = 0
      while (i < rows) { boxOneD(buf, i * cols, tmp, i * cols, cols, 1, wRows); i += 1 }
      var j = 0
      while (j < cols) { boxOneD(tmp, j, buf, j, rows, cols, wCols); j += 1 }
      rep += 1
    }
  }

  /** Point-sample decimation to 64×64 at ((2i+1)·in)/(2·64)
    * (pdqhash.rs:428-443). Returns row-major 64×64. */
  def decimate(in: Array[Float], inR: Int, inC: Int): Array[Float] = {
    val out = new Array[Float](BufferWH * BufferWH)
    var i = 0
    while (i < BufferWH) {
      val ini = ((i * 2 + 1) * inR) / (BufferWH * 2)
      var j = 0
      while (j < BufferWH) {
        out(i * BufferWH + j) = in(ini * inC + ((j * 2 + 1) * inC) / (BufferWH * 2))
        j += 1
      }
      i += 1
    }
    out
  }

  /** Gradient-based quality in [0,1]: vertical gradients first, then
    * horizontal; each |∇|·100/255 truncated before summing; /90, clamp
    * (pdqhash.rs:445-460 — chain order is bit-significant). */
  def quality(buf64: Array[Float]): Float = {
    val n = BufferWH
    var sum = 0.0f
    var r = 0
    while (r < n - 1) {
      var c = 0
      while (c < n) {
        val a = buf64(r * n + c); val b = buf64((r + 1) * n + c)
        sum += math.abs((a - b) * 100.0f / 255.0f).floor
        c += 1
      }
      r += 1
    }
    r = 0
    while (r < n) {
      var c = 0
      while (c < n - 1) {
        val a = buf64(r * n + c); val b = buf64(r * n + c + 1)
        sum += math.abs((a - b) * 100.0f / 255.0f).floor
        c += 1
      }
      r += 1
    }
    val q = sum / 90.0f
    if (q > 1.0f) 1.0f else q
  }

  /** Two-pass 16×16 DCT of a 64×64 buffer (pdqhash.rs:306-336); k-outer
    * accumulation order in pass 1 preserved (bit-identical to naive). */
  def dct64to16(in: Array[Float]): Array[Float] = {
    val m = dctMatrix
    val inter = Array.ofDim[Float](OutWH, BufferWH)
    var i = 0
    while (i < OutWH) {
      val interRow = inter(i)
      var k = 0
      while (k < BufferWH) {
        val coeff = m(i)(k)
        val base = k * BufferWH
        var j = 0
        while (j < BufferWH) { interRow(j) += coeff * in(base + j); j += 1 }
        k += 1
      }
      i += 1
    }
    val out = new Array[Float](OutN)
    i = 0
    while (i < OutWH) {
      var j = 0
      while (j < OutWH) {
        var sum = 0.0f
        var k = 0
        while (k < BufferWH) { sum += inter(i)(k) * m(j)(k); k += 1 }
        out(i * OutWH + j) = sum
        j += 1
      }
      i += 1
    }
    out
  }

  /** Sign pattern for dihedral variants: a mirror negates odd DCT
    * *frequencies* = (index + DctFreqOffset) odd (pdqhash.rs:127-137). */
  @inline private def applySign(v: Float, r: Int, c: Int,
                                negRows: Boolean, negCols: Boolean): Float = {
    val flipR = negRows && (r + DctFreqOffset) % 2 == 1
    val flipC = negCols && (c + DctFreqOffset) % 2 == 1
    if (flipR ^ flipC) -v else v
  }

  /** Median over 256 signed coefficients — torben's lower-middle element,
    * index (n-1)/2 (pdqhash.rs:116-124). total-order float compare. */
  def coefficientMedian(coeffs: Array[Float], negRows: Boolean, negCols: Boolean): Float = {
    val buf = new Array[Float](OutN)
    var idx = 0
    while (idx < OutN) {
      buf(idx) = applySign(coeffs(idx), idx / OutWH, idx % OutWH, negRows, negCols)
      idx += 1
    }
    java.util.Arrays.sort(buf) // IEEE total order for non-NaN; coeffs are finite
    buf((OutN - 1) / 2)
  }

  /** Row r packed bits: bit c set iff signed coeff(r,c) > median
    * (pdqhash.rs:91-106). Returns 16 u16 rows (as Ints). */
  def bitRows(coeffs: Array[Float], negRows: Boolean, negCols: Boolean): Array[Int] = {
    val median = coefficientMedian(coeffs, negRows, negCols)
    val rows = new Array[Int](OutWH)
    var r = 0
    while (r < OutWH) {
      val base = r * OutWH
      var bits = 0
      var c = 0
      while (c < OutWH) {
        if (applySign(coeffs(base + c), r, c, negRows, negCols) > median) bits |= (1 << c)
        c += 1
      }
      rows(r) = bits
      r += 1
    }
    rows
  }

  /** Bit (r,c) of transpose = bit (c,r) of original (pdqhash.rs:140-151). */
  def transposeBitRows(rows: Array[Int]): Array[Int] = {
    val out = new Array[Int](OutWH)
    var r = 0
    while (r < OutWH) {
      var bits = rows(r)
      while (bits != 0) {
        val c = java.lang.Integer.numberOfTrailingZeros(bits)
        out(c) |= (1 << r)
        bits &= bits - 1
      }
      r += 1
    }
    out
  }

  /** Pack: low byte of row r → hash(31-2r), high byte → hash(30-2r)
    * (pdqhash.rs:153-162). */
  def packBitRows(rows: Array[Int]): Array[Byte] = {
    val hash = new Array[Byte](HashBytes)
    var r = 0
    while (r < OutWH) {
      hash(HashBytes - 2 * r - 1) = (rows(r) & 0xff).toByte
      hash(HashBytes - 2 * r - 2) = ((rows(r) >> 8) & 0xff).toByte
      r += 1
    }
    hash
  }

  def toHash(coeffs: Array[Float]): Array[Byte] =
    packBitRows(bitRows(coeffs, negRows = false, negCols = false))

  /** Eight dihedral variant hashes in reference order: identity, rot90,
    * rot180, rot270, mirror-x, mirror-y, transpose, anti-transpose
    * (pdqhash.rs:71-87). Transposes share the untransposed median. */
  def dihedralHashes(coeffs: Array[Float]): Array[Array[Byte]] = {
    val id = bitRows(coeffs, negRows = false, negCols = false)
    val negCols = bitRows(coeffs, negRows = false, negCols = true)
    val negRows = bitRows(coeffs, negRows = true, negCols = false)
    val negBoth = bitRows(coeffs, negRows = true, negCols = true)
    Array(
      packBitRows(id),
      packBitRows(transposeBitRows(negRows)),
      packBitRows(negBoth),
      packBitRows(transposeBitRows(negCols)),
      packBitRows(negCols),
      packBitRows(negRows),
      packBitRows(transposeBitRows(id)),
      packBitRows(transposeBitRows(negBoth))
    )
  }

  /** Full pipeline from a grayscale f32 buffer (row-major, values 0-255).
    * Returns (coefficients[256], quality in [0,1]). Mirrors
    * generate_pdq_from_luma (pdqhash.rs:238-262). */
  def featuresFromLuma(luma0: Array[Float], w0: Int, h0: Int): (Array[Float], Float) = {
    var luma = luma0; var w = w0; var h = h0
    if (w > DownsampleDims || h > DownsampleDims) {
      val (nw, nh) = targetDims(w, h, DownsampleDims)
      luma = boxResize(luma, w, h, nw, nh)
      w = nw; h = nh
    }
    val buf = luma.clone()
    val winRows = (w + BufferWH - 1) / BufferWH // ceil(cols/64) along rows
    val winCols = (h + BufferWH - 1) / BufferWH
    jarosz(buf, h, w, winRows, winCols, NumJaroszPasses)
    val buf64 = decimate(buf, h, w)
    val q = quality(buf64)
    (dct64to16(buf64), q)
  }

  /** 256-bit Hamming distance over 32-byte hashes (hamminghash.rs:55-58). */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    var d = 0; var i = 0
    while (i < a.length) { d += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    d
  }

  /** LSH band key: chunk k = little-endian u16 at bytes 2k..2k+2
    * (hamminghash.rs:49-54). 16 chunks per 256-bit hash. */
  def chunk(hash: Array[Byte], k: Int): Int =
    (hash(2 * k) & 0xff) | ((hash(2 * k + 1) & 0xff) << 8)

  /** Pack a 32-byte hash into 4 longs, little-endian per 8-byte word, so
    * chunk c = (longs(c/4) >>> ((c%4)*16)) & 0xFFFF and Hamming distance is
    * Σ bit_count(xor) over the 4 longs — whole-stage-codegen friendly. */
  def toLongs(hash: Array[Byte]): Array[Long] = {
    val out = new Array[Long](4)
    var w = 0
    while (w < 4) {
      var v = 0L
      var b = 7
      while (b >= 0) { v = (v << 8) | (hash(w * 8 + b) & 0xffL); b -= 1 }
      out(w) = v
      w += 1
    }
    out
  }

  def fromLongs(longs: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](HashBytes)
    var w = 0
    while (w < 4) {
      var b = 0
      while (b < 8) { out(w * 8 + b) = ((longs(w) >>> (8 * b)) & 0xff).toByte; b += 1 }
      w += 1
    }
    out
  }

  def hammingLongs(a: Array[Long], b: Array[Long]): Int = {
    var d = 0; var i = 0
    while (i < 4) { d += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    d
  }
}
