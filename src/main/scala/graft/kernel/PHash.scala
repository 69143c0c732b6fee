package graft.kernel

/**
 * 64-bit DCT perceptual hash (secondary algorithm) — semantics of the
 * reference's phash.rs:48-128: 32×32 triangle-filter resize → luma →
 * unnormalized 2D DCT-II → top-left 8×8 crop → median (DC excluded) →
 * 64 bits, bit 63 = (0,0) … bit 0 = (7,7).
 *
 * Plus the pure bit-twiddling dihedral ops (phash.rs:137-255): rotations
 * and flips on the packed u64 via bit transpose + frequency-parity sign
 * flips — no pixel access needed ("store 1 / query 8").
 */
object PHash {
  final val DctSize = 32
  final val HashSize = 8

  /** Unnormalized DCT-II over one row of length n:
    * X_k = Σ_n x_n · cos(π/N · k · (n+0.5)) — the rustdct convention the
    * reference planners use (phash.rs:36-44). */
  private lazy val dctMat: Array[Array[Double]] = {
    val m = Array.ofDim[Double](DctSize, DctSize)
    var k = 0
    while (k < DctSize) {
      var n = 0
      while (n < DctSize) {
        m(k)(n) = math.cos(math.Pi / DctSize * k * (n + 0.5))
        n += 1
      }
      k += 1
    }
    m
  }

  /** Precomputed normalized triangle-filter taps for one resample axis:
    * the per-output-index (start, weights[]) pairs are identical for every
    * row/column, so computing them once per source length removes the
    * abs/div from the inner loop (~3× on the horizontal pass). */
  private final class Taps(srcLen: Int) {
    val lo = new Array[Int](DctSize)
    val weights = new Array[Array[Float]](DctSize)
    private val ratio = srcLen.toDouble / DctSize
    private val support = math.max(ratio, 1.0)
    locally {
      var o = 0
      while (o < DctSize) {
        val center = (o + 0.5) * ratio
        val l = math.max(math.floor(center - support).toInt, 0)
        val hi = math.min(math.ceil(center + support).toInt, srcLen - 1)
        val raw = new Array[Double](hi - l + 1)
        var wsum = 0.0
        var i = l
        while (i <= hi) {
          val d = math.abs((i + 0.5) - center) / support
          if (d < 1.0) { raw(i - l) = 1.0 - d; wsum += 1.0 - d }
          i += 1
        }
        lo(o) = l
        weights(o) =
          if (wsum > 0) raw.map(v => (v / wsum).toFloat)
          else { val w0 = new Array[Float](hi - l + 1); w0(math.min(center.toInt, srcLen - 1) - l) = 1f; w0 }
        o += 1
      }
    }
  }
  private val tapsCache = new java.util.concurrent.ConcurrentHashMap[Int, Taps]()
  private def taps(srcLen: Int): Taps =
    tapsCache.computeIfAbsent(srcLen, l => new Taps(l))

  /** Separable triangle (bilinear) resample to 32×32 of a grayscale buffer —
    * the role of image::resize_exact(FilterType::Triangle) (phash.rs:51-53). */
  def triangleResize32(src: Array[Float], w: Int, h: Int): Array[Float] = {
    val tx = taps(w)
    val mid = new Array[Float](DctSize * h)
    var y = 0
    while (y < h) {
      val base = y * w
      var ox = 0
      while (ox < DctSize) {
        val ws = tx.weights(ox); val l = tx.lo(ox)
        var acc = 0.0f
        var i = 0
        while (i < ws.length) { acc += src(base + l + i) * ws(i); i += 1 }
        mid(y * DctSize + ox) = acc
        ox += 1
      }
      y += 1
    }
    val ty = taps(h)
    val out = new Array[Float](DctSize * DctSize)
    var oy = 0
    while (oy < DctSize) {
      val ws = ty.weights(oy); val l = ty.lo(oy)
      var x = 0
      while (x < DctSize) {
        var acc = 0.0f
        var i = 0
        while (i < ws.length) { acc += mid((l + i) * DctSize + x) * ws(i); i += 1 }
        out(oy * DctSize + x) = acc
        x += 1
      }
      oy += 1
    }
    out
  }

  /** Hash from a 32×32 grayscale buffer (phash.rs:55-83). */
  def hashFrom32x32(pix: Array[Float]): Long = {
    // 2D DCT-II: rows then cols
    val m = dctMat
    val rowsOut = Array.ofDim[Double](DctSize, DctSize)
    var y = 0
    while (y < DctSize) {
      var k = 0
      while (k < DctSize) {
        var s = 0.0; var n = 0
        while (n < DctSize) { s += pix(y * DctSize + n) * m(k)(n); n += 1 }
        rowsOut(y)(k) = s
        k += 1
      }
      y += 1
    }
    val full = Array.ofDim[Double](DctSize, DctSize)
    var x = 0
    while (x < DctSize) {
      var k = 0
      while (k < DctSize) {
        var s = 0.0; var n = 0
        while (n < DctSize) { s += rowsOut(n)(x) * m(k)(n); n += 1 }
        full(k)(x) = s
        k += 1
      }
      x += 1
    }
    // top-left 8×8 crop, median excluding DC (phash.rs:62-71)
    val low = new Array[Double](HashSize * HashSize)
    var i = 0
    while (i < HashSize) {
      var j = 0
      while (j < HashSize) { low(i * HashSize + j) = full(i)(j); j += 1 }
      i += 1
    }
    val sorted = low.drop(1).sorted
    val median = sorted(sorted.length / 2)
    var hash = 0L
    i = 0
    while (i < 64) {
      if (low(i) > median) hash |= (1L << (63 - i))
      i += 1
    }
    hash
  }

  /** End-to-end: grayscale buffer (0-255 floats, any size ≥1) → 64-bit hash. */
  def hashGray(gray: Array[Float], w: Int, h: Int): Long =
    hashFrom32x32(triangleResize32(gray, w, h))

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // --- bitwise dihedral ops (phash.rs:150-255) ---

  /** rot90 cw: bit transpose + sign flip on odd destination-x frequencies. */
  def rotate90(hash: Long): Long = {
    var result = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val srcIdx = 8 * y + x
        val dstIdx = 8 * x + y // (dst_x, dst_y) = (y, x)
        val bit = (hash >>> (63 - srcIdx)) & 1L
        val flip = y % 2 != 0 // dst_x = y
        val fb = if (flip) bit ^ 1L else bit
        result |= fb << (63 - dstIdx)
        x += 1
      }
      y += 1
    }
    result
  }

  /** rot180: sign flip where (x+y) odd, no transpose. */
  def rotate180(hash: Long): Long = {
    var result = 0L
    var i = 0
    while (i < 64) {
      val x = i % 8; val y = i / 8
      val bit = (hash >>> (63 - i)) & 1L
      val fb = if ((x + y) % 2 != 0) bit ^ 1L else bit
      result |= fb << (63 - i)
      i += 1
    }
    result
  }

  /** rot270 cw: transpose + sign flip on odd destination-y frequencies. */
  def rotate270(hash: Long): Long = {
    var result = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val srcIdx = 8 * y + x
        val dstIdx = 8 * x + y
        val bit = (hash >>> (63 - srcIdx)) & 1L
        val flip = x % 2 != 0 // dst_y = x
        val fb = if (flip) bit ^ 1L else bit
        result |= fb << (63 - dstIdx)
        x += 1
      }
      y += 1
    }
    result
  }

  /** horizontal flip: sign flip on odd horizontal frequencies. */
  def flipHorizontal(hash: Long): Long = {
    var result = 0L
    var i = 0
    while (i < 64) {
      val bit = (hash >>> (63 - i)) & 1L
      val fb = if (i % 8 % 2 != 0) bit ^ 1L else bit
      result |= fb << (63 - i)
      i += 1
    }
    result
  }

  /** min over {id, rot90, rot180, rot270} — rotation-invariant form
    * (phash.rs:137-143). Unsigned min: the reference's u64::min. */
  def rotationInvariant(hash: Long): Long = {
    def umin(a: Long, b: Long): Long = if (java.lang.Long.compareUnsigned(a, b) <= 0) a else b
    umin(umin(hash, rotate90(hash)), umin(rotate180(hash), rotate270(hash)))
  }

  /** All 8 dihedral variants: [id, r90, r180, r270, flipH, flipH+r90,
    * flipH+r180, flipH+r270] (phash.rs:242-255). */
  def dihedral(hash: Long): Array[Long] = {
    val f = flipHorizontal(hash)
    Array(hash, rotate90(hash), rotate180(hash), rotate270(hash),
      f, rotate90(f), rotate180(f), rotate270(f))
  }
}
