package graft

import graft.kernel.{ImageCodec, Pdq}
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity tests mirroring the reference's own suite (pdqhash.rs:464-647):
  * naive-vs-fast cross-check, independent physical-transform ground truth,
  * quality scaling, dimension clamping. LCG generators match
  * pdqhash.rs:537-545 / :606-614 exactly. */
class PdqSpec extends AnyFunSuite {
  private val N = Pdq.BufferWH
  private val OutWH = Pdq.OutWH
  private val OutN = Pdq.OutN
  private val HashLen = Pdq.HashBytes

  // --- naive ground-truth implementations (pdqhash.rs:470-535) ---

  private def naiveToHash(coeffs: Array[Float]): Array[Byte] = {
    val sorted = coeffs.clone(); java.util.Arrays.sort(sorted)
    val median = sorted((sorted.length - 1) / 2)
    val hash = new Array[Byte](HashLen)
    for (i <- 0 until HashLen) {
      var byte = 0
      for (j <- 0 until 8) if (coeffs(i * 8 + j) > median) byte |= (1 << j)
      hash(HashLen - i - 1) = byte.toByte
    }
    hash
  }
  private def naiveTranspose(c: Array[Float]): Array[Float] = {
    val out = new Array[Float](OutN)
    for (r <- 0 until OutWH; cc <- 0 until OutWH)
      out(cc * OutWH + r) = c(r * OutWH + cc)
    out
  }
  private def naiveFlipX(c: Array[Float]): Array[Float] = {
    val out = c.clone()
    for (r <- 0 until OutWH; cc <- 0 until OutWH)
      if ((cc + Pdq.DctFreqOffset) % 2 != 0) out(r * OutWH + cc) = -out(r * OutWH + cc)
    out
  }
  private def naiveFlipY(c: Array[Float]): Array[Float] = {
    val out = c.clone()
    for (r <- 0 until OutWH; cc <- 0 until OutWH)
      if ((r + Pdq.DctFreqOffset) % 2 != 0) out(r * OutWH + cc) = -out(r * OutWH + cc)
    out
  }
  private def naiveDihedral(c: Array[Float]): Seq[Array[Byte]] = Seq(
    naiveToHash(c),
    naiveToHash(naiveFlipX(naiveTranspose(c))),
    naiveToHash(naiveFlipY(naiveFlipX(c))),
    naiveToHash(naiveFlipY(naiveTranspose(c))),
    naiveToHash(naiveFlipX(c)),
    naiveToHash(naiveFlipY(c)),
    naiveToHash(naiveTranspose(c)),
    naiveToHash(naiveFlipY(naiveFlipX(naiveTranspose(c)))))

  /** LCG coefficient generator (pdqhash.rs:537-545). */
  private def pseudoRandomCoeffs(seed: Int): Array[Float] = {
    var state = seed
    Array.fill(OutN) {
      state = state * 1664525 + 1013904223
      ((state >>> 8) & 0xffffff).toFloat / 65536.0f - 128.0f
    }
  }

  /** LCG pixel buffer generator (pdqhash.rs:606-614). */
  private def pseudoRandomBuffer(seed: Int): Array[Float] = {
    var state = seed
    Array.fill(N * N) {
      state = state * 1664525 + 1013904223
      ((state >>> 16) & 0xff).toFloat
    }
  }

  test("fast dihedral matches naive (pdqhash.rs:548-558)") {
    for (seed <- Seq(1, 42, 0x12345678, 0xdeadbeef)) {
      val c = pseudoRandomCoeffs(seed)
      assert(Pdq.toHash(c).sameElements(naiveToHash(c)), s"to_hash mismatch seed $seed")
      val fast = Pdq.dihedralHashes(c)
      val naive = naiveDihedral(c)
      for (v <- 0 until 8)
        assert(fast(v).sameElements(naive(v)), s"dihedral variant $v mismatch seed $seed")
    }
  }

  test("dihedral set is the full group — 8 distinct variants (pdqhash.rs:561-570)") {
    val hashes = Pdq.dihedralHashes(pseudoRandomCoeffs(7))
    for (i <- 0 until 8; j <- i + 1 until 8)
      assert(!hashes(i).sameElements(hashes(j)), s"variants $i and $j collided")
  }

  test("dihedral hashes match physically transformed buffer, dist 0 (pdqhash.rs:583-628)") {
    def transform(in: Array[Float], variant: Int): Array[Float] = {
      val out = new Array[Float](N * N)
      for (x <- 0 until N; y <- 0 until N) {
        out(x * N + y) = variant match {
          case 0 => in(x * N + y)
          case 1 => in((N - 1 - y) * N + x)
          case 2 => in((N - 1 - x) * N + (N - 1 - y))
          case 3 => in(y * N + (N - 1 - x))
          case 4 => in(x * N + (N - 1 - y))
          case 5 => in((N - 1 - x) * N + y)
          case 6 => in(y * N + x)
          case _ => in((N - 1 - y) * N + (N - 1 - x))
        }
      }
      out
    }
    for (seed <- Seq(1, 42, 0xdeadbeef)) {
      val buf = pseudoRandomBuffer(seed)
      val predicted = Pdq.dihedralHashes(Pdq.dct64to16(buf))
      for (v <- 0 until 8) {
        val actual = Pdq.toHash(Pdq.dct64to16(transform(buf, v)))
        val dist = Pdq.hamming(actual, predicted(v))
        assert(dist == 0, s"variant $v (seed $seed) is $dist bits from the real transform")
      }
    }
  }

  test("quality metric scaling (pdqhash.rs:631-639)") {
    assert(Pdq.quality(Array.fill(N * N)(128.0f)) == 0.0f)
    // one gradient of 10 vertically + one horizontally: 2 × trunc(3.92) = 6
    val buf = Array.fill(N * N)(0.0f)
    buf(0 * N + (N - 1)) = 10.0f
    assert(math.abs(Pdq.quality(buf) - 6.0f / 90.0f) < 1e-6)
  }

  test("target dimensions never collapse to zero (pdqhash.rs:642-647)") {
    assert(Pdq.targetDims(4000, 5, 512) == ((512, 1)))
    assert(Pdq.targetDims(5, 4000, 512) == ((1, 512)))
    assert(Pdq.targetDims(1024, 1024, 512) == ((512, 512)))
    assert(Pdq.targetDims(1024, 512, 512) == ((512, 256)))
  }

  test("hash longs round-trip and chunk extraction match byte form") {
    val c = pseudoRandomCoeffs(99)
    val hash = Pdq.toHash(c)
    val longs = Pdq.toLongs(hash)
    assert(Pdq.fromLongs(longs).sameElements(hash))
    for (k <- 0 until 16) {
      val fromLongs = ((longs(k / 4) >>> ((k % 4) * 16)) & 0xffffL).toInt
      assert(fromLongs == Pdq.chunk(hash, k), s"chunk $k mismatch")
    }
    val c2 = pseudoRandomCoeffs(100)
    val hash2 = Pdq.toHash(c2)
    assert(Pdq.hammingLongs(longs, Pdq.toLongs(hash2)) == Pdq.hamming(hash, hash2))
  }

  test("recompression keeps PDQ distance well under threshold 40") {
    val img = graft.synth.Synth.baseImage(12345L, nearFlat = false)
    val (c0, q0) = Pdq.featuresFromLuma(img.luma601, img.w, img.h)
    assert(q0 * 100 >= 50, "procedural base image must be high quality")
    val jpeg = ImageCodec.encodeJpeg(img, 0.70f)
    val dec = ImageCodec.decode(jpeg, "jpg", img.w, img.h).get
    val (c1, _) = Pdq.featuresFromLuma(dec.luma601, dec.w, dec.h)
    val d = Pdq.hamming(Pdq.toHash(c0), Pdq.toHash(c1))
    assert(d < 40, s"recompress distance $d should be < 40")
    // PSNR invariant: lossless PNG round-trip is exact
    val png = ImageCodec.encodePng(img)
    val decPng = ImageCodec.decode(png, "png", img.w, img.h).get
    assert(ImageCodec.psnr(img, decPng).isPosInfinity)
  }

  test("physical rotation matched by dihedral variants ≤ 22 bits (hamminghash.rs:465-477)") {
    val img = graft.synth.Synth.baseImage(777L, nearFlat = false)
    val (c0, _) = Pdq.featuresFromLuma(img.luma601, img.w, img.h)
    val variants = Pdq.dihedralHashes(c0)
    val transforms = Seq(
      graft.synth.Synth.rotate90(img), graft.synth.Synth.rotate180(img),
      graft.synth.Synth.rotate270(img), graft.synth.Synth.flipH(img),
      graft.synth.Synth.flipV(img))
    for ((t, i) <- transforms.zipWithIndex) {
      val (ct, _) = Pdq.featuresFromLuma(t.luma601, t.w, t.h)
      val h = Pdq.toHash(ct)
      val best = variants.map(Pdq.hamming(_, h)).min
      assert(best <= 22, s"transform $i best dihedral distance $best > 22")
    }
  }

  test("near-flat image scores quality < 50 (scanner.rs:1579-1594 gate)") {
    val flat = graft.synth.Synth.baseImage(1L, nearFlat = true)
    val (_, q) = Pdq.featuresFromLuma(flat.luma601, flat.w, flat.h)
    assert(math.round(q * 100) < 50)
  }
}
