package graft.functions

import scala.util.hashing.MurmurHash3

/**
 * Broder MinHash over caption shingles — first-principles implementation
 * (SURVEY.md §2.11; the reference has no caption analog, this is the graft
 * requirement from BASELINE.json north_star).
 *
 * Word k-shingles → 64-bit base hash per shingle → n seeded universal-hash
 * permutations h_i(x) = (a_i·x + b_i) mod p → component i = min over
 * shingles. Banded like the PDQ chunks for LSH candidate generation.
 */
object MinHash {
  final val NumHashes = 64
  final val ShingleK = 3
  final val Bands = 16          // 16 bands × 4 rows
  final val RowsPerBand = NumHashes / Bands
  private final val P = (1L << 61) - 1 // Mersenne prime 2^61-1

  // deterministic per-permutation coefficients (seeded LCG, seed 42)
  private lazy val coeffs: Array[(Long, Long)] = {
    val r = new java.util.Random(42L)
    Array.fill(NumHashes) {
      (math.abs(r.nextLong()) % (P - 1) + 1, math.abs(r.nextLong()) % P)
    }
  }

  /** 64-bit base hash of a shingle: two murmur32 passes mixed. */
  def shingleHash(s: String): Long = {
    val h1 = MurmurHash3.stringHash(s, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(s, 0x85ebca6b)
    ((h1.toLong << 32) | (h2.toLong & 0xffffffffL)) & Long.MaxValue
  }

  def wordShingles(text: String, k: Int = ShingleK): Seq[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length <= k) Seq(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSeq
  }

  /** n-component signature; empty text → all-MaxValue sentinel. */
  def signature(text: String): Array[Int] = {
    val sh = wordShingles(text).map(shingleHash)
    val out = new Array[Int](NumHashes)
    var i = 0
    while (i < NumHashes) {
      val (a, b) = coeffs(i)
      var mn = Long.MaxValue
      sh.foreach { x =>
        // (a*x+b) mod p via 128-bit-safe multiply: split x
        val hi = Math.multiplyHigh(a, x)
        val lo = a * x
        // fold 2^64 mod p: (hi*8 + lo mod p) since 2^64 = 8·2^61 ≡ 8 mod p
        val v = (((hi % P) * (8L % P)) % P + java.lang.Long.remainderUnsigned(lo, P) + b) % P
        if (v < mn) mn = v
      }
      out(i) = (mn & 0x7fffffff).toInt // fold to int for compact storage
      i += 1
    }
    out
  }

  /** Band keys: (band_idx, hash of the band's rows). */
  def bandKeys(sig: Array[Int]): Array[(Int, Long)] = {
    val out = new Array[(Int, Long)](Bands)
    var b = 0
    while (b < Bands) {
      var h = 1125899906842597L
      var r = 0
      while (r < RowsPerBand) { h = h * 31 + sig(b * RowsPerBand + r); r += 1 }
      out(b) = (b, h)
      b += 1
    }
    out
  }

  /** Estimated Jaccard = matching fraction of signature components. */
  def estJaccard(a: Array[Int], b: Array[Int]): Double = {
    var m = 0; var i = 0
    while (i < NumHashes) { if (a(i) == b(i)) m += 1; i += 1 }
    m.toDouble / NumHashes
  }

  /** Exact Jaccard over word shingle sets (verification oracle). */
  def exactJaccard(a: String, b: String): Double = {
    val sa = wordShingles(a).toSet; val sb = wordShingles(b).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }
}
