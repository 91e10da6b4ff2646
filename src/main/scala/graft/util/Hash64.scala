package graft.util

/** Deterministic 64-bit hashing + PRNG used by the synthetic-corpus
  * generator and the fingerprint/minhash kernels.
  *
  * xxh64 is the public XXH64 algorithm (Yann Collet, BSD-2, public spec at
  * github.com/Cyan4973/xxHash) re-implemented from the spec; it is the
  * same family as Spark's `xxhash64` expression, so seed-fixed fixtures
  * (FIXTURES.md §1) are reproducible across machines and parallelism.
  */
object Hash64 {
  private final val P1 = 0x9e3779b185ebca87L
  private final val P2 = 0xc2b2ae3d27d4eb4fL
  private final val P3 = 0x165667b19e3779f9L
  private final val P4 = 0x85ebca77c2b2ae63L
  private final val P5 = 0x27d4eb2f165667c5L

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  @inline private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  @inline private def readInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  @inline private def mergeRound(acc0: Long, v: Long): Long = {
    val acc = acc0 ^ round(0L, v)
    acc * P1 + P4
  }

  def xxh64(data: Array[Byte], seed: Long): Long = xxh64(data, data.length, seed)

  /** Range variant over data[0, len) — identical algorithm; lets callers
    * hash out of a reused buffer (r6: the minhash kernel's per-shingle
    * String + getBytes allocations were a measurable slice of x08). */
  def xxh64(data: Array[Byte], len: Int, seed: Long): Long = {
    var i = 0
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, readLong(data, i))
        v2 = round(v2, readLong(data, i + 8))
        v3 = round(v3, readLong(data, i + 16))
        v4 = round(v4, readLong(data, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= len) {
      h ^= round(0L, readLong(data, i))
      h = rotl(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (readInt(data, i) & 0xffffffffL) * P1
      h = rotl(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (data(i) & 0xffL) * P5
      h = rotl(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  def xxh64(s: String, seed: Long): Long =
    xxh64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)
}

/** SplitMix64 PRNG (Steele/Lea/Flood, public algorithm) — the per-row
  * deterministic randomness stream of the generator. */
final class SplitMix64(seed0: Long) {
  private var s = seed0
  def nextLong(): Long = {
    s += 0x9e3779b97f4a7c15L
    var z = s
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** uniform in [0, n) */
  def nextInt(n: Int): Int = java.lang.Math.floorMod(nextLong(), n.toLong).toInt
  def nextDouble(): Double = (nextLong() >>> 11) * (1.0 / (1L << 53).toDouble)
  /** weighted categorical choice; weights need not sum to 1 */
  def choose[T](items: Seq[(T, Double)]): T = {
    val total = items.map(_._2).sum
    var r = nextDouble() * total
    for ((t, w) <- items) { if (r < w) return t; r -= w }
    items.last._1
  }
}

/** Zipf(alpha) sampler over ranks 1..n via precomputed inverse CDF —
  * models the crawl-domain skew the salted repartition defuses
  * (FIXTURES.md §1: hosts Zipfian alpha≈1.1). */
final class Zipf(n: Int, alpha: Double) {
  private val cdf: Array[Double] = {
    val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1.0, alpha))
    val total = w.sum
    val c = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; c(i) = acc; i += 1 }
    c(n - 1) = 1.0
    c
  }
  /** rank in [0, n) for u in [0,1) */
  def rank(u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cdf, u)
    if (i >= 0) math.min(i + 1, n - 1) else math.min(-i - 1, n - 1)
  }
}
