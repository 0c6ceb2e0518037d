package core

/** Pinned Murmur3-32 (x86 variant) over byte arrays, default seed 0x9747b28c
  * (SURVEY.md §3.3 "Language ID"). This is the label-path hash: langid n-gram
  * buckets, ByteLM context buckets, minhash permutations and document
  * fingerprints all use THIS implementation, never Spark's `hash()`
  * (SURVEY.md §3.7 row 44) — keeps the oracle and the pipeline bit-identical
  * and independent of Spark internals.
  */
object Murmur3 {
  final val DefaultSeed: Int = 0x9747b28c

  def hash(bytes: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nBlocks = len / 4
    var i = 0
    while (i < nBlocks) {
      val base = off + i * 4
      var k1 = (bytes(base) & 0xff) |
        ((bytes(base + 1) & 0xff) << 8) |
        ((bytes(base + 2) & 0xff) << 16) |
        ((bytes(base + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = off + nBlocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (bytes(tail + 2) & 0xff) << 16
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
        k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
      case 2 =>
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
        k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
      case 1 =>
        k1 ^= bytes(tail) & 0xff
        k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
      case _ =>
    }
    h1 ^= len
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  // Specialized 1-3-byte entry points for the per-byte n-gram scorers
  // (LangId 1-3-grams, ByteLM 2-3-byte contexts): straight-line tail +
  // finalization with no block loop or length match — bit-identical to
  // `hash(bytes, off, len, seed)` for the same bytes (len < 4 means the
  // generic path is all tail anyway; property-tested in CoreSpec).
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  @inline private def tailFinal(seed: Int, k0: Int, len: Int): Int = {
    var k1 = k0
    k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2
    var h1 = seed ^ k1
    h1 ^= len
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  @inline def hash1(b0: Byte, seed: Int): Int =
    tailFinal(seed, b0 & 0xff, 1)

  @inline def hash2(b0: Byte, b1: Byte, seed: Int): Int =
    tailFinal(seed, (b0 & 0xff) | ((b1 & 0xff) << 8), 2)

  @inline def hash3(b0: Byte, b1: Byte, b2: Byte, seed: Int): Int =
    tailFinal(seed, (b0 & 0xff) | ((b1 & 0xff) << 8) | ((b2 & 0xff) << 16), 3)

  def hash(bytes: Array[Byte], seed: Int): Int = hash(bytes, 0, bytes.length, seed)
  def hash(bytes: Array[Byte]): Int = hash(bytes, 0, bytes.length, DefaultSeed)

  def hashString(s: String, seed: Int): Int =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)
  def hashString(s: String): Int = hashString(s, DefaultSeed)
}
