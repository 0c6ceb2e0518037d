package core

/** Pure near-duplicate primitives shared by the Spark operators and their
  * Spark-free test oracles: word n-gram shingling, MinHash signatures,
  * SimHash fingerprints, rolling-hash document fingerprints, exact Jaccard.
  * All hashing is the pinned Murmur3-32 / splitmix mix — deterministic and
  * engine-independent.
  */
object Shingles {

  /** Distinct hashed word n-gram shingles (sorted for set ops). */
  def wordShingles(text: String, n: Int): Array[Int] = {
    val ws = TextStats.words(text)
    if (ws.length < n) {
      if (ws.isEmpty) Array.empty
      else Array(Murmur3.hashString(ws.mkString(" "))).distinct.sorted
    } else {
      val out = new Array[Int](ws.length - n + 1)
      var i = 0
      while (i + n <= ws.length) {
        out(i) = Murmur3.hashString(ws.slice(i, i + n).mkString(" "))
        i += 1
      }
      out.distinct.sorted
    }
  }

  /** 32-bit mix of a shingle hash with a permutation index. */
  @inline private def mix32(x: Int, i: Int): Int =
    Lcg.mix(x.toLong, (i + 1).toLong).toInt

  /** k-permutation MinHash signature via one base hash + k cheap mixes. */
  def minhashSignature(shingles: Array[Int], k: Int): Array[Int] = {
    val sig = Array.fill(k)(Int.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val x = shingles(s)
      var i = 0
      while (i < k) {
        val h = mix32(x, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** LSH band keys: hash of each band's r signature slots (b bands × r rows).
    * Two docs share a band key ⟹ candidate pair.
    */
  def bandKeys(sig: Array[Int], bands: Int, rows: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L
      var r = 0
      while (r < rows) {
        h = Lcg.mix(h, sig(b * rows + r).toLong)
        r += 1
      }
      // disambiguate band index in the key so band 0 and 1 never collide
      out(b) = (b.toLong << 56) ^ (h >>> 8)
      b += 1
    }
    out
  }

  /** 64-bit SimHash over hashed word unigrams+bigrams. */
  def simhash64(text: String): Long = {
    val ws = TextStats.words(text)
    val counts = new Array[Int](64)
    // tokens: unigrams and bigrams
    var i = 0
    while (i < ws.length) {
      var h = Lcg.mix(Murmur3.hashString(ws(i)).toLong, 1L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      if (i + 1 < ws.length) {
        h = Lcg.mix(Murmur3.hashString(ws(i) + " " + ws(i + 1)).toLong, 2L)
        bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Exact Jaccard on sorted distinct shingle arrays. */
  def jaccard(a: Array[Int], b: Array[Int]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  /** Content-defined document fingerprint: min-w winnowed Karp-Rabin style —
    * the minimum of rolling word-window hashes (w words), robust to small
    * edits at the tails.
    */
  def fingerprint(text: String, w: Int = 8): Long = {
    val ws = TextStats.words(text)
    if (ws.isEmpty) return 0L
    if (ws.length <= w) return Lcg.mix(Murmur3.hashString(ws.mkString(" ")).toLong, 99L)
    var min = Long.MaxValue
    var i = 0
    while (i + w <= ws.length) {
      val h = Lcg.mix(Murmur3.hashString(ws.slice(i, i + w).mkString(" ")).toLong, 99L)
      if (h < min) min = h
      i += 1
    }
    min
  }
}
