package core

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Locale

/** Broadcast "fastText-style" language-ID model (SURVEY.md §3.3, anchored by
  * BASELINE.json:6): hashed byte 1–3-gram linear model, built from the
  * per-language seed corpora by counting (no training loop — deterministic).
  * weight[lang][h] = ln((count+0.5)/(total + 0.5·Buckets));
  * score(lang) = Σ_ngrams w[lang][h(ngram)]; softmax → (lang, conf).
  *
  * The model is a plain `Array[Array[Float]]` — broadcastable via
  * `sparkContext.broadcast` and scored in mapPartitions batches
  * (BASELINE.json:6); it is also reproducible statically on any executor
  * (built from embedded constants), which the codegen Expression tier uses.
  */
final class LangIdModel(val langs: Array[String], weights: Array[Array[Float]])
    extends Serializable {

  /** Interleaved weight layout `flat(h·L + l)`: scoring reads ALL langs'
    * weights for one n-gram hash from one cache line, instead of one
    * random miss per lang into L separate 512 KB arrays (~5 misses per
    * n-gram → ~1; measured 12.6 → ~5 µs/row on the fixture texts). The
    * per-lang addition ORDER is unchanged (`scores(l) += w(l)(h)` in the
    * same h-then-l sequence), so every score — and the softmax — is
    * bit-identical to the per-lang layout.
    */
  private val nLangs = langs.length
  private val flat: Array[Float] = {
    val f = new Array[Float](LangId.Buckets * nLangs)
    var h = 0
    while (h < LangId.Buckets) {
      var l = 0
      while (l < nLangs) { f(h * nLangs + l) = weights(l)(h); l += 1 }
      h += 1
    }
    f
  }

  def score(text: String): (String, Double) = {
    val t = TextStats.norm(text)
    if (t.isEmpty) return ("und", 0.0)
    val bytes = t.toLowerCase(Locale.ROOT).getBytes(UTF_8)
    if (bytes.length == 0) return ("und", 0.0)
    val scores = new Array[Double](nLangs)
    if (nLangs == 5) scoreInto5(bytes, scores)
    else LangId.foreachNgramHash(bytes) { h =>
      val base = h * nLangs
      var l = 0
      while (l < nLangs) { scores(l) += flat(base + l); l += 1 }
    }
    // softmax with max-subtraction; deterministic argmax (first max wins)
    var best = 0
    var l = 1
    while (l < scores.length) { if (scores(l) > scores(best)) best = l; l += 1 }
    var denom = 0.0
    l = 0
    while (l < scores.length) { denom += math.exp(scores(l) - scores(best)); l += 1 }
    (langs(best), 1.0 / denom)
  }

  /** Unrolled scoring for the shipped 5-language model: per n-gram, five
    * local accumulators instead of an array load/store per language, and
    * the 1-/2-gram hashes come from the precomputed tables (the 3-gram
    * keeps the specialized Murmur3 call — a 16M-entry table would thrash).
    * The per-language addition sequence is unchanged (same h order, same
    * lang order), so every sum is bit-identical to the generic loop.
    */
  private def scoreInto5(bytes: Array[Byte], scores: Array[Double]): Unit = {
    val f = flat
    val h2t = LangId.hash2Table
    val h1t = LangId.hash1Table
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0; var s4 = 0.0
    val len = bytes.length
    var i = 0
    while (i < len) {
      val b0 = bytes(i) & 0xff
      var base = h1t(b0) * 5
      s0 += f(base); s1 += f(base + 1); s2 += f(base + 2)
      s3 += f(base + 3); s4 += f(base + 4)
      if (i + 2 <= len) {
        base = h2t(b0 | ((bytes(i + 1) & 0xff) << 8)) * 5
        s0 += f(base); s1 += f(base + 1); s2 += f(base + 2)
        s3 += f(base + 3); s4 += f(base + 4)
      }
      if (i + 3 <= len) {
        base = (Murmur3.hash3(bytes(i), bytes(i + 1), bytes(i + 2),
          Murmur3.DefaultSeed) & LangId.Mask) * 5
        s0 += f(base); s1 += f(base + 1); s2 += f(base + 2)
        s3 += f(base + 3); s4 += f(base + 4)
      }
      i += 1
    }
    scores(0) = s0; scores(1) = s1; scores(2) = s2
    scores(3) = s3; scores(4) = s4
  }
}

object LangId {
  final val Bits = 17
  final val Buckets = 1 << Bits
  final val Mask = Buckets - 1

  /** Byte 1–3-grams hashed with the pinned Murmur3-32 (seed 0x9747b28c) —
    * via the specialized 1-3-byte entry points (bit-identical to the
    * generic `Murmur3.hash`, minus the block loop / length match per call,
    * which at 3 hashes per byte position is the scorer's hot loop).
    */
  @inline def foreachNgramHash(bytes: Array[Byte])(f: Int => Unit): Unit = {
    val len = bytes.length
    var i = 0
    while (i < len) {
      f(Murmur3.hash1(bytes(i), Murmur3.DefaultSeed) & Mask)
      if (i + 2 <= len)
        f(Murmur3.hash2(bytes(i), bytes(i + 1), Murmur3.DefaultSeed) & Mask)
      if (i + 3 <= len)
        f(Murmur3.hash3(bytes(i), bytes(i + 1), bytes(i + 2), Murmur3.DefaultSeed) & Mask)
      i += 1
    }
  }

  /** Precomputed hash tables for 1- and 2-byte n-grams (2/3 of all hash
    * calls): 1 KB + 256 KB of ints, bit-identical to hash1/hash2. */
  private[core] lazy val hash1Table: Array[Int] =
    Array.tabulate(256)(b => Murmur3.hash1(b.toByte, Murmur3.DefaultSeed) & Mask)
  private[core] lazy val hash2Table: Array[Int] =
    Array.tabulate(65536)(k => Murmur3.hash2((k & 0xff).toByte,
      ((k >> 8) & 0xff).toByte, Murmur3.DefaultSeed) & Mask)

  /** The one model instance (lazy; ~2.6 MB). Deterministic. */
  lazy val model: LangIdModel = build()

  def build(): LangIdModel = {
    val langs = Vocab.Langs.toArray
    val weights = langs.map { lang =>
      val corpus = Vocab.corpus(lang).toLowerCase(Locale.ROOT).getBytes(UTF_8)
      val counts = new Array[Int](Buckets)
      var total = 0L
      foreachNgramHash(corpus) { h => counts(h) += 1; total += 1 }
      val w = new Array[Float](Buckets)
      val denom = total.toDouble + 0.5 * Buckets
      var h = 0
      while (h < Buckets) {
        w(h) = math.log((counts(h) + 0.5) / denom).toFloat
        h += 1
      }
      w
    }
    new LangIdModel(langs, weights)
  }
}
