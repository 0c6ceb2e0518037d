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
    LangId.foreachNgramHash(bytes) { h =>
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
