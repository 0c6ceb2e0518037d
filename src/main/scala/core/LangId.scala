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
final class LangIdModel(val langs: Array[String], val weights: Array[Array[Float]])
    extends Serializable {

  def score(text: String): (String, Double) = {
    val t = TextStats.norm(text)
    if (t.isEmpty) return ("und", 0.0)
    val bytes = t.toLowerCase(Locale.ROOT).getBytes(UTF_8)
    if (bytes.length == 0) return ("und", 0.0)
    val scores = new Array[Double](langs.length)
    LangId.foreachNgramHash(bytes) { h =>
      var l = 0
      while (l < langs.length) { scores(l) += weights(l)(h); l += 1 }
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

  /** Byte 1–3-grams hashed with the pinned Murmur3-32 (seed 0x9747b28c). */
  @inline def foreachNgramHash(bytes: Array[Byte])(f: Int => Unit): Unit = {
    val len = bytes.length
    var i = 0
    while (i < len) {
      f(Murmur3.hash(bytes, i, 1, Murmur3.DefaultSeed) & Mask)
      if (i + 2 <= len) f(Murmur3.hash(bytes, i, 2, Murmur3.DefaultSeed) & Mask)
      if (i + 3 <= len) f(Murmur3.hash(bytes, i, 3, Murmur3.DefaultSeed) & Mask)
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
