package core

import java.nio.charset.StandardCharsets.UTF_8

/** KenLM-style byte-trigram language model with backoff-to-unigram
  * (SURVEY.md §3.3 "Perplexity", anchored by BASELINE.json:6). Counts come
  * from the embedded multilingual seed corpora + digits/punctuation
  * (Vocab.LmExtra) — deterministic, no training loop.
  *
  * p(b | b₋₂b₋₁) = (c₃ + 0.1)/(c₂ + 0.1·256)      when context count c₂ > 0
  *              = (c₁(b) + 0.5)/(N + 0.5·256)      (unigram backoff) otherwise
  * ppl(text) = exp(−(1/T)·Σ ln p), T = UTF-8 byte count; the first two
  * bytes always score with the unigram. Per-turn left-fold in byte order —
  * float-deterministic regardless of partitioning (SURVEY.md §3.3).
  *
  * Contexts are hashed into 2^18 buckets with the pinned Murmur3-32; hash
  * collisions are deterministic and therefore shared by oracle and pipeline.
  */
final class ByteLMModel(
    val ctxCount: Array[Int],   // occurrences of 2-byte contexts (hashed)
    val triCount: Array[Int],   // occurrences of 3-byte sequences (hashed)
    val uniCount: Array[Long],  // exact byte unigram counts
    val uniTotal: Long)
    extends Serializable {

  /** ln p by byte value, precomputed once — identical `math.log` inputs,
    * so every sum term is the bit-exact value the inline form produced. */
  private val uniLog: Array[Double] =
    Array.tabulate(256)(b => math.log((uniCount(b) + 0.5) / (uniTotal + 128.0)))

  @inline private def lnUnigram(b: Int): Double = uniLog(b)

  def perplexity(text: String): Double = {
    val t = TextStats.norm(text)
    if (t.isEmpty) return 0.0
    val bytes = t.getBytes(UTF_8)
    val len = bytes.length
    // Direct-mapped per-thread memo of ln(min(1, (c3+0.1)/(c2+0.1·256)))
    // keyed on the (c2, c3) count pair: the log depends ONLY on the two
    // counts, and natural text repeats contexts heavily, so most bytes
    // skip the math.log (the dominant per-byte cost — measured ~10 µs/row
    // before). A memoized value is the same double the inline computation
    // yields, so the left-fold sum stays bit-identical.
    val memo = ByteLM.logMemo.get()
    val keys = memo.keys
    val vals = memo.vals
    var sum = 0.0
    var i = 0
    while (i < len) {
      if (i < 2) {
        sum += lnUnigram(bytes(i) & 0xff)
      } else {
        val c2 = ctxCount(
          Murmur3.hash2(bytes(i - 2), bytes(i - 1), ByteLM.CtxSeed) & ByteLM.Mask)
        if (c2 > 0) {
          val c3 = triCount(
            Murmur3.hash3(bytes(i - 2), bytes(i - 1), bytes(i), ByteLM.CtxSeed) & ByteLM.Mask)
          // key 0 (c2=0, c3=0) is unreachable here (c2 > 0), so 0 marks empty
          val key = (c2.toLong << 32) | (c3.toLong & 0xffffffffL)
          val slot = (Lcg.mix(key, 0L) & (ByteLM.MemoSize - 1)).toInt
          if (keys(slot) == key) {
            sum += vals(slot)
          } else {
            val p = math.min(1.0, (c3 + 0.1) / (c2 + 0.1 * 256))
            val lp = math.log(p)
            keys(slot) = key
            vals(slot) = lp
            sum += lp
          }
        } else {
          sum += lnUnigram(bytes(i) & 0xff)
        }
      }
      i += 1
    }
    math.exp(-sum / len)
  }
}

object ByteLM {
  final val Bits = 18
  final val Buckets = 1 << Bits
  final val Mask = Buckets - 1
  /** Distinct hash seed so ByteLM buckets don't alias LangId buckets. */
  final val CtxSeed = 0x2e1b2175

  /** Per-thread log-memo size (entries; ×16 B ≈ 512 KB per thread). */
  final val MemoSize = 1 << 15

  private[core] final class LogMemo {
    val keys = new Array[Long](MemoSize)
    val vals = new Array[Double](MemoSize)
  }
  private[core] val logMemo = new ThreadLocal[LogMemo] {
    override def initialValue(): LogMemo = new LogMemo
  }

  lazy val model: ByteLMModel = build()

  def build(): ByteLMModel = {
    val corpus =
      (Vocab.Langs.map(l => Vocab.corpus(l)) :+ Vocab.LmExtra).mkString(" ")
    val bytes = corpus.getBytes(UTF_8)
    val ctx = new Array[Int](Buckets)
    val tri = new Array[Int](Buckets)
    val uni = new Array[Long](256)
    var i = 0
    while (i < bytes.length) {
      uni(bytes(i) & 0xff) += 1
      if (i + 2 <= bytes.length) ctx(Murmur3.hash(bytes, i, 2, CtxSeed) & Mask) += 1
      if (i + 3 <= bytes.length) tri(Murmur3.hash(bytes, i, 3, CtxSeed) & Mask) += 1
      i += 1
    }
    new ByteLMModel(ctx, tri, uni, bytes.length.toLong)
  }
}
