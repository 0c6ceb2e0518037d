package graft

import java.nio.charset.StandardCharsets.UTF_8

/** Fixed single-threaded host-health calibration: N byte-LM perplexity
  * passes over a pinned string. Wall-time depends only on host health
  * (one core, no Spark, no IO), so every perf record that embeds it
  * carries its own evidence of whether it was captured during one of the
  * documented whole-host degradation episodes. Healthy-host reference:
  * ≈ 0.38-0.41 s (BENCH/BASELINE.md).
  *
  * The calibration KERNEL is pinned here verbatim (the round-7 per-byte
  * perplexity loop: generic Murmur3 tail hashing + a math.log per byte),
  * deliberately NOT delegating to `ByteLMModel.perplexity`: the round-8
  * scorer optimizations (log memo, unigram log table, specialized 1-3-byte
  * hashes) made the production path ~2.5× faster, and a calibration that
  * inherited them would read ~0.17 s healthy — under the frozen
  * 1.5 × 0.41 s degraded gate even on a 3×-slowed host, silently killing
  * the whole-sweep rerun. The pinned kernel keeps the 0.41 s healthy
  * reference (and every historical calibration record) meaningful.
  */
object HostCalib {
  /** The round-7 `ByteLMModel.perplexity` body, frozen as the calibration
    * workload (same counts tables, same per-byte arithmetic and hashing
    * path as when the 0.41 s reference was pinned).
    */
  private def pplPinned(model: core.ByteLMModel, text: String): Double = {
    val bytes = text.getBytes(UTF_8)
    val len = bytes.length
    var sum = 0.0
    var i = 0
    while (i < len) {
      if (i < 2) {
        sum += math.log((model.uniCount(bytes(i) & 0xff) + 0.5) /
          (model.uniTotal + 128.0))
      } else {
        val c2 = model.ctxCount(
          core.Murmur3.hash(bytes, i - 2, 2, core.ByteLM.CtxSeed) & core.ByteLM.Mask)
        if (c2 > 0) {
          val c3 = model.triCount(
            core.Murmur3.hash(bytes, i - 2, 3, core.ByteLM.CtxSeed) & core.ByteLM.Mask)
          val p = math.min(1.0, (c3 + 0.1) / (c2 + 0.1 * 256))
          sum += math.log(p)
        } else {
          sum += math.log((model.uniCount(bytes(i) & 0xff) + 0.5) /
            (model.uniTotal + 128.0))
        }
      }
      i += 1
    }
    math.exp(-sum / len)
  }

  def calibrate(): Double = {
    val model = core.ByteLM.build()
    val pinned = ("The quick brown fox jumps over the lazy dog; " +
      "pack my box with five dozen liquor jugs. 0123456789.") * 8
    var sink = 0.0
    // warm the loop once so JIT state doesn't dominate the measurement
    var w = 0
    while (w < 2000) { sink += pplPinned(model, pinned); w += 1 }
    val t0 = System.nanoTime()
    var i = 0
    while (i < 20000) { sink += pplPinned(model, pinned); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    if (sink == Double.MinValue) println(sink) // keep the loop un-elidable
    sec
  }
}
