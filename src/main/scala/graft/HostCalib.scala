package graft

/** Fixed single-threaded host-health calibration: N byte-LM perplexity
  * passes over a pinned string. Wall-time depends only on host health
  * (one core, no Spark, no IO), so every perf record that embeds it
  * carries its own evidence of whether it was captured during one of the
  * documented whole-host degradation episodes. Healthy-host reference:
  * ≈ 0.38-0.41 s (BENCH/BASELINE.md).
  */
object HostCalib {
  def calibrate(): Double = {
    val model = core.ByteLM.build()
    val pinned = ("The quick brown fox jumps over the lazy dog; " +
      "pack my box with five dozen liquor jugs. 0123456789.") * 8
    var sink = 0.0
    // warm the loop once so JIT state doesn't dominate the measurement
    var w = 0
    while (w < 2000) { sink += model.perplexity(pinned); w += 1 }
    val t0 = System.nanoTime()
    var i = 0
    while (i < 20000) { sink += model.perplexity(pinned); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    if (sink == Double.MinValue) println(sink) // keep the loop un-elidable
    sec
  }
}
