package core

/** Deterministic 64-bit LCG per FIXTURES.md §B: x' = x*6364136223846793005 +
  * 1442695040888963407. Order- and partition-independent generation is
  * achieved by seeding each stream with `mix(masterSeed, ordinal)`.
  * No Spark imports (SURVEY.md §8.1-§8.2).
  */
final class Lcg(seed: Long) {
  private[this] var x: Long = Lcg.mix(seed, 0x5deece66dL)

  def nextLong(): Long = {
    x = x * 6364136223846793005L + 1442695040888963407L
    x
  }

  /** Uniform in [0, n). n must be > 0. */
  def nextInt(n: Int): Int = {
    val v = nextLong() >>> 11 // 53 high-quality bits
    (v % n).toInt
  }

  /** Uniform double in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
}

object Lcg {
  /** splitmix64-style finalizer; decorrelates (seed, ordinal) streams. */
  def mix(a: Long, b: Long): Long = {
    var z = a ^ (b * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
