package operators

/** Guide §1 micro-measurement for the multimodal path (no Spark): times
  * PNG/WAV render vs decode+featurize separately over the fixture's
  * doc_id-derived sizes, so the parallelization decision (which half is
  * worth moving off the single scan task) is measured, not guessed.
  *
  * runMain operators.MediaBench [nDocs]
  */
object MediaBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val texts = Array.tabulate(n)(i => s"doc text $i " + ("word " * 40))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var pngs: Array[Array[Byte]] = null
    val tRender = time {
      pngs = Array.tabulate(n) { i =>
        val w = (i % 64) + 16
        val h = ((i * 7) % 64) + 16
        Multimodal.renderPng(i.toLong, texts(i), w, h)
      }
    }
    var ok = 0
    val tDecode = time {
      var i = 0
      while (i < n) {
        Multimodal.decodeImage(pngs(i)).foreach { img =>
          Multimodal.featurize(img); ok += 1
        }
        i += 1
      }
    }
    var wavs: Array[Array[Byte]] = null
    val tWavRender = time {
      wavs = Array.tabulate(n)(i => Multimodal.renderWav(i.toLong, texts(i)))
    }
    var okW = 0
    val tWavDecode = time {
      var i = 0
      while (i < n) {
        Multimodal.decodeWav(wavs(i)).foreach { s =>
          Multimodal.featurizeAudio(s); okW += 1
        }
        i += 1
      }
    }
    println(f"MB png  render $tRender%7.2f s  decode+feat $tDecode%7.2f s ($ok ok)")
    println(f"MB wav  render $tWavRender%7.2f s  decode+feat $tWavDecode%7.2f s ($okW ok)")
  }
}
