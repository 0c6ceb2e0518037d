package graft

import core.{ByteLM, LangId, Scrub, SynthGen, TextStats}

/** Guide §1 micro-measurement for the per-row scoring hot path (no Spark):
  * times each scorer component over real synthetic turn texts so the
  * per-row budget of the pipeline family (q_pipeline_*, the headline) is
  * known before and after a change. Single-threaded by design — per-row
  * cost is what is being measured.
  *
  * runMain graft.ScorerBench [nTurns] [reps]
  */
object ScorerBench {
  def main(args: Array[String]): Unit = {
    val nTurns = args.headOption.map(_.toInt).getOrElse(50000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    // materialize texts once (generation timed separately)
    var texts: Array[String] = null
    val genSec = time {
      val nConv = SynthGen.nConversations(nTurns.toLong)
      texts = (0L until nConv).iterator
        .flatMap(SynthGen.genConv(_, nTurns.toLong))
        .map(t => if (t.text == null) "" else t.text)
        .toArray
    }
    println(f"SB gen         ${genSec}%8.3f s  (${texts.length} turns)")
    // warm the models outside the timed region
    LangId.model; ByteLM.model
    var sink = 0L
    def run(label: String)(f: String => Long): Unit = {
      val secs = (1 to reps).map { _ =>
        time { var i = 0; while (i < texts.length) { sink += f(texts(i)); i += 1 } }
      }
      val best = secs.min
      println(f"SB $label%-12s ${best}%8.3f s  ${best * 1e9 / texts.length}%8.0f ns/row" +
        f"  all=${secs.map(s => f"$s%.2f").mkString(",")}")
    }
    run("stats")(t => TextStats.stats(t).cp.toLong)
    run("langid")(t => LangId.model.score(t)._1.length.toLong)
    run("ppl")(t => ByteLM.model.perplexity(t).toLong)
    run("scrub")(t => Scrub(t).length.toLong)
    println(s"SB sink $sink")
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
}
