package graft

import core.SynthGen
import guards.expr.ScoreFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import pipeline.SynthStore

/** Ad-hoc perf decomposition (not a correctness gate). */
class PerfProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val N = 50000L

  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"PROBE $label%-28s $s%8.2f s   ($n rows, ${n / s}%.0f rows/s)")
  }

  test("pipeline stage timing at 50k turns") {
    val base = SynthStore(N).read(spark).toDF()
    time("gen only")(base.count())
    time("gen only (2nd)")(base.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx", "ts", "role")
    val withWin = base
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev_idx", lag("turn_idx", 1).over(w))
      .withColumn("_prev_role", lag("role", 1).over(w))
    time("gen+window")(withWin.count())
    val tn = guards.Rules.textN(col("text"))
    time("gen+langid")(base.select(ScoreFns.langIdLabel(tn).as("l")).filter(col("l") =!= "xx").count())
    time("gen+ppl")(base.select(ScoreFns.bytePerplexity(tn).as("p")).filter(col("p") >= 0).count())
    time("gen+scrub")(base.select(ScoreFns.scrubText(tn).as("s")).filter(length(col("s")) >= 0).count())
    val rules = guards.Rules.all(col("text"), col("role"), col("tool"), col("turn_idx"),
      lit(1), lit(0), lit(null).cast("string"),
      lit("en"), lit(1.0), lit(1.0))
    time("gen+rules-only")(guards.Rules.withStats(base)
      .withColumn("rh", guards.Rules.ruleHits(rules))
      .filter(size(col("rh")) >= 0).count())
    time("full score")(guards.QualityPipeline.score(base).filter(col("keep")).count())
    time("full score (2nd)")(guards.QualityPipeline.score(base).filter(col("keep")).count())
  }

  test("core scoring loop at 20k turns (single-threaded baseline)") {
    val turns = SynthGen.corpus(20000).map(_.toTurn)
    val t0 = System.nanoTime()
    val scored = core.OracleEvaluator.evaluate(turns)
    val s = (System.nanoTime() - t0) / 1e9
    info(f"oracle ${turns.size} turns in $s%.2f s (${turns.size / s}%.0f turns/s single-thread)")
    assert(scored.nonEmpty)
  }
}
