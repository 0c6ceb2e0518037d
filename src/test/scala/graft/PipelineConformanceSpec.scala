package graft

import core.{OracleEvaluator, SynthGen}
import guards.{QualityPipeline, Scoring}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import pipeline.SynthStore

/** The graded conformance suite (SURVEY.md §6.3 b/c/d): pipeline labels vs
  * the Spark-free oracle on the deterministic 50k-turn... (5k in-suite; the
  * driver's Verify covers 50k) synthetic corpus. Checks violation-detection
  * multiset equality, keep/drop F1 (contract ≥0.99, design exact), byte-exact
  * cleansing equivalence, and tier/partitioning invariance.
  */
class PipelineConformanceSpec extends AnyFunSuite {
  private val Target = 5000L

  private lazy val spark = SparkTestSession.spark

  private lazy val oracle: Map[(String, Int), (Seq[String], Boolean, String)] = {
    val turns = SynthGen.corpus(Target).map(_.toTurn)
    OracleEvaluator.evaluate(turns)
      .map(s => (s.conv_id, s.turn_idx) -> ((s.rule_hits, s.keep, s.scrubbed_text)))
      .toMap
  }

  private def pipelineLabels(df: org.apache.spark.sql.DataFrame) =
    df.select("conv_id", "turn_idx", "rule_hits", "keep", "scrubbed_text")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getSeq[String](2), r.getBoolean(3), r.getString(4))))
      .toMap

  test("violation detection + cleansing equivalence: Column tier == oracle, F1 = 1.0") {
    val scored = QualityPipeline.select(
      QualityPipeline.score(SynthStore(Target).read(spark).toDF()))
    val got = pipelineLabels(scored)
    assert(got.size == oracle.size)
    var tp = 0L; var fp = 0L; var fn = 0L
    val diffs = oracle.flatMap { case (k, (oHits, oKeep, oScrub)) =>
      val (pHits, pKeep, pScrub) = got(k)
      if (pKeep && oKeep) tp += 1
      if (pKeep && !oKeep) fp += 1
      if (!pKeep && oKeep) fn += 1
      if (pHits != oHits || pKeep != oKeep || pScrub != oScrub)
        Some(s"$k oracle=($oHits,$oKeep) pipeline=($pHits,$pKeep) scrubEq=${oScrub == pScrub}")
      else None
    }
    val f1 = 2.0 * tp / (2.0 * tp + fp + fn)
    info(s"keep/drop F1 = $f1 over ${oracle.size} turns")
    assert(diffs.isEmpty, diffs.take(10).mkString("\n"))
    assert(f1 >= 0.99)
    assert(f1 == 1.0, "design target is exact agreement")
  }

  test("mapPartitions-batched tier == Column tier (broadcast models)") {
    val got = pipelineLabels(
      Scoring.scoreBatched(spark, SynthStore(Target).read(spark).toDF()).toDF())
    val diffs = oracle.collect {
      case (k, o) if got(k) != o => s"$k ${got(k)} != $o"
    }
    assert(diffs.isEmpty, diffs.take(10).mkString("\n"))
  }

  test("zero-shuffle clustered path == oracle (conv-contiguous source)") {
    val got = pipelineLabels(QualityPipeline.select(
      QualityPipeline.scoreClustered(spark, SynthStore(Target).read(spark).toDF())))
    assert(got.size == oracle.size)
    val diffs = oracle.collect {
      case (k, o) if got(k) != o => s"$k ${got(k)} != $o"
    }
    assert(diffs.isEmpty, diffs.take(10).mkString("\n"))
  }

  test("labels invariant under repartitioning (scale-path determinism)") {
    val base = SynthStore(Target).read(spark).toDF()
    val shuffled = base.repartition(13, col("turn_idx")) // destroys conv locality
    val got = pipelineLabels(QualityPipeline.select(QualityPipeline.score(shuffled)))
    val diffs = oracle.collect {
      case (k, o) if got(k) != o => s"$k ${got(k)} != $o"
    }
    assert(diffs.isEmpty, diffs.take(10).mkString("\n"))
  }

  test("cleansing equivalence via exceptAll in both directions") {
    import spark.implicits._
    val scored = QualityPipeline.select(
      QualityPipeline.score(SynthStore(Target).read(spark).toDF()))
      .select(col("conv_id"), col("turn_idx"), col("scrubbed_text"))
    val oracleDf = oracle.toSeq
      .map { case ((c, i), (_, _, s)) => (c, i, s) }
      .toDF("conv_id", "turn_idx", "scrubbed_text")
    assert(scored.exceptAll(oracleDf).isEmpty)
    assert(oracleDf.exceptAll(scored).isEmpty)
  }
}
