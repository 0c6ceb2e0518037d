package graft

import guards.QualityPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import pipeline.{Sessions, SynthStore}

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  * Headline = the quality-filter pipeline's turns/sec on the deterministic
  * synthetic corpus sized by SPARK_GRAFT_SF_DIR (2M turns at sf0.1).
  * Scaling evidence (north rule: N vs 4N): run with SPARK_GRAFT_CPUS=8 and
  * =32 on the same input; efficiency = (thr32/thr8)/4 → BENCH/BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)

    // ---- headline: full-label pipeline throughput on the synth corpus ----
    val target = SparkEntry.synthTurns(sfDir)
    val store = SynthStore(target)
    val turnsIn = store.read(spark).count() // materialize-once warmup + size
    val t0 = System.nanoTime()
    val kept = QualityPipeline.score(store.read(spark).toDF())
      .filter(col("keep")).count()
    val pipelineSec = (System.nanoTime() - t0) / 1e9
    val turnsPerSec = turnsIn / pipelineSec

    // ---- full operator sweep ----
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val q0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - q0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipelineSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"pipeline_turns_in":$turnsIn,"pipeline_turns_kept":$kept,"pipeline_sec":$pipelineSec,"turns_per_sec":$turnsPerSec}""")
    spark.stop()
  }
}
