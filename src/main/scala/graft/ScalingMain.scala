package graft

import guards.QualityPipeline
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import pipeline.{Sessions, SynthStore}

/** The N-vs-4N scaling evidence (north rule; BASELINE.md methodology):
  * runs the identical full-output pipeline on the identical deterministic
  * input at local[8] and local[32] in ONE JVM (sequential contexts, so JIT
  * state is shared), best-of-`reps` per level, and prints throughput at
  * both plus the scaling efficiency (thr₃₂/thr₈)/4.
  *
  * Usage: runMain graft.ScalingMain [turns] [reps]
  */
object ScalingMain {
  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  private def measure(cpus: Int, target: Long, reps: Int): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    val store = SynthStore(target)
    val turnsIn = store.read(spark).count()
    def once(): Double = {
      val t0 = System.nanoTime()
      force(QualityPipeline.select(QualityPipeline.score(store.read(spark).toDF()))
        .filter(col("keep")))
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup at this parallelism
    val best = (1 to reps).map(_ => once()).min
    spark.stop()
    (turnsIn, best)
  }

  def main(args: Array[String]): Unit = {
    val target = args.headOption.map(_.toLong).getOrElse(2000000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val (n8, t8) = measure(8, target, reps)
    val (n32, t32) = measure(32, target, reps)
    require(n8 == n32)
    val thr8 = n8 / t8
    val thr32 = n32 / t32
    val eff = (thr32 / thr8) / 4.0
    println(f"""{"turns":$n8,"sec_local8":$t8%.3f,"sec_local32":$t32%.3f,"thr_local8":$thr8%.0f,"thr_local32":$thr32%.0f,"scaling_efficiency":$eff%.3f}""")
  }
}
