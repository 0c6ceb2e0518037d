package graft

import guards.QualityPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import pipeline.{Sessions, SynthStore, TrainingDataJob}

/** Guide §1.4 decomposition of q_training_e2e: times the kept-turns
  * materialization, the conversation-summary aggregation, and the full
  * assign() separately so the residual tail cost is localized.
  * runMain graft.TrainingProbe [turns]
  */
object TrainingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    val target = math.max(1000L, SparkEntry.synthTurns(sfDir) / 4)
    def kept = QualityPipeline.score(SynthStore(target).read(spark).toDF())
      .filter(col("keep"))
    def time(label: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"TP $label%-14s #$i ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
      }
    time("kept")(kept.queryExecution.toRdd.count())
    time("convSummaries")(TrainingDataJob.convSummaries(kept, "scrubbed_text")
      .queryExecution.toRdd.count())
    spark.sparkContext.addSparkListener(new JobTimingListener("TPJOB"))
    time("assign-full") {
      val (assigned, res) = TrainingDataJob.assign(spark, kept, maxTokens = 2048)
      res.convsKept
    }
    spark.stop()
  }
}
