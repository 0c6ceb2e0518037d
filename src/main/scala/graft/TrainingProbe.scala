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
    time("convSummaries")(kept.groupBy("conv_id")
      .agg(
        sum(pmod(xxhash64(lit(1), col("turn_idx"), col("scrubbed_text")),
          lit(1L << 40))).as("fp"),
        sum(pmod(xxhash64(lit(2), col("turn_idx"), col("scrubbed_text")),
          lit(1L << 40))).as("fp2"),
        sum(size(split(col("scrubbed_text"), "\\s+"))).cast("int").as("n_tokens"))
      .queryExecution.toRdd.count())
    val lsn = new org.apache.spark.scheduler.SparkListener {
      private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t0.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (s, d) = t0.get(j.jobId)
        println(f"TPJOB ${j.jobId}%3d ${(System.nanoTime() - s) / 1e9}%6.2f s  $d")
      }
    }
    spark.sparkContext.addSparkListener(lsn)
    time("assign-full") {
      val (assigned, res) = TrainingDataJob.assign(spark, kept, maxTokens = 2048)
      res.convsKept
    }
    spark.stop()
  }
}
