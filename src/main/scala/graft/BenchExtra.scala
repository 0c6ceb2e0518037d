package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import pipeline.Sessions

/** Guide §1.4 companion to graft.Bench (which is frozen for measurement):
  * per-query isolation with cold + warm repetitions and job/stage counts
  * from a SparkListener, so an optimization's effect shows up as "jobs
  * 14 → 6" and not just noisy seconds. Results go to stdout as one line
  * per query.
  *
  * runMain graft.BenchExtra [query...]   (default: the heavy set)
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS
  */
object BenchExtra {
  private final class Counts extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
    }
  }

  val HeavySet: Seq[String] = Seq(
    "q_pipeline_labels", "q_curate_e2e", "q_pipeline_rulehits",
    "q_dedup_inc_near", "q_rulehits_sketch", "q_training_e2e",
    "q_pipeline_mp", "q_dedup_drop", "q_dedup_groups", "q_dedup_lines_nl",
    "q_bm25", "q_multimodal", "q_semdedup", "q_dedup_spans",
    "q_multimodal_audio", "q_agg_pricing", "q_dedup_lines",
    "q_dedup_inc_fallback", "q_dedup_inc_hashed", "q_quality_rep",
    "q_decontaminate_fuzzy", "q_dedup_minhash", "q_dedup_incremental",
    "q_dedup_simhash", "q_dedup_embedding", "q_decontaminate", "q_dsir")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else HeavySet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val times = (1 to reps).map { i =>
        val c = new Counts
        spark.sparkContext.addSparkListener(c)
        spark.sparkContext.setJobDescription(s"bench-extra $name rep$i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(c)
        (sec, c.jobs.get(), c.stages.get(), c.tasks.get())
      }
      val warm = times.drop(1).map(_._1)
      val warmMin = if (warm.nonEmpty) warm.min else times.head._1
      println(f"XBENCH $name cold=${times.head._1}%.3f warmMin=$warmMin%.3f " +
        s"jobs=${times.head._2} stages=${times.head._3} tasks=${times.head._4} " +
        s"all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
