package graft

import org.apache.spark.sql.SparkSession
import pipeline.Sessions

/** One-shot perf-drift report (VERDICT r7 ask #7): compares CURRENT warm
  * medians of the heavy queries against the committed round-8 reference
  * table below and emits one JSON line — a tool, not a CI assertion (the
  * host is too noisy for pass/fail bars; interpret ratios against the
  * bracketing calibration also included in the line).
  *
  * runMain graft.PerfDrift   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_REPS — warm reps per query AFTER one untimed cold run)
  */
object PerfDrift {
  /** Round-8 final warm medians (BenchExtra warmMin class, sf0.1,
    * local[32], healthy host ≈0.41 s calibration) — the reference future
    * rounds diff against. Update ONLY from a healthy-calibration session
    * and record the change in BENCH/BASELINE.md.
    */
  val ReferenceSec: Map[String, Double] = Map(
    "q_pipeline_labels" -> 3.6,
    "q_curate_e2e" -> 3.7,
    "q_pipeline_rulehits" -> 2.7,
    "q_dedup_inc_near" -> 3.2,
    "q_rulehits_sketch" -> 2.4,
    "q_training_e2e" -> 3.1,
    "q_pipeline_mp" -> 1.2,
    "q_dedup_lines_nl" -> 1.25,
    "q_dedup_spans" -> 1.45,
    "q_multimodal" -> 0.85,
    "q_multimodal_audio" -> 0.55,
    "q_bm25" -> 0.67)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    val calibPre = HostCalib.calibrate()
    val rows = ReferenceSec.toSeq.sortBy(_._1).map { case (name, ref) =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).queryExecution.toRdd.count() // untimed cold run
      val warm = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = warm(warm.length / 2)
      f""""$name":{"ref":$ref%.2f,"warm":$med%.3f,"ratio":${med / ref}%.2f}"""
    }
    val calibPost = HostCalib.calibrate()
    println(s"""{"metric":"perf_drift","sf":"$sfDir","cpus":$cpus,""" +
      s""""calib_pre_sec":$calibPre,"calib_post_sec":$calibPost,""" +
      s""""queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
