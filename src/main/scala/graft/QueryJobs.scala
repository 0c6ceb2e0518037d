package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import pipeline.Sessions

/** Per-job wall-time profile of a declared query (guide §1): runs the
  * query REPS times and prints every Spark job's duration + description
  * for the LAST (warm) repetition, so fixed per-job overhead and the
  * dominant jobs are visible. runMain graft.QueryJobs <query> [reps]
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
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
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val lsn = if (i == reps) Some(new JobTimingListener("QJ")) else None
      lsn.foreach(spark.sparkContext.addSparkListener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"QJ $name #$i total ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      lsn.foreach(spark.sparkContext.removeSparkListener)
    }
    spark.stop()
  }
}
