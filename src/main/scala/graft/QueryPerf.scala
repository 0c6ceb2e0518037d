package graft

import org.apache.spark.sql.SparkSession
import pipeline.Sessions

/** Diagnostic: time named driver-contract queries repeatedly on one warm
  * session — for separating plan regressions from host noise.
  * runMain graft.QueryPerf <query> [query...]
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS
  */
object QueryPerf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryPerf <query name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      println(f"QPERF $name reps=$reps min=${sorted.head}%.3f " +
        f"median=${sorted(reps / 2)}%.3f max=${sorted.last}%.3f " +
        s"all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
