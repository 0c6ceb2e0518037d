package graft

import guards.QualityPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import pipeline.{Sessions, SynthStore}

/** Scratch: warm-vs-cold pipeline timing. runMain graft.PerfMain [turns] */
object PerfMain {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    val store = SynthStore(target)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PERF $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n)")
    }
    t("gen count")(store.read(spark).count())
    t("filter-count #1")(QualityPipeline.score(store.read(spark).toDF()).filter(col("keep")).count())
    t("filter-count #2")(QualityPipeline.score(store.read(spark).toDF()).filter(col("keep")).count())
    t("filter-count #3")(QualityPipeline.score(store.read(spark).toDF()).filter(col("keep")).count())
    t("select-count")(QualityPipeline.select(QualityPipeline.score(store.read(spark).toDF())).count())
    spark.stop()
  }
}
