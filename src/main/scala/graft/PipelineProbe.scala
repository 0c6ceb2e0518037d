package graft

import guards.QualityPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import pipeline.{Sessions, SynthStore}

/** Guide §1.4 decomposition of the label pipeline: forces successive
  * prefixes of the q_pipeline_labels plan (toRdd.count, the bench's
  * forcing) so the per-stage cost (generation, window, scoring, final
  * sort) is measured, not guessed. runMain graft.PipelineProbe [turns]
  */
object PipelineProbe {
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
    def force(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        println(f"PP $label%-16s #$i ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
      }
    }
    def turns = store.read(spark).toDF()
    force("gen")(turns)
    val w = Window.partitionBy("conv_id").orderBy(QualityPipeline.OrderCols.map(col): _*)
    force("gen+window")(turns
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev_idx", lag("turn_idx", 1).over(w))
      .withColumn("_prev_role", lag("role", 1).over(w)))
    force("score")(QualityPipeline.score(turns))
    // component variants of scorePostWindow, to localize per-row cost
    def withWin = QualityPipeline.withWindow(turns)
    force("win+stats")(guards.Rules.withStats(withWin))
    force("win+stats+lang")(guards.Rules.withStats(withWin)
      .withColumn("lang", guards.expr.ScoreFns.langIdLabel(col("_tn")))
      .withColumn("lang_conf", guards.expr.ScoreFns.langIdConf(col("_tn"))))
    force("win+stats+ppl")(guards.Rules.withStats(withWin)
      .withColumn("ppl", guards.expr.ScoreFns.bytePerplexity(col("_tn"))))
    force("win+scrub-only")(withWin
      .withColumn("scrubbed_text",
        guards.expr.ScoreFns.scrubText(coalesce(col("text"), lit("")))))
    force("labels-query")(SparkEntry.queries("q_pipeline_labels")(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")))
    def labelsSelect(sorted: org.apache.spark.sql.DataFrame) =
      QualityPipeline.scorePostWindow(sorted)
        .select(col("conv_id"), col("turn_idx"), col("keep"),
          concat_ws("|", col("rule_hits")).as("rule_hits"),
          col("lang"), col("scrubbed_text"))
    force("labels-win")(labelsSelect(
      QualityPipeline.withWindow(turns).orderBy("conv_id", "turn_idx")))
    force("labels-cwin")(labelsSelect(
      QualityPipeline.withWindowClustered(spark, turns)
        .orderBy("conv_id", "turn_idx")))
    force("labels-ckpt")(labelsSelect(
      QualityPipeline.withWindowClustered(spark, turns)
        .localCheckpoint(true)
        .orderBy("conv_id", "turn_idx")))
    // the frozen Bench.scala steady-pipeline formulation, verbatim
    force("bench-pipeline")(QualityPipeline.select(
      QualityPipeline.score(store.read(spark).toDF()))
      .filter(col("keep")))
    // the zero-shuffle clustered variant on the same generator input
    force("clustered")(QualityPipeline.scoreClustered(spark,
      store.read(spark).toDF()))
    force("bench-clustered")(QualityPipeline.select(
      QualityPipeline.scoreClustered(spark, store.read(spark).toDF()))
      .filter(col("keep")))
    spark.stop()
  }
}
