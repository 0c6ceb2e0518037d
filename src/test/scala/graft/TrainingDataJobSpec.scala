package graft

import guards.QualityPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import pipeline.{SynthStore, TrainingDataJob}

/** End-to-end composition: quality-filtered turns → conversation-level
  * dedup → group-coherent splits → sequence packing.
  */
class TrainingDataJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def kept = QualityPipeline.score(
    SynthStore(2000L).read(spark).toDF()).filter(col("keep"))

  test("duplicate conversations are dropped whole; packing covers the rest") {
    val base = kept.cache()
    try {
      val someConv = base.select("conv_id").head().getString(0)
      // plant an exact duplicate conversation under a later-sorting id
      val planted = base.unionByName(
        base.filter(col("conv_id") === someConv)
          .withColumn("conv_id", concat(lit("zzdup_"), col("conv_id"))))
      val convsIn = planted.select("conv_id").distinct().count()
      val (assigned, res) = TrainingDataJob.assign(spark, planted,
        maxTokens = 512, packPartitions = 4)
      assert(res.convsIn == convsIn)
      assert(res.convsKept == convsIn - 1, "exactly the planted dup dropped")
      // the ORIGINAL id survives (min conv_id wins)
      val ids = assigned.select("conv_id").collect().map(_.getString(0)).toSet
      assert(ids.contains(someConv) && !ids.contains(s"zzdup_$someConv"))
      // every surviving conversation assigned exactly once
      assert(assigned.groupBy("conv_id").count()
        .filter(col("count") > 1).count() == 0)
      // capacity respected within every (split, seq) except oversize bins
      val overfull = assigned.groupBy("split", "seq_id")
        .agg(sum("n_tokens").as("t"), max(col("oversize").cast("int")).as("ov"))
        .filter(col("ov") === 0 && col("t") > 512).count()
      assert(overfull == 0)
      // splits partition the conversations
      assert(res.splitConvs.values.sum == res.convsKept)
      info(s"convs ${res.convsKept}, splits ${res.splitConvs}, " +
        s"bins ${res.bins}, fill ${res.fillRatio}")
      assert(res.fillRatio > 0.5)
    } finally base.unpersist()
  }

  test("assignment is deterministic across reruns") {
    def once() = TrainingDataJob.assign(spark, kept,
      maxTokens = 512, packPartitions = 4)._1
      .select("conv_id", "split", "seq_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(once().sameElements(once()))
  }
}
