package graft

import guards.QualityPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import pipeline.{SynthStore, TrainingDataJob}
import scala.jdk.CollectionConverters._

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

  test("single-action summary stats equal the reference three-action formulation") {
    // assign() derives convsKept / splitConvs / bins / fillRatio from ONE
    // per-split rollup; this pins them against the direct (count,
    // groupBy-split, global bin agg) computation over the same assignment
    val (assigned, res) = TrainingDataJob.assign(spark, kept,
      maxTokens = 512, packPartitions = 4)
    val a = assigned.cache()
    try {
      assert(res.convsKept == a.count())
      assert(res.splitConvs == a.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
      val binStats = a.groupBy("split", "seq_id")
        .agg(sum("n_tokens").as("t"), max(col("oversize").cast("int")).as("over"))
        .agg(count(lit(1)).as("bins"),
          try_divide(sum(when(col("over") === 0, col("t")).otherwise(0)),
            sum(when(col("over") === 0, 1).otherwise(0)) * 512L).as("fill"))
        .head()
      assert(res.bins == binStats.getAs[Long]("bins"))
      assert(res.fillRatio == binStats.getAs[Double]("fill"),
        "fill must be the same IEEE division of the same long totals")
    } finally a.unpersist()
  }

  test("assignment is deterministic across reruns") {
    def once() = TrainingDataJob.assign(spark, kept,
      maxTokens = 512, packPartitions = 4)._1
      .select("conv_id", "split", "seq_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(once().sameElements(once()))
  }

  test("materialized sequences: manifest commit, no-op rerun, resume equals a clean run") {
    val dir = java.nio.file.Files.createTempDirectory("tdj-run").toString
    val base = kept.cache()
    def readSeqs = spark.read.parquet(s"$dir/sequences")
      .collect().map(r => (r.getAs[String]("split"), r.getAs[Long]("seq_id"),
        r.getAs[Seq[String]]("conv_ids").mkString(","),
        r.getAs[Long]("n_convs"), r.getAs[Long]("n_tokens"))).sorted
    def listing = {
      val root = java.nio.file.Paths.get(dir, "sequences")
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => (p.toString, java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toVector.sorted
      finally s.close()
    }
    try {
      val r1 = TrainingDataJob.run(spark, base, dir, "run1",
        maxTokens = 512, packPartitions = 4)
      assert(r1.processedSplits == Seq("train", "val", "test")
        && r1.result.nonEmpty)
      val first = readSeqs
      val files1 = listing
      assert(first.nonEmpty && files1.nonEmpty)
      // sequences partition the assigned conversations exactly once
      val convCount = first.map(_._4).sum
      assert(convCount == r1.result.get.convsKept)

      // fully-committed rerun: a no-op — no splits processed, no files
      // touched, no assignment computed
      val r2 = TrainingDataJob.run(spark, base, dir, "run2",
        maxTokens = 512, packPartitions = 4)
      assert(r2.processedSplits.isEmpty && r2.result.isEmpty
        && r2.skippedSplits == Seq("train", "val", "test"))
      assert(listing == files1, "no-op rerun rewrote files")

      // simulated partial failure: manifest lost the val commit; resume
      // reprocesses ONLY val and the table equals the clean run's
      pipeline.Manifest.write(dir,
        pipeline.Manifest("run1", "synth@seed42", "trainspec-v1", Set(0, 2)))
      val r3 = TrainingDataJob.run(spark, base, dir, "run3",
        maxTokens = 512, packPartitions = 4)
      assert(r3.processedSplits == Seq("val")
        && r3.skippedSplits == Seq("train", "test"))
      assert(readSeqs.sameElements(first), "resumed val diverged from clean run")

      // a changed config sha invalidates the whole commit
      val r4 = TrainingDataJob.run(spark, base, dir, "run4",
        maxTokens = 512, packPartitions = 4, configSha = "trainspec-v2")
      assert(r4.processedSplits == Seq("train", "val", "test"))
      assert(readSeqs.sameElements(first))
    } finally base.unpersist()
  }

  test("invalidated commit clears the table: an empty split leaves no stale generation") {
    val dir = java.nio.file.Files.createTempDirectory("tdj-stale").toString
    val base = kept.cache()
    try {
      // generation 1: big val slice guarantees split=val files on disk
      TrainingDataJob.run(spark, base, dir, "g1", maxTokens = 512,
        valPermille = 300, testPermille = 10, packPartitions = 4,
        configSha = "v1")
      val valDir = new java.io.File(s"$dir/sequences/split=val")
      assert(valDir.exists, "generation 1 must materialize a val partition")
      // generation 2 invalidates the commit AND produces ZERO val rows —
      // dynamic overwrite alone would keep g1's val files and mark them
      // committed under v2
      val r2 = TrainingDataJob.run(spark, base, dir, "g2", maxTokens = 512,
        valPermille = 0, testPermille = 10, packPartitions = 4,
        configSha = "v2")
      assert(r2.processedSplits == Seq("train", "val", "test"))
      assert(!valDir.exists, "stale generation-1 val files survived invalidation")
      val out = spark.read.parquet(s"$dir/sequences")
      assert(out.filter(col("split") === "val").count() == 0)
      assert(out.count() > 0)
    } finally base.unpersist()
  }
}
