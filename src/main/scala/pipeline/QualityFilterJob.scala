package pipeline

import guards.QualityPipeline
import guards.expr.ScoreFns
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The production job (SURVEY.md §4.1): read → resume-filter → window →
  * (salted) score → rules → fork into filtered-output sink + per-partition
  * lineage/rule-hit metrics sink → commit manifest.
  *
  * Scale design (BASELINE.json:6):
  * - logical resume partitions: `pmod(murmur3_32(conv_id), 256)` — decoupled
  *   from shuffle parallelism (SURVEY.md §8.6), so restart granularity is
  *   stable across cluster sizes.
  * - skew: the window exchange must hash by conv_id (locality for the
  *   lag/row_number rules), which would make a mega-conversation a straggler
  *   if scoring ran in the same stage. With `salted=true` the window stage
  *   computes ONLY the O(1)/row lag columns, then a salted repartition on
  *   (conv_id, turn_idx) spreads every conversation across all cores for
  *   the expensive model scoring — per-turn rules no longer need conv
  *   locality because the window context is already attached to the row.
  * - AQE skew handling stays on for the join/agg side (Sessions.tune).
  */
object QualityFilterJob {
  final val LogicalPartitions = 256

  final case class Result(
      runId: String,
      processedPartitions: Seq[Int],
      skippedPartitions: Seq[Int],
      turnsIn: Long,
      turnsKept: Long,
      wallMs: Long)

  def metricsSchemaCols: Seq[String] =
    Seq("run_id", "partition_id", "rule", "hits", "turns_in", "turns_kept",
      "bytes_in", "wall_ms")

  /** End-to-end run with idempotent partition-granular resume. */
  def run(
      spark: SparkSession,
      store: TranscriptStore,
      outDir: String,
      runId: String,
      salted: Boolean = true,
      inputSnapshot: String = "synth@seed42",
      configSha: String = "rulespec-v1"): Result = {
    val t0 = System.nanoTime()
    // dynamic partition overwrite => re-running a partition replaces exactly
    // that partition's files (idempotence); untouched partitions survive.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val committed: Set[Int] = Manifest.read(outDir) match {
      case Some(m) if m.inputSnapshot == inputSnapshot && m.configSha == configSha =>
        m.committed
      case _ => Set.empty
    }

    val turns = store.read(spark).toDF()
      .withColumn("part_id", ScoreFns.convPartId(col("conv_id"), LogicalPartitions))
    // resume filter BEFORE any heavy work; partitions are sets of whole
    // conversations so dropping them never breaks window locality
    val pending =
      if (committed.isEmpty) turns
      else turns.filter(!col("part_id").isin(committed.toSeq: _*))

    val scored0 = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("conv_id")
        .orderBy(QualityPipeline.OrderCols.map(col): _*)
      val withWin = pending
        .withColumn("_rn", row_number().over(w))
        .withColumn("_prev_idx", lag("turn_idx", 1).over(w))
        .withColumn("_prev_role", lag("role", 1).over(w))
      val spread =
        if (salted) withWin.repartition(col("conv_id"), col("turn_idx"))
        else withWin
      QualityPipeline.scorePostWindow(spread)
    }
    val scored = scored0.persist()
    try {
      // ---- sink 1: kept + scrubbed turns, partitioned by logical part id
      scored.filter(col("keep"))
        .select(col("part_id"), col("conv_id"), col("turn_idx"), col("role"),
          col("scrubbed_text"), col("tool"), col("ts"), col("lang"),
          col("lang_conf"), col("ppl"))
        .write.mode(SaveMode.Overwrite).partitionBy("part_id")
        .parquet(s"$outDir/kept")

      // ---- sink 2: per-partition lineage + rule-hit metrics (SURVEY.md §2.3)
      val wallMsSoFar = (System.nanoTime() - t0) / 1000000L
      val totals = scored.groupBy(col("part_id").as("partition_id")).agg(
        count(lit(1)).as("turns_in"),
        sum(col("keep").cast("long")).as("turns_kept"),
        sum(octet_length(coalesce(col("text"), lit(""))).cast("long")).as("bytes_in"))
      val byRule = scored
        .select(col("part_id").as("partition_id"), explode(col("rule_hits")).as("rule"))
        .groupBy("partition_id", "rule").agg(count(lit(1)).as("hits"))
      val totalRows = totals
        .withColumn("rule", lit("_total"))
        .withColumn("hits", col("turns_in") - col("turns_kept"))
      val metrics = byRule.join(totals, "partition_id")
        .unionByName(totalRows)
        .withColumn("run_id", lit(runId))
        .withColumn("wall_ms", lit(wallMsSoFar))
        .select(metricsSchemaCols.map(col): _*)
      metrics.write.mode(SaveMode.Overwrite).partitionBy("partition_id")
        .parquet(s"$outDir/metrics")

      // ---- commit: all pending partitions that produced rows
      val stats = scored.agg(
        count(lit(1)), sum(col("keep").cast("long")),
        collect_set(col("part_id"))).head()
      val turnsIn = stats.getLong(0)
      val turnsKept = if (stats.isNullAt(1)) 0L else stats.getLong(1)
      val processed = stats.getSeq[Int](2).sorted
      Manifest.write(outDir, Manifest(runId, inputSnapshot, configSha,
        committed ++ processed))
      Result(runId, processed, committed.toSeq.sorted, turnsIn, turnsKept,
        (System.nanoTime() - t0) / 1000000L)
    } finally {
      scored.unpersist()
    }
  }
}
