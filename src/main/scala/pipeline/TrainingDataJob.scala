package pipeline

import operators.{Packing, Sampling}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The downstream half of the training-data pipeline: what a corpus
  * consumer runs over `QualityFilterJob`'s kept output to get model-ready
  * data — conversation-level exact dedup, reproducible group-coherent
  * train/val/test splits, and fixed-token sequence packing.
  *
  * Everything is conversation-granular (the training unit): a duplicate
  * CONVERSATION is dropped whole, a conversation never straddles splits,
  * and packing bins whole conversations by their summed token count.
  *
  * Scale shape: one groupBy(conv_id) builds (fingerprint pair, n_tokens)
  * — each fingerprint is a sum of independently-seeded per-turn
  * xxhash64(seed, turn_idx, text) values, pure codegen,
  * order-independent-safe because turn_idx is hashed in; dedup is a
  * groupBy(fingerprint pair) min-winner + semi join on ids (never text);
  * split/packing add zero and one exchange respectively. Nothing in the
  * job touches turn text after the first aggregation.
  */
object TrainingDataJob {

  final case class Result(
      convsIn: Long,
      convsKept: Long,
      splitConvs: Map[String, Long],
      bins: Long,
      fillRatio: Double)

  /** Conversation summaries: (conv_id, fp, fp2, n_tokens). The
    * fingerprint is TWO independently-seeded sums of per-turn hashes,
    * each bounded into 2^40 before summing (ANSI mode faults on long
    * overflow; 2^40-bounded terms keep any conversation under 2^23 turns
    * overflow-free). One 40-bit sum alone would birthday-collide around
    * ~1.5M conversations and silently drop a distinct conversation; the
    * (fp, fp2) pair is ~80 bits — collision odds ~n²/2^81, negligible
    * through 10^9+ conversations.
    */
  def convSummaries(kept: DataFrame,
      textCol: String): DataFrame =
    kept.groupBy("conv_id")
      .agg(
        sum(pmod(xxhash64(lit(1), col("turn_idx"), col(textCol)), lit(1L << 40)))
          .as("fp"),
        sum(pmod(xxhash64(lit(2), col("turn_idx"), col(textCol)), lit(1L << 40)))
          .as("fp2"),
        sum(size(split(col(textCol), "\\s+"))).cast("int").as("n_tokens"))

  /** Run over a kept-turns DataFrame (conv_id, turn_idx, <textCol>, ...).
    * Returns the per-conversation assignment table
    * (conv_id, split, seq_id, n_tokens, oversize) — seq ids are unique
    * WITHIN a split, so (split, seq_id) is the sequence key — plus
    * summary stats.
    */
  def assign(spark: SparkSession, kept: DataFrame,
      maxTokens: Int = 2048,
      valPermille: Int = 10, testPermille: Int = 10,
      textCol: String = "scrubbed_text",
      packPartitions: Int = 0): (DataFrame, Result) = {
    val convs = convSummaries(kept, textCol).cache()
    try {
      val convsIn = convs.count()
      // conversation-level exact dedup: min conv_id wins per fingerprint
      val winners = convs.groupBy("fp", "fp2").agg(min("conv_id").as("conv_id"))
      val unique = convs.join(winners, Seq("fp", "fp2", "conv_id"), "left_semi")
      // persisted: the three per-split packs below each re-evaluate their
      // input, which without this cache re-ran the dedup groupBy + semi
      // join per split (4 evaluations total — measured ~2× the whole
      // assignment tail). Conv-sized rows, released in the finally.
      val split = Sampling.assignSplit(unique, "conv_id",
        valPermille, testPermille)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // pack per split so sequences never mix train and eval data; packing
      // keys on the conv_id string itself (packSequencesByKey), so the
      // group identity rides through the bin assignment verbatim — the
      // earlier xxhash64(conv_id) surrogate join could birthday-collide
      // two conversations in a split and assign both twice
      val packedPerSplit = Seq("train", "val", "test").map { s =>
        Packing.packSequencesByKey(
          split.filter(col("split") === s).select("conv_id", "n_tokens"),
          "conv_id", maxTokens, packPartitions)
          .toDF()
          .select(col("key").as("conv_id"), lit(s).as("split"),
            col("seq_id"), col("n_tokens"), col("oversize"))
      }
      val assigned = packedPerSplit.reduce(_ unionByName _).cache()
      try {
        // ONE stats action instead of three (count / per-split counts /
        // bin stats): every summary derives from the ≤3-row per-split
        // rollup of the per-(split, seq_id) aggregate — same long sums in
        // a different grouping order (order-independent), same final
        // double division, so every Result field is bit-identical while
        // `assigned` is scanned once, not three times.
        val perSplit = assigned
          .groupBy("split", "seq_id")
          .agg(count(lit(1)).as("n_convs"), sum("n_tokens").as("t"),
            max(col("oversize").cast("int")).as("over"))
          .groupBy("split")
          .agg(sum("n_convs").as("convs"), count(lit(1)).as("bins"),
            sum(when(col("over") === 0, col("t")).otherwise(0)).as("fill_num"),
            sum(when(col("over") === 0, 1).otherwise(0)).as("fill_bins"))
          .collect()
        val splitCounts = perSplit.map(r =>
          r.getString(0) -> r.getLong(1)).toMap
        val fillDen = perSplit.map(_.getLong(4)).sum * maxTokens.toLong
        val fillNum = perSplit.map(_.getLong(3)).sum
        (assigned,
          Result(convsIn, splitCounts.values.sum, splitCounts,
            perSplit.map(_.getLong(2)).sum,
            // matches the previous try_divide(BIGINT, BIGINT): both casts
            // to double then one IEEE division; zero non-oversize bins ⇒ 0.0
            if (fillDen == 0L) 0.0 else fillNum.toDouble / fillDen.toDouble))
      } finally {
        assigned.unpersist()
        split.unpersist()
      }
    } finally convs.unpersist()
  }

  final case class RunResult(
      runId: String,
      processedSplits: Seq[String],
      skippedSplits: Seq[String],
      result: Option[Result])

  private val SplitIds = Seq("train" -> 0, "val" -> 1, "test" -> 2)

  /** Materialize the model-ready packed-sequence table — the last meter of
    * the training-data pipeline: `assign`'s output aggregated to one row
    * per sequence (split, seq_id, sorted member conv_ids, conv/token
    * counts, oversize flag), written split-partitioned under the same
    * manifest / idempotence protocol as QualityFilterJob:
    *
    * - dynamic partition overwrite ⇒ re-running a split replaces exactly
    *   that split's files; committed splits are never rewritten;
    * - the manifest (temp-file + atomic rename) records committed splits
    *   under (inputSnapshot, configSha) — a changed input or rule config
    *   invalidates the commit and recomputes everything;
    * - a fully-committed rerun is a no-op that touches NO files (and skips
    *   the assignment computation entirely — `result` comes back None);
    * - assignment is deterministic (pinned packPartitions), so a resumed
    *   split's rows are identical to what a single clean run would have
    *   written — asserted in TrainingDataJobSpec.
    */
  def run(spark: SparkSession, kept: DataFrame, outDir: String, runId: String,
      maxTokens: Int = 2048,
      valPermille: Int = 10, testPermille: Int = 10,
      textCol: String = "scrubbed_text",
      packPartitions: Int = 32,
      inputSnapshot: String = "synth@seed42",
      configSha: String = "trainspec-v1"): RunResult = {
    val committed: Set[Int] = Manifest.read(outDir) match {
      case Some(m) if m.inputSnapshot == inputSnapshot && m.configSha == configSha =>
        m.committed
      case _ => Set.empty
    }
    val skipped = SplitIds.collect { case (s, i) if committed(i) => s }
    val pending = SplitIds.filterNot { case (_, i) => committed(i) }
    if (pending.isEmpty) return RunResult(runId, Nil, skipped, None)

    val (assigned0, res) = assign(spark, kept, maxTokens,
      valPermille, testPermille, textCol, packPartitions)

    // nothing committed = fresh start OR an invalidated prior commit
    // (changed snapshot/config). Dynamic overwrite only replaces
    // partitions the new write PRODUCES — a pending split that happens to
    // pack zero sequences under the new config would silently keep the
    // OLD config's files and then be marked committed. Clear the table
    // outright so invalidation can never mix generations — AFTER the
    // expensive assignment succeeded (deleting first would destroy the
    // previous generation even when this run dies before writing), and
    // loudly: a delete that fails without throwing would reintroduce the
    // generation mix
    val seqPath = new org.apache.hadoop.fs.Path(s"$outDir/sequences")
    val fs = seqPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (committed.isEmpty && fs.exists(seqPath)
        && !fs.delete(seqPath, true) && fs.exists(seqPath))
      sys.error(s"TrainingDataJob: could not clear invalidated table $seqPath")

    val assigned = assigned0.cache()
    try {
      assigned
        .filter(col("split").isin(pending.map(_._1): _*))
        .groupBy("split", "seq_id")
        .agg(
          sort_array(collect_list(col("conv_id"))).as("conv_ids"),
          count(lit(1)).as("n_convs"),
          sum("n_tokens").as("n_tokens"),
          (max(col("oversize").cast("int")) === 1).as("oversize"))
        .write.mode(SaveMode.Overwrite).partitionBy("split")
        // per-WRITE dynamic overwrite (only the produced splits are
        // replaced); a session-level conf set here would silently change
        // overwrite semantics for every later job on the shared session
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$outDir/sequences")
    } finally assigned.unpersist()
    Manifest.write(outDir, Manifest(runId, inputSnapshot, configSha,
      committed ++ pending.map(_._2)))
    RunResult(runId, pending.map(_._1), skipped, Some(res))
  }
}
