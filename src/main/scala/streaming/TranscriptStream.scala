package streaming

import core.Turn
import guards.{QualityPipeline, WinTurn}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import pipeline.TranscriptStore

/** Per-conversation evolving state for S5 (top-level: the state encoder's
  * generated code must see a public constructor). */
case class ConvState(rn: Int, lastIdx: Int, lastRole: String)

/** Structured-Streaming tier (SURVEY.md §3.9 S1-S5; optional — batch is the
  * graded path). Micro-batch file source → watermarked windowed aggregates,
  * session windows, and stateful per-conversation rule evaluation via
  * flatMapGroupsWithState.
  *
  * Pinned divergence note (SURVEY.md §3.9): r_order/r_alt are windowed
  * rules; in streaming they are evaluated against per-conversation STATE in
  * arrival order. For in-order, on-time data the labels equal the batch
  * labels (asserted in StreamingSpec); late/out-of-order data past the
  * watermark can differ — the F1 contract is defined on the batch path.
  */
object TranscriptStream {

  /** S1: micro-batch parquet source with the fixed Turn schema. */
  def readTurns(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(TranscriptStore.turnSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** S2+S3: keep-rate per 10-minute tumbling event-time window, 1h
    * watermark. Uses the stateless rule subset (per-turn rules only).
    */
  def keepRateByWindow(turns: DataFrame): DataFrame = {
    val labeled = statelessScore(turns)
    labeled
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("turns"),
        sum(col("keep").cast("long")).as("kept"))
      .select(col("window.start").as("win_start"), col("turns"), col("kept"))
  }

  /** S3 (sliding variant): keep-rate per 10-minute window sliding every 5
    * minutes — each on-time event contributes to exactly two windows.
    */
  def keepRateBySlidingWindow(turns: DataFrame): DataFrame = {
    val labeled = statelessScore(turns)
    labeled
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("turns"),
        sum(col("keep").cast("long")).as("kept"))
      .select(col("window.start").as("win_start"), col("turns"), col("kept"))
  }

  /** Streaming exact dedup: at-least-once sources (Kafka, file redelivery)
    * emit duplicate turns; drop re-deliveries of the same (conv_id,
    * turn_idx) across micro-batches. `dropDuplicatesWithinWatermark`
    * bounds the dedup state by event time — state for keys older than the
    * watermark is evicted, so state size tracks the watermark horizon, not
    * the stream's lifetime (the only viable shape for an unbounded
    * stream).
    */
  def dedupedTurns(turns: DataFrame): DataFrame =
    turns
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")

  /** Corpus-LIFETIME streaming dedup — the streaming face of
    * `Dedup.incrementalNewWithBloom`. `dedupedTurns` above bounds its key
    * state by the watermark horizon (re-delivery dedup); this one rejects
    * any text EVER accepted, with stream-side state = the persisted
    * ~1.2 bytes/key bloom file, never a text table. Per micro-batch
    * (foreachBatch): in-batch dedup on text → bloom prefilter + exact
    * confirm against the accepted-output dir (which IS the history) →
    * append survivors → merge their hashes into the bloom (atomic
    * rename).
    *
    * Crash safety hinges on WRITE ORDER: the merged bloom is persisted
    * BEFORE the survivors are appended. A crash between the two leaves a
    * bloom that over-claims (it has the batch's hashes but history lacks
    * the rows) — on replay those texts are suspects, the exact confirm
    * finds no history match, and they append exactly once. The reverse
    * order would be a real bug: append-then-crash leaves rows the bloom
    * does NOT claim, so a replay classifies them sure-new, bypasses the
    * confirm, and duplicates them forever. No committed-batch marker is
    * kept (one keyed on batchId would break legitimately-restarted
    * queries, whose ids restart at 0). fpp only costs recall of NEW
    * texts into the confirm join, never correctness.
    */
  def dedupNewTexts(stream: DataFrame, outDir: String, stateDir: String,
      expectedItems: Long, fpp: Double = 0.01): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        processDedupBatch(batch.toDF(), outDir, stateDir, expectedItems, fpp)
    }

  /** One micro-batch of the corpus-lifetime dedup — public so batch-mode
    * callers (and the crash-window spec) can drive the identical protocol
    * without a streaming query around it.
    *
    * The accepted-output table carries a persisted `_h = xxhash64(text)`
    * column (Dedup.withTextHash), so the exact confirm's history probe
    * scans 8 bytes/row instead of re-hashing the full text column every
    * batch (Dedup.incrementalNewHashed — at 100 TB the old shape was a
    * full-corpus text read per micro-batch). Null-text rows are dropped at
    * this entry point: a null joins nothing in the exact confirm (SQL NULL
    * semantics), so it would re-append on EVERY batch it appears in — a
    * permanent duplicate leak, and a null turn is not content anyway.
    */
  def processDedupBatch(batch: DataFrame,
      outDir: String, stateDir: String, expectedItems: Long,
      fpp: Double): Unit = {
    import java.nio.file.{Files, Paths}
    val spark = batch.sparkSession
    val bloomPath = s"$stateDir/history.bloom"
    val bloom =
      if (Files.exists(Paths.get(bloomPath))) operators.Dedup.readBloom(bloomPath)
      else org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
    val outP = new org.apache.hadoop.fs.Path(outDir)
    val fs = outP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val history =
      if (fs.exists(outP)) spark.read.parquet(outDir).select("_h", "text")
      else operators.Dedup.withTextHash(batch.select("text").limit(0))
    // in-batch first: a text seen twice within one micro-batch keeps one
    // representative row (which one is source-order-dependent; the
    // ACCEPTED TEXT SET is deterministic)
    val fresh = operators.Dedup
      .incrementalNewHashed(bloom, history,
        batch.filter(col("text").isNotNull).dropDuplicates("text"))
      .persist()
    try {
      // materializes the cache AND decides the all-dup fast path: an
      // empty fresh set has nothing to append and nothing to merge, so
      // the bloom write and the historyBloom probe are skipped entirely
      val nFresh = fresh.count()
      if (nFresh == 0) return
      // bloom FIRST, append second — see the crash-safety note above.
      // Merge direction matters: mergeBlooms mutates its FIRST argument,
      // and `bloom` is the live broadcast object the `seen` UDF reads (in
      // local mode the broadcast value IS this object) — mutating it
      // before the append action could silently reclassify a recomputed
      // partition's sure-new rows as claimed. The batch bloom is the
      // mutation target; `bloom` stays pristine until the JVM drops it.
      operators.Dedup.writeBloom(
        operators.Dedup.mergeBlooms(
          operators.Dedup.historyBloom(fresh, expectedItems, fpp,
            knownNonEmpty = true), bloom),
        bloomPath)
      // a crash mid-append can orphan a _temporary task dir that a
      // replay's FileOutputCommitter (same job/attempt ids) could commit
      // ALONGSIDE its own files, duplicating rows — clear it before
      // writing, loudly on failure (bloom-first ordering is unaffected:
      // the cleanup only removes never-committed temp output)
      val tmpP = new org.apache.hadoop.fs.Path(outP, "_temporary")
      if (fs.exists(tmpP) && !fs.delete(tmpP, true) && fs.exists(tmpP))
        sys.error(s"processDedupBatch: could not clear stale $tmpP")
      operators.Dedup.withTextHash(fresh).write.mode("append").parquet(outDir)
    } finally fresh.unpersist()
  }

  /** Corpus-lifetime streaming NEAR-dedup — the streaming face of
    * `Dedup.incrementalNewNear`, completing the dedup story the exact
    * tier above starts: `dedupNewTexts` rejects byte-identical repeats,
    * but a production stream also re-delivers LIGHTLY EDITED copies
    * (boilerplate re-crawls, syndicated articles), which only the
    * near-dup tier catches. Stream rows must carry (doc_id: long,
    * text: string) — near-dedup is a document-pipeline operator (the
    * band index and the duplicate components are keyed on doc ids).
    *
    * Per micro-batch (foreachBatch), via `processNearDedupBatch`:
    * EXACT stage first (in-batch text dedup → bloom prefilter → hashed
    * confirm against history — identical protocol to the exact tier,
    * and the reason replays are idempotent), then the NEAR stage probes
    * the persisted band-key index (`Dedup.incrementalNewNear` —
    * history-wins, so an already-accepted doc is never retracted), then
    * three state writes IN THIS ORDER:
    *   1. the merged bloom (claiming the accepted texts),
    *   2. the band-index append (the accepted docs' keys),
    *   3. the history append (the accepted rows, with `_h`).
    * Crash safety mirrors the exact tier's bloom-first rationale: every
    * prefix of the order leaves state that OVER-claims, which a replay
    * repairs — the exact confirm finds no history row (texts pass), the
    * phantom index keys carry the replayed batch's own ids (excluded
    * from the history-candidate probe) and duplicate index keys are
    * deduped at probe time (collect_set + the sliver distinct), so the
    * batch lands exactly once. Any reversed order would leak: history
    * rows missing from the index would never again surface as near-dup
    * candidates, admitting their future near-clones forever.
    */
  def dedupNearNewTexts(stream: DataFrame, outDir: String, stateDir: String,
      expectedItems: Long, tau: Double, fpp: Double = 0.01): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        processNearDedupBatch(batch.toDF(), outDir, stateDir, expectedItems,
          tau, fpp)
    }

  /** One micro-batch of the corpus-lifetime NEAR-dedup — public so
    * batch-mode callers and the crash-window spec drive the identical
    * protocol (see `dedupNearNewTexts` for the write-order contract).
    */
  def processNearDedupBatch(batch: DataFrame, outDir: String,
      stateDir: String, expectedItems: Long, tau: Double,
      fpp: Double = 0.01): Unit = {
    import java.nio.file.{Files, Paths}
    val spark = batch.sparkSession
    val bloomPath = s"$stateDir/history.bloom"
    val bandPath = s"$stateDir/band_index"
    val bloom =
      if (Files.exists(Paths.get(bloomPath))) operators.Dedup.readBloom(bloomPath)
      else org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
    val outP = new org.apache.hadoop.fs.Path(outDir)
    val fs = outP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val history =
      if (fs.exists(outP)) spark.read.parquet(outDir)
      else operators.Dedup.withTextHash(batch.select("doc_id", "text").limit(0))
    // exact stage (null texts dropped, one id per in-batch text — min
    // doc_id per text group, so the surviving id is DETERMINISTIC: a
    // replay after a crash between the band-index append and the history
    // append re-picks the SAME representative, and the phantom index keys
    // are guaranteed to carry the replayed batch's own ids — a
    // partition-order-dependent dropDuplicates("text") could orphan the
    // first attempt's id in the index forever)
    val fresh = operators.Dedup.incrementalNewHashed(bloom,
      history.select("_h", "text"),
      batch.filter(col("text").isNotNull)
        .groupBy("text").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id", "text"))
      .persist()
    try {
      if (fresh.count() == 0) return
      val bandP = new org.apache.hadoop.fs.Path(bandPath)
      val compactP = new org.apache.hadoop.fs.Path(bandPath + ".compact")
      val stagedP = new org.apache.hadoop.fs.Path(bandPath + ".old")
      // a live index must exist whenever history does: silently starting
      // from an EMPTY index would accept near-clones of the entire
      // history and lose history's keys forever (the exact leak the
      // bloom→index→history write order prevents). The one legitimate
      // way to be here with history but no live index is a crash inside
      // compactBandIndex between its two renames — recover its complete
      // staged copy; anything else is corrupted state and fails loudly.
      if (!fs.exists(bandP) && fs.exists(outP)) {
        require(fs.exists(compactP),
          s"processNearDedupBatch: history at $outDir is non-empty but the " +
            s"band index $bandPath is missing and no $compactP exists to " +
            "recover — refusing to probe an empty index")
        require(fs.rename(compactP, bandP),
          s"processNearDedupBatch: could not recover $compactP to $bandPath")
        if (fs.exists(stagedP)) fs.delete(stagedP, true)
      }
      val index =
        if (fs.exists(bandP))
          operators.Dedup.readBandIndex(spark, bandPath)
        else operators.Dedup.bandIndexFor(fresh.limit(0))
      val accepted = operators.Dedup.incrementalNewNear(index,
        history.select("doc_id", "text"), fresh, tau).persist()
      try {
        if (accepted.count() == 0) return
        // state writes — ORDER IS THE CONTRACT (see dedupNearNewTexts)
        operators.Dedup.writeBloom(
          operators.Dedup.mergeBlooms(
            operators.Dedup.historyBloom(accepted, expectedItems, fpp,
              knownNonEmpty = true), bloom),
          bloomPath)
        operators.Dedup.writeBandIndex(accepted, bandPath)
        // a crash mid-append can orphan a _temporary task dir (same
        // rescue as the exact tier)
        val tmpP = new org.apache.hadoop.fs.Path(outP, "_temporary")
        if (fs.exists(tmpP) && !fs.delete(tmpP, true) && fs.exists(tmpP))
          sys.error(s"processNearDedupBatch: could not clear stale $tmpP")
        operators.Dedup.withTextHash(accepted)
          .write.mode("append").parquet(outDir)
      } finally accepted.unpersist()
    } finally fresh.unpersist()
  }

  /** S4: conversation sessionization by 30-minute inactivity gap. */
  def sessions(turns: DataFrame): DataFrame =
    turns
      .withWatermark("ts", "1 hour")
      .groupBy(col("conv_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("turns"))
      .select(col("conv_id"), col("session_window.start").as("sess_start"), col("turns"))

  /** Stateless scoring: per-turn rules with the window context neutralized
    * (r_order/r_alt cannot fire: rn=1 ∧ turn_idx=0 is spoofed off by
    * passing the row's own idx as "previous+1").
    */
  def statelessScore(turns: DataFrame): DataFrame =
    QualityPipeline.scorePostWindow(
      turns
        .withColumn("_rn", lit(1))
        .withColumn("_prev_idx", col("turn_idx") - 1) // unused at rn=1
        .withColumn("_prev_role", lit(null).cast("string")))
      .withColumn("rule_hits", array_remove(col("rule_hits"), "r_order"))
      .withColumn("keep", size(col("rule_hits")) === 0)

  /** S5: full labels in streaming — per-conversation state carries
    * (row_number, last turn_idx, last role) across micro-batches, then the
    * SAME Column rule compiler runs on the state-annotated rows.
    */
  def statefulLabels(spark: SparkSession, turns: DataFrame): DataFrame = {
    import spark.implicits._
    val winTurns: Dataset[WinTurn] = turns.as[Turn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) => {
          val sorted = rows.toSeq.sortBy(t =>
            (t.turn_idx, Option(t.ts).map(_.getTime).getOrElse(Long.MinValue),
              Option(t.role).getOrElse("")))
          var st = state.getOption.getOrElse(ConvState(0, -1, null))
          val out = sorted.map { t =>
            val rn = st.rn + 1
            val w = WinTurn(t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts,
              rn,
              if (rn == 1) None else Some(st.lastIdx),
              if (rn == 1) None else Option(st.lastRole))
            st = ConvState(rn, t.turn_idx, t.role)
            w
          }
          state.update(st)
          out.iterator
        })
    QualityPipeline.scorePostWindow(winTurns.toDF())
  }
}
