package graft

import core.SynthGen
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import streaming.TranscriptStream

/** Streaming tier S1-S5 (SURVEY.md §3.9): file micro-batches; stateful
  * conversation rules must reproduce the batch labels for in-order data.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Write the synth corpus as two parquet files, splitting every
    * conversation's turns across the batch boundary (state must carry).
    */
  private def writeSplitInput(dir: String, target: Long): Unit = {
    import spark.implicits._
    val turns = SynthGen.corpus(target).map(_.toTurn)
    val (a, b) = turns.partition(t => t.turn_idx < 3)
    a.toDF().coalesce(1).write.parquet(s"$dir/f1")
    b.toDF().coalesce(1).write.parquet(s"$dir/f2")
    // flatten: streaming source reads dir of files
    val f = new java.io.File(dir)
    for (sub <- Seq("f1", "f2"); p <- new java.io.File(f, sub).listFiles()
         if p.getName.endsWith(".parquet")) {
      Files.move(p.toPath, new java.io.File(f, s"$sub.parquet").toPath)
    }
    Seq("f1", "f2").foreach { sub =>
      new java.io.File(f, sub).listFiles().foreach(_.delete())
      new java.io.File(f, sub).delete()
    }
  }

  test("S5 stateful streaming labels == batch labels (in-order micro-batches)") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val target = 1500L
    writeSplitInput(dir, target)

    val stream = TranscriptStream.statefulLabels(spark,
      TranscriptStream.readTurns(spark, dir))
      .select(col("conv_id"), col("turn_idx"), col("keep"),
        concat_ws("|", col("rule_hits")).as("hits"))
    val q = stream.writeStream
      .format("memory").queryName("labels").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.sql("SELECT * FROM labels").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getBoolean(2), r.getString(3))))
      .toMap

    val batch = guards.QualityPipeline.score(
      pipeline.SynthStore(target).read(spark).toDF())
      .select(col("conv_id"), col("turn_idx"), col("keep"),
        concat_ws("|", col("rule_hits")).as("hits"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getBoolean(2), r.getString(3))))
      .toMap

    assert(got.size == batch.size)
    val diffs = batch.collect { case (k, v) if got(k) != v => s"$k got=${got(k)} want=$v" }
    assert(diffs.isEmpty, diffs.take(10).mkString("\n"))
  }

  /** One parquet file per micro-batch with controlled mod-times so the
    * file source replays them in the given order (oldest mod-time first).
    */
  private def writeOrderedBatches(dir: String,
      batches: Seq[Seq[core.Turn]]): Unit = {
    import spark.implicits._
    val f = new java.io.File(dir)
    batches.zipWithIndex.foreach { case (turns, i) =>
      val sub = s"b$i"
      turns.toDF().coalesce(1).write.parquet(s"$dir/$sub")
      val part = new java.io.File(f, sub).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(f, s"$sub.parquet")
      Files.move(part.toPath, dest.toPath)
      dest.setLastModified(System.currentTimeMillis() - 60000L + i * 10000L)
      new java.io.File(f, sub).listFiles().foreach(_.delete())
      new java.io.File(f, sub).delete()
    }
  }

  private def turnAt(conv: String, idx: Int, epochMs: Long): core.Turn =
    core.Turn(conv, idx, "user", "the and for data", null,
      new java.sql.Timestamp(epochMs))

  test("S3 sliding windows: every on-time turn lands in exactly two windows") {
    val dir = Files.createTempDirectory("graft_slide").toString
    val base = 1735689600000L // 2025-01-01T00:00:00Z
    // 4 turns inside a 10-minute span, single micro-batch, all on time
    writeOrderedBatches(dir, Seq(Seq(
      turnAt("s1", 0, base),
      turnAt("s1", 1, base + 4 * 60000L),
      turnAt("s2", 0, base + 7 * 60000L),
      turnAt("s2", 1, base + 9 * 60000L))))
    val q = TranscriptStream.keepRateBySlidingWindow(
      TranscriptStream.readTurns(spark, dir)).writeStream
      .format("memory").queryName("slide").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // update-mode memory sink re-emits a window on every update: dedupe to
    // the final value per window before summing
    val total = spark.sql(
      """SELECT sum(t) FROM (
        |  SELECT win_start, max(turns) AS t FROM slide GROUP BY win_start)"""
        .stripMargin).head().getLong(0)
    assert(total == 8, s"4 turns x 2 overlapping windows expected, got $total")
  }

  test("late data past the watermark is dropped from windowed aggregates") {
    val dir = Files.createTempDirectory("graft_late").toString
    val base = 1735689600000L
    val h = 3600000L
    writeOrderedBatches(dir, Seq(
      // batch 1: two turns 4h apart -> watermark advances to max-1h = base+3h
      Seq(turnAt("c1", 0, base), turnAt("c1", 1, base + 4 * h)),
      // batch 2: on-time turn; the base-window state (end << base+3h) is
      // evicted at the END of this batch
      Seq(turnAt("c2", 1, base + 4 * h + 2 * 60000L)),
      // batch 3: a turn far below the watermark, arriving AFTER eviction —
      // this is the row the engine must drop
      Seq(turnAt("c2", 0, base + 5 * 60000L))))
    val q = TranscriptStream.keepRateByWindow(
      TranscriptStream.readTurns(spark, dir)).writeStream
      .format("memory").queryName("late").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.sql(
      """SELECT sum(t) FROM (
        |  SELECT win_start, max(turns) AS t FROM late GROUP BY win_start)"""
        .stripMargin).head().getLong(0)
    // 4 input turns, 1 late-after-eviction -> only 3 aggregated (documents
    // the pinned batch/streaming divergence: the batch path counts all 4)
    assert(total == 3, s"expected the late row to be dropped, got $total")
  }

  test("streaming dedup drops at-least-once redeliveries across micro-batches") {
    val dir = Files.createTempDirectory("graft_dedup").toString
    val base = 1735689600000L
    writeOrderedBatches(dir, Seq(
      Seq(turnAt("d1", 0, base), turnAt("d1", 1, base + 60000L)),
      // batch 2: redelivery of (d1, 0) — same key, later arrival inside the
      // watermark horizon — plus one genuinely new turn
      Seq(turnAt("d1", 0, base + 120000L), turnAt("d2", 0, base + 180000L))))
    val q = TranscriptStream.dedupedTurns(
      TranscriptStream.readTurns(spark, dir)).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.sql("SELECT conv_id, turn_idx FROM dedup").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(rows.length == 3, s"redelivered turn must be dropped: ${rows.toSeq}")
    assert(rows.toSet == Set(("d1", 0), ("d1", 1), ("d2", 0)))
  }

  test("S2-S4: watermarked tumbling windows and session windows aggregate") {
    val dir = Files.createTempDirectory("graft_stream2").toString
    writeSplitInput(dir, 800L)
    val src = TranscriptStream.readTurns(spark, dir)

    val q1 = TranscriptStream.keepRateByWindow(src).writeStream
      .format("memory").queryName("keeprate").outputMode("update").start()
    try q1.processAllAvailable() finally q1.stop()
    val kr = spark.sql("SELECT sum(turns) FROM keeprate").head().getLong(0)
    assert(kr > 0)

    // session windows only support append mode; closed sessions (watermark
    // has passed) are emitted — the corpus spans ~a year so most close
    val q2 = TranscriptStream.sessions(src).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val sess = spark.sql("SELECT count(*), sum(turns) FROM sess").head()
    assert(sess.getLong(0) > 0)
    assert(sess.getLong(1) > 0)
  }

  test("corpus-lifetime streaming dedup: bloom state carries across batches and query restarts") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft_sdedup").toString
    val (outDir, stateDir) = (s"$base/out", s"$base/state")

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = TranscriptStream.dedupNewTexts(
      mem.toDF().toDF("doc_id", "text"), outDir, stateDir, expectedItems = 10000)
      .option("checkpointLocation", s"$base/ck1").start()
    try {
      mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      mem.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
      mem.addData((6L, "alpha"), (7L, "delta"), (8L, "delta"))
      q.processAllAvailable()
    } finally q.stop()

    val out1 = spark.read.parquet(outDir)
    assert(out1.count() == 4, "one accepted row per distinct text")
    assert(out1.select("text").collect().map(_.getString(0)).sorted
      .sameElements(Array("alpha", "beta", "delta", "gamma")))
    // the accepted table persists its 8-byte dedup key, and it is the
    // real hash — later batches confirm against THIS column, never by
    // re-hashing history text
    assert(out1.columns.contains("_h"))
    assert(out1.filter(col("_h") =!= xxhash64(col("text"))).count() == 0)
    // the carried state claims every accepted text
    val bloom = operators.Dedup.readBloom(s"$stateDir/history.bloom")
    assert(out1.select(xxhash64(col("text"))).collect().map(_.getLong(0))
      .forall(bloom.mightContainLong))

    // a RESTARTED query (fresh checkpoint, batch ids from 0 again) against
    // the same state: old texts still rejected, new ones accepted
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q2 = TranscriptStream.dedupNewTexts(
      mem2.toDF().toDF("doc_id", "text"), outDir, stateDir, expectedItems = 10000)
      .option("checkpointLocation", s"$base/ck2").start()
    try {
      mem2.addData((9L, "gamma"), (10L, "epsilon"))
      q2.processAllAvailable()
    } finally q2.stop()
    val out2 = spark.read.parquet(outDir)
    assert(out2.count() == 5)
    assert(out2.filter(col("text") === "epsilon").count() == 1)
    assert(out2.filter(col("text") === "gamma").count() == 1)
  }

  test("corpus-lifetime streaming NEAR-dedup: accepted set == the batch-sequential incrementalNewNear fold, across restarts") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft_sneardedup").toString
    val (outDir, stateDir) = (s"$base/out", s"$base/state")
    val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val B = "one two three four five six seven eight nine ten eleven twelve"
    val C = "red orange yellow green blue indigo violet cyan magenta white black"
    val D = "north south east west up down left right forward backward sideways"
    val batches = Seq(
      // in-batch near-clone (3 ≈ 1): batch-only component keeps min id 1
      Seq((1L, A), (2L, B), (3L, A + " extra")),
      // near-clone of accepted history (4 ≈ 1), a new text, an exact
      // re-delivery of B under a new id (exact stage drops it)
      Seq((4L, A + " more"), (5L, C), (6L, B)),
      // after a RESTART: near-clone of 5, plus a genuinely new text
      Seq((7L, C + " tail"), (8L, D)))

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = streaming.TranscriptStream.dedupNearNewTexts(
      mem.toDF().toDF("doc_id", "text"), outDir, stateDir,
      expectedItems = 10000, tau = 0.8)
      .option("checkpointLocation", s"$base/ck1").start()
    try {
      mem.addData(batches(0): _*); q.processAllAvailable()
      mem.addData(batches(1): _*); q.processAllAvailable()
    } finally q.stop()
    // restarted query, fresh checkpoint (batch ids from 0 again) — the
    // persisted bloom + band index ARE the state, not the checkpoint
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q2 = streaming.TranscriptStream.dedupNearNewTexts(
      mem2.toDF().toDF("doc_id", "text"), outDir, stateDir,
      expectedItems = 10000, tau = 0.8)
      .option("checkpointLocation", s"$base/ck2").start()
    try { mem2.addData(batches(2): _*); q2.processAllAvailable() } finally q2.stop()

    val out = spark.read.parquet(outDir)
    val gotIds = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    // reference: the batch-sequential fold of the SAME protocol in batch
    // mode (exact stage = text dropDuplicates + anti vs history texts,
    // then incrementalNewNear against the accumulating band index)
    var hist = Seq.empty[(Long, String)].toDF("doc_id", "text")
    batches.foreach { b =>
      val bd = b.toDF("doc_id", "text").dropDuplicates("text")
        .join(hist.select("text"), Seq("text"), "left_anti")
        .select("doc_id", "text")
      val acc = operators.Dedup.incrementalNewNear(
        operators.Dedup.bandIndexFor(hist), hist, bd, 0.8)
      hist = hist.unionByName(acc).localCheckpoint(true)
    }
    val wantIds = hist.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotIds == wantIds, s"stream $gotIds vs fold $wantIds")
    assert(gotIds == Seq(1L, 2L, 5L, 8L),
      s"near-clones (3, 4, 7) and the exact re-delivery (6) must drop: $gotIds")
    // the band index carries exactly the accepted docs' keys (each doc
    // Bands times), so the next batch probes the full accepted corpus
    val idx = operators.Dedup.readBandIndex(spark, s"$stateDir/band_index")
    assert(idx.select("doc_id").distinct().collect().map(_.getLong(0)).sorted
      .toSeq == gotIds)
    assert(idx.count() == gotIds.size.toLong * operators.Dedup.Bands)
    // and a replayed LAST batch (at-least-once redelivery) appends nothing
    streaming.TranscriptStream.processNearDedupBatch(
      batches(2).toDF("doc_id", "text"), outDir, stateDir,
      expectedItems = 10000, tau = 0.8)
    assert(spark.read.parquet(outDir).count() == 4)
  }

  test("streaming NEAR-dedup crash window: bloom+index-written-but-rows-not-appended is rescued") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ncrash").toString
    val (outDir, stateDir) = (s"$base/out", s"$base/state")
    val A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val C = "red orange yellow green blue indigo violet cyan magenta white black"
    streaming.TranscriptStream.processNearDedupBatch(
      Seq((1L, A)).toDF("doc_id", "text"), outDir, stateDir,
      expectedItems = 10000, tau = 0.8)
    // emulate a crash AFTER write steps 1-2 (bloom + band index) of batch
    // 2 but BEFORE the history append: the accepted set would be {3}
    // (4 is a near-clone of history doc 1)
    val b2 = Seq((3L, C), (4L, A + " extra")).toDF("doc_id", "text")
    val wouldAccept = Seq((3L, C)).toDF("doc_id", "text")
    operators.Dedup.writeBloom(
      operators.Dedup.mergeBlooms(
        operators.Dedup.historyBloom(wouldAccept, expectedItems = 10000),
        operators.Dedup.readBloom(s"$stateDir/history.bloom")),
      s"$stateDir/history.bloom")
    operators.Dedup.writeBandIndex(wouldAccept, s"$stateDir/band_index")
    // replay of batch 2: doc 3 is bloom-claimed (suspect) but has no
    // history row — the exact confirm passes it; its phantom index keys
    // are its own id (excluded from the history-candidate probe); doc 4
    // is still near-rejected. Appended exactly once.
    streaming.TranscriptStream.processNearDedupBatch(b2, outDir, stateDir,
      expectedItems = 10000, tau = 0.8)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 2)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
    // the index now carries doc 3's keys TWICE (crash replay) — probe-time
    // dedup must keep that harmless: a near-clone of C is still rejected
    // and nothing is double-appended
    val idx = operators.Dedup.readBandIndex(spark, s"$stateDir/band_index")
    assert(idx.filter(col("doc_id") === 3L).count() ==
      2L * operators.Dedup.Bands)
    streaming.TranscriptStream.processNearDedupBatch(
      Seq((9L, C + " tail")).toDF("doc_id", "text"), outDir, stateDir,
      expectedItems = 10000, tau = 0.8)
    assert(spark.read.parquet(outDir).count() == 2)
    // and a full replay of batch 2 after success appends nothing
    streaming.TranscriptStream.processNearDedupBatch(b2, outDir, stateDir,
      expectedItems = 10000, tau = 0.8)
    assert(spark.read.parquet(outDir).count() == 2)
  }

  test("streaming dedup crash window: bloom-written-but-rows-not-appended is rescued") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_crash").toString
    val (outDir, stateDir) = (s"$base/out", s"$base/state")
    // batch 1 processed normally
    streaming.TranscriptStream.processDedupBatch(
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
      outDir, stateDir, expectedItems = 10000, fpp = 0.01)
    // emulate the crash state the write order creates: batch 2's hashes
    // are already merged into the persisted bloom, but its rows never
    // reached the output (crash between writeBloom and the append)
    val batch2 = Seq((3L, "gamma"), (4L, "delta")).toDF("doc_id", "text")
    operators.Dedup.writeBloom(
      operators.Dedup.mergeBlooms(
        operators.Dedup.readBloom(s"$stateDir/history.bloom"),
        operators.Dedup.historyBloom(batch2, expectedItems = 10000)),
      s"$stateDir/history.bloom")
    // replay of batch 2: every row is bloom-claimed (a suspect), but the
    // exact confirm finds no history match — appended exactly once
    streaming.TranscriptStream.processDedupBatch(batch2,
      outDir, stateDir, expectedItems = 10000, fpp = 0.01)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 4)
    assert(out.select("text").collect().map(_.getString(0)).sorted
      .sameElements(Array("alpha", "beta", "delta", "gamma")))
    // and a second replay of the same batch appends nothing
    streaming.TranscriptStream.processDedupBatch(batch2,
      outDir, stateDir, expectedItems = 10000, fpp = 0.01)
    assert(spark.read.parquet(outDir).count() == 4)
  }
}
