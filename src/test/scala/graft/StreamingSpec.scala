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
}
