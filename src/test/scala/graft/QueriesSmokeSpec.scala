package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every driver-contract query must run on the smoke fixture; plus
  * secondary-ingest (CSV/JSON scan, SURVEY.md §3.1 #8) round-trips.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  test("all queries run on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(SparkTestSession.spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("deterministic no_oracle queries match their pinned golden outputs") {
    // these queries are hash/plane-deterministic but not SQL-expressible,
    // so the driver only checks row counts; the pinned fixture catches a
    // value regression (Shingles fingerprint, simhash, Lcg hyperplanes)
    val spark = SparkTestSession.spark
    def fmt(v: Any): String = v match {
      case d: Double => f"$d%.4f"
      case f: Float => f"$f%.4f"
      case b: Boolean => if (b) "true" else "false"
      case null => "null"
      case other => String.valueOf(other)
    }
    val golden = spark.read.json("fixtures/golden_queries.json")
      .collect()
      .map(r => (r.getAs[String]("query"), r.getAs[String]("columns"),
        r.getAs[String]("row")))
      .groupBy(_._1)
    // q_dedup_groups and q_chunks ALSO have DuckDB oracles; pinning their
    // row values here as well means a DuckDB version change can never
    // silently relax that oracle
    assert(golden.keySet == Set("q_dedup_fingerprint", "q_dedup_simhash",
      "q_dedup_embedding", "q_lsh_buckets", "q_dedup_minhash",
      "q_dedup_groups", "q_chunks", "q_dedup_drop", "q_semdedup",
      "q_decontaminate_fuzzy", "q_dedup_inc_near", "q_multimodal_audio",
      "q_multimodal", "q_curate_e2e"))
    golden.toSeq.sortBy(_._1).foreach { case (name, rows) =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      assert(df.columns.mkString(",") == rows.head._2,
        s"$name columns ${df.columns.mkString(",")} != pinned ${rows.head._2}")
      val got = df.collect().map(_.toSeq.map(fmt).mkString("|")).sorted.toSeq
      val want = rows.map(_._3).sorted.toSeq
      assert(got == want,
        s"$name: ${got.size} vs ${want.size} rows; first diff: " +
          got.zipAll(want, "<none>", "<none>").find(p => p._1 != p._2))
    }
  }

  test("entry returns rows on the smoke tier") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }

  test("CSV and JSON scans round-trip the Turn schema") {
    val spark = SparkTestSession.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val turns = pipeline.SynthStore(500L).read(spark).toDF()
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
    val n = turns.count()

    turns.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val backCsv = spark.read.schema(pipeline.TranscriptStore.turnSchema)
      .option("header", "true").csv(s"$dir/csv")
    assert(backCsv.count() == n)

    turns.write.mode("overwrite").json(s"$dir/json")
    val backJson = spark.read.schema(pipeline.TranscriptStore.turnSchema)
      .json(s"$dir/json")
    assert(backJson.count() == n)
    // labels computed from the JSON re-ingest match the direct path
    val a = guards.QualityPipeline.score(backJson)
      .select("conv_id", "turn_idx", "keep").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    val b = guards.QualityPipeline.score(turns)
      .select("conv_id", "turn_idx", "keep").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    assert(a == b)
  }
}
