package graft

import operators.{Packing, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing and deterministic splitting — the two layout-dependent
  * training-data ops with no SQL oracle: checked by exhaustive invariants.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n_tokens"))

  test("packing assigns every doc exactly once and respects the capacity") {
    val maxTok = 256
    val packed = Packing.packSequences(docs, maxTok, numPartitions = 8).cache()
    try {
      val in = docs.select("doc_id").collect().map(_.getLong(0)).sorted
      val out = packed.toDF().select("doc_id").collect().map(_.getLong(0)).sorted
      assert(out.sameElements(in), "exactly-once coverage")

      val bins = packed.toDF().groupBy("seq_id")
        .agg(sum("n_tokens").as("t"), count(lit(1)).as("d"),
          max(col("oversize").cast("int")).as("over"))
        .collect()
        .map(r => (r.getAs[Long]("t"), r.getAs[Long]("d"), r.getAs[Int]("over")))
      val overfull = bins.filter(b => b._3 == 0 && b._1 > maxTok)
      assert(overfull.isEmpty, s"bins over capacity: ${overfull.take(3).toSeq}")
      // an oversize doc sits alone in its bin, flagged
      val overBins = bins.filter(_._3 == 1)
      assert(overBins.forall(_._2 == 1L), "oversize bins are singletons")
      val nOversizeDocs = docs.filter(col("n_tokens") > maxTok).count()
      assert(overBins.length.toLong == nOversizeDocs)
    } finally packed.unpersist()
  }

  test("packing fill ratio is measured and first-fit-decreasing-tight") {
    val stats = Packing.packingStats(
      Packing.packSequences(docs, 256, numPartitions = 8), 256).head()
    val fill = stats.getAs[Double]("fill_ratio")
    info(s"fill ratio = $fill over ${stats.getAs[Long]("n_bins")} bins")
    assert(fill >= 0.7, s"FFD should pack tighter than $fill")
    assert(stats.getAs[Long]("max_bin_tokens") <= 256)
  }

  test("packing is deterministic for a pinned partition layout") {
    val a = Packing.packSequences(docs, 256, numPartitions = 8)
      .collect().map(p => (p.doc_id, p.seq_id)).sorted
    val b = Packing.packSequences(docs, 256, numPartitions = 8)
      .collect().map(p => (p.doc_id, p.seq_id)).sorted
    assert(a.sameElements(b))
  }

  test("split is a deterministic partition of the corpus, group-coherent") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val split = Sampling.assignSplit(events, "user_id", 100, 100).cache()
    try {
      assert(split.count() == events.count())
      // every user lands in exactly one split — no group leakage
      val leaky = split.groupBy("user_id")
        .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
      assert(leaky == 0)
      // repartitioning does not change the assignment (pure function of key)
      val a = split.select("user_id", "split").distinct().collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      val b = Sampling.assignSplit(events.repartition(17), "user_id", 100, 100)
        .select("user_id", "split").distinct().collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(a == b)
    } finally split.unpersist()
    // fraction check needs key cardinality: 500 doc_ids, 10%/10% split
    val docsT = spark.read.parquet(s"$sf/documents.parquet")
    val bySplit = Sampling.assignSplit(docsT, "doc_id", 100, 100)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum.toDouble
    for (nm <- Seq("val", "test"); n = bySplit.getOrElse(nm, 0L))
      assert(n / total > 0.03 && n / total < 0.25,
        s"$nm fraction ${n / total} far from 10%")
  }

  test("remix hits target rates deterministically; unlisted groups untouched") {
    val docsT = spark.read.parquet(s"$sf/documents.parquet")
    val rates = Map("src0" -> 0.4, "src1" -> 2.0, "src2" -> 2.5)
    val mixed = Sampling.remix(docsT, "source", "doc_id", rates).cache()
    try {
      val bySrc = mixed.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // unlisted sources: exactly unchanged, single copy
      assert(bySrc("src3") == 25L)
      assert(mixed.filter(col("source") === "src3" && col("mix_copy") =!= 0)
        .count() == 0)
      // whole-number upsample: exactly rate x n
      assert(bySrc("src1") == 50L, s"2.0x of 25 must be exactly 50: $bySrc")
      // fractional rates: within binomial tolerance of the target
      assert(bySrc("src0") >= 3 && bySrc("src0") <= 18, s"0.4x25: $bySrc")
      assert(bySrc("src2") >= 55 && bySrc("src2") <= 70, s"2.5x25: $bySrc")
      // replication is per-key exact: each kept src2 key has 2 or 3 copies
      val copies = mixed.filter(col("source") === "src2")
        .groupBy("doc_id").count().collect().map(_.getLong(1)).toSet
      assert(copies.subsetOf(Set(2L, 3L)), s"src2 copies: $copies")
      // deterministic: a rerun is row-identical
      val again = Sampling.remix(docsT, "source", "doc_id", rates)
        .select("doc_id", "mix_copy").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
      val first = mixed.select("doc_id", "mix_copy").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted
      assert(first.sameElements(again))
    } finally mixed.unpersist()
  }

  test("remix rate 0 drops the group; packing handles all-oversize input") {
    val docsT = spark.read.parquet(s"$sf/documents.parquet")
    val mixed = Sampling.remix(docsT, "source", "doc_id", Map("src0" -> 0.0))
    assert(mixed.filter(col("source") === "src0").count() == 0)
    assert(mixed.filter(col("source") === "src1").count() == 25)

    // every doc over capacity: one flagged singleton bin each, none lost
    val tiny = Packing.packSequences(docs, maxTokens = 1, numPartitions = 4)
      .cache()
    try {
      assert(tiny.count() == docs.count())
      assert(tiny.filter(!col("oversize")).count() ==
        docs.filter(col("n_tokens") <= 1).count())
      val binSizes = tiny.toDF().filter(col("oversize"))
        .groupBy("seq_id").count().filter(col("count") > 1).count()
      assert(binSizes == 0, "oversize bins must be singletons")
    } finally tiny.unpersist()
  }

  test("keyed packing: exactly-once on the string key, capacity held, deterministic") {
    val keyed = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("conv-"), col("doc_id")).as("cid"),
        size(split(col("text"), "\\s+")).as("n_tokens"))
    val packed = Packing.packSequencesByKey(keyed, "cid", 256, numPartitions = 8)
      .cache()
    try {
      val in = keyed.select("cid").collect().map(_.getString(0)).sorted
      val out = packed.collect().map(_.key).sorted
      assert(out.sameElements(in), "every key assigned exactly once")
      val overfull = packed.toDF().groupBy("seq_id")
        .agg(sum("n_tokens").as("t"), max(col("oversize").cast("int")).as("over"))
        .filter(col("over") === 0 && col("t") > 256).count()
      assert(overfull == 0)
      val again = Packing.packSequencesByKey(keyed, "cid", 256, numPartitions = 8)
        .collect().map(p => (p.key, p.seq_id)).sorted
      assert(packed.collect().map(p => (p.key, p.seq_id)).sorted.sameElements(again))
    } finally packed.unpersist()
  }

  test("null or negative n_tokens fails with a typed error naming the key") {
    import spark.implicits._
    val bad = Seq((1L, 10), (2L, -3)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      Packing.packSequences(bad, 256, numPartitions = 2).collect()
    }
    assert(e.getMessage.contains("n_tokens"), s"untyped failure: ${e.getMessage}")
    val withNull = Seq((1L, Some(10)), (2L, None))
      .toDF("doc_id", "n_tokens")
    val e2 = intercept[Exception] {
      Packing.packSequences(withNull, 256, numPartitions = 2).collect()
    }
    assert(e2.getMessage.contains("n_tokens"), s"untyped failure: ${e2.getMessage}")
  }

  test("packingStats stays fully typed when every bin is oversize") {
    import spark.implicits._
    val docs = Seq((1L, 50), (2L, 60)).toDF("doc_id", "n_tokens")
    val stats = Packing.packingStats(
      Packing.packSequences(docs, maxTokens = 10, numPartitions = 2), 10).head()
    assert(stats.getAs[Long]("n_oversize_bins") == 2L)
    assert(stats.getAs[Double]("fill_ratio") == 0.0, "null fill_ratio leaked")
    assert(stats.getAs[Long]("max_bin_tokens") == 0L, "null max_bin_tokens leaked")
  }

  test("chunkTokens: chunked docs pack with zero oversize bins, totals preserved") {
    val maxTok = 64
    assert(docs.filter(col("n_tokens") > maxTok).count() > 0,
      "fixture must contain oversize docs for this test to bite")
    val chunked = Packing.chunkTokens(docs, "doc_id", maxTok).cache()
    try {
      // token mass preserved exactly; every doc keeps >= 1 chunk
      assert(chunked.agg(sum("n_tokens")).head().getLong(0)
        == docs.agg(sum("n_tokens")).head().getLong(0))
      assert(chunked.select("doc_id").distinct().count() == docs.count())
      // all chunks within capacity, all-but-last full
      assert(chunked.filter(col("n_tokens") > maxTok || col("n_tokens") < 0)
        .count() == 0)
      val notFull = chunked.groupBy("doc_id")
        .agg(max("chunk_idx").as("last"), count(lit(1)).as("n"))
        .join(chunked, "doc_id")
        .filter(col("chunk_idx") < col("last") && col("n_tokens") =!= maxTok)
        .count()
      assert(notFull == 0, "only the last chunk may be partial")
      // packing the chunks on a composite key: no oversize bins possible
      val keyed = chunked.select(
        concat(col("doc_id"), lit("#"), col("chunk_idx")).as("ck"),
        col("n_tokens"))
      val packed = Packing.packSequencesByKey(keyed, "ck", maxTok,
        numPartitions = 4)
      assert(packed.filter(col("oversize")).count() == 0)
      assert(packed.count() == chunked.count())
    } finally chunked.unpersist()
  }

  test("selectors are independent: the 10% sample is NOT the test split") {
    val docsT = spark.read.parquet(s"$sf/documents.parquet")
    val sampleIds = Sampling.deterministicSample(docsT, "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val testIds = Sampling.assignSplit(docsT, "doc_id", 100, 100)
      .filter(col("split") === "test")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // unsalted buckets would make these bit-for-bit identical (training on
    // the sample = training on test data); independent ~10% slices overlap
    // only by chance
    assert(sampleIds != testIds)
    assert((sampleIds intersect testIds).size < math.max(sampleIds.size, 1) / 2,
      s"sample/test overlap too high: ${(sampleIds intersect testIds).size}")
  }

  test("deterministic sample is a stable subset matching its bucket rule") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val s1 = Sampling.deterministicSample(events, "user_id", 100)
    val ids = s1.select("event_id").collect().map(_.getLong(0)).sorted
    val again = Sampling.deterministicSample(events, "user_id", 100)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(again))
    assert(ids.length > 0 && ids.length < events.count())
  }
}
