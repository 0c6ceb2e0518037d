package operators

import core.Shingles
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators over a (doc_id, text) table:
  * exact (hash-groupBy — see SparkEntry q_dedup_exact/q_dedup_first),
  * MinHash+LSH, SimHash, exact n-gram Jaccard verification, and
  * winnowed fingerprints.
  *
  * Scale design (the 100 TB story):
  * - signatures/fingerprints are computed per-row with NO shuffle;
  * - the only shuffles are (1) the band-bucket groupBy, whose payload is
  *   (band_key, doc_id) — 8 bytes × bands per doc, NOT the text — and
  *   (2) the candidate-verification join, which touches only candidate ids;
  * - degenerate buckets (boilerplate shingles shared by millions of docs)
  *   are capped at MaxBucket and the drop is observable in `bucketStats`,
  *   never silent;
  * - pair generation is per-bucket (size ≤ MaxBucket ⇒ ≤ MaxBucket²/2
  *   pairs), then `distinct` dedups across bands.
  */
object Dedup {
  final val ShingleN = 3
  final val MinhashK = 64
  final val Bands = 16
  final val Rows = 4
  final val MaxBucket = 64

  private val bandKeysUdf = udf((text: String) =>
    Shingles.bandKeys(
      Shingles.minhashSignature(Shingles.wordShingles(text, ShingleN), MinhashK),
      Bands, Rows))

  private val shinglesUdf = udf((text: String) => Shingles.wordShingles(text, ShingleN))

  private val jaccardUdf = udf((a: Seq[Int], b: Seq[Int]) =>
    Shingles.jaccard(a.toArray, b.toArray))

  private val simhashUdf = udf((text: String) => Shingles.simhash64(text))

  private val fingerprintUdf = udf((text: String) => Shingles.fingerprint(text))

  private val pairsUdf = udf((ids: Seq[Long]) =>
    for {
      i <- ids.indices
      j <- (i + 1) until ids.length
    } yield (ids(i), ids(j)))

  /** Candidate pairs from bucketed keys: groupBy bucket → in-bucket pairs.
    * Shared by minhash / simhash / embedding-LSH dedup tiers.
    */
  private[operators] def pairsFromKeys(keyed: DataFrame): DataFrame =
    keyed // (doc_id, band_key)
      .groupBy("band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
      .select(explode(pairsUdf(col("ids"))).as("p"))
      .select(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .distinct()

  /** MinHash band keys: (doc_id, band_key), `Bands` rows per doc. */
  private def minhashKeys(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(bandKeysUdf(col("text"))).as("band_key"))

  /** SimHash chunk keys: (doc_id, band_key), 4 rows per doc — 16-bit chunks
    * offset into disjoint key spaces per chunk index. The simhash is
    * materialized ONCE in its own projection before the chunk expressions:
    * inlining the UDF into the 4 generator arms would re-tokenize and
    * re-hash the full text 4× per row (no common-subexpression elimination
    * reaches inside a generator's input).
    */
  private def simhashKeys(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhashUdf(col("text")).as("sim"))
      .select(col("doc_id"),
        explode(array((0 until 4).map(c =>
          (shiftrightunsigned(col("sim"), c * 16) % 65536) +
            lit(c.toLong * 65536)): _*)).as("band_key"))

  /** MinHash-LSH candidate pairs. Input: (doc_id: long, text: string). */
  def minhashCandidates(docs: DataFrame): DataFrame =
    pairsFromKeys(minhashKeys(docs))

  /** MinHash-LSH candidates verified with exact shingle Jaccard ≥ tau. */
  def nearDuplicates(docs: DataFrame, tau: Double): DataFrame = {
    val sh = docs.select(col("doc_id"), shinglesUdf(col("text")).as("sh"))
    minhashCandidates(docs)
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-dups: 64-bit fingerprints, candidates via 4×16-bit chunk
    * buckets (any pair within Hamming ≤ 3 of 64 bits shares ≥1 exact 16-bit
    * chunk by pigeonhole... for ≤3 flips over 4 chunks), verified by
    * bit_count(a XOR b) ≤ maxHamming.
    */
  def simhashDuplicates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // pigeonhole over 4 chunks is only COMPLETE for ≤ 3 flips; a larger
    // maxHamming would silently lose pairs whose flips hit all four chunks
    require(maxHamming >= 0 && maxHamming <= 3,
      s"simhash candidate generation uses 4 chunks => maxHamming ≤ 3, got $maxHamming")
    val sims = docs.select(col("doc_id"), simhashUdf(col("text")).as("sim"))
    val cand = pairsFromKeys(simhashKeys(docs))
    cand
      .join(sims.select(col("doc_id").as("doc_a"), col("sim").as("sim_a")), "doc_a")
      .join(sims.select(col("doc_id").as("doc_b"), col("sim").as("sim_b")), "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Winnowed-fingerprint duplicate groups (cheapest near-dup tier: one
    * long per doc, one groupBy).
    */
  def fingerprintGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintUdf(col("text")).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .filter(col("n_docs") > 1)

  /** Bloom filter over the history corpus's text hashes — the carried
    * state of incremental dedup. One scan of one hashed column; the
    * returned filter is ~1.2 bytes/key at fpp=0.01 (1.2 GB for 10⁹ docs),
    * built distributed by Spark's bloomFilter aggregate and mergeable
    * across runs via `mergeBlooms` / persisted via `writeBloom`+`readBloom`
    * (see `incrementalNewWithBloom` for the amortized per-batch flow).
    */
  def historyBloom(history: DataFrame, expectedItems: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    // Spark's bloomFilter aggregate yields null bytes over ZERO input rows
    // and readFrom NPEs on them; an empty history is a legitimate first
    // run — test for it explicitly (isEmpty = a limit-1 probe, cheap)
    // rather than catching the NPE, so a genuine aggregation failure still
    // surfaces instead of masquerading as an empty filter
    if (history.isEmpty)
      org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
    else history.select(xxhash64(col("text")).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)

  /** Persist a bloom to `path` via temp file + atomic rename — the carried
    * cross-batch state of incremental dedup, so history is never rescanned
    * just to rebuild the filter.
    */
  def writeBloom(bloom: org.apache.spark.util.sketch.BloomFilter,
      path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    val out = java.nio.file.Files.newOutputStream(tmp)
    try bloom.writeTo(out) finally out.close()
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def readBloom(path: String): org.apache.spark.util.sketch.BloomFilter = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
  }

  /** Merge `b` into `a` (both must share expectedItems/fpp — Spark blooms
    * are only compatible at identical bit size and hash count). Returns the
    * mutated `a` for chaining: the per-batch update is
    * `writeBloom(mergeBlooms(readBloom(p), historyBloom(batch, n)), p)`.
    */
  def mergeBlooms(a: org.apache.spark.util.sketch.BloomFilter,
      b: org.apache.spark.util.sketch.BloomFilter): org.apache.spark.util.sketch.BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  /** Incremental (cross-batch) exact dedup: the rows of `incoming` whose
    * text does not appear in `history` — the production shape of dedup at
    * corpus scale, where today's batch must be checked against 100 TB of
    * history WITHOUT an all-vs-all join. Builds the history bloom inline;
    * the amortized path is `incrementalNewWithBloom` with a persisted
    * filter (`writeBloom`/`readBloom`/`mergeBlooms`), which skips the
    * bloom-build scan entirely.
    */
  def incrementalNew(history: DataFrame, incoming: DataFrame,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    incrementalNewWithBloom(historyBloom(history, expectedItems, fpp),
      history, incoming)

  /** Exact incremental dedup given an already-built history bloom (the
    * persisted cross-batch state — history is NOT scanned to build it).
    *
    * Plan shape, and why no shuffle ever carries history's text column:
    * 1. the broadcast bloom prunes `incoming` — only rows the bloom claims
    *    (true dups + an fpp-bounded sliver of new rows) become suspects;
    * 2. history is pruned to the suspect hash set by a broadcast LEFT SEMI
    *    join keyed on `xxhash64(text)` — the broadcast side is the 8-byte
    *    suspect hashes (bounded by the batch's dup count), so the 100 TB
    *    history side streams through its scan with ZERO exchange;
    * 3. the confirming anti-join then exact-compares text only within that
    *    hash-matched sliver (≈ batch-dup-sized on both sides), rescuing
    *    both bloom false positives and 64-bit hash collisions.
    * The result is EXACT: it equals a plain anti-join on text (asserted in
    * OperatorsSpec and against the DuckDB NOT EXISTS oracle); the only
    * data volumes that move are batch-proportional, never history-
    * proportional.
    */
  def incrementalNewWithBloom(
      bloom: org.apache.spark.util.sketch.BloomFilter,
      history: DataFrame, incoming: DataFrame): DataFrame = {
    val spark = incoming.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val seen = udf((h: Long) => bloomBc.value.mightContainLong(h))
    val keyed = incoming.withColumn("_h", xxhash64(col("text")))
    val sureNew = keyed.filter(!seen(col("_h")))
    val suspects = keyed.filter(seen(col("_h")))
    val suspectHashes = suspects.select("_h").distinct()
    val histCand = history
      .select(xxhash64(col("text")).as("_h"), col("text"))
      .join(broadcast(suspectHashes), Seq("_h"), "left_semi")
    val confirmed = suspects.join(histCand, Seq("_h", "text"), "left_anti")
    sureNew.unionByName(confirmed).drop("_h")
  }

  /** Connected components over a candidate-pair graph — the step that
    * turns near-dup PAIRS into duplicate GROUPS: transitivity means a≈b
    * and b≈c must land a, b, c in ONE component even when (a, c) never
    * surfaced as a candidate, and "keep one per cluster" (component id =
    * the component's min doc_id, the canonical survivor) is only sound on
    * components, not pairs.
    *
    * Shape: iterative hash-min label propagation. Each round is one
    * join + one groupBy-min over (id, label) pairs — 8-byte rows, never
    * text — and the driver only ever sees a convergence COUNT, no data.
    * Rounds needed = the component diameter; near-dup clusters are
    * shallow balls in practice, and a pathological chain deeper than
    * `maxIter` fails LOUDLY (IllegalStateException naming the moving
    * label count) — never a silent partial labeling that would merge
    * some clusters and not others. Only vertices that appear in some
    * pair get a row — singleton docs need no component.
    *
    * Returns (doc_id, component) as an eagerly `localCheckpoint`ed
    * DataFrame: the iteration caches are unpersisted before returning
    * (Dataset caches are pinned by the CacheManager until explicitly
    * unpersisted — repeated calls would otherwise leak), and the result
    * carries no lineage back through the loop. Matches a union-find
    * oracle in OperatorsSpec and a DuckDB recursive-CTE oracle as
    * q_dedup_groups.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs
      .select(col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
      .unionByName(pairs.select(col("doc_b").cast("long").as("src"),
        col("doc_a").cast("long").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("component", col("doc_id"))
      .persist()
    try {
      var iter = 0
      var changed = 1L
      while (changed > 0 && iter < maxIter) {
        val prop = edges
          .join(labels, edges("src") === labels("doc_id"))
          .select(col("dst").as("doc_id"), col("component"))
          .unionByName(labels)
          .groupBy("doc_id").agg(min("component").as("component"))
          .persist()
        changed = prop
          .join(labels.withColumnRenamed("component", "_old"), Seq("doc_id"))
          .filter(col("component") =!= col("_old")).count()
        labels.unpersist()
        labels = prop
        iter += 1
      }
      if (changed > 0) {
        // cap bit without converging: surface it loudly — a silent partial
        // labeling would merge some clusters and not others. Release the
        // last iteration's cache first: a caller that catches and retries
        // with a higher maxIter (as the message suggests) must not
        // accumulate one pinned DataFrame per failed attempt
        labels.unpersist()
        throw new IllegalStateException(
          s"connectedComponents: not converged after $maxIter iterations " +
            s"($changed labels still moving) — raise maxIter")
      }
      // freeze the result (eager localCheckpoint truncates the loop's
      // lineage), then release the cache entry — otherwise every call
      // leaves a CacheManager-pinned DataFrame behind
      val frozen = labels.localCheckpoint(true)
      labels.unpersist()
      frozen
    } finally edges.unpersist()
  }

  /** The end-to-end near-dup dedup most callers want: minhash-LSH
    * candidates → exact-Jaccard verify at `tau` → connected components →
    * keep each cluster's min-doc_id canonical plus every unpaired doc.
    * The non-survivor set is component-members-minus-canonicals — a
    * broadcast-sized fraction at any realistic dup rate — removed with
    * one anti-join on doc_id (8-byte keys; text never joins).
    */
  def dropNearDuplicates(docs: DataFrame, tau: Double): DataFrame = {
    val losers = connectedComponents(
      nearDuplicates(docs, tau).select("doc_a", "doc_b"))
      .filter(col("doc_id") =!= col("component"))
      .select("doc_id")
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** MaxBucket-cap observability over any pre-keyed (doc_id, band_key)
    * tier — "no silent truncation" holds for minhash, simhash AND the
    * embedding-LSH tier (Similarity.embeddingBucketStats): any bucket
    * `pairsFromKeys` would drop shows up in n_capped.
    */
  def bucketStatsFromKeys(keyed: DataFrame): DataFrame =
    keyed.groupBy("band_key").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("n") > MaxBucket, 1).otherwise(0)).as("n_capped"),
        max("n").as("max_bucket"))

  /** Cap observability for the minhash tier. */
  def bucketStats(docs: DataFrame): DataFrame =
    bucketStatsFromKeys(minhashKeys(docs))

  /** Cap observability for the simhash tier. */
  def simhashBucketStats(docs: DataFrame): DataFrame =
    bucketStatsFromKeys(simhashKeys(docs))
}
