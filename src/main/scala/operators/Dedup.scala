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
    * offset into disjoint key spaces per chunk index.
    */
  private def simhashKeys(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array((0 until 4).map(c =>
        (shiftrightunsigned(simhashUdf(col("text")), c * 16) % 65536) +
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
