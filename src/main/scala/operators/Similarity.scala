package operators

import core.VecOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (vec_id: long, embedding: array<float>).
  *
  * - `bruteForceTopK` is the correctness baseline: broadcast the (small)
  *   query set against the full table — one pass, no shuffle of the corpus,
  *   top-k via per-query window. O(Q·N) dot products, embarrassingly
  *   parallel; this is exactly how you'd score 100 TB against a handful of
  *   probes.
  * - `ivfTopK` is the scale path: a deterministic IVF index — C centroids
  *   (k-means-style refined from a deterministic seed set), each vector
  *   assigned to its nearest centroid (one narrow column added at rest;
  *   at production scale this is the partition key), queries probe only
  *   the nProbe nearest centroid buckets ⇒ the corpus-side scan shrinks to
  *   nProbe/C of the data. Recall vs brute force is asserted in tests —
  *   approximation is measured, never assumed.
  */
object Similarity {

  private val cosUdf = udf((a: Seq[Float], b: Seq[Float]) =>
    VecOps.cosine(a.toArray, b.toArray))

  /** Rank the per-query candidate stream: top-k by (cos DESC, vec_id ASC)
    * via the bounded-heap aggregate. Map-side combine ships ≤ k rows per
    * (task, query) — scale-safe for MANY queries, unlike a window over
    * partitionBy(q_id), which funnels every candidate of a query through
    * one reducer partition.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored // (q_id, cos, vec_id)
      .groupBy("q_id")
      .agg(TopKByScore(col("cos"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as("vec_id"))

  /** Exact cosine top-k of each query vector against the corpus.
    * `queries`/`corpus`: (vec_id, embedding). Excludes self-matches.
    * The query side is broadcast, so it must be driver-memory bounded
    * (≲10⁵ rows); the corpus side streams and is never shuffled — only
    * the k survivors per (task, query) move.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    rankTopK(
      c.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), cosUdf(col("q_emb"), col("embedding")).as("cos"),
          col("vec_id")),
      k)
  }

  /** Deterministic centroids: seed with the C lowest vec_ids of a bounded
    * deterministic sample, then one Lloyd refinement pass over the sample.
    * Centroid quality does not need the full corpus, and the refinement
    * pass `posexplode`s every sampled vector (dim× row blow-up) — capping
    * the sample keeps the build O(sampleCap·dim) regardless of corpus size.
    */
  def centroids(spark: SparkSession, corpus: DataFrame, c: Int,
      sampleCap: Long = 65536L): Array[(Int, Array[Float])] = {
    val n = corpus.count()
    val sampled =
      if (n <= sampleCap) corpus
      else corpus.filter(
        pmod(xxhash64(col("vec_id")), lit(n / sampleCap + 1)) === 0)
    val seed = sampled.orderBy("vec_id").limit(c)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val bcSeed = spark.sparkContext.broadcast(seed)
    val assignUdf = udf((emb: Seq[Float]) => {
      val e = emb.toArray
      var best = 0; var bestD = Double.MaxValue
      var i = 0
      while (i < bcSeed.value.length) {
        val d = VecOps.l2sq(bcSeed.value(i), e)
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    })
    val refined = sampled
      .withColumn("cid", assignUdf(col("embedding")))
      .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cid", "dim").agg(avg("v").as("m"))
      .collect()
    val byC = refined.groupBy(_.getInt(0)).map { case (cid, rows) =>
      cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)
    }
    (0 until c).map(i => i -> byC.getOrElse(i, seed(i))).toArray
  }

  /** IVF ANN: assign corpus to centroid buckets, probe nProbe buckets per
    * query, exact cosine within the probed subset.
    */
  def ivfTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
      k: Int, c: Int = 16, nProbe: Int = 4,
      sampleCap: Long = 65536L): DataFrame = {
    val cents = centroids(spark, corpus, c, sampleCap)
    val bc = spark.sparkContext.broadcast(cents)
    val assignUdf = udf((emb: Seq[Float]) => {
      val e = emb.toArray
      var best = 0; var bestD = Double.MaxValue
      for ((cid, cv) <- bc.value) {
        val d = VecOps.l2sq(cv, e)
        if (d < bestD) { bestD = d; best = cid }
      }
      best
    })
    val probeUdf = udf((emb: Seq[Float]) => {
      val e = emb.toArray
      bc.value.map { case (cid, cv) => (cid, VecOps.l2sq(cv, e)) }
        .sortBy { case (cid, d) => (d, cid) }.take(nProbe).map(_._1)
    })
    val corpusAssigned = corpus
      .withColumn("cid", assignUdf(col("embedding")))
      .select(col("vec_id"), col("embedding"), col("cid"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      explode(probeUdf(col("embedding"))).as("cid"))
    rankTopK(
      corpusAssigned.join(broadcast(q), Seq("cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), cosUdf(col("q_emb"), col("embedding")).as("cos"),
          col("vec_id")),
      k)
  }

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket mates
    * verified with exact cosine ≥ tau. Same scale shape as the text dedup
    * tiers (Dedup.scala): the bucket shuffle moves (bucket, vec_id) pairs —
    * never the vectors — and only candidate ids re-join their embeddings.
    * Identical vectors share every hyperplane sign, so exact duplicates are
    * always bucket mates (recall 1.0 for cosine = 1); near-duplicates may
    * straddle a hyperplane — the recall/cost trade is the `bits` knob.
    */
  def embeddingNearDuplicates(corpus: DataFrame, tau: Double,
      bits: Int = 16, dim: Int = 64): DataFrame = {
    val keyed = lshBuckets(corpus, bits, dim)
      .select(col("vec_id").as("doc_id"), col("bucket").cast("long").as("band_key"))
    val emb = corpus.select(col("vec_id"), col("embedding"))
    Dedup.pairsFromKeys(keyed)
      .join(emb.select(col("vec_id").as("doc_a"), col("embedding").as("emb_a")), "doc_a")
      .join(emb.select(col("vec_id").as("doc_b"), col("embedding").as("emb_b")), "doc_b")
      .withColumn("cos", cosUdf(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= tau)
      .select("doc_a", "doc_b", "cos")
  }

  /** Random-hyperplane LSH bucketing (16-bit signatures): the cheap
    * pre-filter tier for pairwise embedding near-dup at corpus scale.
    */
  def lshBuckets(corpus: DataFrame, bits: Int = 16, dim: Int = 64): DataFrame = {
    val planes: Array[Array[Float]] = Array.tabulate(bits) { b =>
      val rng = new core.Lcg(core.Lcg.mix(1234L, b.toLong))
      Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)
    }
    val sigUdf = udf((emb: Seq[Float]) => {
      val e = emb.toArray
      var sig = 0
      var b = 0
      while (b < planes.length) {
        if (VecOps.dot(planes(b), e) >= 0) sig |= (1 << b)
        b += 1
      }
      sig
    })
    corpus.withColumn("bucket", sigUdf(col("embedding")))
  }
}
