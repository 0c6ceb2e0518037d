package operators

import core.VecOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Exact cosine top-k of each query vector against the corpus.
    * `queries`/`corpus`: (vec_id, embedding). Excludes self-matches.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosUdf(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id")
  }

  /** Deterministic centroids: seed with the C lowest vec_ids, then one
    * Lloyd refinement pass over the corpus (distributed: one aggregation).
    */
  def centroids(spark: SparkSession, corpus: DataFrame, c: Int): Array[(Int, Array[Float])] = {
    val seed = corpus.orderBy("vec_id").limit(c)
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
    val refined = corpus
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
      k: Int, c: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = centroids(spark, corpus, c)
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
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    corpusAssigned.join(broadcast(q), Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosUdf(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id")
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
