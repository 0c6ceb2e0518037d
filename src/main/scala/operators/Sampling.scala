package operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, group-aware dataset splitting — the train/val/test cut a
  * training pipeline makes ONCE and must be able to reproduce forever.
  *
  * Split by hash bucket, not by `rand()`: `xxhash64(key) mod 10000` is a
  * pure function of the key, so the assignment is identical across runs,
  * cluster sizes, partitionings and engine versions — and keying by a
  * GROUP column (conv_id, url-domain, author) puts every row of the group
  * in the same split, preventing near-duplicate leakage from train into
  * eval. Zero shuffle: the split column is a codegen'd projection.
  */
object Sampling {
  final val Buckets = 10000

  /** The stable bucket in [0, Buckets) for a key column under a purpose
    * salt. The salt matters: if split/sample/remix all bucketed on the
    * bare key hash, their selections would be perfectly CORRELATED — a
    * "10% sample" would be bit-for-bit the test split, and a downsampled
    * domain would survive only inside test/val. Salting makes each
    * selector an independent slice of the key space.
    */
  def hashBucket(key: Column, purpose: String): Column =
    pmod(xxhash64(lit(purpose), key), lit(Buckets.toLong))

  /** Add a `split` column: 'test' gets `testPermille`/1000 of key-groups,
    * 'val' the next `valPermille`/1000, 'train' the rest.
    */
  def assignSplit(df: DataFrame, keyCol: String,
      valPermille: Int = 10, testPermille: Int = 10): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0
      && valPermille + testPermille <= 1000,
      s"permilles out of range: val=$valPermille test=$testPermille")
    val b = hashBucket(col(keyCol), "split")
    df.withColumn("split",
      when(b < testPermille * (Buckets / 1000), "test")
        .when(b < (testPermille + valPermille) * (Buckets / 1000), "val")
        .otherwise("train"))
  }

  /** Deterministic subsample: keep ~`permille`/1000 of key-groups — the
    * repeatable "1% slice" used for eval sets and fast experiments
    * (same rows every run, unlike `DataFrame.sample`).
    */
  def deterministicSample(df: DataFrame, keyCol: String,
      permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"bad permille $permille")
    df.filter(hashBucket(col(keyCol), "sample") < permille * (Buckets / 1000))
  }

  /** Deterministic data mixing: re-weight domains/sources to target rates
    * — rate < 1 downsamples (keep the stable bottom `rate` of key
    * buckets), rate ≥ 1 upsamples by whole-copy replication plus a
    * fractional bucket slice; rows of replicated copies carry
    * `mix_copy` = 0..⌈rate⌉-1 so downstream shuffling/packing can spread
    * them. Unlisted groups keep rate 1.0.
    *
    * Scale shape: rates ride a tiny broadcast map join (one row per
    * group); sampling is the pure-projection bucket filter; upsampling is
    * `explode(sequence(...))` — no shuffle anywhere, and the mix is
    * reproducible run-over-run (the property `DataFrame.sample` +
    * `union` cannot give you).
    */
  /** Derive a corpus-mixing plan from the corpus itself: per-source token
    * counts → temperature-weighted sampling targets. `weight_s =
    * n_tokens_s^alpha / Σ n_tokens^alpha` (alpha = 1 keeps natural
    * proportions, alpha = 0 is uniform over sources, the usual 0 < α < 1
    * up-weights small sources the way multilingual/LLM mixes do), then
    * `target_tokens_s = round(weight_s · budgetTokens)` and `rate_s =
    * min(1, target/n_tokens)` — a pure DOWNSAMPLING plan: a source whose
    * target exceeds its actual size keeps rate 1 (upsampling is `remix`'s
    * job, deliberately a separate decision).
    *
    * Returns one row per source: (source, n_docs, n_tokens, weight,
    * target_tokens, rate).
    *
    * Scale shape: one hash aggregate over (source, count, sum) — 16-byte
    * partial rows with map-side combine — then the normalization rides a
    * one-row broadcast cross join. The plan itself is sources-sized
    * (domains, not documents) and broadcast-joinable downstream.
    */
  def mixingPlan(docs: DataFrame, sourceCol: String, tokensCol: Column,
      alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha out of [0,1]: $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val perSource = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("n_tokens"))
      .withColumn("_pw", pow(col("n_tokens").cast("double"), lit(alpha)))
    val tot = perSource.agg(sum("_pw").as("_spw"))
    perSource.crossJoin(broadcast(tot))
      .withColumn("weight", col("_pw") / col("_spw"))
      .withColumn("target_tokens",
        round(col("weight") * lit(budgetTokens.toDouble)).cast("long"))
      // explicit zero-token guard: 0/0 would be NaN and the rate-1 outcome
      // would then hinge on least()'s NaN ordering — a source with nothing
      // to downsample keeps rate 1 by CONTRACT, not by float accident
      // (covers a null n_tokens — every token value null — the same way)
      .withColumn("rate",
        when(col("n_tokens") > 0,
          least(lit(1.0),
            col("target_tokens").cast("double") / col("n_tokens")))
          .otherwise(lit(1.0)))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_tokens"), col("rate"))
  }

  /** Apply a `mixingPlan` (or any (source, rate) table): keep the stable
    * bottom `rate` slice of `keyCol`'s hash buckets per source — same
    * run-over-run reproducibility as `deterministicSample`, with its own
    * purpose salt so the mix is uncorrelated with split/sample/remix
    * selections. Sources absent from the plan keep rate 1. The plan joins
    * as a broadcast (sources-sized), the filter is a pure projection —
    * zero shuffle.
    */
  def applyMixingPlan(docs: DataFrame, plan: DataFrame, sourceCol: String,
      keyCol: String): DataFrame =
    docs.join(broadcast(plan.select(col(sourceCol), col("rate"))),
        Seq(sourceCol), "left")
      .withColumn("_rate", coalesce(col("rate"), lit(1.0)))
      .filter(hashBucket(col(keyCol), "mix")
        < round(col("_rate") * Buckets).cast("long"))
      .drop("rate", "_rate")

  /** Per-source document cap (the "no domain dominates the corpus" pass):
    * keep at most `k` documents per source, ranked by (`score` DESC,
    * `idCol` ASC). Returns one row per kept doc: (source, rank 1-based,
    * id, score) — callers wanting full rows semi-join back on the 8-byte
    * ids.
    *
    * Null scores never rank: a doc whose score is null is excluded from
    * its source's top-k (it cannot be compared), NOT ranked last — a
    * source whose every score is null contributes no rows. Callers who
    * want unscored docs kept must coalesce the score first. (The
    * q_source_cap oracle pins the same contract with an IS NOT NULL
    * guard.)
    *
    * Deliberately NOT `row_number().over(partitionBy(source))`: the window
    * shuffles EVERY document of a source to one reducer before ranking —
    * on a web corpus where one domain is 10% of 100 TB, that is 10 TB
    * through a single partition. `TopKByScore` (the same bounded-heap
    * TypedImperativeAggregate the ANN path uses) gets map-side combine,
    * so each task ships at most k 16-byte (score, id) entries per source
    * and the reducer merges k-sized buffers — the skewed-domain cost is
    * O(tasks · k), independent of the domain's row count.
    */
  def capPerSource(docs: DataFrame, sourceCol: String, score: Column,
      idCol: String, k: Int): DataFrame =
    docs.groupBy(col(sourceCol))
      .agg(TopKByScore(score.cast("double"), col(idCol), k).as("_top"))
      .select(col(sourceCol), posexplode(col("_top")))
      .select(col(sourceCol), (col("pos") + lit(1L)).as("rank"),
        col("col.id").as(idCol), col("col.score").as("score"))

  def remix(df: DataFrame, groupCol: String, keyCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 100),
      s"rates out of [0,100]: $rates")
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = broadcast(
      rates.toSeq.toDF(groupCol, "_rate"))
    val b = hashBucket(col(keyCol), "remix")
    df.join(rateDf, Seq(groupCol), "left")
      .withColumn("_rate", coalesce(col("_rate"), lit(1.0)))
      // whole copies: floor(rate); one extra copy for the stable bucket
      // slice covering the fractional remainder
      .withColumn("_copies",
        floor(col("_rate")).cast("int")
          + when(b < ((col("_rate") % 1.0) * Buckets).cast("long"), 1)
            .otherwise(0))
      .filter(col("_copies") > 0)
      .withColumn("mix_copy",
        explode(sequence(lit(0), col("_copies") - 1)))
      .drop("_rate", "_copies")
  }
}
