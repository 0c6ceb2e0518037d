package operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-selection importance scoring (the DSIR idea, Xie et al. 2023):
  * score each raw-corpus document by how much its word distribution looks
  * like a TARGET corpus rather than the raw corpus itself — the per-doc
  * average log-likelihood ratio under add-one-smoothed unigram models of
  * the two corpora. Positive score = target-like (keep / up-rank);
  * selection on the score is the caller's policy (threshold, top-k, or
  * weighted sampling via `Sampling.applyMixingPlan`-style rates).
  */
object Importance {

  /** Exact word-level importance scores.
    *
    * Model: over the union vocabulary V of both corpora, with raw counts
    * rc(w) (total R) and target counts tc(w) (total T),
    * `p_t(w) = (tc(w)+1)/(T+|V|)`, `p_r(w) = (rc(w)+1)/(R+|V|)`, and a
    * doc's score is the mean over its word occurrences of
    * `ln p_t(w) − ln p_r(w)`. Docs with zero word tokens drop out (no
    * evidence either way — same convention as
    * `TextAnalysis.repetitionSignals`). Every doc word is in V by
    * construction, so the weight join is inner with no loss.
    *
    * Returns (doc_id, n_words, score).
    *
    * Scale shape: two word-count hash aggregates (map-side combine eats
    * per-partition repeats), a vocab-sized full join to build the weight
    * table, a one-row broadcast cross join for the totals, then the
    * scoring join keyed on the word — the weight table is vocab-sized
    * (≪ corpus; AQE picks broadcast when it fits). When even the vocab is
    * too large to be a comfortable join side, use
    * `importanceScoresHashed` — a fixed-size feature space is the actual
    * DSIR construction.
    */
  def importanceScores(docs: DataFrame, target: DataFrame): DataFrame = {
    val dw = docs.select(col("doc_id"),
      explode(TextAnalysis.wordTokens(col("text"))).as("word"))
    val tw = target.select(
      explode(TextAnalysis.wordTokens(col("text"))).as("word"))
    val rc = dw.groupBy("word").agg(count(lit(1)).as("rc"))
    val tc = tw.groupBy("word").agg(count(lit(1)).as("tc"))
    val vocab = rc.join(tc, Seq("word"), "full")
      .select(col("word"), coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
    val tot = vocab.agg(sum("rc").as("_R"), sum("tc").as("_T"),
      count(lit(1)).as("_V"))
    val weights = vocab.crossJoin(broadcast(tot))
      .select(col("word"),
        (log((col("tc") + 1).cast("double")
            / (col("_T") + col("_V")).cast("double"))
          - log((col("rc") + 1).cast("double")
            / (col("_R") + col("_V")).cast("double"))).as("_w"))
    dw.join(weights, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), avg("_w").as("score"))
  }

  /** Hashed-feature importance scores — the production-scale DSIR shape:
    * the paper's unigram AND bigram features map to `numBuckets` hashed
    * buckets before counting (a doc with n word tokens contributes n
    * unigram + n−1 bigram occurrences), so the weight table is a
    * FIXED-SIZE broadcast (numBuckets rows, e.g. 2^16 ≈ 1 MB) regardless
    * of corpus vocabulary, and the scoring join never shuffles. Hash
    * collisions merge n-gram statistics (the documented DSIR trade: a
    * bounded-memory estimator of the same ratio); scores are
    * deterministic and partition-invariant but not equal to the exact
    * word-level scores.
    */
  def importanceScoresHashed(docs: DataFrame, target: DataFrame,
      numBuckets: Int = 1 << 16): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    def feats(d: DataFrame, cols: Seq[String]): DataFrame = {
      val w = TextAnalysis.wordTokens(col("text"))
      // unigrams ++ bigrams in one generator pass (zip_with bigrams — see
      // TextAnalysis.tokenBigrams for the measured slice-per-index trap)
      d.select(cols.map(col) :+
          explode(concat(w, TextAnalysis.tokenBigrams(w))).as("_gram"): _*)
        .select(cols.map(col) :+
          pmod(xxhash64(col("_gram")), lit(numBuckets.toLong)).as("feat"): _*)
    }
    val dw = feats(docs, Seq("doc_id"))
    val rc = dw.groupBy("feat").agg(count(lit(1)).as("rc"))
    val tc = feats(target, Seq.empty)
      .groupBy("feat").agg(count(lit(1)).as("tc"))
    val vocab = rc.join(tc, Seq("feat"), "full")
      .select(col("feat"), coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
    val tot = vocab.agg(sum("rc").as("_R"), sum("tc").as("_T"),
      count(lit(1)).as("_V"))
    val weights = vocab.crossJoin(broadcast(tot))
      .select(col("feat"),
        (log((col("tc") + 1).cast("double")
            / (col("_T") + col("_V")).cast("double"))
          - log((col("rc") + 1).cast("double")
            / (col("_R") + col("_V")).cast("double"))).as("_w"))
    dw.join(broadcast(weights), Seq("feat"))
      .groupBy("doc_id")
      // n_feats, not n_words: a doc with n word tokens has 2n-1 features
      .agg(count(lit(1)).as("n_feats"), avg("_w").as("score"))
  }

  /** Token-distribution drift between two corpus snapshots (the pipeline
    * monitoring check "did this week's crawl change shape?"): symmetrized
    * KL (Jeffreys) and Jensen-Shannon divergence between the two word
    * distributions, add-one-smoothed over the union vocabulary so both
    * are finite. Returns ONE row: (n_tokens_a, n_tokens_b, n_vocab,
    * kl_ab, kl_ba, js); js ∈ [0, ln 2], 0 = identical shape.
    *
    * Scale shape: two word-count hash aggregates with map-side combine
    * (the only corpus-sized work — 16-byte partial rows), one vocab-sized
    * full join, one one-row reduction. `tokenDriftHashed` is the
    * bounded-state variant at any vocabulary size.
    */
  def tokenDrift(a: DataFrame, b: DataFrame): DataFrame =
    driftBetween(a, b, identity)

  /** Bounded-state drift: `tokenDrift` with words pre-hashed into a
    * fixed `buckets` space (the `importanceScoresHashed` trade): the
    * vocab join and all state are capped at `buckets` rows regardless of
    * corpus vocabulary — the shape a weekly monitor over an unbounded
    * web-crawl vocabulary needs. The divergences measure the HASHED
    * distributions: collisions can only merge mass and blur true drift
    * toward 0, never invent drift — identical snapshots still read
    * exactly 0 (asserted), and n_vocab ≤ buckets by construction.
    */
  def tokenDriftHashed(a: DataFrame, b: DataFrame,
      buckets: Int = 1 << 16): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    driftBetween(a, b, w => pmod(xxhash64(w), lit(buckets.toLong)))
  }

  private def driftBetween(a: DataFrame, b: DataFrame,
      key: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    def counts(d: DataFrame, as: String): DataFrame =
      d.select(explode(TextAnalysis.wordTokens(col("text"))).as("raw"))
        .select(key(col("raw")).as("word"))
        .groupBy("word").agg(count(lit(1)).as(as))
    val vocab = counts(a, "ca").join(counts(b, "cb"), Seq("word"), "full")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = vocab.agg(sum("ca").as("_A"), sum("cb").as("_B"),
      count(lit(1)).as("_V"))
    val pa = (col("ca") + 1).cast("double") / (col("_A") + col("_V"))
    val pb = (col("cb") + 1).cast("double") / (col("_B") + col("_V"))
    val m = (pa + pb) / 2
    vocab.crossJoin(broadcast(tot))
      .select(col("_A"), col("_B"), col("_V"),
        (pa * log(pa / pb)).as("_ab"), (pb * log(pb / pa)).as("_ba"),
        (pa * log(pa / m) / 2 + pb * log(pb / m) / 2).as("_js"))
      .groupBy("_A", "_B", "_V")
      .agg(sum("_ab").as("kl_ab"), sum("_ba").as("kl_ba"),
        sum("_js").as("js"))
      .select(col("_A").as("n_tokens_a"), col("_B").as("n_tokens_b"),
        col("_V").as("n_vocab"), col("kl_ab"), col("kl_ba"), col("js"))
  }
}
