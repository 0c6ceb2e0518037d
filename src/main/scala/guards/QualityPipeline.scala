package guards

import guards.expr.ScoreFns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The label pipeline: Turn rows → ScoredTurn rows (SURVEY.md §4.1).
  * Exactly ONE exchange in this path — the hash-by-conv_id window shuffle
  * that computes the stable-order lag columns; language-ID, perplexity,
  * rule predicates and the scrub all run inside whole-stage codegen on the
  * post-window stream (no further shuffle, no RDD, no UDF).
  */
object QualityPipeline {

  final val OrderCols = Seq("turn_idx", "ts", "role")

  /** Adds window context, scoring columns, rule_hits, keep, scrubbed_text.
    * Works on any DataFrame with the Turn schema.
    */
  def score(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy(OrderCols.map(col): _*)
    val withWin = turns
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev_idx", lag("turn_idx", 1).over(w))
      .withColumn("_prev_role", lag("role", 1).over(w))
    scorePostWindow(withWin)
  }

  /** Scoring + rules given precomputed window columns (_rn, _prev_idx,
    * _prev_role). Shared by the Column tier and the salted scale path.
    */
  def scorePostWindow(withWin: DataFrame): DataFrame = {
    val scoredCols = Rules.withStats(withWin)
      .withColumn("lang", ScoreFns.langIdLabel(col("_tn")))
      .withColumn("lang_conf", ScoreFns.langIdConf(col("_tn")))
      .withColumn("ppl", ScoreFns.bytePerplexity(col("_tn")))
    val rules = Rules.all(
      col("text"), col("role"), col("tool"), col("turn_idx"),
      col("_rn"), col("_prev_idx"), col("_prev_role"),
      col("lang"), col("lang_conf"), col("ppl"))
    scoredCols
      .withColumn("rule_hits", Rules.ruleHits(rules))
      .withColumn("keep", size(col("rule_hits")) === 0)
      .withColumn("scrubbed_text", ScoreFns.scrubText(col("_tn")))
      .drop("_rn", "_prev_idx", "_prev_role")
      .drop(Rules.StatCols: _*)
  }

  /** Output projection matching core.ScoredTurn field order. */
  def select(scored: DataFrame): DataFrame =
    scored.select("conv_id", "turn_idx", "role", "text", "tool", "ts",
      "lang", "lang_conf", "ppl", "rule_hits", "keep", "scrubbed_text")
}
