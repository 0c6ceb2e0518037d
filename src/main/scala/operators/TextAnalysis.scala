package operators

import guards.expr.ScoreFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a
  * (doc_id, text) table: token counting (whitespace / word / BPE-ish),
  * quality scoring, language-ID application, and fingerprinting. All
  * counting runs as java.util.regex-backed Column expressions (codegen,
  * no shuffle); the same regexes are DuckDB-RE2-compatible so the counts
  * are oracle-checkable.
  */
object TextAnalysis {
  /** BPE-ish pre-tokenizer: letter runs, 1-3 digit runs, single symbols. */
  final val BpeIshRe = "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]"
  final val WordRe = "[\\p{L}\\p{N}]+"
  final val WsTokenRe = "\\S+"
  /** Top English stopwords used for the quality ratio. */
  final val StopRe = "\\b(the|and|for|with|that|this|from|have|are|was)\\b"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(WsTokenRe)).as("n_ws_tokens"),
      regexp_count(lower(col("text")), lit(WordRe)).as("n_words"),
      regexp_count(col("text"), lit(BpeIshRe)).as("n_bpe_tokens"))

  /** Integer-arithmetic quality signals (no float ratios → oracle-exact). */
  def qualitySignals(docs: DataFrame): DataFrame = {
    val cp = length(col("text"))
    val nWords = regexp_count(lower(col("text")), lit(WordRe))
    val nStop = regexp_count(lower(col("text")), lit(StopRe))
    docs.select(
      col("doc_id"), cp.as("n_cp"), nWords.as("n_words"), nStop.as("n_stop"),
      (cp.between(20, 8000) && nWords >= 5 && nStop * 20 >= nWords).as("ok_quality"))
  }

  /** Language-ID over an arbitrary text table (codegen expression tier). */
  def langIdBreakdown(docs: DataFrame): DataFrame =
    docs.select(col("lang").as("lang_label"),
      ScoreFns.langIdLabel(coalesce(col("text"), lit(""))).as("lang_pred"))
      .groupBy("lang_label", "lang_pred").agg(count(lit(1)).as("n"))
}
