package guards

import core.{ByteLM, LangId, OracleEvaluator, ScoredTurn, Turn}
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Turn + precomputed stable-window context (typed boundary input). */
case class WinTurn(
    conv_id: String, turn_idx: Int, role: String, text: String, tool: String,
    ts: Timestamp, _rn: Int, _prev_idx: Option[Int], _prev_role: Option[String]) {
  def toTurn: Turn = Turn(conv_id, turn_idx, role, text, tool, ts)
}

/** The mapPartitions-batched model-inference tier (BASELINE.json:6;
  * SURVEY.md §3.8 row 55): langid + LM are broadcast ONCE per executor and
  * deserialized once per task, then applied in a tight per-partition loop.
  * Semantics are shared with the oracle via core.OracleEvaluator.scoreOne —
  * equality with the codegen-expression tier is enforced by
  * PipelineEquivalenceSpec. This tier exists for models too large or
  * stateful to embed statically (real fastText .bin in production); the
  * expression tier is the default hot path.
  */
object Scoring {

  def scoreBatched(spark: SparkSession, turns: DataFrame): Dataset[ScoredTurn] = {
    import spark.implicits._
    val w = Window.partitionBy("conv_id").orderBy(QualityPipeline.OrderCols.map(col): _*)
    val withWin = turns
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev_idx", lag("turn_idx", 1).over(w))
      .withColumn("_prev_role", lag("role", 1).over(w))
      .as[WinTurn]
    val bcLang = spark.sparkContext.broadcast(LangId.model)
    val bcLm = spark.sparkContext.broadcast(ByteLM.model)
    withWin.mapPartitions { it =>
      val langModel = bcLang.value
      val lmModel = bcLm.value
      it.map(wt => OracleEvaluator.scoreOne(
        wt.toTurn, wt._rn, wt._prev_idx, wt._prev_role, langModel, lmModel))
    }
  }
}
