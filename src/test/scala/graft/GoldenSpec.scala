package graft

import java.sql.Timestamp

import core.{OracleEvaluator, Turn}
import guards.QualityPipeline
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file suite (SURVEY.md §6.2's own mitigation for the shared-core
  * risk): ~60 turns in fixtures/golden_turns.json whose expected rule_hits /
  * scrubbed_text / lang / ppl bounds were derived BY HAND from the pinned
  * spec (RuleSpec thresholds, Scrub regex chain), never by running core.*.
  * A semantic bug in a shared scalar (TextStats, Scrub, LangId, ByteLM)
  * that oracle-vs-pipeline F1 cannot see fails here.
  *
  * Both execution tiers are checked against the same constants: the
  * Spark-free OracleEvaluator and the Catalyst expression pipeline.
  */
class GoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val BaseMs = 1735689600000L // 2025-01-01T00:00:00Z

  private case class Golden(
      turn: Turn,
      expHits: Option[Seq[String]],
      expHas: Option[Seq[String]],
      expNot: Option[Seq[String]],
      expScrub: Option[String],
      expLang: Option[String],
      expPplLt: Option[Double],
      expPplGe: Option[Double],
      note: String)

  private val schema = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts_off", LongType),
    StructField("exp_hits", ArrayType(StringType)),
    StructField("exp_hits_has", ArrayType(StringType)),
    StructField("exp_hits_not", ArrayType(StringType)),
    StructField("exp_scrub", StringType),
    StructField("exp_lang", StringType),
    StructField("exp_ppl_lt", DoubleType),
    StructField("exp_ppl_ge", DoubleType),
    StructField("note", StringType)))

  private lazy val goldens: Seq[Golden] = {
    val rows = spark.read.schema(schema)
      .json("fixtures/golden_turns.json").collect().toSeq
    assert(rows.length >= 50, "golden fixture must hold >= 50 turns")
    rows.map { r =>
      def optStr(n: String) = Option(r.getAs[String](n))
      def optSeq(n: String) =
        Option(r.getAs[scala.collection.Seq[String]](n)).map(_.toSeq)
      def optD(n: String) =
        if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))
      Golden(
        Turn(r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"),
          r.getAs[String]("role"), r.getAs[String]("text"),
          r.getAs[String]("tool"),
          new Timestamp(BaseMs + r.getAs[Long]("ts_off") * 1000L)),
        optSeq("exp_hits"), optSeq("exp_hits_has"), optSeq("exp_hits_not"),
        optStr("exp_scrub"), optStr("exp_lang"), optD("exp_ppl_lt"),
        optD("exp_ppl_ge"), r.getAs[String]("note"))
    }
  }

  /** Unique identity per golden row (fixture guarantees uniqueness). */
  private def key(convId: String, idx: Int, role: String): (String, Int, String) =
    (convId, idx, if (role == null) "<null>" else role)

  private def checkOne(tier: String, g: Golden, hits: Seq[String],
      scrub: String, lang: String, ppl: Double): Unit = {
    val id = s"[$tier ${g.turn.conv_id}/${g.turn.turn_idx}] ${g.note}"
    g.expHits.foreach(e => assert(hits == e, s"$id rule_hits=$hits expected=$e"))
    g.expHas.foreach(e => assert(e.forall(hits.contains),
      s"$id rule_hits=$hits must contain all of $e"))
    g.expNot.foreach(e => assert(!e.exists(hits.contains),
      s"$id rule_hits=$hits must contain none of $e"))
    g.expScrub.foreach(e => assert(scrub == e, s"$id scrub=<$scrub> expected=<$e>"))
    g.expLang.foreach(e => assert(lang == e, s"$id lang=$lang expected=$e"))
    g.expPplLt.foreach(e => assert(ppl < e, s"$id ppl=$ppl expected < $e"))
    g.expPplGe.foreach(e => assert(ppl >= e, s"$id ppl=$ppl expected >= $e"))
  }

  test("golden turns: Spark-free oracle matches hand-written expectations") {
    val scored = OracleEvaluator.evaluate(goldens.map(_.turn))
    goldens.zip(scored).foreach { case (g, s) =>
      checkOne("oracle", g, s.rule_hits, s.scrubbed_text, s.lang, s.ppl)
    }
  }

  test("golden turns: Catalyst pipeline matches hand-written expectations") {
    import spark.implicits._
    // 3 partitions + reversed input order: expectations must hold no matter
    // how rows arrive (stable window re-sorts)
    val df = spark.createDataset(goldens.map(_.turn).reverse).repartition(3)
    val out = QualityPipeline.select(QualityPipeline.score(df.toDF()))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("rule_hits"),
        col("scrubbed_text"), col("lang"), col("ppl"))
      .collect()
      .map { r =>
        key(r.getString(0), r.getInt(1), r.getString(2)) ->
          ((r.getAs[scala.collection.Seq[String]](3).toSeq, r.getString(4),
            r.getString(5), r.getDouble(6)))
      }.toMap
    assert(out.size == goldens.size, "pipeline must emit one row per golden turn")
    goldens.foreach { g =>
      val k = key(g.turn.conv_id, g.turn.turn_idx, g.turn.role)
      val (hits, scrub, lang, ppl) = out(k)
      checkOne("pipeline", g, hits, scrub, lang, ppl)
    }
  }
}
