package pipeline

import core.{GenTurn, SynthGen, Turn}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.types._

/** Abstraction over the transcript table format (SURVEY.md §3.1 #2/#4).
  * The production path is an Iceberg table read at a pinned snapshot
  * (BASELINE.json:14-15); the Iceberg runtime jar is absent in this sandbox
  * (SURVEY.md §0.2), so `IcebergStore` carries the documented production
  * wiring while `ParquetStore` + the checkpoint `Manifest` emulate
  * snapshot-pinned, idempotent-resume semantics in-sandbox, and
  * `SynthStore` provides the deterministic generated corpus (FIXTURES.md §B).
  */
trait TranscriptStore extends Serializable {
  def read(spark: SparkSession): Dataset[Turn]
}

object TranscriptStore {
  /** Fixed, declared input schema — no inference in the product path;
    * mismatching files fail fast (SURVEY.md §2.1). */
  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))
}

final case class ParquetStore(path: String) extends TranscriptStore {
  def read(spark: SparkSession): Dataset[Turn] =
    spark.read.schema(TranscriptStore.turnSchema).parquet(path)
      .as(Encoders.product[Turn])
}

/** Production path (requires iceberg-spark-runtime on the cluster):
  * `spark.read.format("iceberg").option("snapshot-id", id).load(table)` —
  * the snapshot pin is what makes resume idempotent against a table that
  * keeps ingesting. Untestable in this sandbox; fails fast here.
  */
final case class IcebergStore(table: String, snapshotId: Option[Long]) extends TranscriptStore {
  def read(spark: SparkSession): Dataset[Turn] = {
    val reader = snapshotId.foldLeft(spark.read.format("iceberg")) {
      (r, id) => r.option("snapshot-id", id.toString)
    }
    reader.load(table).selectExpr(
      "conv_id", "cast(turn_idx as int) as turn_idx", "role", "text", "tool", "ts")
      .as(Encoders.product[Turn])
  }
}

/** Deterministic in-memory corpus: `spark.range(nConv).flatMap(genConv)` —
  * each conversation self-contained, so the source is embarrassingly
  * parallel and identical under any partitioning (FIXTURES.md §B).
  */
final case class SynthStore(totalTurnsTarget: Long) extends TranscriptStore {
  /** Columnar projection, NOT `.map(_.toTurn)`: the typed map forced a
    * full deserialize(GenTurn)→construct→reserialize round trip per row
    * (string + timestamp decode/encode over the whole corpus) just to
    * drop `planted`; the select prunes that field inside the generator's
    * serializer — same rows, same schema, one object boundary instead of
    * two.
    */
  def read(spark: SparkSession): Dataset[Turn] =
    SynthStore.genTurns(spark, totalTurnsTarget)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as(Encoders.product[Turn])
}

object SynthStore {
  def genTurns(spark: SparkSession, totalTurnsTarget: Long): Dataset[GenTurn] = {
    import spark.implicits._
    // mapPartitions with the NAMED core.GenConvFlat — flatMap(f) is
    // mapPartitions(_.flatMap(f)) under the hood, so rows, order and plan
    // shape are identical; the named class is what lets
    // QualityPipeline.score recognize the conv-clustered source.
    spark.range(SynthGen.nConversations(totalTurnsTarget))
      .mapPartitions(new core.GenConvFlat(totalTurnsTarget))
  }
}
