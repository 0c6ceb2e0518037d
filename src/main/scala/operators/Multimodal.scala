package operators

import core.Murmur3
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batched per-partition "inference".
  *
  * The decode step is a clearly-marked deterministic STUB (no codec
  * libraries exist in this container); everything around it — the schema,
  * the binary column handling, the typed boundary, the batch shape
  * (fixed-size batches inside mapPartitions, the Scala analogue of
  * mapInPandas batches), and the partitioning — is real and tested.
  * Swapping `decodeStub` for a JNI/ONNX call is a one-function change.
  */
object Multimodal {
  final val FeatureDim = 8
  final val BatchSize = 64

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      format: String, width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, feat: Array[Float], batch_size: Int)

  /** Attach a synthetic binary payload + typed metadata to a text table
    * (stands in for real image bytes; deterministic).
    */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id") * 7, lit(64)) + 16).cast("int").as("height")).as("meta"))

  /** STUB decode+featurize: a real implementation would decode the payload
    * (JPEG/PNG/WAV) and run a feature extractor; here features are a
    * deterministic hash-fold of the bytes so tests pin the plumbing.
    */
  private def decodeStub(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
    val f = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      val h = Murmur3.hash(payload, i * 31 + width * 7 + height)
      f(i) = (h.toDouble / Int.MaxValue.toDouble).toFloat
      i += 1
    }
    f
  }

  /** Batched per-partition feature extraction: the binary column flows to
    * executors once; batches of BatchSize amortize model-session setup
    * exactly like a vectorized UDF would.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.format").as("format"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // one "model call" per batch in a real impl
          batch.map(r => MediaFeatures(r.doc_id,
            decodeStub(r.payload, r.width, r.height), batch.size))
        }
      }
  }
}
