package operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the hand-rolled WAV fast paths against the JDK audio stack: the
  * canonical container must be byte-identical to AudioSystem.write, and
  * decodeWav's canonical-layout fast path must yield exactly the samples
  * a pure AudioSystem read yields (with non-canonical payloads still
  * handled by the AudioSystem fallback).
  */
class MultimodalWavSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def jdkWav(pcm: Array[Byte], sampleRate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val out = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    finally ais.close()
    out.toByteArray
  }

  test("hand-rolled WAV container is byte-identical to AudioSystem.write") {
    val rng = new scala.util.Random(42)
    for (n <- Seq(0, 1, 2, 511, 512, 2528, 10000)) {
      val pcm = new Array[Byte](n * 2)
      rng.nextBytes(pcm)
      assert(java.util.Arrays.equals(Multimodal.wavContainer(pcm),
        jdkWav(pcm, Multimodal.AudioSampleRate)),
        s"container bytes differ from the JDK writer at n=$n samples")
    }
  }

  test("decodeWav fast path == AudioSystem path; non-canonical WAVs fall back") {
    val media = Multimodal.synthesizeAudio(docs.limit(16)).collect()
    assert(media.nonEmpty)
    media.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val ref = try {
        val bytes = ais.readAllBytes()
        Array.tabulate(bytes.length / 2)(i =>
          (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort)
      } finally ais.close()
      assert(Multimodal.decodeWav(payload).exists(_.sameElements(ref)),
        s"fast-path samples differ for doc ${r.getLong(0)}")
    }
    // a VALID wav the fast path must reject (different sample rate): the
    // AudioSystem fallback still decodes it
    val pcm = Array.tabulate(600)(i => (i * 37 % 251 - 125).toByte)
    val other = Multimodal.decodeWav(jdkWav(pcm, 11025f))
    assert(other.exists(_.length == 300),
      "fallback must still decode a valid non-canonical WAV")
  }
}
