package operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Sequence packing: group variable-length documents into fixed-capacity
  * training sequences (bins of ≤ maxTokens) — the standard pretraining
  * data-prep step ("pack to a 4k/8k context") that turns a deduped corpus
  * into dense model inputs.
  *
  * Spark-first shape: packing runs per partition — a first-fit-decreasing
  * greedy over a `sortWithinPartitions` iterator with a bounded open-bin
  * list, so the only exchange is the initial hash repartition and memory
  * per task is O(MaxOpenBins), independent of partition size. Sequence ids
  * are globally unique without coordination: partition_id << 32 | local.
  *
  * At 100 TB: per-partition packing is embarrassingly parallel; vs a
  * global packer it loses at most ~one partially-filled bin per partition,
  * a fill-ratio loss of O(partitions · maxTokens / corpus_tokens) —
  * negligible at corpus scale and measured (not assumed) in the spec.
  * Docs longer than maxTokens are flagged `oversize` in a singleton bin,
  * never silently dropped or split — chunking is a caller policy.
  *
  * Two entry points share the packing core: `packSequences` bins long
  * doc_ids; `packSequencesByKey` bins directly on an opaque string key
  * (e.g. conv_id), so callers never have to round-trip through a 64-bit
  * hash of their key — a birthday collision in such a hash would silently
  * merge two groups' assignment rows (the failure TrainingDataJob had
  * before it switched to this entry point).
  */
object Packing {
  final val MaxOpenBins = 64

  final case class PackedDoc(doc_id: Long, seq_id: Long, n_tokens: Int,
      oversize: Boolean)
  final case class PackedKey(key: String, seq_id: Long, n_tokens: Int,
      oversize: Boolean)

  /** A null or negative token count is an upstream data bug (e.g. a null
    * text turning into a null `size(split(...))`); fail it loudly with a
    * typed error naming the offending key, per the "never silently
    * dropped/clamped" contract — a bare encoder NPE inside mapPartitions
    * is undiagnosable from a 1000-executor log.
    */
  private def validTokens(keyCol: String): Column =
    when(col("n_tokens").isNull || col("n_tokens") < 0,
      raise_error(concat(
        lit(s"packSequences: null/negative n_tokens for $keyCol="),
        coalesce(col(keyCol).cast("string"), lit("null")))).cast("int"))
      .otherwise(col("n_tokens").cast("int"))
      .as("n_tokens")

  /** The per-partition FFD core over an already-sorted (key, tokens)
    * iterator. Open bins are (local_bin_id, tokens_used); when over
    * MaxOpenBins, evict the fullest (min remaining) — that forfeits the
    * least future capacity. Eviction can only cost fill ratio (a small doc
    * that would have fit the evicted bin opens a new one), never
    * correctness; the spec measures the ratio rather than assuming it.
    */
  private def packIter[K](it: Iterator[(K, Int)],
      maxTokens: Int): Iterator[(K, Long, Int, Boolean)] = {
    val pid = TaskContext.getPartitionId().toLong
    val open = ArrayBuffer.empty[(Long, Int)]
    var nextLocal = 0L
    it.map { case (key, tok) =>
      if (tok > maxTokens) {
        val local = nextLocal; nextLocal += 1
        (key, (pid << 32) | local, tok, true)
      } else {
        var i = 0
        var found = -1
        while (found < 0 && i < open.length) {
          if (open(i)._2 + tok <= maxTokens) found = i
          i += 1
        }
        val local =
          if (found >= 0) {
            val b = open(found)
            open(found) = (b._1, b._2 + tok)
            b._1
          } else {
            if (open.length >= MaxOpenBins) {
              var minI = 0
              var j = 1
              while (j < open.length) {
                if (open(j)._2 > open(minI)._2) minI = j
                j += 1
              }
              open.remove(minI)
            }
            val id = nextLocal; nextLocal += 1
            open += ((id, tok))
            id
          }
        (key, (pid << 32) | local, tok, false)
      }
    }
  }

  /** Pack (doc_id, n_tokens) rows into sequences of capacity `maxTokens`.
    * `numPartitions` pins the layout (and thus the exact assignment) —
    * pass 0 to keep the input partitioning.
    */
  def packSequences(docs: DataFrame, maxTokens: Int,
      numPartitions: Int = 0): Dataset[PackedDoc] = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs.select(col("doc_id").cast("long").as("doc_id"),
      validTokens("doc_id"))
    val parts =
      if (numPartitions > 0) sized.repartition(numPartitions, col("doc_id"))
      else sized
    parts
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id"))
      .as[(Long, Int)]
      .mapPartitions(it => packIter(it, maxTokens).map {
        case (id, seq, tok, over) => PackedDoc(id, seq, tok, over)
      })
  }

  /** Pack keyed on an opaque string column (`keyCol`, e.g. conv_id):
    * identical semantics to `packSequences` but the group identity rides
    * through the bin assignment verbatim — no hashed surrogate id, so no
    * join back and no collision class at any corpus size.
    */
  def packSequencesByKey(docs: DataFrame, keyCol: String, maxTokens: Int,
      numPartitions: Int = 0): Dataset[PackedKey] = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs.select(col(keyCol).cast("string").as("key"),
      validTokens(keyCol))
    val parts =
      if (numPartitions > 0) sized.repartition(numPartitions, col("key"))
      else sized
    parts
      .sortWithinPartitions(col("n_tokens").desc, col("key"))
      .as[(String, Int)]
      .mapPartitions(it => packIter(it, maxTokens).map {
        case (key, seq, tok, over) => PackedKey(key, seq, tok, over)
      })
  }

  /** The chunking policy the `oversize` flag otherwise defers to callers:
    * split each doc's token count into ⌈n/maxTokens⌉ chunks of at most
    * `maxTokens` (all full except the last), emitting one
    * (keyCol, chunk_idx, n_tokens) row per chunk — feed
    * `concat(key, '#', chunk_idx)` to `packSequencesByKey` and no bin is
    * ever oversize. Zero-token docs keep one empty chunk (a doc is never
    * silently dropped). Pure projection + `explode(sequence(...))`:
    * no shuffle, no UDF, corpus-scale safe by construction.
    */
  def chunkTokens(docs: DataFrame, keyCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    docs
      .select(col(keyCol), validTokens(keyCol))
      .withColumn("n_chunks",
        greatest(ceil(col("n_tokens") / maxTokens.toLong), lit(1L)))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col(keyCol), col("chunk_idx"),
        least(lit(maxTokens),
          col("n_tokens") - col("chunk_idx") * maxTokens.toLong)
          .cast("int").as("n_tokens"))
  }

  /** One-row packing summary: bins, docs, and the fill ratio
    * sum(tokens)/(bins · maxTokens) over non-oversize bins — the quality
    * metric of a packer. No silent anything: oversize docs are counted,
    * and the all-oversize degenerate case reports fill_ratio 0.0 /
    * max_bin_tokens 0 rather than nulls the caller must remember to guard.
    */
  def packingStats(packed: Dataset[PackedDoc], maxTokens: Int): DataFrame =
    packed.toDF()
      .groupBy("seq_id")
      .agg(sum("n_tokens").as("bin_tokens"), count(lit(1)).as("bin_docs"),
        max(col("oversize").cast("int")).as("over"))
      .agg(
        count(lit(1)).as("n_bins"),
        sum("bin_docs").as("n_docs"),
        sum(when(col("over") === 1, 1).otherwise(0)).as("n_oversize_bins"),
        coalesce(
          // try_divide: the all-oversize case has ZERO non-oversize bins —
          // under ANSI a plain division would throw, not null out
          round(try_divide(
            sum(when(col("over") === 0, col("bin_tokens")).otherwise(0)),
            sum(when(col("over") === 0, 1).otherwise(0)) * maxTokens.toLong),
            4), lit(0.0)).as("fill_ratio"),
        coalesce(max(when(col("over") === 0, col("bin_tokens"))), lit(0L))
          .as("max_bin_tokens"))
}
