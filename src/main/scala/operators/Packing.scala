package operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  */
object Packing {
  final val MaxOpenBins = 64

  final case class PackedDoc(doc_id: Long, seq_id: Long, n_tokens: Int,
      oversize: Boolean)

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
      col("n_tokens").cast("int").as("n_tokens"))
    val parts =
      if (numPartitions > 0) sized.repartition(numPartitions, col("doc_id"))
      else sized
    parts
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        // open bins as (local_bin_id, tokens_used); when over MaxOpenBins,
        // evict the fullest (min remaining) — that forfeits the least
        // future capacity. Eviction can only cost fill ratio (a small doc
        // that would have fit the evicted bin opens a new one), never
        // correctness; the spec measures the ratio rather than assuming it
        val open = ArrayBuffer.empty[(Long, Int)]
        var nextLocal = 0L
        it.map { case (docId, rawTok) =>
          val tok = math.max(rawTok, 0)
          if (tok > maxTokens) {
            val local = nextLocal; nextLocal += 1
            PackedDoc(docId, (pid << 32) | local, tok, oversize = true)
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
            PackedDoc(docId, (pid << 32) | local, tok, oversize = false)
          }
        }
      }
  }

  /** One-row packing summary: bins, docs, and the fill ratio
    * sum(tokens)/(bins · maxTokens) over non-oversize bins — the quality
    * metric of a packer. No silent anything: oversize docs are counted.
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
        round(sum(when(col("over") === 0, col("bin_tokens")).otherwise(0))
          / (sum(when(col("over") === 0, 1).otherwise(0)) * maxTokens.toLong),
          4).as("fill_ratio"),
        max(when(col("over") === 0, col("bin_tokens"))).as("max_bin_tokens"))
}
