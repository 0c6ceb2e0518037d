package operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, group-aware dataset splitting — the train/val/test cut a
  * training pipeline makes ONCE and must be able to reproduce forever.
  *
  * Split by hash bucket, not by `rand()`: `xxhash64(key) mod 10000` is a
  * pure function of the key, so the assignment is identical across runs,
  * cluster sizes, partitionings and engine versions — and keying by a
  * GROUP column (conv_id, url-domain, author) puts every row of the group
  * in the same split, preventing near-duplicate leakage from train into
  * eval. Zero shuffle: the split column is a codegen'd projection.
  */
object Sampling {
  final val Buckets = 10000

  /** The stable bucket in [0, Buckets) for a key column. */
  def hashBucket(key: Column): Column =
    pmod(xxhash64(key), lit(Buckets.toLong))

  /** Add a `split` column: 'test' gets `testPermille`/1000 of key-groups,
    * 'val' the next `valPermille`/1000, 'train' the rest.
    */
  def assignSplit(df: DataFrame, keyCol: String,
      valPermille: Int = 10, testPermille: Int = 10): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0
      && valPermille + testPermille <= 1000,
      s"permilles out of range: val=$valPermille test=$testPermille")
    val b = hashBucket(col(keyCol))
    df.withColumn("split",
      when(b < testPermille * (Buckets / 1000), "test")
        .when(b < (testPermille + valPermille) * (Buckets / 1000), "val")
        .otherwise("train"))
  }

  /** Deterministic subsample: keep ~`permille`/1000 of key-groups — the
    * repeatable "1% slice" used for eval sets and fast experiments
    * (same rows every run, unlike `DataFrame.sample`).
    */
  def deterministicSample(df: DataFrame, keyCol: String,
      permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"bad permille $permille")
    df.filter(hashBucket(col(keyCol)) < permille * (Buckets / 1000))
  }
}
