package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / packing for training-data
  * pipelines. Everything here is a pure function of the data — no RNG
  * state, no partition-order dependence — so a 100 TB run reproduces
  * bit-identically on any cluster layout, and every operator has an ANSI
  * SQL twin for the oracle. The randomizer is a cryptographic digest of
  * the row key: uniform, stable across engines, and already the idiom
  * Spark's own `hash`-based sampling approximates (but `hash()` values
  * differ per engine, digests don't).
  */
object Sampling {

  /** Hex digest used as the deterministic "random" sort/bucket key. */
  private def keyDigest(key: Column): Column = md5(key.cast("string"))

  /** Exact-fraction stratified sample: within each stratum, rank rows by
    * digest and keep `ceil(fraction · stratum_size)` — unlike
    * `DataFrame.sampleBy`, the per-stratum count is exact, not binomial.
    * One shuffle on the stratum; the rank and the stratum size share its
    * window. `key` must be unique per row (a doc/row id): equal keys
    * produce equal digests, and which of the tied rows falls under the
    * cutoff would then depend on partition order — the key itself is the
    * secondary sort, so ONLY exact key duplicates are ambiguous.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fraction: Double): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(keyDigest(key), key)
    val n = Window.partitionBy(stratum)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("__rn") <= ceil(lit(fraction) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Deterministic train/validation/test assignment from the first hex
    * digit of the key digest: 0-b → train (12/16), c-d → validation
    * (2/16), e-f → test (2/16). A row's split never changes when the
    * corpus grows — the property that matters for incremental 100 TB
    * ingestion (re-sampling fractions would reshuffle every row's split).
    */
  def datasetSplit(df: DataFrame, key: Column): DataFrame = {
    val digit = substring(keyDigest(key), 1, 1)
    df.withColumn("split",
      when(digit < "c", "train")
        .when(digit < "e", "validation")
        .otherwise("test"))
  }

  /** Greedy contiguous sequence packing: docs ordered by `key`
    * accumulate token counts, and each doc's sequence id is
    * `floor(preceding_cumsum / maxTokens)` — the standard approximate
    * packing for LLM pretraining shards (a doc crossing a boundary opens
    * the next sequence; no doc splitting). One window over the global
    * order: at scale, run per shard/partition column instead of a global
    * ORDER BY (the window spec is the only change).
    */
  def packSequences(df: DataFrame, key: Column, tokenCount: Column,
                    maxTokens: Int): DataFrame = {
    val w = Window.orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokenCount).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - tokenCount) / maxTokens).cast("long"))
      .drop("__cum")
  }

  /** [[packSequences]] at 100 TB: the running sum is windowed per
    * `shard` (a date / source-file / language bucket), so every shard
    * packs independently in parallel — no single-partition global sort.
    * `seq_id` is unique only within a shard; (shard, seq_id) is the
    * global sequence key.
    */
  def packSequencesSharded(df: DataFrame, shard: Column, key: Column,
                           tokenCount: Column, maxTokens: Int): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokenCount).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - tokenCount) / maxTokens).cast("long"))
      .drop("__cum")
  }
}
