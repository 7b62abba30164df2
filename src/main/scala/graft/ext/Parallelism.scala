package graft.ext

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input widening (optimization guide §2: derive
  * partitioning from the input, never from a constant tuned for one
  * deployment).
  *
  * The compiled per-row text work this repo leans on (tokenize → XXH64 →
  * shingle window, the Gopher batteries, BPE segmentation) runs in the
  * SCAN stage, so its parallelism equals the scan's split count. Parquet
  * splits at row-group boundaries — a small input (or any input written
  * as one row group per file) therefore scans as ONE task regardless of
  * session cores, and the CPU-heavy text pass serializes on a single
  * core while the rest idle. That is a real plan defect at every scale
  * where it occurs: a 32-core ingest trigger handed one small batch file
  * has the identical shape.
  *
  * `widen` round-robin-repartitions such an input up to the session's
  * default parallelism BEFORE the heavy per-row work — and is a no-op
  * whenever the input already carries at least core-count partitions.
  * The condition makes it self-limiting in both directions: it can only
  * fire where the extra exchange is provably cheap (an input with fewer
  * splits than cores is small by construction — here, bounded by
  * cores × maxPartitionBytes ≈ 32 × 128 MB), and at 100 TB, where a scan
  * carries thousands of splits, it never fires and the plan is
  * byte-identical to before. Round-robin is retry-safe (Spark's default
  * sort-before-repartition keeps the row→partition assignment
  * deterministic across task retries, SPARK-23207) and invisible to
  * every consumer in this repo: downstream operators are keyed
  * aggregates and joins, never partition- or arrival-order-sensitive
  * (no `spark_partition_id`/`monotonically_increasing_id` in any query
  * path).
  */
object Parallelism {

  /** Bytes of input per widened task. The heavy passes behind `widen`
    * (tokenize→XXH64→shingle, Gopher battery, BPE segment) chew ~5–10
    * MB/s/core of *compressed* text, so 64 KB ≈ 10–100 ms of work — big
    * enough that a task is never scheduling-dominated, small enough that
    * a sub-MB input still fans out. Measured both failure modes at
    * sf0.1: a flat widen-to-32 made the ~100-job composites PAY ~30
    * ms/job of 33-task scheduling for ~140-doc tasks (curation_screen_v4
    * 6.6 s → 9.5 s), while no widening serializes 0.6–1.3 s jobs on one
    * of 32 cores.
    */
  val LeafBytesPerTask: Long = 64L * 1024

  /** The floor for COMPOSITE-level widening ([[graft.ext.CorpusPrep]]):
    * a composite's widened frame is checkpointed and then consumed by
    * ~30 downstream jobs, so every extra partition is paid ~30× in task
    * scheduling (measured at sf0.1: widening the 584 KB corpus scan to
    * 9 tasks cost the prepare callers 0.3–0.7 s net — train_prep 3.50 →
    * 4.18 s — while the same widen is a clear win for single-job leaf
    * passes). 1 MB ≈ 100–200 ms of battery work per task, an order
    * above the composite-wide scheduling burden of that partition; a
    * bench-sized corpus therefore stays at its scan count while a
    * single-file 128 MB ingest batch still fans out to every core.
    */
  val CompositeBytesPerTask: Long = 1024L * 1024

  /** Widen `df` up to `min(cores, plan-estimated-bytes / 64 KB)`
    * partitions iff its current plan produces fewer (see object doc).
    * Work-derived, never a constant: a tiny test fixture stays at its
    * natural partition count, the bench corpus gets a handful of
    * ~64 KB tasks, and any input already carrying ≥ core-count splits
    * (every at-scale scan) is returned untouched. When the optimizer
    * has no size estimate (post-checkpoint LogicalRDDs report
    * Long.MaxValue-ish defaults) `widen` is a NO-OP: such frames were
    * produced by an upstream stage that already chose a partitioning —
    * in this repo always a checkpoint that was itself widened — and
    * re-exchanging after a checkpoint would both double-pay the shuffle
    * and un-pin the one-scan guarantee the checkpoint exists for. Both
    * probes (partition count, plan stats) are driver-side planning
    * only, no job.
    */
  def widen(df: DataFrame, perTaskBytes: Long = LeafBytesPerTask): DataFrame = {
    val sess = df.sparkSession
    val cores = sess.sparkContext.defaultParallelism
    val cur = df.rdd.getNumPartitions
    if (cur >= cores) return df
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val known = size > 0 && size < BigInt(1L << 50)
    if (!known) return df
    val byWork = (size / perTaskBytes).min(BigInt(cores)).toInt
    val target = math.max(cur, math.min(byWork, cores))
    if (target > cur) df.repartition(target) else df
  }
}
