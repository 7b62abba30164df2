package graft.ext

import org.apache.spark.sql.Dataset

/** Lineage truncation for iterative operators ([[Graph.pageRank]],
  * [[Dedup.connectedComponents]]) — one shared switch between the two
  * Spark checkpoint flavors, because they differ exactly where a
  * cluster differs from local mode:
  *
  *  - `reliable = false` → `localCheckpoint()`: blocks live on executor
  *    block managers. Cheap (no DFS write) and correct on `local[n]`,
  *    but an executor loss mid-iteration loses blocks WITH their
  *    lineage — the job dies and must restart from the operator's
  *    input. The right default for tests and single-node runs.
  *  - `reliable = true` → `checkpoint()`: blocks are written to the
  *    `SparkContext.setCheckpointDir` filesystem (HDFS/object store),
  *    so iteration state survives executor loss at the cost of one
  *    DFS round-trip per truncation. The right choice for long
  *    iterative jobs on a real cluster, where losing an executor over
  *    a 20-iteration run is the expected case, not the exception.
  *    Reclamation caveat: Spark deletes reliable checkpoint data only
  *    when `spark.cleaner.referenceTracking.cleanCheckpoints = true`
  *    (default false) — without it, each iteration's materialized
  *    frame stays on the DFS for the application's lifetime. Set that
  *    conf (or point the checkpoint dir at a TTL'd/scratch path) for
  *    long-running applications; only the localCheckpoint flavor is
  *    reclaimed automatically by the ContextCleaner.
  *
  * Both flavors are EAGER (they run a job at the call site) and both
  * leave the returned frame's lineage flat, so iteration plans never
  * replan their full history. Callers expose this as a
  * `reliable: Boolean = false` parameter.
  */
object Checkpoints {

  /** Truncate `df`'s lineage; see class doc for the mode semantics.
    * Fails fast (not at first executor loss) when the reliable mode is
    * requested without a configured checkpoint directory.
    */
  def truncate[T](df: Dataset[T], reliable: Boolean): Dataset[T] =
    if (reliable) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable = true requires SparkContext.setCheckpointDir " +
          "(an HDFS/object-store path on a real cluster)")
      df.checkpoint()
    } else df.localCheckpoint()
}
