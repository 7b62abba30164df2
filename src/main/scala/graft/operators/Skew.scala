package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for shuffles whose cost concentrates on one
  * reducer. Plain algebraic aggregates don't need this — map-side partial
  * aggregation already bounds what any reducer receives to one partial
  * per mapper. The cases that DO melt a reducer at 100 TB:
  *
  *   - `COUNT(DISTINCT x) GROUP BY k`: Catalyst expands to a shuffle of
  *     every distinct (k, x) pair — a hot `k` sends its entire key set
  *     to one task.
  *   - a shuffle equi-join with a hot key: every row of the hot key on
  *     both sides meets in one task (AQE's skew-join split handles the
  *     sort-merge case at runtime; the salted form below is the static
  *     plan-level guarantee, and the only option when AQE is off or the
  *     join is hash-based).
  *
  * Both helpers are SEMANTICALLY INVISIBLE — identical results to the
  * unsalted form (the DuckDB oracle asserts this) — because the salt is
  * derived deterministically from data, never RNG (the engine determinism
  * contract: no `rand()`, results identical under any partitioning).
  */
object Skew {

  /** Two-stage salted distinct count. The salt is derived from the
    * DISTINCT column itself, so every distinct value lands in exactly one
    * (key, salt) cell — the per-cell `countDistinct` partials are over
    * disjoint value sets and the final stage is a plain `sum`. The hot
    * key's distinct set now spreads over `buckets` tasks, and the second
    * shuffle carries one row per (key, salt), which is nothing.
    */
  def saltedDistinctCount(df: DataFrame, key: String, distinctCol: String,
                          buckets: Int = 16,
                          outName: String = "n_distinct"): DataFrame =
    df.select(col(key), col(distinctCol))
      .withColumn("_salt", pmod(xxhash64(col(distinctCol)), lit(buckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(countDistinct(col(distinctCol)).as("_part"))
      .groupBy(col(key))
      .agg(sum("_part").cast("long").as(outName))

  /** Salted shuffle equi-join: left rows carry a salt derived from
    * `saltFrom` (pass a column that VARIES WITHIN the join key — a line
    * number, a unique id; salting by the key itself would be a no-op),
    * and the right side is replicated across all `buckets` salt values,
    * so each (key, salt) cell joins independently and a hot key's rows
    * spread over `buckets` tasks. Replication multiplies the right side
    * ×buckets — use when right is the smaller input but too big to
    * broadcast (the classic mid-size-dimension skew case).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFrom: Column, buckets: Int = 8): DataFrame = {
    val l = left.withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
