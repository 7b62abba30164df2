package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for shuffles whose cost concentrates on one
  * reducer. AQE's skew-join handles most join cases at runtime; these
  * explicit salts are for the pathological ones AQE can't split (a single
  * hot key inside one task, a broadcast-ineligible dim that must shuffle
  * against a hot fact key, or `COUNT(DISTINCT x) GROUP BY k`, which
  * Catalyst expands to a shuffle of every distinct (k, x) pair — a hot
  * `k` sends its entire key set to one task). Plain algebraic aggregates
  * never need this: map-side partial aggregation already bounds what any
  * reducer receives to one partial per mapper.
  *
  * Shape: the fact side spreads each hot key over `salts` sub-keys using a
  * deterministic per-row salt; the dim side is replicated `salts`× via
  * `explode`. Join cardinality/result is provably identical to the plain
  * join; only the shuffle layout changes (hot key → `salts` tasks). Every
  * salt is derived from data, never `rand()` (the engine determinism
  * contract: identical results under any partitioning and on retries).
  */
object Skew {

  /** Deterministic row salt in [0, salts): hashes the distinguishing
    * columns (anything that varies within a join key — an id, a
    * timestamp), never `rand()` (breaks retries/determinism).
    */
  def salt(salts: Int, distinguishers: Column*): Column =
    pmod(hash(distinguishers: _*), lit(salts))

  /** Salted inner equi-join on `key`. `factDistinguisher` must vary within
    * a key on the fact side (e.g. the fact's primary key).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factDistinguisher: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(salts, factDistinguisher))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage salted distinct count. The salt is derived from the
    * DISTINCT column itself, so every distinct value lands in exactly one
    * (key, salt) cell — the per-cell `countDistinct` partials are over
    * disjoint value sets and the final stage is a plain `sum`. The hot
    * key's distinct set now spreads over `salts` tasks, and the second
    * shuffle carries one row per (key, salt), which is nothing.
    * Result is identical to plain `countDistinct` (the DuckDB oracle
    * asserts this via the distinct_counts_salted query).
    */
  def saltedDistinctCount(df: DataFrame, key: String, distinctCol: String,
                          salts: Int = 16,
                          outName: String = "n_distinct"): DataFrame =
    df.select(col(key), col(distinctCol))
      .withColumn("__salt", pmod(xxhash64(col(distinctCol)), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__part"))
      .groupBy(col(key))
      .agg(sum("__part").cast("long").as(outName))
}
