package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins. AQE's skew-join handles most cases at
  * runtime; this explicit salt is for the pathological ones AQE can't
  * split (a single hot key inside one task, or a broadcast-ineligible dim
  * that must shuffle against a hot fact key).
  *
  * Shape: the fact side spreads each hot key over `salts` sub-keys using a
  * deterministic per-row salt; the dim side is replicated `salts`× via
  * `explode`. Join cardinality/result is provably identical to the plain
  * join; only the shuffle layout changes (hot key → `salts` tasks).
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
}
