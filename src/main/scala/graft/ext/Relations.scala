package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._

/** Relationship-mining operators: market-basket co-occurrence and
  * blocked fuzzy entity matching. Both are "pair space is the enemy"
  * problems — the scale design is always the same two moves the dedup
  * family uses (`Dedup`, `Similarity`): PRUNE the item universe before
  * any pairing, and pair only WITHIN a bounded block (an order, an
  * entity block), never across the whole table.
  */
object Relations {

  /** Frequent co-occurring item pairs (the market-basket / apriori first
    * pass): for every pair of distinct items appearing in the same
    * basket, the number of baskets containing both — min-support pruned
    * and top-k truncated with a total tiebreak.
    *
    * Scale shape: NO self-join. Each basket's distinct items collapse to
    * one sorted array in a single basket-keyed shuffle (`collect_set` —
    * bounded by the basket, not the table), and the pair space is then
    * generated IN PLACE per basket row with array lambdas: x paired with
    * every later element of the sorted array, so `i1 < i2` holds by
    * construction and the quadratic term is (max basket size)² of
    * row-local work — never a joined/shuffled pair table before the
    * count aggregate sees it. Item support is one group-keyed aggregate
    * (the apriori prune: a pair can't be frequent if either member
    * isn't — lossless above minSupport); the surviving items prune the
    * fact stream through a broadcast SEMI-join before the basket
    * grouping (a hash probe inside the scan stage — never an army of
    * per-row array intersections, whose cost is |basket|·|frequent set|
    * interpreted). A basket self-join would shuffle the fact table twice
    * more and tempt the planner into broadcasting a fact-sized side at
    * test scale — this form shuffles each fact row exactly twice (the
    * two passes apriori fundamentally needs: support, then baskets).
    */
  def itemPairs(facts: DataFrame, basket: Column, item: Column,
                minSupport: Long, topK: Int): DataFrame = {
    val raw = facts.select(basket.as("b"), item.as("i"))
    // Distinct within basket: a basket listing an item twice is still
    // ONE co-occurrence (collect_set dedupes; the support count uses an
    // explicit distinct so support = number of DISTINCT baskets).
    val frequent = raw.distinct().groupBy("i")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val prunedFacts = raw.join(broadcast(frequent.select("i")),
      Seq("i"), "left_semi")
    val pruned = prunedFacts.groupBy("b")
      .agg(sort_array(collect_set(col("i"))).as("arr"))
    val pairs = pruned.select(explode(expr(
      """flatten(transform(arr, (x, ix) ->
        |  transform(slice(arr, ix + 2, size(arr)), y ->
        |    struct(x AS i1, y AS i2))))""".stripMargin)).as("p"))
    pairs.select("p.i1", "p.i2")
      .groupBy("i1", "i2").agg(count(lit(1)).as("n_baskets"))
      .orderBy(col("n_baskets").desc, col("i1"), col("i2"))
      .limit(topK)
  }

  /** Blocked fuzzy entity matching: candidate duplicate pairs whose
    * names are within `maxDist` Levenshtein edits, compared only INSIDE
    * caller-chosen blocks (the classic entity-resolution blocking step —
    * nation, zip prefix, name initial…).
    *
    * The O(n²) edit-distance comparison runs per BLOCK, never globally:
    * the self-join keys on the block id (one shuffle, co-partitioned),
    * and `id1 < id2` halves the pair space. Cost is Σ|block|² — the
    * caller's blocking key is the scale lever, exactly as LSH bands are
    * for [[Dedup]]. Levenshtein itself is Spark's codegen'd built-in
    * (same contract as the oracle's `levenshtein`).
    */
  def fuzzyMatchBlocked(df: DataFrame, blockKey: Column, id: Column,
                        name: Column, maxDist: Int): DataFrame = {
    val e = df.select(blockKey.as("blk"), id.as("id"), name.as("nm"))
    // The block table broadcasts (it's the same small entity table), so
    // the join needs NO co-partitioning — which means the left side's
    // layout decides the parallelism of the pair explosion + DP verify.
    // A single-file scan would run the whole O(Σ|block|²) stage on one
    // core: spread rows by id first (a narrow-row shuffle of the ENTITY
    // table, not the pair space — cheap at any size). The partition
    // count is EXPLICIT: the entity table is tiny pre-explosion, and an
    // advisory repartition would be AQE-coalesced back to one task —
    // sized for the input rather than the O(|block|²) work each input
    // row fans out into.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val l = e.repartition(parts, col("id"))
      .select(col("blk"), col("id").as("id1"), col("nm").as("nm1"))
    val r = e.select(col("blk").as("blk2"), col("id").as("id2"),
      col("nm").as("nm2"))
    l.join(broadcast(r), col("blk") === col("blk2") && col("id1") < col("id2"))
      .withColumn("dist", F.levenshtein(col("nm1"), col("nm2")))
      .filter(col("dist") <= maxDist)
      .select(col("blk"), col("id1"), col("id2"), col("dist"))
      .orderBy("blk", "id1", "id2")
  }
}
