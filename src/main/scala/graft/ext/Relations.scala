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
                minSupport: Long, topK: Int,
                maxBasketSize: Int = Int.MaxValue,
                observeName: String = "item_pairs_clamp"): DataFrame = {
    val raw = facts.select(basket.as("b"), item.as("i"))
    // Distinct within basket: a basket listing an item twice is still
    // ONE co-occurrence (collect_set dedupes; the support count uses an
    // explicit distinct so support = number of DISTINCT baskets).
    val frequent = raw.distinct().groupBy("i")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val prunedFacts = raw.join(broadcast(frequent.select("i")),
      Seq("i"), "left_semi")
    // Basket-size clamp: the (max basket)² row-local term is bounded by
    // construction ONLY if baskets are. One pathological mega-basket (a
    // bot session with 10⁵ items) is 10¹⁰ structs inside a single task —
    // so oversized baskets are DROPPED, and the drop is observable: the
    // `item_pairs_clamp` metric (Dataset.observe → CollectMetrics, read
    // via queryExecution.observedMetrics or a QueryExecutionListener)
    // reports how many baskets were dropped and the largest size seen,
    // so a silent-truncation audit can see exactly what the clamp cost.
    // `observeName` must be unique per query — a plan composing two
    // itemPairs results passes distinct names to avoid the analysis-
    // time metric-name collision.
    // The stage consuming this exchange does the (basket size)² in-place
    // pair explosion — its COST is quadratic in basket size while its
    // INPUT bytes are linear, so AQE's byte-targeted coalescing
    // systematically under-provisions it (measured at sf0.1: coalesced
    // to 7 tasks, 1.36 s of the query's 2.7 s in that one stage). Pin
    // the basket shuffle to the session's shuffle-partition count
    // instead ([[fuzzyMatchBlocked]]'s documented rule for the same
    // compute-fans-out-of-small-bytes shape): an explicit
    // REPARTITION_BY_NUM is exempt from AQE coalescing, and the
    // same-key groupBy reuses the exchange, so no second shuffle.
    val parts = facts.sparkSession.sessionState.conf.numShufflePartitions
    val pruned = prunedFacts.repartition(parts, col("b")).groupBy("b")
      .agg(sort_array(collect_set(col("i"))).as("arr"))
      .observe(observeName,
        sum(when(size(col("arr")) > maxBasketSize, 1L).otherwise(0L))
          .as("dropped_baskets"),
        coalesce(max(size(col("arr"))), lit(0)).as("max_basket_size"))
      .filter(size(col("arr")) <= maxBasketSize)
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
    *
    * Join strategy — the 100-TB decision: the default plan is a
    * co-partitioned SORT-MERGE self-join keyed on `blk`. Both sides are
    * the entity table, shuffled once each on the block key (narrow rows,
    * cheap at any size); the O(|block|²) pair explosion + DP verify then
    * runs inside the join, parallel across blocks. Nothing broadcasts,
    * so the operator survives entity tables of any size — the previous
    * form broadcast the WHOLE unblocked table, which dies at the
    * driver/executor broadcast limit (tens of millions of rows) no
    * matter how good the blocking key is. The shuffles are pinned to an
    * explicit partition count (REPARTITION_BY_NUM) because the entity
    * table is small relative to the pair work it fans out into — AQE
    * would coalesce the tiny shuffle onto one task and serialize the
    * whole Σ|block|² stage (measured 28 s vs 1.7 s at sf0.1).
    *
    * Two caveats, both with levers: (1) parallelism of the merge path
    * is bounded by block-key cardinality — a coarse key (5 regions)
    * caps the stage at 5 tasks and one hot block skews it. First
    * preference: pick keys with ≥ cluster-core cardinality (zip prefix,
    * name trigram), the same advice as choosing LSH band width. When
    * the key is fixed and coarse/hot, `subSplits = s` fragments every
    * block into s sub-joins ([[graft.etl.Skew.saltedJoin]]'s shape:
    * left side salted by id, right side replicated s×), multiplying
    * stage parallelism by s for s× more narrow-entity-row shuffle —
    * the pair space itself is unchanged and every pair still meets
    * exactly once, at the left member's salt. (2) `smallDim = true`
    * opts into the broadcast form: one shuffle FEWER and parallelism
    * decoupled from block cardinality (rows spread by id, each probes
    * the broadcast map), correct ONLY when the caller can prove the
    * entity table fits the broadcast limit — it is a promise, not a
    * hint, so it is off by default (subSplits is then moot and
    * ignored).
    */
  /** Size-adaptive entry point: picks [[fuzzyMatchBlocked]]'s broadcast
    * or sort-merge plan from Catalyst's OWN size estimate for the
    * 3-column entity projection — the same `sizeInBytes` statistic the
    * planner compares against `spark.sql.autoBroadcastJoinThreshold`
    * when it chooses join strategies, so "small enough to broadcast"
    * means exactly what it means everywhere else in the session.
    *
    * The estimate is read from the optimized logical plan BEFORE any
    * job runs (file-size based for file sources — no extra scan, no
    * `count()`), and it errs LARGE: an unknown source falls back to
    * `defaultSizeInBytes` (= conf'd huge), and column pruning makes a
    * wide table's projection look bigger than it ships. Both failure
    * directions therefore degrade to the always-safe merge plan — the
    * adaptive mode can only ever decline a broadcast that would have
    * been fine, never attempt one that kills the driver. A threshold
    * of -1 (broadcast disabled session-wide) forces the merge plan,
    * matching the planner's own contract for that sentinel.
    *
    * `smallDim = true` remains the caller-promise override for the
    * case the caller knows the true size and the estimate doesn't
    * (e.g. a filtered frame whose selectivity stats can't see).
    */
  def fuzzyMatchAdaptive(df: DataFrame, blockKey: Column, id: Column,
                         name: Column, maxDist: Int,
                         subSplits: Int = 1): DataFrame = {
    val est = df.select(blockKey.as("blk"), id.as("id"), name.as("nm"))
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    fuzzyMatchBlocked(df, blockKey, id, name, maxDist,
      smallDim = thr > 0 && est <= BigInt(thr), subSplits = subSplits)
  }

  def fuzzyMatchBlocked(df: DataFrame, blockKey: Column, id: Column,
                        name: Column, maxDist: Int,
                        smallDim: Boolean = false,
                        subSplits: Int = 1): DataFrame = {
    val e = df.select(blockKey.as("blk"), id.as("id"), name.as("nm"))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val joined =
      if (smallDim) {
        // Caller-asserted small table: spread the left side by id (so
        // the explosion parallelism is row-count-, not block-, bound)
        // and hash-probe the broadcast right side.
        val l = e.repartition(parts, col("id"))
          .select(col("blk"), col("id").as("id1"), col("nm").as("nm1"))
        val r = e.select(col("blk").as("blk2"), col("id").as("id2"),
          col("nm").as("nm2"))
        l.join(broadcast(r),
          col("blk") === col("blk2") && col("id1") < col("id2"))
      } else {
        // Default: co-partitioned sort-merge on (block key, sub-split).
        // The merge hint keeps the planner (and AQE re-planning) from
        // flipping a test-scale-small side back to broadcast — the
        // exact shape this form exists to avoid.
        val s = math.max(1, subSplits)
        val l = e.select(col("blk"), col("id").as("id1"),
            col("nm").as("nm1"),
            graft.etl.Skew.salt(s, col("id")).as("__sub"))
          .repartition(parts, col("blk"), col("__sub"))
        val r = e.select(col("blk").as("blk2"), col("id").as("id2"),
            col("nm").as("nm2"),
            explode(sequence(lit(0), lit(s - 1))).as("__sub2"))
          .repartition(parts, col("blk2"), col("__sub2"))
        l.hint("merge").join(r,
          col("blk") === col("blk2") && col("__sub") === col("__sub2") &&
            col("id1") < col("id2"))
      }
    joined
      // Length-gap prefilter (|len(a)-len(b)| > k ⇒ dist > k) drops a
      // pair before any DP work; the survivors run the THRESHOLDED
      // levenshtein — a banded O(n·k) DP that abandons a row pair the
      // moment the band exceeds maxDist (returns -1), instead of
      // filling the full O(n²) matrix and filtering after. Same result
      // set: the thresholded form returns the exact distance whenever
      // it is ≤ maxDist, which is precisely the surviving predicate.
      .filter(abs(length(col("nm1")) - length(col("nm2"))) <= maxDist)
      .withColumn("dist", F.levenshtein(col("nm1"), col("nm2"), maxDist))
      .filter(col("dist").between(0, maxDist))
      .select(col("blk"), col("id1"), col("id2"), col("dist"))
      .orderBy("blk", "id1", "id2")
  }
}
