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

  /** Fixed-size per-group sample: the k rows of each group with the
    * smallest key digests — the "give me 20 representative docs per
    * language" shape. Same digest-rank machinery as
    * [[stratifiedSample]] but COUNT-exact rather than fraction-exact,
    * so the output size is k·|groups| regardless of skew: a group with
    * a billion rows and a group with ten both emit ≤ k. One window
    * shuffle on the group key; no global sort, no second pass (the
    * stratum-size count is not needed).
    */
  def perGroupSample(df: DataFrame, group: Column, key: Column,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(keyDigest(key), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
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

  /** Deterministic k-fold assignment (cross-validation folds): fold i is
    * the digest-prefix interval [hexThreshold(i/k), hexThreshold((i+1)/k))
    * — equal 1/k fractions up to 16⁻⁸, stable as the corpus grows (a
    * row's fold never changes — same property as [[datasetSplit]]).
    * Plan-time hex-string thresholds, shared verbatim with the oracle
    * SQL: both engines compare plain lowercase-hex strings.
    */
  def kfoldAssign(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    df.withColumn("fold", digestBucket(substring(keyDigest(key), 1, 8), k))
  }

  /** Equal-width digest-prefix bucket: prefix ∈ [hexThreshold(i/n),
    * hexThreshold((i+1)/n)) → i. The ONE ladder behind [[kfoldAssign]],
    * [[shuffleShards]], and [[shardId]] — their equal-assignment
    * contracts (and the oracle SQL's CASE twins) hold because there is
    * exactly one implementation to drift. When-chain built from the
    * highest threshold down, so the ascending checks end up evaluated
    * smallest-first (first match wins).
    */
  private def digestBucket(prefix: Column, n: Int): Column =
    (1 until n).reverse.foldLeft(lit(n - 1): Column) { (acc, i) =>
      when(prefix < hexThreshold(i.toDouble / n), i - 1).otherwise(acc)
    }

  /** 8-hex-digit digest prefix threshold for fractional probability `f`:
    * P(digest_prefix < threshold) = f exactly (up to 16^-8). Computed at
    * plan-build time, so both the Spark plan and the SQL oracle compare
    * plain lowercase-hex strings — no base conversion inside the engine.
    */
  private[graft] def hexThreshold(f: Double): String =
    f"${math.round(f * (1L << 32)).min((1L << 32) - 1).max(0L)}%08x"

  /** Deterministic mixture resampling — reweight a corpus toward target
    * per-stratum epoch counts (the "data mixture" step of LLM training:
    * e.g. books ×2.3, web ×0.4). A weight w emits floor(w) copies of
    * every row plus one more for the digest-fraction of rows under
    * frac(w) — so the stratum's expected multiplicity is exactly w,
    * the selection is a pure function of the key (same rows survive on
    * any cluster layout), and an `epoch` column (1-based) distinguishes
    * the copies. Rows in strata absent from `weights` get `default`.
    * Shape: a codegen'd projection + explode(sequence) — scan-bound, no
    * shuffle; downstream shuffles see the already-reweighted stream.
    */
  /** Per-source document caps — the C4/RefinedWeb-style "no domain may
    * dominate the mix" rule: within each source, rank docs by
    * `preference` (descending; ties broken by ascending doc_id — a
    * total order, so the kept set is deterministic) and keep the top
    * `cap`. Returns the SURVIVORS (doc_id, source, src_rank) — the
    * materializing form — because emitting keep-flags for every row
    * would force the full window over each source, while the rank ≤ cap
    * filter lets Spark plan a partial WindowGroupLimit: each map task
    * ships AT MOST `cap` candidates per source into the shuffle, so a
    * billion-doc hot domain costs the shuffle `cap` rows, not a
    * billion (the negative_samples skew armor; PlanGuardSpec pins the
    * Partial node).
    */
  def sourceCaps(docs: DataFrame, cap: Int,
                 preference: Column): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(preference.desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        row_number().over(w).as("src_rank"))
      .filter(col("src_rank") <= cap)
      .orderBy("source", "src_rank")
  }

  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
                    weights: Map[String, Double],
                    default: Double = 1.0): DataFrame = {
    def parts(w: Double): (Long, Double) = {
      val base = math.floor(w).toLong
      (base, w - base)
    }
    mixtureSampleParts(df, stratum, key,
      weights.map { case (s, w) => s -> parts(w) }, parts(default))
  }

  /** [[mixtureSample]] with each stratum's multiplicity supplied as the
    * (full_epochs, residual_rate) PAIR a token-budget plan publishes,
    * instead of their sum: reconstructing the fraction as w − floor(w)
    * can drift from the plan's residual_rate by an ulp when
    * full_epochs ≥ 1 (an off-by-one coin threshold vs the oracle's
    * LEAST(ROUND(residual_rate·2³²), 2³²−1) on unlucky corpora), and a
    * residual that rounds to exactly 1.0 would fold into the floor —
    * EVERY doc gets the extra epoch — where the clamped coin correctly
    * leaves out digest prefix ffffffff. The coin threshold must come
    * from the plan's own residual column ([[sampleAtBudget]]).
    */
  private[ext] def mixtureSampleParts(df: DataFrame, stratum: Column,
                                      key: Column,
                                      parts: Map[String, (Long, Double)],
                                      default: (Long, Double)): DataFrame = {
    def copiesFor(p: (Long, Double)): Column = {
      // The epoch column stays INT (the mixture family's published
      // schema), so a base past Int range must fail loudly here — a
      // silent .toInt wrap would flip copies negative and DROP the
      // source the plan meant to upsample hardest.
      require(p._1 >= 0 && p._1 <= Int.MaxValue,
        s"full-epoch multiplicity ${p._1} outside [0, Int.MaxValue] — " +
          "check the budget plan (budget vs source token count)")
      // strict '<' against the half-open digest interval [0, rate)
      lit(p._1.toInt) + when(
        substring(keyDigest(key), 1, 8) < hexThreshold(p._2), 1)
        .otherwise(0)
    }
    val copies = parts.foldLeft(copiesFor(default)) {
      case (acc, (s, p)) => when(stratum === s, copiesFor(p)).otherwise(acc)
    }
    // Drop zero-copy rows BEFORE the explode: sequence(1, 0) would infer
    // a descending step and emit [1, 0], not an empty array. The explicit
    // step keeps the remaining sequences ascending-only.
    df.filter(copies > 0)
      .withColumn("epoch", explode(sequence(lit(1), copies, lit(1))))
  }

  /** Temperature-flattened mixture with weights derived FROM the corpus
    * (the multilingual/multi-source rebalancing step of LLM training):
    * each stratum's weight is √(n_max / n_s) — T = 2 temperature
    * flattening relative to the LARGEST stratum, which keeps weight
    * exactly 1.0 (every row once) while rarer strata upsample by the
    * square-root of their size deficit. Like [[mixtureSample]], the
    * digit coin makes the selection a pure function of the key; a NULL
    * stratum matches no weight row and falls to weight 1.0 (the
    * `default` convention).
    *
    * Fully in-frame — unlike [[mixtureSample]]'s caller-supplied Map
    * (a bounded when-chain), the data-dependent weights live in a
    * strata-cardinality frame equi-joined back (AQE broadcasts it when
    * small), so a high-cardinality stratum (domain, url host) neither
    * collects to the driver nor blows up the expression tree. Every
    * number is IEEE-754-exact and engine-independent by construction:
    * √ and ÷ on exact integer counts, frac·2³² (scaling by a power of
    * two is exact), and an integer digest compared against it — no
    * rounding, no hex formatting, nothing libm. T is FIXED at 2 for
    * the same reason: a general temperature would go through `pow`,
    * whose values are not guaranteed identical across engines.
    */
  def temperatureMixture(df: DataFrame, stratum: Column,
                         key: Column): DataFrame = {
    // NULL strata are excluded from the count frame entirely: they
    // match no weight row (default 1.0) and must not participate in
    // the n_max derivation either — a large missing-stratum group
    // would otherwise deny EVERY real stratum the documented
    // weight-1.0 anchor. Both consumers of `counts` (the 1-row global
    // max and the weights projection) share its corpus shuffle at
    // runtime (ReusedExchange — identical exchange subtrees; guarded
    // in PlanGuardSpec), and the max reduces in parallel — no
    // single-task window over a possibly high-cardinality strata
    // frame.
    val counts = df.filter(stratum.isNotNull)
      .groupBy(stratum.as("__s")).agg(count(lit(1)).as("__n"))
    val nmax = counts.agg(max(col("__n")).as("__nmax"))
    val weights = counts.crossJoin(broadcast(nmax))
      .select(col("__s"),
        sqrt(col("__nmax").cast("double") / col("__n")).as("__w"))
    val digit = conv(substring(keyDigest(key), 1, 8), 16, 10)
      .cast("bigint").cast("double")
    val copies = coalesce(
      floor(col("__w")).cast("int") +
        when(digit < (col("__w") - floor(col("__w"))) * lit(4294967296.0), 1)
          .otherwise(0),
      lit(1))
    // No zero-copy guard needed (unlike mixtureSample's caller-supplied
    // weights): every matched weight is √(n_max/n) ≥ 1 and unmatched
    // rows coalesce to 1, so copies ≥ 1 by construction.
    df.join(weights, stratum === col("__s"), "left")
      .withColumn("epoch", explode(sequence(lit(1), copies, lit(1))))
      .drop("__s", "__w")
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

  /** Fixed-size token-window chunking with overlap — the context-length
    * splitter that runs before packing: chunk i covers tokens
    * [i·stride, i·stride+chunk); the last chunk starts at
    * ceil((len−chunk)/stride)·stride so the tail is covered exactly once
    * (no fully-redundant trailing chunk). A typed compiled `flatMap`
    * like [[Dedup.hashedShingles]] — the declarative transform+slice
    * chain is interpreted and allocates per-chunk arrays twice. Pure
    * per-row expansion: scan-bound, no shuffle, deterministic, and
    * ANSI-expressible for the oracle.
    */
  def chunkByTokens(docs: DataFrame, chunkTokens: Int,
                    strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1,
      s"chunk/stride must be positive: $chunkTokens/$strideTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.trim.split("\\s+")
        val n = toks.length
        val last = math.max(0,
          math.ceil((n - chunkTokens).toDouble / strideTokens).toInt)
        (0 to last).iterator.map { i =>
          val s = i * strideTokens
          val end = math.min(s + chunkTokens, n)
          (id, i, end - s, toks.slice(s, end).mkString(" "))
        }
      }
      .toDF("doc_id", "chunk_id", "n_tokens", "chunk")
  }

  /** [[packSequences]]' EXACT global-order semantics without the
    * single-task global window: a declarative two-pass distributed
    * prefix sum.
    *
    *  1. Bucket cuts: `buckets − 1` approximate quantiles of the
    *     (numeric, unique) `key` — one narrow agg job. Bucket id =
    *     number of cuts below the key, so bucketing is a pure function
    *     of the key VALUE (never of partition layout; Spark's range
    *     partitioner samples nondeterministically across jobs, which
    *     is why it cannot be used twice and isn't used here).
    *  2. Per-bucket token totals (map-side-combined agg → `buckets`
    *     rows on the driver) become exclusive prefix offsets.
    *  3. Each bucket runs its cumulative sum as a PARALLEL window
    *     partitioned by bucket id, plus its broadcast offset — the
    *     global running sum, reassembled.
    *
    * The output is bit-identical to [[packSequences]] for any bucket
    * count (the global cumsum is bucketing-invariant — quantile
    * wobble only moves WORK between buckets, never results; pinned by
    * SamplingSpec and the `pack_global` oracle). Cost at 100 TB: two
    * scans (the offsets pass reads two columns), one narrow and one
    * full shuffle, no task ever sees more than ~1/buckets of the
    * corpus — vs [[packSequences]]' one-task global sort. Use
    * [[packSequencesSharded]] when a natural shard key exists and
    * per-shard sequence ids suffice; use this when the contract is ONE
    * global greedy packing order.
    */
  def packSequencesGlobal(df: DataFrame, key: Column, tokenCount: Column,
                          maxTokens: Int, buckets: Int = 64): DataFrame = {
    require(maxTokens >= 1 && buckets >= 1,
      s"maxTokens/buckets must be positive: $maxTokens/$buckets")
    val withTc = df.withColumn("__tc", tokenCount.cast("long"))
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val cuts: Seq[Long] =
      if (probs.isEmpty) Seq.empty
      else {
        val row = withTc
          .agg(percentile_approx(key.cast("long"),
            typedLit(probs), lit(10000)).as("c"))
          .head()
        if (row.isNullAt(0)) Seq.empty // empty input
        else row.getSeq[Long](0)
      }
    // pid = number of cuts strictly below the key — ONE flat array
    // expression (a fold of nested `when`s builds an expression tree
    // as deep as the bucket count and overflows the stack past a few
    // thousand; the lambda form is depth-1, width-n).
    val pid =
      if (cuts.isEmpty) lit(0)
      else size(filter(typedLit(cuts.distinct.sorted),
        c => key.cast("long") > c))
    val bucketed = withTc.withColumn("__pid", pid)
    val sums = bucketed.groupBy("__pid").agg(sum(col("__tc")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.scanLeft((0, 0L)) { case ((_, acc), (p, s)) =>
      (p, acc + s)
    }.sliding(2).collect { case Array((_, acc), (p, _)) => (p, acc) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("__cum", col("__off") + sum(col("__tc")).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - col("__tc")) / maxTokens).cast("long"))
      .drop("__pid", "__off", "__cum", "__tc")
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

  /** Deterministic fixed-size uniform sample: the `k` rows whose key
    * digests sort smallest — the digest-keyed form of reservoir
    * sampling. Mergeable by construction (bottom-k of a union is the
    * bottom-k of per-part bottom-ks), and Spark plans the ORDER
    * BY+LIMIT as TakeOrdered: each partition ships only its own k
    * candidate rows to the driver merge — no shuffle, no full sort, at
    * any table size. Unlike `TABLESAMPLE`/`rand()`, the sample is
    * REPRODUCIBLE across runs, engines, and partitionings, and `k` is
    * exact, not expected.
    */
  def bottomKSample(df: DataFrame, key: Column, k: Int): DataFrame =
    df.withColumn("digest", md5(key.cast("string")))
      .orderBy("digest")
      .limit(k)

  /** Deterministic negative sampling for contrastive training: each
    * anchor draws the `k` pool members whose PAIR digest sorts smallest
    * — uniform pseudo-random negatives that are reproducible across
    * runs/engines (the property in-batch `rand()` negatives lack, and
    * the one that makes training jobs resumable). The pool BROADCASTS
    * (contrastive negatives come from a bounded candidate set — a
    * shard, an in-batch pool, a curated hard-negative table), so the
    * pair frame is |anchors|×|pool| rows of ids+digest flowing through
    * one per-anchor top-k window — never corpus × corpus.
    */
  def negativeSamples(anchors: DataFrame, anchorKey: Column,
                      pool: DataFrame, poolKey: Column,
                      k: Int): DataFrame = {
    val a = anchors.select(anchorKey.as("anchor_id"))
    val p = broadcast(pool.select(poolKey.as("neg_id")))
    val w = Window.partitionBy("anchor_id").orderBy("digest")
    a.crossJoin(p)
      .filter(col("anchor_id") =!= col("neg_id"))
      .withColumn("digest",
        md5(concat_ws(":", col("anchor_id"), col("neg_id"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col("neg_id"))
      .orderBy("anchor_id", "rank")
  }

  /** Token-budget mixture plan: the sizing step a training run does
    * BEFORE any resampling — given target mixture weights per source
    * and a total token budget, how many tokens each source must
    * contribute, how many epochs of that source this implies, and the
    * per-doc sampling rate that realizes it ([[mixtureSample]] consumes
    * exactly (full epochs + residual coin) per source downstream).
    *
    * Sources absent from `weights` are EXCLUDED from the plan (a
    * mixture names every source it keeps); `epochs > 1` means the
    * budget wants MORE than one pass of that source (upsampling —
    * the small-high-quality-corpus case), `< 1` means downsampling.
    *
    * Exactness: one corpus scan aggregates per-source doc/token
    * counts (DECIMAL sums, fold-order-free); weights ride as
    * DECIMAL(10,6) literals so short decimal weights survive exactly
    * (no IEEE 0.1 drift); `target_tokens = floor(budget · w)` floors
    * EXPLICITLY — Spark's decimal→long cast truncates while DuckDB's
    * rounds, so the floor must be in the expression, not the cast.
    * The epoch/rate divisions are single IEEE ops over exact inputs,
    * reproduced literally by the oracle.
    */
  def tokenBudgetPlan(docs: DataFrame, weights: Map[String, Double],
                      budgetTokens: Long): DataFrame = {
    val spark = docs.sparkSession
    val w = broadcast(spark.createDataFrame(
        weights.toSeq.sortBy(_._1)).toDF("source", "w_raw")
      .select(col("source"),
        col("w_raw").cast("decimal(10,6)").as("w")))
    val per = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"))
    val target = floor(lit(budgetTokens).cast("decimal(27,6)") * col("w"))
      .cast("long")
    per.join(w, Seq("source"))
      .withColumn("weight", col("w").cast("double"))
      .withColumn("target_tokens", target)
      .withColumn("epochs",
        round(col("target_tokens").cast("double") /
          col("n_tokens").cast("double"), 4))
      .withColumn("full_epochs", floor(col("epochs")).cast("long"))
      .withColumn("residual_rate",
        round(col("epochs") - col("full_epochs"), 4))
      .select("source", "n_docs", "n_tokens", "weight", "target_tokens",
        "epochs", "full_epochs", "residual_rate")
      .orderBy("source")
  }

  /** EXECUTE a token-budget plan ([[tokenBudgetPlan]] → the corpus AT
    * the plan): every doc of a planned source is emitted `full_epochs`
    * times plus once more for the digest-fraction of docs under
    * `residual_rate` — [[mixtureSample]]'s deterministic digit coin
    * with the per-source rates derived FROM the plan instead of
    * caller-supplied, so the sizing step and the sampling step can no
    * longer drift apart. Docs from sources absent from `weights` are
    * dropped (the budget covers planned sources only — the plan's own
    * inner-join rule).
    *
    * Shape at 100 TB: the plan collect is weights-sized (one row per
    * source — the bounded-metadata convention), the rates become plan
    * literals, and the sampling itself is [[mixtureSample]]'s
    * scan-bound projection + explode: no shuffle anywhere. Expected
    * output tokens per source = target_tokens (the digest coin is
    * unbiased); the realized count is a pure function of the doc_id
    * population, so replays and backfills materialize the identical
    * corpus.
    */
  def sampleAtBudget(docs: DataFrame, weights: Map[String, Double],
                     budgetTokens: Long): DataFrame = {
    // Bounded collect: |weights| rows of plan metadata. The
    // (full_epochs, residual_rate) pair feeds the coin UNFOLDED — the
    // oracle decomposes the same way, and summing then re-deriving the
    // fraction is ulp-unsafe ([[mixtureSampleParts]]).
    val parts = tokenBudgetPlan(docs, weights, budgetTokens)
      .select("source", "full_epochs", "residual_rate")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    mixtureSampleParts(docs, col("source"), col("doc_id"), parts,
      default = (0L, 0.0))
  }

  /** Deterministic global shuffle, sharded — the final training-data
    * layout step: every row gets a (shard, pos) address such that
    * reading shards in shard order, each in pos order, replays ONE
    * fixed pseudo-random permutation of the corpus — bit-identical on
    * any cluster layout and across restarts (training-order
    * reproducibility, the property a `repartition(n).sortWithinPartitions`
    * of Spark's partition-order-dependent `rand()` cannot give).
    * `shard` is an equal-width digest-prefix bucket (the
    * [[kfoldAssign]] intervals — plan-time hex thresholds shared
    * verbatim with the oracle); `pos` ranks within the shard by
    * (digest, key), so ties are impossible for a unique key. Changing
    * `seed` draws a fresh permutation; re-running draws the same one.
    *
    * Shape at 100 TB: ONE hash exchange on `shard`, then a per-task
    * sort — never a global ORDER BY (a single total-order sort of
    * 100 TB is the plan this operator exists to avoid). Shard count is
    * the parallelism contract: size it to the target output file
    * (100 TB at 1 GB files ≈ 100k shards) and no task ever holds more
    * than one shard's rows; the digest is uniform, so shards balance
    * to 16⁻⁸ regardless of key distribution — a hot key family cannot
    * skew a shard the way value-based partitioning would.
    *
    * `key` must be unique and non-null per row (the [[stratifiedSample]]
    * contract): equal keys produce equal digests, and which tied row
    * takes which `pos` would then depend on partition order.
    */
  def shuffleShards(df: DataFrame, key: Column, numShards: Int,
                    seed: String = "graft"): DataFrame = {
    require(numShards >= 1, "need at least one shard")
    val shard = digestBucket(substring(col("__dg"), 1, 8), numShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("__dg"), key)
    df.withColumn("__dg", md5(concat_ws(":", lit(seed), key.cast("string"))))
      .withColumn("shard", shard.cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__dg")
  }

  /** Digest-bucket shard id for `key` — [[shuffleShards]]'s assignment
    * WITHOUT the rank: row-local (no window, no exchange), for
    * manifests, routing, and any consumer that needs "which shard"
    * but not "which position". Identical literals/thresholds, so
    * `shardId(key, n, seed)` always equals the `shard` column
    * [[shuffleShards]] emits for the same arguments.
    */
  def shardId(key: Column, numShards: Int,
              seed: String = "graft"): Column = {
    require(numShards >= 1, "need at least one shard")
    digestBucket(substring(
      md5(concat_ws(":", lit(seed), key.cast("string"))), 1, 8), numShards)
      .cast("int")
  }

  /** Materialize the [[shuffleShards]] permutation: `dir/shard=N/`
    * parquet, each shard ONE file whose row order IS the permutation
    * order — a trainer streams the files in shard order and replays the
    * fixed shuffle with no sort and no shard-assignment logic of its
    * own (`pos` rides along for seekable restarts). Costs NOTHING on
    * top of [[shuffleShards]]'s one exchange: the rank window already
    * leaves every task's rows hash-clustered by shard and sorted by
    * (shard, digest, key), exactly the dynamic-partition write order —
    * each shard lives in exactly one task, so each `shard=N/` dir gets
    * exactly one file (SamplingSpec pins both properties; the write
    * pins `maxRecordsPerFile = 0` so a session-level file-splitting
    * knob cannot shear a shard into several files behind the
    * contract's back). Overwrite mode, pinned STATIC: re-running the
    * same (corpus, seed, numShards) rewrites the identical bytes, and
    * a re-run with FEWER shards must clear the old layout entirely — a
    * session-level dynamic overwrite would leave the old permutation's
    * extra `shard=` dirs in place and a trainer would replay a mix of
    * two permutations.
    */
  def writeShuffled(df: DataFrame, key: Column, numShards: Int,
                    dir: String, seed: String = "graft"): Unit =
    shuffleShards(df, key, numShards, seed)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .option("maxRecordsPerFile", 0)
      .partitionBy("shard").parquet(dir)
}
