package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards for the headline queries: the properties
  * that make them viable at 100 TB are asserted on the physical plan, so
  * a refactor that silently trades them away (a lost pushdown, a
  * broadcast turned shuffle, a top-k turned global sort) fails CI, not
  * the cluster. Complements PLANS.md (the human-reviewed snapshots).
  */
class PlanGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("pack_global's cumsum window is bucket-partitioned, never global") {
    // The operator exists to avoid the one-task global window: its
    // single Window node must be partitioned by the quantile bucket id
    // (a partition-less windowspecdefinition is the failure mode that
    // funnels the corpus through one task).
    val df = SparkEntry.queries("pack_global")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val specs = "windowspecdefinition\\(([^,)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("__pid")),
      s"window partition specs: $specs\n$p")
  }

  test("simhash_pairs runs the fingerprint aggregate once (reused exchange)") {
    // The band self-join's two sides must share the one explode + vote
    // aggregate via exchange reuse — the minhash joins' contract,
    // asserted on the final adaptive plan.
    val df = SparkEntry.queries("simhash_pairs")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"), p)
    assert("Generate explode".r.findAllIn(p).length <= 2, p)
  }

  test("simhash_pairs_r7 runs the fingerprint aggregate once (checkpointed frame)") {
    // The MIH sides join on DIFFERENT keys (plain vs bit-flipped), so
    // exchange reuse can't deduplicate the fingerprint pipeline the way
    // it does for the banded form — the (doc_id, simhash) frame is
    // checkpointed instead, and both sides must scan it: the final
    // adaptive plan reads the checkpoint (ExistingRDD) on both sides
    // and never re-runs the token explode + 64 bit-vote aggregate
    // (that ran once, in the checkpoint job) — the surviving Generates
    // are the cheap 4-element band-struct explodes + the 17-flip
    // expansion, all over 16-byte rows.
    val df = SparkEntry.queries("simhash_pairs_r7")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Scan ExistingRDD".r.findAllIn(p).length == 2, p)
    assert("Scan parquet".r.findAllIn(p).isEmpty, p)
    assert(!p.contains("split(trim"), p)
  }

  test("dsir_weights shares one candidate feature pass (checkpointed)") {
    // The histogram and the scoring join both consume the candidate
    // corpus' uni+bi feature stream; a shared localCheckpoint makes
    // that ONE evaluation (and the target histogram is its own eager
    // checkpoint), so the final adaptive plan reads only checkpoint
    // blocks — zero parquet scans, zero token explodes.
    val df = SparkEntry.queries("dsir_weights")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ExistingRDD"), p)
    assert("Scan parquet".r.findAllIn(p).isEmpty, p)
    assert("Generate explode".r.findAllIn(p).isEmpty, p)
  }

  test("corpus_prep's final plan reads the corpus only through checkpoints") {
    // Stage-1 (quality + blocklist + digest) is ONE fused corpus scan
    // checkpointed once; the shingle pass is the other checkpoint. The
    // final report plan must therefore read corpus text from NO parquet
    // scan at all — the only documents FileScan allowed is the eval
    // slice feeding the contamination screen (doc_id < 50).
    val df = SparkEntry.queries("corpus_prep")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Scan ExistingRDD"), p)
    val docScans = "FileScan parquet".r.findAllIn(p).length
    assert(docScans <= 1, s"$docScans parquet scans:\n$p")
    if (docScans == 1) assert(p.contains("LessThan(doc_id,50)"), p)
  }

  test("corpus_prep_v3's span stage rides the positional checkpoint — corpus never re-scanned") {
    // The span veto (r16) consumes the SAME shared shingle checkpoint
    // as the near-dup/containment/contamination/repetition consumers
    // (pos kept when the screen is on): the per-doc verdict plan must
    // read corpus text through checkpoints only — no corpus-side
    // (doc_id >= 50) parquet scan may survive. The eval slice
    // (doc_id < 50) and the embeddings table are the only allowed
    // scans: both metadata-sized relative to the corpus by contract.
    val df = SparkEntry.queries("corpus_prep_v3")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("GreaterThanOrEqual(doc_id,50)"), p)
  }

  test("curation_screen_v2 reads batch text once (checkpointed); standing state at rest") {
    // The incremental composite's eight screens all consume ONE
    // checkpointed (doc_id, text) frame: no documents FileScan of the
    // batch (the doc_id >= 450 filter) survives into the final plan —
    // on a backfill-shaped batch that is the difference between one
    // corpus scan and one per screen. The standing corpus appears only
    // as at-rest index tables, and the eval suite only as its postings
    // index (the doc_id < 50 slice is never re-read at screen time).
    val df = SparkEntry.queries("curation_screen_v2")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("GreaterThanOrEqual(doc_id,450)"), p)
    assert(!p.contains("LessThan(doc_id,450)"), p)
    assert(!p.contains("LessThan(doc_id,50)"), p)
  }

  test("contamination_indexed broadcasts the eval postings; eval text never re-read") {
    // Polarity flip vs the corpus-index screens: the eval-gram index is
    // the SMALL side, so it broadcasts into the batch's gram stream —
    // no batch-sized shuffle for the probe join, and the eval suite
    // itself (doc_id < 50) appears only as its at-rest postings.
    val df = SparkEntry.queries("contamination_indexed")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("graft-contam1-"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("LessThan(doc_id,50)"), p)
  }

  test("redecontaminate_delta broadcasts one postings read; eval suites never re-read") {
    // Both screen states (base df, full df) derive from ONE read of the
    // at-rest postings — the eval suites (doc_id < 30 and 30–49) appear
    // only as the index, and the df-flagged postings broadcast into the
    // batch gram stream exactly like the steady-state screen.
    val df = SparkEntry.queries("redecontaminate_delta")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("graft-contamdelta1-"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("LessThan(doc_id,50)"), p)
    assert(!p.contains("LessThan(doc_id,30)"), p)
    val gramScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("graft-contamdelta1-"))
    assert(gramScans <= 1, s"postings scanned $gramScans times:\n$p")
  }

  test("redecontaminate_spans_delta: one postings read, one corpus tokenize, eval suites never re-read") {
    // The span-rule delta (r16): per-gram full/base states from ONE
    // postings read broadcast into the positional gram stream, which is
    // checkpointed so the TWO per-state island windows share one corpus
    // tokenize pass — the final plan reads the matched hits from
    // ExistingRDD, scans the at-rest postings at most once, and never
    // re-reads the eval suites as text.
    val df = SparkEntry.queries("redecontaminate_spans_delta")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("LessThan(doc_id,50)"), p)
    assert(!p.contains("LessThan(doc_id,30)"), p)
    val gramScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("graft-contamsdelta1-"))
    assert(gramScans <= 1, s"postings scanned $gramScans times:\n$p")
    // no corpus-side parquet scan either: the hit stream's checkpoint
    // carried the one real read
    assert(!p.contains("GreaterThanOrEqual(doc_id,450)"), p)
  }

  test("containment_pairs runs the winnow pipeline once per side (reused exchange)") {
    // The inverted self-join's two sides are byte-identical capped
    // fingerprint subtrees lined up by the merge pin — the final
    // adaptive plan must reuse the exchange instead of running the
    // shingle → groupByKey → winnow pipeline twice; and the per-doc
    // size must ride the rows (no separate sizes aggregate joins —
    // exactly one SMJ, the band join, in the whole plan).
    val df = SparkEntry.queries("containment_pairs")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"), p)
    assert("MapGroups".r.findAllIn(p).length <= 1, p)
    assert("SortMergeJoin".r.findAllIn(p).length <= 1, p)
  }

  test("top_events is a TakeOrderedAndProject, not a global sort") {
    val p = plan("top_events")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q3_topk ends in a TakeOrderedAndProject") {
    assert(plan("q3_topk").contains("TakeOrderedAndProject"))
  }

  test("region_customers broadcasts its dimensions") {
    val p = plan("region_customers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("trip_stats pushes its ts bounds into the scan on either encoding") {
    // ns-encoded events push rule-derived int64 bounds; µs-encoded events
    // push native timestamp bounds — both satisfy this shape, and a scan
    // with NO pushed ts bound (reading the whole table at 100 TB) fails.
    val p = plan("trip_stats")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"), p)
    // On µs data the redundant ns-preimage conjunct must be GONE (it
    // prunes nothing there and costs one evaluated expression per
    // scanned row); on ns data it IS the pushdown and must stay.
    val nsEncoded = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    if (!nsEncoded) assert(!p.contains("unix_micros"), p)
  }

  test("string_funcs pushes the LIKE prefix into the scan") {
    assert(plan("string_funcs").contains("StringStartsWith(p_type,S)"))
  }

  test("q1_agg scan reads only the referenced columns") {
    // Formatted mode prints the untruncated ReadSchema.
    val p = SparkEntry.queries("q1_agg")(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.isDefined, p)
    // 7 referenced lineitem columns of 11 — pruning must hold.
    val cols = read.get.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate"), cols)
  }

  test("valid_filter pushes its conjuncts to the scan") {
    val p = plan("valid_filter")
    assert(p.contains("GreaterThan(value,0.0)"), p)
  }

  test("tolerance_pairs never plans a cartesian or nested-loop join") {
    val p = plan("tolerance_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("range_join_counts joins on the manufactured bucket key") {
    val p = plan("range_join_counts")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("asof_join never plans a cartesian or nested-loop join") {
    val p = plan("asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("ann_topk_indexed prunes the index scan to the probed cells") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val df = SparkEntry.queries("ann_topk_indexed")(spark, dir)
    // The scan must carry a STATIC partition filter on the cell key —
    // pruning decided at plan time, not a post-scan filter.
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined, p)
    // The files actually read all come from the probed cells' directories
    // (≤ nprobe of the 16 cell partitions).
    val idx = graft.ext.Similarity.ivfIndexPathFor(dir)
    val (qVec, qNorm) = graft.ext.Similarity.lookupVec(spark, idx, 0L)
    // The probe set derives from the index's STORED (trained) quantizer.
    val storedCs = graft.ext.Similarity.loadCentroidsMeta(spark, idx)._1
    val probed = graft.ext.Similarity.probeCells(qVec, storedCs).toSet
    val scannedCells = spark.read.parquet(idx)
      .filter(col("cell").isin(probed.toSeq: _*))
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0))
      .flatMap(f => "cell=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      .toSet
    assert(scannedCells.nonEmpty && scannedCells.subsetOf(probed),
      s"scanned $scannedCells, probed $probed")
    // Pruned scan and a full-scan IVF under the SAME stored quantizer
    // agree row-for-row (ann_topk_ivf's seeded quantizer probes
    // different cells, so the comparator is annTopKIvfWith).
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(df.collect().toSeq ==
      graft.ext.Similarity.annTopKIvfWith(emb, queryId = 0L, k = 10,
        storedCs).collect().toSeq)
  }

  test("ngram_jaccard_pairs runs the shingle pass once (reused exchange)") {
    // The one-pass guarantee is a RUNTIME property: AQE reuses the
    // (band, band_hash) exchange across the self-join's sides, so the
    // corpus scan + shingle flatMap + sketch/set aggregation execute
    // exactly once. Assert on the final adaptive plan, not the initial.
    val df = SparkEntry.queries("ngram_jaccard_pairs")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
    assert("MapPartitions".r.findAllIn(finalPlan).length == 1, finalPlan)
  }

  test("cross_span_scrub runs the gram pass once (reused exchange, broadcast survivors)") {
    // Both consumers of the per-(gram, doc) frame — the skew-free df
    // aggregate and the survivor probe — must share one (h, doc)
    // exchange at runtime, so the gram explode executes exactly once;
    // the df ≥ minDf survivor set must come back as a broadcast, never
    // a shuffled join of the gram volume.
    val df = SparkEntry.queries("cross_span_scrub")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
    assert("Generate explode".r.findAllIn(finalPlan).length == 1, finalPlan)
  }

  test("line_dedup runs the line explode once (reused exchange, mergeable winner agg)") {
    // Both consumers of the (h, doc_id) line aggregate — the per-hash
    // winner aggregate and the removal probe join — must share ONE
    // exchange at runtime, so the posexplode executes exactly once; and
    // the winner must be a partial-aggregated min/sum (skew-safe: a
    // boilerplate line in a billion docs pre-combines per map task),
    // never a `min OVER (PARTITION BY h)` window, which would funnel a
    // hot line's every occurrence through one task.
    val df = SparkEntry.queries("line_dedup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"), p)
    assert("Generate posexplode".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min"), p)
  }

  test("line_dedup_indexed streams the index through broadcast joins (batch-side exchanges only)") {
    // The standing-corpus hash index is the BIG side: it must flow
    // through broadcast semi/outer joins (batch hashes broadcast into
    // it, the held set broadcast back), never into a hash exchange of
    // its own; the batch's (h, doc_id) aggregate stays the one
    // reuse-shared exchange (winner + removal probe), the posexplode
    // runs once, and no window appears anywhere.
    val df = SparkEntry.queries("line_dedup_indexed")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"), p)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("Generate posexplode".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Window"), p)
  }

  test("shuffle_shards plans one hash exchange and a per-shard sort, never a global sort") {
    // The operator's reason to exist: a deterministic training-order
    // permutation WITHOUT a global ORDER BY of the corpus. Exactly one
    // hashpartitioning exchange (on shard) plus the presentation
    // range-partition; the row_number window must be shard-partitioned.
    val p = plan("shuffle_shards")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"$hashEx hash exchanges:\n$p")
    val specs = "windowspecdefinition\\(([^,)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("shard")),
      s"window partition specs: $specs\n$p")
  }

  test("gopher batteries are scan-bound: zero hash exchanges, one scan each") {
    // All three Gopher screens (line repetition, n-gram battery, doc
    // quality) exist as per-doc projections — their 100-TB viability IS
    // the absence of any aggregation exchange. Only the verify
    // surface's presentation sort (range partition) may shuffle, and
    // the corpus must be read exactly once.
    for (q <- Seq("line_repetition", "gopher_ngrams", "gopher_quality")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q plans a hash exchange:\n$p")
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans == 1, s"$q reads the corpus $scans times:\n$p")
    }
  }

  test("temperature_mixture aggregates the corpus once (reused exchange, parallel max)") {
    // Both consumers of the strata-counts frame — the 1-row global max
    // and the weights projection — must share one corpus exchange at
    // runtime (no second scan+shuffle), and the max must be a parallel
    // aggregate, never a single-task global window over the strata.
    val df = SparkEntry.queries("temperature_mixture")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
    assert(!finalPlan.contains("Window"), finalPlan)
  }

  test("sessionize_batch plans exactly one pre-output exchange") {
    val p = plan("sessionize_batch")
    // One Exchange for the key windows + aggregate, one for the final
    // presentation ORDER BY — any more means a lost partitioning reuse.
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r
      .findAllIn(p).length
    assert(exchanges == 2, s"$exchanges exchanges:\n$p")
  }

  test("set_ops_users folds both memberships in one aggregate (single hash exchange)") {
    // The INTERSECT/EXCEPT semantics computed as one groupBy(user_id):
    // exactly one hash exchange (the aggregate) plus the presentation
    // ORDER BY's range exchange — the four-distinct + two-set-op
    // formulation this replaced planned five.
    val p = plan("set_ops_users")
    val hash = "Exchange hashpartitioning".r.findAllIn(p).length
    val range = "Exchange rangepartitioning".r.findAllIn(p).length
    assert(hash == 1 && range == 1, s"$hash hash + $range range exchanges:\n$p")
  }

  test("minhash_pairs join-back runs the sketch pipeline once (reused exchanges)") {
    // The static plan shows the scan+shingle+sketch subtree four times
    // (two band-join sides, two signature join-backs); at runtime AQE
    // must collapse them onto one executed MapPartitions via exchange
    // reuse — the property the 2M-doc drill timings depend on.
    val df = SparkEntry.queries("minhash_pairs")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("MapPartitions".r.findAllIn(finalPlan).length == 1, finalPlan)
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
  }

  test("minhash_novel scans corpus text once; indexed form never touches it") {
    // The corpus side is the 100-TB cost: its shingle aggregate's
    // exchange must be reused by the merge-pinned verify join-back, so
    // corpus text is scanned exactly once. (The batch side may plan a
    // second batch-sized scan — an optimizer-cloning artifact that is
    // cheap by construction and deliberately not pinned.)
    val df = SparkEntry.queries("minhash_novel")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"), p)
    assert("LessThan\\(doc_id,450\\)".r.findAllIn(p).length == 1, p)
    // The indexed screen reads bands + sets AT REST: no corpus text
    // scan anywhere in the plan — the property the persisted index
    // exists for.
    val dfi = SparkEntry.queries("minhash_novel_indexed")(spark, dir)
    dfi.collect()
    val pi = dfi.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!pi.contains("LessThan(doc_id,450)"), pi)
    assert(pi.contains("graft-minhash1-"), pi)
  }

  test("contamination_neardup_indexed broadcasts the eval index; eval text never re-read") {
    // The decontamination polarity's plan contract (broadcastIndex):
    // the eval suite appears ONLY as its at-rest MinHash index — no
    // eval-document scan (the doc_id<50 filter) anywhere — and BOTH
    // index tables (bands and sets) enter through BroadcastExchanges,
    // so the corpus-scale batch is never shuffled against them: its
    // only exchange is its own shingle aggregate, reused by the
    // merge-pinned verify join-back.
    val df = SparkEntry.queries("contamination_neardup_indexed")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("LessThan(doc_id,50)"), p)
    assert(p.contains("graft-minhash-eval1-"), p)
    val bcasts = "BroadcastExchange".r.findAllIn(p).length
    assert(bcasts >= 2, s"expected both index tables broadcast\n$p")
    // ONE batch tokenize: the shingle aggregate's two consumers (band
    // rows; the verify join-back) read the checkpointed set frame —
    // exactly one text-reading documents scan survives in the final
    // plan (exchange reuse does NOT dedupe the aggregates here, the
    // checkpoint is the contract; the doc_id-only scans of the outer
    // join are pruned-column cheap and not pinned).
    val textScans = "ReadSchema: struct<doc_id:bigint,text:string>".r
      .findAllIn(p).length
    assert(textScans <= 1, s"batch text scanned $textScans times\n$p")
  }

  test("contamination_neardup (scan form) broadcasts the eval side; corpus bands never merge-shuffle") {
    // The r18 broadcastCorpus plan — the scan-form twin of the indexed
    // query's broadcastIndex contract: the benchmark-sized eval side's
    // capped band table AND shingle sets enter through broadcasts, so
    // the corpus-scale side's band rows are never shuffled against
    // them (the r17-verdict near-miss exchange); its only exchanges
    // are its own shingle aggregate (reused by the merge-pinned verify
    // join-back) and the candidate-sized distinct.
    val df = SparkEntry.queries("contamination_neardup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("BroadcastHashJoin \\[[^\\]]*band_hash".r.findFirstIn(p).isDefined,
      s"band join not broadcast:\n$p")
    assert("SortMergeJoin \\[[^\\]]*band_hash".r.findFirstIn(p).isEmpty,
      s"band rows merge-shuffled against the eval side:\n$p")
    // ONE corpus-side text scan: the (doc_id, shset) checkpoint feeds
    // both the band rows and the verify join-back (the broadcastIndex
    // double-tokenize defect's fix, mirrored in the scan form).
    val corpusTextScans = p.linesIterator.count(l =>
      l.contains("GreaterThanOrEqual(doc_id,50)") &&
        l.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    assert(corpusTextScans <= 1,
      s"corpus text scanned $corpusTextScans times:\n$p")
  }

  test("corpus_prep_v4's fuzzy veto rides the shared checkpoint; eval bands broadcast") {
    // corpus_prep_v3's one-corpus-pass pin extended to the fuzzy veto
    // (r18): the per-doc verdict plan reads corpus text from NO parquet
    // scan (six shingle consumers, one checkpointed pass), and the
    // veto's band join broadcasts the benchmark-sized eval side — the
    // composite gains a screen without gaining a corpus-sized exchange.
    val df = SparkEntry.queries("corpus_prep_v4")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("GreaterThanOrEqual(doc_id,50)"), p)
    assert("BroadcastHashJoin \\[[^\\]]*band_hash".r.findFirstIn(p).isDefined,
      s"fuzzy veto's band join not broadcast:\n$p")
  }

  test("corpus_prep_v5's gopher gate adds no corpus scan and no new exchange class") {
    // The eleventh screen is row-local by construction: v5's plan must
    // keep v4's shape exactly — corpus text still read from NO parquet
    // scan (the battery fuses into the stage-1 checkpointed
    // projection), the fuzzy veto's band join still broadcast.
    val df = SparkEntry.queries("corpus_prep_v5")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("GreaterThanOrEqual(doc_id,50)"), p)
    assert("BroadcastHashJoin \\[[^\\]]*band_hash".r.findFirstIn(p).isDefined,
      s"fuzzy veto's band join not broadcast:\n$p")
  }

  test("simhash_novel screens read fingerprints at rest, never corpus text") {
    // The property the persisted index exists for: the standing corpus
    // appears ONLY as the 16-byte-row fps parquet — no corpus-side
    // document scan (the doc_id<450 filter), at either radius or join
    // plan. The batch side scans documents once (its own fingerprint
    // aggregate — batch-sized by contract).
    for (name <- Seq("simhash_novel", "simhash_novel_r5")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("graft-simhash1-"), s"$name:\n$p")
      assert(!p.contains("LessThan(doc_id,450)"), s"$name:\n$p")
      assert("GreaterThanOrEqual\\(doc_id,450\\)".r.findAllIn(p).length <= 2,
        s"$name:\n$p")
    }
    // The broadcast (per-trigger) plan additionally prunes the at-rest
    // scan to the probed buckets BEFORE the hot-bucket cap's window —
    // a LeftSemi against the batch's distinct band keys — so the cap
    // never costs a corpus-wide exchange.
    val r5 = SparkEntry.queries("simhash_novel_r5")(spark, dir)
    r5.collect()
    val p5 = r5.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p5.contains("LeftSemi"), p5)
    // Same at-rest property for the containment screen's merge plan.
    val cn = SparkEntry.queries("containment_novel")(spark, dir)
    cn.collect()
    val pc = cn.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(pc.contains("graft-contain2-"), pc)
    assert(!pc.contains("LessThan(doc_id,450)"), pc)
  }

  test("boilerplate_grams joins survivor text back via broadcast") {
    // Gram STRINGS must never enter a wide shuffle: the df-thresholded
    // hash list broadcasts and the string stream filters against it.
    // minDf low enough that survivors exist at sf0.001 (the query's
    // production threshold empties here and AQE collapses the plan).
    val df = graft.ext.TextAnalysis.frequentNgrams(
      graft.sources.Tables.load(spark, dir, "documents"), n = 2, minDf = 2)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
    assert(!finalPlan.contains("SortMergeJoin"), finalPlan)
  }

  test("unigram_logprob runs the word pass once (reused exchange)") {
    val df = SparkEntry.queries("unigram_logprob")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
  }

  test("item_pairs never joins the fact table against itself") {
    // The pair space is generated per basket row by array lambdas; the
    // ONLY join allowed is the broadcast SEMI prune of the fact stream.
    // A SortMerge/ShuffledHash join appearing here means the operator
    // regressed to the self-join form (two extra fact shuffles), and a
    // non-semi broadcast means the planner got to broadcast a fact-sized
    // side — the shape that dies at 100 TB.
    val p = plan("item_pairs")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("fuzzy_match co-partitions the self-join on the block key") {
    // The default ER plan must be a sort-merge join keyed on blk: no
    // side broadcasts (the old form shipped the WHOLE entity table to
    // every executor — dead past the broadcast limit), and the shuffles
    // are pinned to an explicit count (REPARTITION_BY_NUM) so AQE can't
    // coalesce the tiny entity shuffle onto one task and serialize the
    // O(Σ|block|²) verify stage (measured 28 s → 1.7 s at sf0.1).
    val p = plan("fuzzy_match")
    assert(p.contains("REPARTITION_BY_NUM"), p)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("gap_fill_daily joins aggregates, never raw facts") {
    // Both join inputs must already be aggregated (the fact table is
    // reduced to |keys|·|days| rows before any join), and the join
    // itself broadcast — the grid is calendar-sized.
    val p = plan("gap_fill_daily")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("outlier_zscore broadcasts the group moments back into the scan") {
    val p = plan("outlier_zscore")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("mixture_sample and chunk_tokens stay scan-shaped") {
    // Pure per-row expansion: the only exchange either plans is the
    // final presentation ORDER BY — a join or aggregate appearing here
    // means the operator stopped being scan-bound.
    for (name <- Seq("mixture_sample", "chunk_tokens")) {
      val p = plan(name)
      val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r
        .findAllIn(p).length
      assert(exchanges == 1, s"$name: $exchanges exchanges:\n$p")
      assert(!p.contains("Join"), s"$name:\n$p")
    }
  }

  test("regression_stats is one hash aggregate — no join, no window") {
    // The five power sums must ride the same partial+final aggregate;
    // a second scan or a join means the closed-form algebra broke.
    val p = plan("regression_stats")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    val aggExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(aggExchanges == 1, s"$aggExchanges agg exchanges:\n$p")
  }

  test("rolling_stats plans exactly one window over one shuffle") {
    val p = plan("rolling_stats")
    assert("Window ".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("bigram_logprob shuffles hashes, never strings") {
    // Every exchange row type must be (id/pos/hash/count) longs — the
    // token/bigram TEXT never leaves the flatMap that hashed it.
    val p = SparkEntry.queries("bigram_logprob")(spark, dir).queryExecution
      .executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
    exchanges.foreach { line =>
      assert(!line.contains("string"), s"string column in shuffle: $line\n$p")
    }
  }

  test("hll_vocab_rollup computes per-lang and ALL rows in one token pass") {
    // ROLLUP(lang) must produce both grouping levels from a single
    // aggregate tree: exactly one token explode (one corpus scan — the
    // Expand doubles rows in-flight, not scans) feeding the combined
    // exact-distinct + sketch aggregate. A second explode would mean
    // the exact twin re-scanned the corpus.
    val df = SparkEntry.queries("hll_vocab_rollup")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(finalPlan.contains("Expand"), finalPlan)
    assert("Generate explode".r.findAllIn(finalPlan).length == 1, finalPlan)
  }

  test("bm25_indexed prunes the postings scan to the query terms' buckets") {
    val df = SparkEntry.queries("bm25_indexed")(spark, dir)
    // Static partition filter on the bucket key — pruning decided at
    // plan time, so only the query terms' buckets' files are read.
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined, p)
    // Identical scoring tree over the postings ⇒ row-for-row equality
    // with the corpus-scan form (they also share one oracle).
    assert(df.collect().toSeq ==
      SparkEntry.queries("bm25_topk")(spark, dir).collect().toSeq)
  }

  test("ewma_smooth is one window over one shuffle — no join, no agg") {
    val p = plan("ewma_smooth")
    assert("Window".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("quality_classifier stays scan-shaped: one aggregate, no join") {
    val p = plan("quality_classifier")
    assert(!p.contains("Join"), p)
    // explode → partial agg → exchange → final agg, nothing else
    assert("Exchange".r.findAllIn(p).length <= 2, p)
  }

  test("negative_samples broadcasts the pool and takes top-k map-side") {
    val p = plan("negative_samples")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // WindowGroupLimit Partial BEFORE the exchange: each partition
    // ships only its own k candidates per anchor, not the full
    // |anchors|×|pool| pair frame.
    assert(p.contains("WindowGroupLimit"), p)
    assert("WindowGroupLimit [^\n]*Partial".r.findFirstIn(p).isDefined, p)
  }

  test("source_caps plans a partial WindowGroupLimit (hot-domain skew armor)") {
    // The rank <= cap filter must push a Partial WindowGroupLimit below
    // the source exchange: each map task ships at most `cap` candidates
    // per source, so a billion-doc hot domain costs the shuffle `cap`
    // rows, not a billion.
    val p = plan("source_caps")
    assert(p.contains("WindowGroupLimit"), p)
    assert("WindowGroupLimit [^\n]*Partial".r.findFirstIn(p).isDefined, p)
  }

  test("dq_audit fuses all same-table predicate checks into one scan each") {
    // 12 checks over 4 tables plan exactly 9 scans: one fused
    // conditional aggregate per checkTable group (3), one key-only scan
    // per uniqueness check (2), and one child + one parent scan per FK
    // edge (2×2) — the per-check naive form would be 12+.
    val p = plan("dq_audit")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 9, s"expected fused scans, got $scans:\n$p")
  }
}
