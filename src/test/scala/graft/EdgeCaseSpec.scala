package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Contamination, CorpusPrep, Dedup, Relations, Sampling, TextAnalysis, Vocab}
import graft.operators.Temporal

/** Empty/degenerate-input behavior: every operator must return an empty
  * (or correctly null-extended) result rather than throwing — at 100 TB
  * a filter upstream routinely leaves a partition, a day, or an entire
  * side empty.
  */
class EdgeCaseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val someDocs = Seq((1L, "one two three four five six seven"))
    .toDF("doc_id", "text")

  test("dedup family on an empty corpus") {
    assert(Dedup.minhashNearDupPairs(emptyDocs).isEmpty)
    assert(Dedup.nearDupClusters(emptyDocs).isEmpty)
    assert(Dedup.winnowedFingerprints(emptyDocs).isEmpty)
    assert(Dedup.simhash(emptyDocs).isEmpty)
    val stats = Dedup.exactStats(emptyDocs).head()
    assert(stats.getAs[Long]("total_docs") == 0)
  }

  test("round-12 operators on empty/degenerate inputs") {
    // containment: empty corpus, and a corpus with no shareable
    // fingerprints (single doc) both yield empty — never throw
    assert(Dedup.containmentPairs(emptyDocs).isEmpty)
    assert(Dedup.containmentPairs(someDocs).isEmpty)
    // simhash MIH path on empty/single-doc corpora
    assert(Dedup.simhashNearDupPairs(emptyDocs, maxHamming = 7).isEmpty)
    assert(Dedup.simhashNearDupPairs(someDocs, maxHamming = 7).isEmpty)
    // DSIR: empty candidate side → empty. An empty TEXT is one empty
    // token under the shared tokenizer (split('') = [''] in BOTH
    // engines — the oracle's string_split_regex agrees), so a blank
    // doc scores finitely on its single unigram feature instead of
    // vanishing or throwing.
    assert(TextAnalysis.dsirWeights(someDocs, emptyDocs).isEmpty)
    // A feature-less TARGET would make every log-ratio silently null —
    // the operator fails loudly instead (build path too).
    intercept[IllegalArgumentException] {
      TextAnalysis.dsirWeights(emptyDocs, someDocs)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.buildDsirIndex(emptyDocs,
        java.nio.file.Files.createTempDirectory("dsir_empty").toString)
    }
    val blank = Seq((5L, "")).toDF("doc_id", "text")
    val blankRow = TextAnalysis.dsirWeights(someDocs, blank).head()
    assert(blankRow.getLong(1) == 1L &&
      !blankRow.getDouble(3).isNaN && !blankRow.getDouble(3).isInfinite)
    // semantic outliers: an empty embedding corpus flags nothing, and
    // a degenerate all-identical corpus (σ = 0) flags nothing
    val emptyEmb = Seq.empty[(Long, Int, Seq[Float])]
      .toDF("vec_id", "label", "embedding")
    assert(graft.ext.Similarity.semanticOutliers(emptyEmb, k = 2,
      iters = 1, dim = 4).isEmpty)
    val same = (0L until 10L).map(i => (i, 0, Seq(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "label", "embedding")
    assert(graft.ext.Similarity.semanticOutliers(same, k = 2,
      iters = 1, dim = 4).isEmpty)
  }

  test("blocklist gate on blank docs: zero tokens, zero frac, keep") {
    // split('') = [''] — without the zero-length filter a blank doc
    // would report a phantom token (n_tokens = 1). Pinned: blank and
    // whitespace-only docs are n_tokens = 0 with an explicit 0.0
    // fraction (no 0/0 null) and keep = true.
    val docs = Seq((1L, ""), (2L, "   "), (3L, "clean text here"),
      (4L, "dup dup clean")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistGate(docs, Seq("dup"), maxFraction = 0.5)
      .collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(byId(1L) == ((0L, 0L, 0.0, true)))
    assert(byId(2L) == ((0L, 0L, 0.0, true)))
    assert(byId(3L) == ((3L, 0L, 0.0, true)))
    assert(byId(4L) == ((3L, 2L, 0.6667, false)))
  }

  test("contamination with an empty side") {
    assert(Contamination.ngramOverlap(emptyDocs, someDocs).isEmpty)
    assert(Contamination.ngramOverlap(someDocs, emptyDocs).isEmpty)
    // Decontamination: an empty eval set flags nothing (the corpus
    // passes through whole); an empty train side yields nothing.
    assert(Contamination.decontaminate(someDocs, emptyDocs).count() == 1)
    assert(Contamination.decontaminate(emptyDocs, someDocs).isEmpty)
  }

  test("cross-doc scrub and BPE on empty/degenerate corpora") {
    assert(TextAnalysis.scrubCommonSpans(emptyDocs).isEmpty)
    // A single doc can never meet minDf ≥ 2 — text passes through.
    val one = TextAnalysis.scrubCommonSpans(someDocs, n = 3, minDf = 2)
      .head()
    assert(one.getString(1) == "one two three four five six seven" &&
      one.getLong(2) == 0L)
    // BPE on an empty corpus: no pairs, no merges — and no exception.
    assert(Vocab.learnBpeMerges(emptyDocs, 5).isEmpty)
    assert(Vocab.bpeTokenCounts(emptyDocs, Nil).isEmpty)
    // Single-character words have no adjacent pairs: still no merges.
    val chars = Seq((1L, "a b a b")).toDF("doc_id", "text")
    assert(Vocab.learnBpeMerges(chars, 5).isEmpty)
  }

  test("itemPairs drops pathological mega-baskets, observably") {
    // One 500-item bot basket above the clamp: it must contribute ZERO
    // pairs (500² structs would be row-local work inside one task at a
    // real bot-session size), the small baskets must be untouched, and
    // the drop must be visible in the item_pairs_clamp observed metric.
    val facts = ((1 to 500).map(i => (1L, f"item_$i%03d")) ++
      Seq((2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"))).toDF("b", "i")
    val out = Relations.itemPairs(facts, col("b"), col("i"),
      minSupport = 1L, topK = 1000, maxBasketSize = 10)
    val rows = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", "b", 2L)))
    val m = out.queryExecution.observedMetrics("item_pairs_clamp")
    assert(m.getAs[Long]("dropped_baskets") == 1L)
    assert(m.getAs[Int]("max_basket_size") == 500)
  }

  test("corpus prep with an empty eval set keeps clean docs") {
    val out = CorpusPrep.prepare(someDocs, emptyDocs).collect()
    assert(out.length == 1 && out.head.getAs[Boolean]("kept"))
  }

  test("repetition veto at threshold 0: sub-3-token docs carry no verdict and never flag") {
    // threshold 0.0 is the harshest setting — ANY duplicate gram flags —
    // yet a doc too short to have a gram must pass (no grams → no
    // verdict → coalesce(true)), in both composites.
    val docs = Seq((1L, "hi there"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val batch = CorpusPrep.prepare(docs, emptyDocs,
        repetitionMaxDupFrac = Some(0.0)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(batch(1L).getAs[Boolean]("repetition_ok") &&
      batch(1L).isNullAt(batch(1L).fieldIndex("dup_3gram_frac")))
    assert(batch(2L).getAs[Boolean]("repetition_ok") &&
      batch(2L).getAs[Double]("dup_3gram_frac") == 0.0)
    val idx = java.nio.file.Files
      .createTempDirectory("rep-edge").toString + "/mh"
    Dedup.buildMinhashIndex(someDocs, idx)
    val inc = CorpusPrep.screenIncremental(docs, idx,
        repetitionMaxDupFrac = Some(0.0)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(inc(1L).getAs[Boolean]("repetition_ok") &&
      inc(1L).isNullAt(inc(1L).fieldIndex("dup_3gram_frac")))
  }

  test("span veto on the batch path: sub-3-token docs and empty eval sets never flag") {
    val docs = Seq((1L, "hi there"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    // empty eval set → no rare grams → run 0 for everyone, span_ok
    val out = CorpusPrep.prepare(docs, emptyDocs,
        contamSpanMinRun = Some(8)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("span_ok") &&
      out(1L).getAs[Long]("contam_span_run") == 0L)
    assert(out(2L).getAs[Boolean]("span_ok") &&
      out(2L).getAs[Long]("contam_span_run") == 0L)
    // a 2-token doc that copies an eval doc VERBATIM still cannot carry
    // a 3-gram: no grams → run 0 → clean under the span rule even at
    // the harshest threshold (the doc-level screen's <3-token rule,
    // mirrored on the batch span path)
    val eval = Seq((9L, "hi there")).toDF("doc_id", "text")
    val out2 = CorpusPrep.prepare(docs, eval,
        contamSpanMinRun = Some(3)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out2(1L).getAs[Boolean]("span_ok") &&
      out2(1L).getAs[Long]("contam_span_run") == 0L, out2(1L).toString)
  }

  test("neardup veto on the batch path: sub-3-token docs and empty eval sets never flag") {
    val docs = Seq((1L, "hi there"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    // empty eval set → no eval shingle sets → no candidate pair can
    // form → neardup_ok for everyone
    val out = CorpusPrep.prepare(docs, emptyDocs,
        contamNeardupThreshold = Some(0.5)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("neardup_ok"))
    assert(out(2L).getAs[Boolean]("neardup_ok"))
    // a 2-token doc that copies an eval doc VERBATIM carries no 3-gram
    // shingle: no set → no Jaccard → clean under the fuzzy rule even
    // at threshold 0 (the family's <shingle-size rule on its third
    // member)
    val eval = Seq((9L, "hi there")).toDF("doc_id", "text")
    val out2 = CorpusPrep.prepare(docs, eval,
        contamNeardupThreshold = Some(0.0)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out2(1L).getAs[Boolean]("neardup_ok"), out2(1L).toString)
  }

  test("neardup veto on the incremental path: sub-3-token docs and committed-empty eval index never flag") {
    val idxBase = java.nio.file.Files
      .createTempDirectory("nd-edge").toString
    val (mh, nd) = (s"$idxBase/mh", s"$idxBase/nd")
    // standing corpus index for the novelty stage (unrelated content)
    Dedup.buildMinhashIndex(
      Seq((100L, (1 to 30).map(i => s"corp$i").mkString(" ")))
        .toDF("doc_id", "text"), mh)
    val batch = Seq((1L, "hi there"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    // committed-EMPTY eval index (explicit empty-suite initialization):
    // the one legitimate all-clean state — nothing flags, typed columns
    Dedup.buildMinhashIndex(emptyDocs, nd)
    val out = CorpusPrep.screenIncremental(batch, mh,
        neardupEvalIndexPath = Some(nd)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("neardup_ok") &&
      out(1L).isNullAt(out(1L).fieldIndex("eval_jaccard")))
    assert(out(2L).getAs[Boolean]("neardup_ok"))
    // sub-shingle batch doc vs a NON-empty eval index holding its
    // verbatim copy: no 3-gram → no set → never flags
    Dedup.buildMinhashIndex(
      Seq((9L, "hi there")).toDF("doc_id", "text"), nd)
    val out2 = CorpusPrep.screenIncremental(batch, mh,
        neardupEvalIndexPath = Some(nd), neardupEvalThreshold = 0.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out2(1L).getAs[Boolean]("neardup_ok"), out2(1L).toString)
  }

  test("mmrTopK at a few hundred candidates: bounded greedy stays deterministic and well-formed") {
    // The scaladoc's driver-memory bound in action: nCand = 300 holds a
    // 300-row relevance list + ~90k-entry sim map on the driver — the
    // single-stage form's intended width ceiling region. Pin: valid
    // distinct picks, rank 1 = best relevance (no picks yet → pure
    // relevance), every later pick's mmr_score ≤ λ_rel·its relevance,
    // and the trajectory is run-to-run deterministic.
    import graft.ext.Similarity
    val dim = 8
    val emb = (0L until 400L).map { i =>
      (i, "c",
        Seq.tabulate(dim)(j => (math.sin(i * 13.7 + j * 2.1) +
          (if (j == 0) 2.0 else 0.0)).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val out = Similarity.mmrTopK(emb, queryId = 0L, k = 12, nCand = 300)
      .collect()
    assert(out.length == 12)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == 12)
    val byRank = out.sortBy(_.getAs[Int]("rank"))
    assert(byRank.head.getAs[Double]("mmr_score") ==
      math.rint(0.7 * byRank.head.getAs[Double]("relevance") * 1e4) / 1e4)
    byRank.tail.foreach { r =>
      assert(r.getAs[Double]("mmr_score") <=
        0.7 * r.getAs[Double]("relevance") + 1e-9, r.toString)
    }
    val again = Similarity.mmrTopK(emb, queryId = 0L, k = 12, nCand = 300)
      .collect().map(_.toSeq).toSeq
    assert(again == out.map(_.toSeq).toSeq)
  }

  test("as-of join with an empty right side null-extends every left row") {
    val left = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val right = Seq.empty[(Long, Long, Long, Double)]
      .toDF("rid", "k", "t", "v")
    val out = Temporal.asofJoinBackward(left, right, "k", "t", "t", "rid",
      Seq("v")).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("asof_rid")))
  }

  test("sessionize and tolerance join on empty inputs") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "tu", "id")
    assert(Temporal.sessionize(empty, "k", "tu", "id", 100L).isEmpty)
    val l = Seq.empty[Long].toDF("l_us")
    val r = Seq(1L).toDF("r_us")
    assert(Temporal.toleranceJoin(l, r, "l_us", "r_us", 10L).isEmpty)
  }

  test("sampling family on empty input") {
    assert(Sampling.stratifiedSample(emptyDocs, col("text"), col("doc_id"),
      0.5).isEmpty)
    assert(Sampling.datasetSplit(emptyDocs, col("doc_id")).isEmpty)
    assert(Sampling.packSequences(emptyDocs, col("doc_id"), lit(1),
      100).isEmpty)
    assert(Sampling.packSequencesSharded(emptyDocs, col("text"),
      col("doc_id"), lit(1), 100).isEmpty)
  }

  test("one-pass LSH verify and incremental dedup on empty/degenerate input") {
    assert(Dedup.lshVerifiedJaccardPairs(emptyDocs).isEmpty)
    // every new doc is novel when nothing has been seen
    assert(Dedup.dedupAgainstSeen(someDocs, emptyDocs).count() == 1)
    // nothing new → nothing out
    assert(Dedup.dedupAgainstSeen(emptyDocs, someDocs).isEmpty)
    // docs shorter than the shingle size produce no candidates, not a crash
    val tiny = Seq((1L, "ab"), (2L, "ab")).toDF("doc_id", "text")
    assert(Dedup.lshVerifiedJaccardPairs(tiny).isEmpty)
  }

  test("persisted IVF index: pruning to cells with no files is empty, not an error") {
    import graft.ext.Similarity
    val emb = Seq(
      (0L, 0, Array(1f, 0f, 0f, 0f)),
      (1L, 0, Array(0.9f, 0.1f, 0f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf-edge").toString
    Similarity.buildIvfIndex(emb, path, nlist = 4, dim = 4)
    // Both vectors land in one cell; a probe set of OTHER cells prunes
    // every file — the scan must come back empty, not fail.
    val stored = spark.read.parquet(path)
    val usedCells = stored.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    val unused = (0 until 4).filterNot(usedCells)
    assert(stored.filter(col("cell").isin(unused: _*)).isEmpty)
    // and the real query against the index still finds both neighbors
    val (qv, qn) = Similarity.lookupVec(spark, path, 0L)
    val top = Similarity.annTopKIndexed(spark, path, qv, qn, k = 2,
      nprobe = 4)
    assert(top.select("vec_id").as[Long].collect().toSet == Set(0L, 1L))
  }

  test("NaN embeddings degrade to cell 0 in both quantizers, not a crash") {
    import graft.ext.Similarity
    // A NaN element poisons every dot product: single-assignment picks
    // cell 0 (initialized best index); multi-assignment must agree at
    // element 0 and fill the rest deterministically instead of throwing
    // ArrayIndexOutOfBounds from an unset selection index.
    val cs = Seq(Seq(1f, 0f), Seq(0f, 1f), Seq(-1f, 0f))
    val rows = Seq(
      (0L, Array(Float.NaN, 0.5f)),
      (1L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Similarity.cellFor(col("embedding"), cs).as("cell"),
        Similarity.cellsFor(col("embedding"), cs, 2).as("cells"))
      .orderBy("vec_id").collect()
    val nanRow = rows(0)
    assert(nanRow.getInt(1) == 0)
    assert(nanRow.getSeq[Int](2) == Seq(0, 1)) // first untaken fallback
    // element 0 of cellsFor equals cellFor on every input, NaN included
    rows.foreach(r => assert(r.getSeq[Int](2).head == r.getInt(1)))
  }

  test("pre-built contamination shingles must declare a matching gram size") {
    val sh = Dedup.hashedShingles(someDocs, 3).select("doc_id", "h")
    intercept[IllegalArgumentException] {
      Contamination.ngramOverlap(someDocs, someDocs,
        trainShingles = Some(sh)) // gram size undeclared
    }
    intercept[IllegalArgumentException] {
      Contamination.ngramOverlap(someDocs, someDocs, n = 3,
        trainShingles = Some(sh), trainShinglesN = Some(4)) // mismatched
    }
    // declared and matching: same answer as the self-built stream
    val a = Contamination.ngramOverlap(someDocs, someDocs, minShared = 1)
      .collect().toSeq
    val b = Contamination.ngramOverlap(someDocs, someDocs, minShared = 1,
      trainShingles = Some(sh), trainShinglesN = Some(3)).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("round-16 operators on empty/degenerate inputs") {
    import graft.ext.{Retrieval, Similarity => Sim}
    // RRF: one list empty → pure single-list ranking, never a throw;
    // both empty → empty.
    val someList = Seq((1L, 5.0), (2L, 4.0)).toDF("doc_id", "score")
    val emptyList = Seq.empty[(Long, Double)].toDF("doc_id", "score")
    val oneSided = Retrieval.rrfFuse(someList, emptyList, k = 10)
      .collect()
    assert(oneSided.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(oneSided.forall(r => r.isNullAt(2))) // dense_rank all null
    assert(Retrieval.rrfFuse(emptyList, emptyList, k = 10).isEmpty)
    // Hybrid over a corpus where the query terms match NOTHING: the
    // dense list alone carries the fusion.
    val emb = Seq((0L, Seq(1f, 0f), 0), (1L, Seq(0.9f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val h = Retrieval.hybridTopK(someDocs, emb, Seq("zzznotaword"),
      queryVecId = 0L, k = 5).collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L))
    // MMR: k larger than the candidate pool returns the whole pool,
    // ranks 1..n; a single candidate is trivially 'selected'.
    val mmr = Sim.mmrTopK(emb, queryId = 0L, k = 10, nCand = 5).collect()
    assert(mmr.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L))
    assert(mmr.map(_.getAs[Int]("rank")).toSeq === Seq(1))
    // Token budget: empty corpus → empty plan; weights naming a source
    // absent from the data contribute nothing (inner join semantics).
    val emptySrc = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(Sampling.tokenBudgetPlan(emptySrc, Map("a" -> 1.0), 100L).isEmpty)
    val planned = Sampling.tokenBudgetPlan(
      Seq((1L, "w w", "a")).toDF("doc_id", "text", "source"),
      Map("a" -> 0.5, "ghost" -> 0.5), 100L).collect()
    assert(planned.map(_.getString(0)).toSeq === Seq("a"))
    // keep-best clustering on an empty corpus → empty, never a throw.
    assert(Dedup.nearDupClustersKeepBest(emptyDocs,
      TextAnalysis.tokenCount(col("text")).cast("long")).isEmpty)
    // Perplexity buckets: an empty candidate side → empty frame with
    // the right schema (reference still non-empty).
    val langDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "lang")
    val pb = TextAnalysis.perplexityBuckets(someDocs, langDocs)
    assert(pb.isEmpty && pb.columns.toSeq ===
      Seq("doc_id", "lang", "mean_logp", "bucket"))
  }
}
