package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Retrieval

/** Retrieval operators on hand-computed fixtures: BM25 against the
  * textbook formula, classifier determinism and thresholds, and KL
  * divergence's gold-standard identities (zero iff identical, positive
  * otherwise) — the DuckDB oracle then pins engine-vs-engine equality
  * at sf0.01.
  */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("source", lit("s"))

  test("bm25TopK matches the hand-computed textbook score") {
    // Corpus: 3 docs, query = ["cat"]. Only doc 1 and 2 contain it.
    val d = docs((1L, "cat dog"), (2L, "cat cat cat dog"), (3L, "fish"))
    val out = Retrieval.bm25TopK(d, Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap

    // N=3, df=2 → idf = ln(1 + 1.5/2.5); avgdl = (2+4+1)/3 = 7/3.
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double, dl: Double) = {
      val raw = idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (7.0 / 3.0))))
      math.rint(raw * 1e4) / 1e4
    }
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === s(1.0, 2.0))
    assert(out(2L) === s(3.0, 4.0))
    // Higher tf wins despite the longer doc at these parameters.
    assert(out(2L) > out(1L))
  }

  test("bm25TopK rare terms outrank common terms (idf ordering)") {
    // "rare" appears in 1 of 4 docs, "common" in all 4, once each, and
    // every doc has the same length — only idf differs.
    val d = docs(
      (1L, "rare common x"), (2L, "y common x"),
      (3L, "z common x"), (4L, "w common x"))
    val out = Retrieval.bm25TopK(d, Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // Doc 1 holds both terms → strictly top; the rest tie on doc_id order.
    assert(out.head._1 === 1L)
    assert(out.head._2 > out(1)._2)
    assert(out.tail.map(_._1).toSeq === Seq(2L, 3L, 4L))
  }

  test("linearQualityScore is deterministic and thresholds exactly") {
    val d = docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma"))
    val rows = Retrieval.linearQualityScore(d).collect()
    // Identical text → identical score and verdict.
    assert(rows(0).getDouble(2) === rows(1).getDouble(2))
    assert(rows(0).getString(3) === rows(1).getString(3))
    assert(Set("keep", "drop", "review").contains(rows(0).getString(3)))
    assert(rows(0).getLong(1) === 3L)
  }

  test("tokenWeight spans [-1, 1] and matches a reference md5 fold") {
    val d = Seq("alpha", "beta", "gamma", "delta").toDF("term")
    val w = d.select(Retrieval.tokenWeight(col("term")).as("w"))
      .collect().map(_.getDouble(0))
    assert(w.forall(x => x >= -1.0 && x <= 1.0))
    // Reference computation off-Spark for one token.
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (java.lang.Long.parseLong(md.take(6), 16) % 1001 - 500) / 500.0
    assert(w(0) === expect)
  }

  test("appendBm25Index equals a from-scratch rebuild") {
    // Index half the corpus, append the other half: postings, merged
    // stats, and the ranked answer must all be EXACTLY what a full
    // rebuild produces (idf/avgdl shift to the enlarged corpus), which
    // in turn equals the index-free scan ranker.
    val all = docs(
      (1L, "cat dog"), (2L, "cat cat cat dog"), (3L, "fish cat"),
      (4L, "dog fish"), (5L, "cat fish fish fish"))
    val incDir = java.nio.file.Files
      .createTempDirectory("bm25-inc").toString
    val fullDir = java.nio.file.Files
      .createTempDirectory("bm25-full").toString
    Retrieval.buildBm25Index(all.filter(col("doc_id") <= 2), incDir)
    Retrieval.appendBm25Index(all.filter(col("doc_id") > 2), incDir)
    Retrieval.buildBm25Index(all, fullDir)
    val q = Seq("cat", "fish")
    def rows(d: String) = Retrieval.bm25Indexed(spark, d, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val inc = rows(incDir)
    assert(inc === rows(fullDir))
    assert(inc === Retrieval.bm25TopK(all, q, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    // per-ingest mergeable stats rows sum to the rebuilt corpus stats
    def stats(d: String) = spark.read.parquet(s"$d/stats")
      .agg(sum("n"), sum("sdl").cast("decimal(28,6)")).head()
    assert(stats(incDir).getLong(0) === stats(fullDir).getLong(0))
    assert(stats(incDir).getDecimal(1) === stats(fullDir).getDecimal(1))
    // replay idempotence: re-appending the same batch under the SAME
    // ingest id dynamically overwrites its own partition — postings,
    // stats, and the ranked answer are all unchanged (the exactly-once
    // property the streaming twin relies on under foreachBatch replay)
    Retrieval.appendBm25Index(all.filter(col("doc_id") > 2), incDir,
      ingestId = 1L)
    Retrieval.appendBm25Index(all.filter(col("doc_id") > 2), incDir,
      ingestId = 1L)
    assert(rows(incDir) === inc)
    assert(stats(incDir).getLong(0) === stats(fullDir).getLong(0))
  }

  test("bm25Indexed: cached postings reads equal direct reads across an append") {
    val all = docs(
      (1L, "cat dog"), (2L, "cat cat cat dog"), (3L, "fish cat"),
      (4L, "dog fish"), (5L, "cat fish fish fish"))
    val dir = java.nio.file.Files
      .createTempDirectory("bm25-cache").toString
    Retrieval.buildBm25Index(all.filter(col("doc_id") <= 3), dir)
    val q = Seq("cat", "fish")
    def rows() = Retrieval.bm25Indexed(spark, dir, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val direct = rows()
    spark.conf.set("spark.graft.indexCache", "true")
    try {
      assert(rows() === direct) // cold fill
      assert(rows() === direct) // cache hit
      // an append lands a new ingest partition: the cached ranking must
      // see it, and equal the plain scan over the same state
      Retrieval.appendBm25Index(all.filter(col("doc_id") > 3), dir)
      val appended = rows()
      spark.conf.unset("spark.graft.indexCache")
      assert(appended === rows())
      assert(appended !== direct) // the append actually moved idf/avgdl
    } finally {
      spark.conf.unset("spark.graft.indexCache")
      graft.ext.IndexCache.clear()
    }
  }

  test("compactBm25Index: compacted == appended == rebuilt; folded replays no-op") {
    val all = docs(
      (1L, "cat dog"), (2L, "cat cat cat dog"), (3L, "fish cat"),
      (4L, "dog fish"), (5L, "cat fish fish fish"))
    val dir = java.nio.file.Files
      .createTempDirectory("bm25-compact").toString
    val fullDir = java.nio.file.Files
      .createTempDirectory("bm25-compact-full").toString
    Retrieval.buildBm25Index(all.filter(col("doc_id") <= 2), dir)
    Retrieval.appendBm25Index(all.filter(col("doc_id") === 3), dir,
      ingestId = 1L)
    Retrieval.appendBm25Index(all.filter(col("doc_id") > 3), dir,
      ingestId = 2L)
    val q = Seq("cat", "fish")
    def rows(d: String) = Retrieval.bm25Indexed(spark, d, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = rows(dir)
    assert(Retrieval.compactBm25Index(spark, dir))
    // every partition folded into the base, on BOTH sibling tables
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ids(sub: String) = graft.ext.IndexStamp.ingestIds(fs,
      new org.apache.hadoop.fs.Path(s"$dir/$sub"))
    assert(ids("postings") === Set(0L) && ids("stats") === Set(0L))
    // compacted == appended == rebuilt
    Retrieval.buildBm25Index(all, fullDir)
    assert(rows(dir) === before && rows(dir) === rows(fullDir))
    // a replay of a FOLDED ingest id is a no-op — its rows are already
    // in the base; re-landing the partition would double them (the
    // at-least-once stream's post-compaction crash replay)
    Retrieval.appendBm25Index(all.filter(col("doc_id") === 3), dir,
      ingestId = 1L)
    assert(ids("postings") === Set(0L) && rows(dir) === before)
    // a genuinely new auto-id append skips past folded ids (no reuse of
    // an id a live stream might still replay) and still lands
    Retrieval.appendBm25Index(docs((9L, "cat bird")), dir)
    assert(ids("postings") === Set(0L, 3L))
    val grown = java.nio.file.Files
      .createTempDirectory("bm25-compact-grown").toString
    Retrieval.buildBm25Index(all.unionByName(docs((9L, "cat bird"))), grown)
    assert(rows(dir) === rows(grown))
    // compact again; an already-compact index then no-ops
    assert(Retrieval.compactBm25Index(spark, dir))
    assert(rows(dir) === rows(grown))
    assert(!Retrieval.compactBm25Index(spark, dir))
  }

  test("compaction changes files, not corpus: a fresh source stamp survives") {
    val src = java.nio.file.Files
      .createTempDirectory("bm25-cstamp-src").toString + "/documents"
    val idx = java.nio.file.Files
      .createTempDirectory("bm25-cstamp").toString
    docs((1L, "cat"), (2L, "cat dog")).write.mode("overwrite").parquet(src)
    Retrieval.ensureBm25Index(spark, spark.read.parquet(src), idx,
      sourcePath = Some(src))
    assert(graft.ext.IndexStamp.read(spark, idx).isDefined)
    // single-ingest index → compact is a no-op and the stamp survives:
    // a following stamped ensure must NOT rebuild (fingerprint of the
    // postings listing is unchanged — same files, same mtimes)
    assert(!Retrieval.compactBm25Index(spark, idx))
    assert(graft.ext.IndexStamp.read(spark, idx).isDefined)
    val filesBefore = graft.ext.IndexStamp.fingerprint(spark, s"$idx/postings")
    Retrieval.ensureBm25Index(spark, spark.read.parquet(src), idx,
      sourcePath = Some(src))
    assert(graft.ext.IndexStamp.fingerprint(spark, s"$idx/postings")
      === filesBefore, "ensure after a no-op compact must not rebuild")
    // a multi-ingest index is already unstamped (the APPEND dropped it,
    // not the compaction) — compact keeps it absent, so the stamped
    // ensure afterwards rebuilds from source exactly as it would have
    // before the compact
    Retrieval.appendBm25Index(docs((3L, "cat bird")), idx, ingestId = 1L)
    assert(graft.ext.IndexStamp.read(spark, idx).isEmpty)
    assert(Retrieval.compactBm25Index(spark, idx))
    assert(graft.ext.IndexStamp.read(spark, idx).isEmpty)
    Retrieval.ensureBm25Index(spark, spark.read.parquet(src), idx,
      sourcePath = Some(src))
    // rebuilt from the 2-doc source: the appended doc 3 is gone
    assert(Retrieval.bm25Indexed(spark, idx, Seq("cat"), k = 10)
      .count() === 2)
  }

  test("ensureBm25Index rebuilds when the source data changes") {
    // A marker-only ensure serves stale postings after the source table
    // is regenerated in place; the source-stamped ensure detects the
    // new file listing and rebuilds.
    val src = java.nio.file.Files
      .createTempDirectory("bm25-src").toString + "/documents"
    val idx = java.nio.file.Files
      .createTempDirectory("bm25-stale").toString
    docs((1L, "cat")).write.mode("overwrite").parquet(src)
    Retrieval.ensureBm25Index(spark, spark.read.parquet(src), idx,
      sourcePath = Some(src))
    assert(Retrieval.bm25Indexed(spark, idx, Seq("cat"), k = 10).count() === 1)
    // regenerate the source at the same path with different content
    docs((1L, "cat"), (2L, "cat cat"), (3L, "dog")).write
      .mode("overwrite").parquet(src)
    // marker-only ensure: does NOT notice (documents the failure mode)
    Retrieval.ensureBm25Index(spark, spark.read.parquet(src), idx)
    assert(Retrieval.bm25Indexed(spark, idx, Seq("cat"), k = 10).count() === 1)
    // stamped ensure: rebuilds and serves the regenerated corpus
    Retrieval.ensureBm25Index(spark, spark.read.parquet(src), idx,
      sourcePath = Some(src))
    assert(Retrieval.bm25Indexed(spark, idx, Seq("cat"), k = 10).count() === 2)
  }

  test("a batch-only full rebuild clears a surviving source stamp") {
    // Crash scenario: a source-stamped index loses its postings marker
    // mid-rewrite but keeps $path/_source_stamp (BM25's build rewrites
    // only the postings/stats subdirs, so the root-level stamp
    // survives). An auto-id append then takes the FULL-BUILD branch and
    // builds from the batch alone — the old stamp must not survive to
    // convince a later stamped ensure that the batch-only index is
    // source-fresh.
    val src = java.nio.file.Files
      .createTempDirectory("bm25-stamp-src").toString + "/documents"
    val idx = java.nio.file.Files
      .createTempDirectory("bm25-stamp").toString
    docs((1L, "cat"), (2L, "dog")).write.mode("overwrite").parquet(src)
    Retrieval.ensureBm25Index(spark, spark.read.parquet(src), idx,
      sourcePath = Some(src))
    assert(graft.ext.IndexStamp.read(spark, idx).isDefined)
    // simulate the crash: marker gone, stamp intact
    val marker = new org.apache.hadoop.fs.Path(s"$idx/postings/_SUCCESS")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(marker, false)
    Retrieval.appendBm25Index(docs((9L, "bird")), idx) // auto id → full build
    assert(graft.ext.IndexStamp.read(spark, idx).isEmpty,
      "batch-only rebuild must invalidate the old source stamp")
    // the stamped ensure now rebuilds from the true source again
    Retrieval.ensureBm25Index(spark, spark.read.parquet(src), idx,
      sourcePath = Some(src))
    assert(Retrieval.bm25Indexed(spark, idx, Seq("cat"), k = 10).count() === 1)
  }

  test("a partially appended index fails loudly, even with zero postings") {
    // Crash between a cold-start append's stats and postings writes:
    // stats carry ingest=1, postings carry nothing (just the empty-base
    // marker). The reader's consistency probe must fire BEFORE the
    // committed-empty-base early return would silently serve an empty
    // ranking over the skewed state.
    val idx = java.nio.file.Files
      .createTempDirectory("bm25-partial").toString
    Retrieval.appendBm25Index(docs((1L, "cat dog")), idx, ingestId = 1L)
    val p = new org.apache.hadoop.fs.Path(s"$idx/postings/ingest=1")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25Indexed(spark, idx, Seq("cat"), k = 10)
    }
    assert(e.getMessage.contains("partially appended"))
  }

  test("domainDivergence: KL is zero iff the source matches the corpus") {
    // Two sources with IDENTICAL token distributions → corpus equals
    // each source → KL = 0 for both.
    val same = Seq(
        (1L, "a a b", "s1"), (2L, "a a b", "s2"))
      .toDF("doc_id", "text", "source")
    val kl0 = Retrieval.domainDivergence(same)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(kl0("s1") === 0.0 && kl0("s2") === 0.0)

    // Skewed source diverges: KL > 0, and the more distinct source is
    // farther from the corpus mixture.
    val skew = Seq(
        (1L, "a a a a", "s1"), (2L, "b b b b", "s2"), (3L, "a b", "s3"))
      .toDF("doc_id", "text", "source")
    val kl = Retrieval.domainDivergence(skew)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(kl("s1") > 0.0 && kl("s2") > 0.0)
    // s3 is the 50/50 mixture, closest to the corpus (6a, 6b → uniform).
    assert(kl("s3") < kl("s1") && kl("s3") < kl("s2"))
  }

  test("rrfFuse matches the hand-computed RRF scores and order") {
    // sparse list: doc 1 (rank 1), doc 2 (rank 2);
    // dense  list: doc 2 (rank 1), doc 3 (rank 2).
    val sparse = Seq((1L, 5.0), (2L, 4.0)).toDF("doc_id", "score")
    val dense = Seq((2L, 0.9), (3L, 0.8)).toDF("doc_id", "cosine")
    val out = Retrieval.rrfFuse(sparse, dense, k = 10).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3)))
    def rrf(ranks: Seq[Int]): Double =
      math.rint(ranks.map(r => 1.0 / (60 + r)).sum * 1e6) / 1e6
    // doc 2 is in BOTH lists → wins; 1 and 3 hold one rank each, and
    // the better single rank (sparse 1) beats the worse (dense 2).
    assert(out.map(_._1).toSeq === Seq(2L, 1L, 3L))
    assert(out(0) === ((2L, Some(2L), Some(1L), rrf(Seq(2, 1)))))
    assert(out(1) === ((1L, Some(1L), None, rrf(Seq(1)))))
    assert(out(2) === ((3L, None, Some(2L), rrf(Seq(2)))))
  }

  test("rrfFuse ties on equal single-list ranks break on doc_id") {
    // docs 5 and 3 each hold rank 2 in exactly one list → equal RRF
    // score; the smaller doc_id must order first.
    val sparse = Seq((1L, 5.0), (5L, 4.0)).toDF("doc_id", "score")
    val dense = Seq((1L, 0.9), (3L, 0.8)).toDF("doc_id", "cosine")
    val ids = Retrieval.rrfFuse(sparse, dense, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 3L, 5L))
  }

  test("hybridTopKIndexed returns exactly hybridTopK's rows") {
    val all = docs(
      (1L, "spark spark engine"), (2L, "vector search engine"),
      (3L, "spark vector"), (4L, "unrelated words entirely"),
      (5L, "dup dup dup"))
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f), 0), (2L, Seq(0.9f, 0.1f, 0f), 0),
      (3L, Seq(0f, 1f, 0f), 0), (4L, Seq(0.8f, 0.2f, 0.1f), 0),
      (5L, Seq(0f, 0f, 1f), 0), (0L, Seq(1f, 0.05f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files
      .createTempDirectory("bm25-hybrid").toString
    Retrieval.buildBm25Index(all, dir)
    val scan = Retrieval.hybridTopK(all, emb, Seq("spark", "dup"),
      queryVecId = 0L, k = 5).collect().toSeq
    val indexed = Retrieval.hybridTopKIndexed(spark, dir, emb,
      Seq("spark", "dup"), queryVecId = 0L, k = 5).collect().toSeq
    assert(scan === indexed)
    assert(scan.nonEmpty)
  }
}
