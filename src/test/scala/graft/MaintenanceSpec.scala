package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Sampling
import graft.warehouse.Warehouse

/** Warehouse-maintenance semantics: MERGE keep-latest, incremental
  * aggregate refresh (the algebraic invariant against a from-scratch
  * recompute), and k-fold stability under corpus growth.
  */
class MaintenanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("keepLatest keeps the newest version per key, ties broken by id") {
    val df = Seq(
      (1L, 10L, 1L, "old"), (1L, 20L, 2L, "new"),
      (2L, 10L, 3L, "a"), (2L, 10L, 4L, "b"),   // same version: id 4 wins
      (3L, 5L, 5L, "only"))
      .toDF("k", "ver", "id", "payload")
    val out = Warehouse.keepLatest(df, Seq("k"), "ver", "id")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq == Seq((1L, "new"), (2L, "b"), (3L, "only")))
  }

  test("mergeAggState equals the from-scratch aggregate exactly") {
    val rows = (1 to 100).map(i => (s"g${i % 3}", i.toLong, i * 1.5))
      .toDF("g", "id", "v")
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,6)")).as("s"))
    val merged = Warehouse.mergeAggState(
      agg(rows.filter(col("id") <= 60)), agg(rows.filter(col("id") > 60)),
      Seq("g"))
    val full = agg(rows)
    assert(merged.orderBy("g").collect().toSeq ==
      full.orderBy("g").collect().toSeq)
  }

  test("kfold folds are near-equal and stable when the corpus grows") {
    val small = (1 to 400).map(_.toLong).toDF("id")
    val big = (1 to 800).map(_.toLong).toDF("id")
    val fSmall = Sampling.kfoldAssign(small, col("id"), 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fBig = Sampling.kfoldAssign(big, col("id"), 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // Stability: a row's fold never changes as the corpus grows.
    assert(fSmall.forall { case (id, f) => fBig(id) == f })
    // Balance: each of the 5 folds holds roughly 1/5 (digest-uniform).
    val sizes = fBig.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 5 && sizes.values.forall(n => n > 100 && n < 220),
      sizes.toMap.toString)
  }


  test("*PathFor index conventions resolve under spark.graft.indexRoot when set, tmp otherwise") {
    // Persisted indexes are production state: one warehouse-root config
    // must relocate every index family; tmp remains the dev fallback.
    import graft.ext.{Dedup, IndexStamp, Quantization, Retrieval, Similarity}
    val root = java.nio.file.Files
      .createTempDirectory("graft-idx-root").toString
    spark.conf.set("spark.graft.indexRoot", root)
    try {
      val paths = Seq(Similarity.ivfIndexPathFor("/x/sf9"),
        Quantization.pqIndexPathFor("/x/sf9"),
        Retrieval.bm25IndexPathFor("/x/sf9"),
        Dedup.minhashIndexPathFor("/x/sf9"),
        graft.ext.TextAnalysis.dsirIndexPathFor("/x/sf9"))
      paths.foreach(p => assert(p.startsWith(root), p))
      assert(paths.distinct.size == 5) // families stay distinct
      // and an index actually built through the convention lands there
      val docs = Seq((0L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text")
      val idx = Dedup.minhashIndexPathFor("/x/sf9")
      Dedup.buildMinhashIndex(docs, idx)
      assert(new java.io.File(idx, "bands/_SUCCESS").exists())
    } finally spark.conf.unset("spark.graft.indexRoot")
    assert(IndexStamp.indexRoot == sys.props("java.io.tmpdir"))
    assert(Dedup.minhashIndexPathFor("/x/sf9")
      .startsWith(new org.apache.hadoop.fs.Path(
        sys.props("java.io.tmpdir")).toString))
  }

  test("applyCdc upserts, inserts, deletes — and replays idempotently") {
    val state = Seq((1L, "a", 1L, 10L), (2L, "b", 1L, 11L))
      .toDF("k", "v", "ver", "tb")
    val changes = Seq(
        (2L, "b2", 2L, 12L, "U"),   // update user 2
        (1L, "a", 2L, 13L, "D"),    // delete user 1
        (3L, "c", 1L, 14L, "I"))    // insert user 3
      .toDF("k", "v", "ver", "tb", "op")
    val out = Warehouse.applyCdc(state, changes, Seq("k"), "ver", "tb")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((2L, "b2"), (3L, "c")))

    // Replaying the same change batch onto the merged state is a no-op:
    // version order decides, so at-least-once delivery is safe.
    val replay = Warehouse.applyCdc(
        Warehouse.applyCdc(state, changes, Seq("k"), "ver", "tb"),
        changes, Seq("k"), "ver", "tb")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(replay.toSeq === out.toSeq)

    // An out-of-order STALE delete (older version) must not win.
    val stale = Seq((2L, "b", 1L, 9L, "D")).toDF("k", "v", "ver", "tb", "op")
    val kept = Warehouse.applyCdc(
        Warehouse.applyCdc(state, changes, Seq("k"), "ver", "tb"),
        stale, Seq("k"), "ver", "tb")
      .orderBy("k").collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(2L, 3L))
  }
}
