package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Contamination, CorpusPrep, Dedup, Sampling}
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

  test("contamination with an empty side") {
    assert(Contamination.ngramOverlap(emptyDocs, someDocs).isEmpty)
    assert(Contamination.ngramOverlap(someDocs, emptyDocs).isEmpty)
  }

  test("corpus prep with an empty eval set keeps clean docs") {
    val out = CorpusPrep.prepare(someDocs, emptyDocs).collect()
    assert(out.length == 1 && out.head.getAs[Boolean]("kept"))
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
  }
}
