package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Graph

/** Graph analytics on hand-computable fixtures: PageRank against the
  * closed-form power iteration, degree counts, and partition
  * invariance of the decimal rank accumulation.
  */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("degrees counts undirected degree per vertex") {
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val d = Graph.degrees(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(d === Map(1L -> 1L, 2L -> 3L, 3L -> 1L, 4L -> 1L))
  }

  test("pageRank matches the hand-computed power iteration on a path") {
    // Path 1–2–3 (symmetrized): after 2 iterations at d=0.85,
    // r(2) = 0.05 + 0.85·(r1+r3), r(1)=r(3)=0.05 + 0.85·r2/2.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 2).collect()
      .map(row => (row.getLong(0), row.getDouble(1))).toMap
    val r1i1 = 0.05 + 0.85 * (1.0 / 3 / 2)           // after iter 1
    val r2i1 = 0.05 + 0.85 * (2.0 / 3)
    val r2i2 = 0.05 + 0.85 * (r1i1 + r1i1)
    val r1i2 = 0.05 + 0.85 * (r2i1 / 2)
    assert(math.abs(r(2L) - r2i2) < 1e-6)
    assert(math.abs(r(1L) - r1i2) < 1e-6)
    assert(math.abs(r(3L) - r1i2) < 1e-6)
    // Rank mass stays ~1 (no dangling loss on a symmetrized graph).
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("pageRank ranks the hub of a star highest and is partition-invariant") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val ranked = Graph.pageRank(edges).collect()
    assert(ranked.head.getLong(0) === 1L)
    // identical ranks under a different input partitioning
    val ranked7 = Graph.pageRank(edges.repartition(7)).collect()
    assert(ranked.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      ranked7.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("pageRank and connectedComponents: reliable checkpointing matches local") {
    // `reliable = true` swaps localCheckpoint (executor-memory blocks,
    // lost with an executor) for durable checkpoint() (survives executor
    // loss on a cluster). Results must be bit-identical either way —
    // the flag changes fault-tolerance, never semantics — and the
    // reliable mode must fail fast without a configured checkpoint dir.
    import graft.ext.Dedup
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L))
      .toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, reliable = true)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      // iters = 6 so the per-5-iteration rank truncation path runs too
      val local = Graph.pageRank(edges, iters = 6).collect().toSeq
      val durable = Graph.pageRank(edges, iters = 6, reliable = true)
        .collect().toSeq
      assert(local === durable)
      // driverEdgeLimit = 0: the point here is the durable-checkpoint
      // machinery inside the LOOP, which the small-graph fast path skips
      val ccLocal = Dedup.connectedComponents(edges, driverEdgeLimit = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val ccDurable = Dedup.connectedComponents(edges, reliable = true,
          driverEdgeLimit = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(ccLocal === ccDurable)
      assert(ccLocal === Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
    } finally {
      // Shared session: later suites must not silently inherit the dir.
      sc.setCheckpointDir(null)
    }
  }

  test("bottomKSample is exact-k, reproducible, and partition-invariant") {
    import graft.ext.Sampling
    val df = (1L to 1000L).toDF("id")
    val s1 = Sampling.bottomKSample(df, col("id"), 50).collect()
      .map(_.getLong(0))
    val s2 = Sampling.bottomKSample(df.repartition(13), col("id"), 50)
      .collect().map(_.getLong(0))
    assert(s1.length === 50)
    assert(s1.toSeq === s2.toSeq)
    // TakeOrdered plan: no global sort, no shuffle of the table.
    val plan = Sampling.bottomKSample(df, col("id"), 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
