package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.Behavior
import graft.sources.Tables

/** Funnel / cohort / transition semantics on hand-computed sequences —
  * the ordering rules (stage-after-stage, tie-broken lag) that the SQL
  * oracle also encodes, pinned here against tiny fixtures where the
  * right answer is obvious.
  */
class BehaviorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // (user, µs, type, id)
  private lazy val ev = Seq(
    // u1 converts in order: view@10 → click@20 → purchase@30
    (1L, 10L, "view", 1L), (1L, 20L, "click", 2L), (1L, 30L, "purchase", 3L),
    // u2's purchase precedes its click: reaches stage 2 only
    (2L, 10L, "view", 4L), (2L, 40L, "click", 5L), (2L, 20L, "purchase", 6L),
    // u3 never views: reaches nothing, despite click+purchase
    (3L, 10L, "click", 7L), (3L, 20L, "purchase", 8L),
    // u4 views only
    (4L, 10L, "view", 9L))
    .toDF("u", "tu", "et", "eid")

  test("funnel counts a stage only after the previous stage's first time") {
    val out = Behavior.funnel(ev, col("tu"), col("u"), col("et"),
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "view", 3L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("funnel stage time is the earliest QUALIFYING event, not the earliest event") {
    // click@5 (before view@10) must not become stage 2's timestamp —
    // otherwise purchase@8 would falsely qualify for stage 3.
    val tricky = Seq(
      (1L, 5L, "click", 1L), (1L, 10L, "view", 2L),
      (1L, 12L, "click", 3L), (1L, 8L, "purchase", 4L))
      .toDF("u", "tu", "et", "eid")
    val out = Behavior.funnel(tricky, col("tu"), col("u"), col("et"),
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L), (2, 1L), (3, 0L)))
  }

  test("cohort retention buckets by first-event week, offsets are integral") {
    val wk = 604800000000L
    val e = Seq(
      (1L, 0L * wk + 5L), (1L, 2L * wk + 5L),       // cohort 0, active wk 0+2
      (2L, 1L * wk), (2L, 1L * wk + 1L), (2L, 2L * wk)) // cohort 1, wk 0 (×2 events, 1 user) + 1
      .toDF("u", "tu")
    val out = Behavior.cohortRetention(e, col("tu"), col("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("transitions follow event time with the id as a deterministic tiebreak") {
    val e = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L),
      (1L, 20L, "c", 3L), // same ts as b: id orders b before c
      (2L, 5L, "a", 4L))  // singleton sequence: no transition
      .toDF("u", "tu", "et", "eid")
    val out = Behavior.transitions(e, col("tu"), col("u"), col("et"),
        col("eid"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 1L), ("b", "c", 1L)))
  }

  test("winsorized stats clamp exactly at the interpolated percentiles") {
    // 0..100: p10 = 10.0, p90 = 90.0 exactly (rank = p·(n−1) integral).
    val v = (0 to 100).map(_.toDouble).toDF("x")
    val r = Behavior.winsorizedStats(v, col("x"), 0.10, 0.90).head()
    assert(r.getAs[Long]("n") == 101)
    assert(r.getAs[Double]("w_min") == 10.0 && r.getAs[Double]("w_max") == 90.0)
    // sum = 11 copies of 10 + 11..89 inclusive + 11 copies of 90
    val expect = 11 * 10.0 + (11 to 89).sum + 11 * 90.0
    assert(r.getAs[Double]("w_sum") == expect)
  }

  test("rollingDistinctUsers matches a hand-computed trailing window") {
    // days 1,2,3,9 with overlapping users; window=2.
    val ev = Seq(
        ("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 2L),
        ("2024-01-02 10:00:00", 2L), ("2024-01-02 11:00:00", 3L),
        ("2024-01-03 10:00:00", 3L),
        ("2024-01-09 10:00:00", 9L))
      .toDF("s", "user_id").select(to_timestamp(col("s")).as("ts"),
        col("user_id"))
    val out = Behavior.rollingDistinctUsers(ev, col("ts"), col("user_id"),
        window = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // d1: {1,2}=2; d2: {1,2,3}=3; d3: {2,3}=2; d4: {3}=1 (trailing from
    // d3); d9: {9}=1; d10 clipped (past the data horizon).
    assert(out === Map("2024-01-01" -> 2L, "2024-01-02" -> 3L,
      "2024-01-03" -> 2L, "2024-01-04" -> 1L, "2024-01-09" -> 1L))
  }

  test("HLL rolling distinct tracks the exact form within 5%") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val exact = Behavior.rollingDistinctUsers(ev, col("ts"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val est = Behavior.rollingDistinctUsersHll(ev, col("ts"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    // The exact form also emits trailing gap days the sketch form never
    // does (documented), so compare only on days both report.
    val common = exact.keySet.intersect(est.keySet)
    assert(common.nonEmpty)
    common.foreach { d =>
      assert(math.abs(est(d) - exact(d)) / exact(d) < 0.05,
        s"$d: est ${est(d)} vs exact ${exact(d)}")
    }
  }

  test("HLL rolling distinct window is calendar-ranged, not row-counted") {
    // 3-day window over data with a 10-day gap: day 20's window must
    // contain ONLY day 20 (days 1-2 are 18 days away) — a ROWS frame
    // would silently fold them in across the gap. Cardinalities this
    // small are exact in the HLL sketch, so assert equality.
    val ev = Seq(
      ("2024-01-01 00:00:00", 1L), ("2024-01-01 01:00:00", 2L),
      ("2024-01-02 00:00:00", 3L),
      ("2024-01-20 00:00:00", 9L))
      .toDF("s", "user_id")
      .select(to_timestamp(col("s")).as("ts"), col("user_id"))
    val got = Behavior.rollingDistinctUsersHll(ev, col("ts"), col("user_id"),
        window = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 3L, "2024-01-20" -> 1L))
  }
}
