package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** [[graft.operators.Temporal]] — as-of join, sessionization, tolerance
  * join: exact semantics on hand-built rows (ties, empty sides, gap
  * boundaries), plus equivalence of the bucketed tolerance join with the
  * naive cross-filter on small data.
  */
class TemporalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("asof backward: picks latest right at-or-before, ties by tie column") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 200L, 5L))
      .toDF("id", "k", "t")
    val right = Seq(
      (11L, 100L, 10L, 1.0),  // exactly at left t=10 → inclusive
      (12L, 100L, 10L, 2.0),  // same ts, higher tie id wins
      (13L, 100L, 20L, 3.0),
      (14L, 999L, 1L, 9.0))   // other key, never matches
      .toDF("rid", "k", "t", "v")
    val out = Temporal.asofJoinBackward(left, right, "k", "t", "t", "rid",
        Seq("v"))
      .select("id", "asof_rid", "asof_v").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, 12L, 2.0),   // ties at t=10 → rid 12
      (2L, 13L, 3.0),   // latest <= 25 is t=20
      (3L, -1L, -1.0))) // key 200 has no purchases
  }

  test("asof forward: picks earliest right at-or-after, ties to min tie") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 200L, 50L))
      .toDF("id", "k", "t")
    val right = Seq(
      (11L, 100L, 10L, 1.0),  // exactly at left t=10 → inclusive
      (12L, 100L, 10L, 2.0),  // same ts, SMALLER tie id wins forward
      (15L, 100L, 30L, 5.0),
      (14L, 999L, 60L, 9.0))  // other key, never matches
      .toDF("rid", "k", "t", "v")
    val out = Temporal.asofJoinForward(left, right, "k", "t", "t", "rid",
        Seq("v"))
      .select("id", "asof_rid", "asof_v").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, 11L, 1.0),   // ties at t=10 → rid 11 (smallest)
      (2L, 15L, 5.0),   // earliest >= 25 is t=30
      (3L, -1L, -1.0))) // key 200 has nothing following
  }

  test("sessionize: splits exactly when gap exceeds threshold") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 101L, 3L), // gap 100 == gap → same
      (1L, 302L, 4L),                               // gap 201 > 100 → new
      (2L, 0L, 5L))
      .toDF("k", "tu", "id")
    val out = Temporal.sessionize(df, "k", "tu", "id", gapUs = 100L)
      .orderBy("k", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(
      (1L, 1L, 0L, 101L, 3L),
      (1L, 2L, 302L, 302L, 1L),
      (2L, 1L, 0L, 0L, 1L)))
  }

  test("tolerance join is exact at magnitudes beyond double precision") {
    // ns-epoch-scale values (≫ 2^53): double-division bucketing mis-floors
    // here; the integer floor-division path must still find every pair.
    val base = 1700000000000000000L
    val tol = 1000L
    val ls = Seq(base, base + 999L, base + 2500L, base + 7777L).toDF("l_us")
    val rs = Seq(base + 1000L, base + 1999L, base + 3500L, base + 9000L)
      .toDF("r_us")
    val bucketed = Temporal.toleranceJoin(ls, rs, "l_us", "r_us", tol)
      .select("l_us", "r_us").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val naive = ls.crossJoin(rs)
      .filter(abs(col("l_us") - col("r_us")) <= tol)
      .select("l_us", "r_us").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(naive.nonEmpty && (bucketed sameElements naive))
  }

  test("sessionize matches Spark's built-in session_window off-boundary") {
    // Same session definition, one boundary difference: gaps-and-islands
    // starts a new session when diff > gap (<= stays); session_window
    // merges while diff < gap (== gap splits). Off the exact boundary
    // the two agree — this pins both semantics.
    val rows = Seq(
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 99L, 3L),   // diffs 50, 49 < gap
      (1L, 300L, 4L),                                // diff 201 > gap
      (2L, 10L, 5L), (2L, 500L, 6L))
      .toDF("k", "tu", "id")
    val gapUs = 100L
    val ours = Temporal.sessionize(rows, "k", "tu", "id", gapUs)
      .select("k", "session_start_us", "session_end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val builtin = rows
      .withColumn("ts", timestamp_micros(col("tu")))
      .groupBy(col("k"), session_window(col("ts"), "0.0001 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), unix_micros(col("session_window.start")).as("s"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // Compare on (key, start, count) — session_window's end is start+gap
    // padded, not the last event.
    assert(ours.map(t => (t._1, t._2, t._4)) === builtin)
  }

  test("range join equals the naive cross-filter and handles edge intervals") {
    // Varying widths: zero-width, sub-bucket, multi-bucket (spans 4
    // buckets at width 10), inverted (hi < lo → matches nothing).
    val intervals = Seq(
      (1L, 15L, 15L),   // zero-width: only pt == 15
      (2L, 3L, 7L),     // inside one bucket
      (3L, 8L, 34L),    // spans buckets 0..3
      (4L, 40L, 30L))   // inverted → dropped
      .toDF("iid", "lo", "hi")
    val points = (0L until 60L).map(p => (p, p)).toDF("pid", "pt")
    val got = Temporal.rangeJoin(points, intervals, "pt", "lo", "hi",
        bucketWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val naive = points.crossJoin(intervals)
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(got.nonEmpty && got === naive)
    // each qualifying pair appears exactly once despite the multi-bucket
    // interval explode
    assert(got.distinct === got)
    // inclusive on both ends; inverted interval contributed nothing
    assert(got.contains((15L, 1L)) && got.contains((8L, 3L)) &&
      got.contains((34L, 3L)) && !got.exists(_._2 == 4L))
  }

  test("tolerance join equals the naive cross-filter") {
    val l = (0L until 50L).map(i => i * 37L % 1000L).toDF("l_us")
    val r = (0L until 50L).map(i => i * 53L % 1000L).toDF("r_us")
    val tol = 25L
    val bucketed = Temporal.toleranceJoin(l, r, "l_us", "r_us", tol)
      .select("l_us", "r_us").collect().map(x => (x.getLong(0), x.getLong(1)))
      .sorted
    val naive = l.crossJoin(r)
      .filter(abs(col("l_us") - col("r_us")) <= tol)
      .select("l_us", "r_us").collect().map(x => (x.getLong(0), x.getLong(1)))
      .sorted
    assert(bucketed.nonEmpty && bucketed === naive)
  }
}
