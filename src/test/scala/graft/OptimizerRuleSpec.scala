package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Quality
import graft.sources.Tables

/** [[graft.plans.PushNanosTimestampPredicates]] — the injected optimizer
  * rule must derive scan-pushable int64-ns predicates from range filters
  * on the rebuilt µs timestamp, with zero manual help and zero result
  * change.
  */
class OptimizerRuleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def scanOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // The driver's events.ts has shipped as both INT64 TIMESTAMP(NANOS) and
  // timestamp[us] across testdata generations (Tables.load branches on the
  // loaded schema). These two guards adapt with it: on ns data the injected
  // rule must derive pushable int64-ns bounds; on µs data the bounds must
  // push NATIVELY on ts (no rewrite needed — and the plan must show it, or
  // the scan reads the whole table at 100 TB).
  // The RAW parquet ts type is the discriminator (PlanGuardSpec's rule):
  // the loaded frame's ts_ns is LongType on BOTH paths (the µs branch
  // derives it too), so a loaded-schema conjunct here would be always
  // true and silently degenerate the guard.
  private def eventsAreNs: Boolean =
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType

  test("plain BETWEEN on derived ts pushes ns bounds into the scan") {
    val ev = Tables.load(spark, dir, "events")
    // No betweenWithPushdown — the rule must do it.
    val plan = scanOf(Quality.between(ev, col("ts"),
      "2024-01-05 00:00:00", "2024-01-20 00:00:00"))
    if (eventsAreNs) {
      assert(plan.contains("GreaterThanOrEqual(ts,1704412800000000000"), plan)
      assert(plan.contains("LessThanOrEqual(ts,1705708800000000999"), plan)
    } else {
      assert(plan.contains("GreaterThanOrEqual(ts,2024-01-05"), plan)
      assert(plan.contains("LessThanOrEqual(ts,2024-01-20"), plan)
    }
  }

  test("flipped literal-first comparison is also rewritten") {
    val ev = Tables.load(spark, dir, "events")
    val plan = scanOf(ev.filter(
      to_timestamp(lit("2024-01-15 00:00:00")) <= col("ts")))
    if (eventsAreNs)
      assert(plan.contains("GreaterThanOrEqual(ts,1705276800000000000"), plan)
    else
      assert(plan.contains("GreaterThanOrEqual(ts,2024-01-15"), plan)
  }

  test("rule changes plans, never results") {
    val ev = Tables.load(spark, dir, "events")
    val filtered = Quality.between(ev, col("ts"),
      "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    val manual = Quality.betweenWithPushdown(ev, col("ts"), col("ts_ns"),
      "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    assert(filtered.exceptAll(manual).isEmpty && manual.exceptAll(filtered).isEmpty)
  }

  test("pre-epoch bounds keep truncation-boundary rows (sign-correct preimage)") {
    // IntegralDivide truncates toward zero, so for negative ns the µs
    // preimage is [us·1000-999, us·1000]. A floor-division assumption here
    // silently drops rows (e.g. ns = -500 has ts = epoch, which satisfies
    // ts >= '1970-01-01', but ns >= 0 excludes it).
    import spark.implicits._
    val data = Seq(-2000L, -1500L, -1000L, -999L, -500L, -1L,
      0L, 1L, 500L, 999L, 1000L, 1500L)
    val tmp = java.nio.file.Files.createTempDirectory("preepoch").toString
    data.toDF("raw_ns").write.mode("overwrite").parquet(tmp)
    // Same derivation shape as Tables.load, so the rule fires on a real scan.
    val df = spark.read.parquet(tmp)
      .withColumn("ts", timestamp_micros(expr("raw_ns div 1000")))
    def got(f: org.apache.spark.sql.DataFrame): Seq[Long] =
      f.select("raw_ns").collect().map(_.getLong(0)).toSeq.sorted
    val epoch = to_timestamp(lit("1970-01-01 00:00:00"))
    val minusOneUs = to_timestamp(lit("1969-12-31 23:59:59.999999"))
    // us >= 0  ⟺  ns >= -999
    assert(got(df.filter(col("ts") >= epoch)) === data.filter(_ >= -999).sorted)
    assert(got(df.filter(col("ts") > minusOneUs)) === data.filter(_ >= -999).sorted)
    // us <= -1  ⟺  ns <= -1000
    assert(got(df.filter(col("ts") <= minusOneUs)) === data.filter(_ <= -1000).sorted)
    assert(got(df.filter(col("ts") < epoch)) === data.filter(_ <= -1000).sorted)
    // us = -1  ⟺  ns ∈ [-1999, -1000]
    assert(got(df.filter(col("ts") === minusOneUs)) ===
      data.filter(n => n >= -1999 && n <= -1000).sorted)
    // And the injected scan predicate carries the sign-correct bound.
    val plan = df.filter(col("ts") >= epoch)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(raw_ns,-999)"), plan)
  }

  test("sub-millisecond bounds: manual ns pushdown equals plain between") {
    // epochNs via toEpochMilli dropped sub-ms digits, making the ns
    // conjunct stricter than the µs predicate for bounds like ….000500.
    val ev = Tables.load(spark, dir, "events")
    val lo = "2024-01-10 00:00:00.000500"
    val hi = "2024-01-20 12:34:56.789123"
    val plain = Quality.between(ev, col("ts"), lo, hi)
    val pushed = Quality.betweenWithPushdown(ev, col("ts"), col("ts_ns"), lo, hi)
    assert(plain.exceptAll(pushed).isEmpty && pushed.exceptAll(plain).isEmpty)
    val dyn = Quality.timeRangeWithPushdown(ev, col("ts"), col("ts_ns"),
      Some(lo), Some(hi))
    assert(plain.exceptAll(dyn).isEmpty && dyn.exceptAll(plain).isEmpty)
  }

  test("vec_dot is callable from SQL via the injected function") {
    Tables.registerAll(spark, dir)
    val r = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM embeddings WHERE vec_id = 0")
      .head().getAs[Double]("d")
    assert(math.abs(r - 1.0) < 1e-3) // unit-normalized corpus
  }
}
