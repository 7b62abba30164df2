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

  test("plain BETWEEN on derived ts pushes ns bounds into the scan") {
    val ev = Tables.load(spark, dir, "events")
    // No betweenWithPushdown — the rule must do it.
    val plan = scanOf(Quality.between(ev, col("ts"),
      "2024-01-05 00:00:00", "2024-01-20 00:00:00"))
    assert(plan.contains("GreaterThanOrEqual(ts,1704412800000000000"), plan)
    assert(plan.contains("LessThanOrEqual(ts,1705708800000000999"), plan)
  }

  test("flipped literal-first comparison is also rewritten") {
    val ev = Tables.load(spark, dir, "events")
    val plan = scanOf(ev.filter(
      to_timestamp(lit("2024-01-15 00:00:00")) <= col("ts")))
    assert(plan.contains("GreaterThanOrEqual(ts,1705276800000000000"), plan)
  }

  test("rule changes plans, never results") {
    val ev = Tables.load(spark, dir, "events")
    val filtered = Quality.between(ev, col("ts"),
      "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    val manual = Quality.betweenWithPushdown(ev, col("ts"), col("ts_ns"),
      "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    assert(filtered.exceptAll(manual).isEmpty && manual.exceptAll(filtered).isEmpty)
  }

  test("vec_dot is callable from SQL via the injected function") {
    Tables.registerAll(spark, dir)
    val r = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM embeddings WHERE vec_id = 0")
      .head().getAs[Double]("d")
    assert(math.abs(r - 1.0) < 1e-3) // unit-normalized corpus
  }
}
