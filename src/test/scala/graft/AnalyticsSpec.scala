package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.Analytics

/** A1–A7 on hand-computed fixtures. */
class AnalyticsSpec extends AnyFunSuite {

  test("typed top-k aggregator: bounded buffer, correct under merge and ties") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 5.0), ("a", 9.0), ("a", 9.0), ("a", 1.0), ("a", 7.0),
        ("b", 2.0))
      .toDF("g", "v").repartition(4) // force partial-buffer merges
    val out = df.groupBy("g")
      .agg(graft.functions.TopKAgg.top_k_values(col("v"), 3).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(9.0, 9.0, 7.0)) // duplicate values both kept
    assert(out("b") == Seq(2.0))           // fewer than k
  }
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val trips = Seq(
    (1, "2015-01-15 08:10:00", 10.0),
    (1, "2015-01-15 08:40:00", 20.0),
    (2, "2015-01-15 09:10:00", 30.0),
    (2, "2015-01-16 09:20:00", 40.0))
    .toDF("vendor_id", "s", "fare")
    .withColumn("ts", to_timestamp(col("s")))

  test("A1 trip statistics: count/avg/sum/min/max, exact") {
    val r = Analytics.tripStatistics(trips, col("fare")).head()
    assert(r.getAs[Long]("total_trips") == 4)
    assert(r.getAs[Double]("avg_fare") == 25.0)
    assert(r.getAs[Double]("total_revenue") == 100.0)
    assert(r.getAs[Double]("min_fare") == 10.0)
    assert(r.getAs[Double]("max_fare") == 40.0)
  }

  test("A2 vendor comparison groups and orders by vendor") {
    val rows = Analytics.vendorComparison(trips, col("vendor_id"), col("fare"))
      .collect()
    assert(rows.map(_.getAs[Int]("vendor_id")).toSeq == Seq(1, 2))
    assert(rows.map(_.getAs[Double]("total_revenue")).toSeq == Seq(30.0, 70.0))
  }

  test("A3 date bounds emits ISO strings + epoch seconds") {
    val r = Analytics.dateBounds(trips, col("ts")).head()
    assert(r.getAs[String]("min_date") == "2015-01-15")
    assert(r.getAs[String]("max_date") == "2015-01-16")
    assert(r.getAs[Long]("max_ts_sec") - r.getAs[Long]("min_ts_sec") ==
      (25 * 3600 + 10 * 60)) // 08:10 on the 15th → 09:20 on the 16th
  }

  test("A5 conditional counts compile to one-pass sums") {
    val r = Analytics.conditionalCounts(trips, Seq(
      "vendor_1_trips" -> (col("vendor_id") === 1),
      "big_trips" -> (col("fare") > 25))).head()
    assert(r.getAs[Long]("vendor_1_trips") == 2)
    assert(r.getAs[Long]("big_trips") == 2)
  }

  test("A6 hourly statistics keys on (date, hour)") {
    val rows = Analytics.hourlyStatistics(trips, col("ts"), col("fare")).collect()
    assert(rows.length == 3) // (15th,8) (15th,9) (16th,9)
    assert(rows.head.getAs[String]("analysis_date") == "2015-01-15")
    assert(rows.head.getAs[Int]("hour_of_day") == 8)
    assert(rows.head.getAs[Long]("trip_count") == 2)
  }

  test("A7 vendor-daily keys on (vendor, date)") {
    val rows = Analytics.vendorDaily(trips, col("vendor_id"), col("ts"),
      col("fare")).collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getAs[Int]("vendor_id"),
      r.getAs[String]("analysis_date"))).toSeq ==
      Seq((1, "2015-01-15"), (2, "2015-01-15"), (2, "2015-01-16")))
  }
}
