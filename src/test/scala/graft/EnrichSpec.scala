package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Enrich, Keys, Quality}

/** Edge rows from FIXTURES.md §A.3 — boundary semantics of the
  * enrichment/filter DAG (reference: spark_consumer.py:63-78).
  */
class EnrichSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def trip(pick: String, drop: String, dist: Double, fare: Double,
                   tip: Double): Row = {
    val df = Seq((1, pick, drop, 1, dist, fare, tip, fare + tip))
      .toDF("VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
        "passenger_count", "trip_distance", "fare_amount", "tip_amount",
        "total_amount")
    Enrich.enrich(df).head()
  }

  test("trip_category boundaries are inclusive: <=2 short, <=10 medium") {
    val cats = Seq(1.9, 2.0, 2.0001, 10.0, 10.0001).map { d =>
      trip("2015-01-15 19:00:00", "2015-01-15 19:30:00", d, 10.0, 1.0)
        .getAs[String]("trip_category")
    }
    assert(cats == Seq("short", "short", "medium", "medium", "long"))
  }

  test("duration is integer-second based, in minutes") {
    val r = trip("2015-01-15 19:00:00", "2015-01-15 19:30:30", 5.0, 10.0, 0.0)
    assert(r.getAs[Double]("trip_duration_minutes") == 30.5)
  }

  test("tip_percentage guards fare=0 (tip present) to 0") {
    val r = trip("2015-01-15 19:00:00", "2015-01-15 19:10:00", 1.0, 0.0, 5.0)
    assert(r.getAs[Double]("tip_percentage") == 0.0)
  }

  test("speed guards distance=0 with positive duration to 0") {
    val r = trip("2015-01-15 19:00:00", "2015-01-15 19:10:00", 0.0, 10.0, 0.0)
    assert(r.getAs[Double]("speed_mph") == 0.0)
    val moving = trip("2015-01-15 19:00:00", "2015-01-15 19:30:00", 6.0, 10.0, 0.0)
    assert(moving.getAs[Double]("speed_mph") == 12.0) // 6 mi in 0.5 h
  }

  test("validity filter: open interval on duration, >=0 on distance/fare") {
    val rows = Seq(
      // (pickup, dropoff, dist, fare) -> survives?
      ("2015-01-15 19:00:00", "2015-01-15 19:00:00", 1.0, 5.0, false), // dur 0
      ("2015-01-15 19:00:00", "2015-01-16 00:00:00", 1.0, 5.0, false), // dur 300
      ("2015-01-15 19:00:00", "2015-01-15 23:59:59", 1.0, 5.0, true),  // dur <300
      ("2015-01-15 19:00:00", "2015-01-15 19:10:00", -0.1, 5.0, false), // neg dist
      ("2015-01-15 19:00:00", "2015-01-15 19:10:00", 1.0, -0.1, false), // neg fare
      ("2015-01-15 19:00:00", "2015-01-15 19:10:00", 0.0, 0.0, true))  // zeros ok
    val df = rows.zipWithIndex.map { case ((p, d, di, f, _), i) =>
      (i, 1, p, d, 1, di, f, 0.0, f)
    }.toDF("id", "VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
      "passenger_count", "trip_distance", "fare_amount", "tip_amount",
      "total_amount")
    val kept = Quality.validTrips(Enrich.enrich(df))
      .select("id").as[Int].collect().toSet
    val expected = rows.zipWithIndex.collect { case ((_, _, _, _, true), i) => i }.toSet
    assert(kept == expected)
  }

  test("dynamic time range: None bounds add no predicate") {
    val df = Seq(("2015-01-01 00:00:00"), ("2015-06-01 00:00:00"))
      .toDF("s").withColumn("ts", to_timestamp(col("s")))
    assert(Quality.timeRange(df, col("ts"), None, None).count() == 2)
    assert(Quality.timeRange(df, col("ts"), Some("2015-03-01 00:00:00"), None)
      .count() == 1)
    assert(Quality.timeRange(df, col("ts"), Some("2015-01-01 00:00:00"),
      Some("2015-01-02 00:00:00")).count() == 1)
  }

  test("partition-key cascade: location, then coords hash, then vendor hash") {
    val df = Seq(
      (Some(237), Some(-73.97), Some(40.76), 1),
      (None, Some(-73.97), Some(40.76), 1),
      (None, None, None, 2))
      .toDF("PULocationID", "lon", "lat", "VendorID")
    val keys = df.select(Keys.partitionKey(col("PULocationID"), col("lon"),
      col("lat"), col("VendorID")).as("k")).as[String].collect()
    assert(keys(0) == "237")
    assert(keys(1).toInt >= 0 && keys(1).toInt < 1000)
    assert(keys(2).toInt >= 0 && keys(2).toInt < 100)
  }
}
