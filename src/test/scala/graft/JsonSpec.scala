package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Enrich
import graft.ingest.Json
import graft.model.Schemas

/** P1–P3 / S6 semantics: PERMISSIVE parse, field dropping, null
  * normalization, producer round-trip (FIXTURES.md §A.3 malformed rows).
  */
class JsonSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val good =
    """{"VendorID":2,"tpep_pickup_datetime":"2015-01-15 19:05:39",
      |"tpep_dropoff_datetime":"2015-01-15 19:23:42","passenger_count":1,
      |"trip_distance":1.59,"fare_amount":12.0,"tip_amount":3.25,
      |"total_amount":17.05}""".stripMargin.replace("\n", "")

  test("P1: binary Kafka value casts to string before parse") {
    val binary = TestSpark.tripJson(Seq(good))
      .select(col("value").cast("binary").as("value"))
    val df = Json.parseStream(binary, Schemas.tripStream)
    assert(df.head().getAs[Integer]("VendorID") == 2)
  }

  test("malformed JSON yields a null-struct row (PERMISSIVE), not a failure") {
    val df = Json.parseStream(TestSpark.tripJson(Seq(good, "{not json")),
      Schemas.tripStream)
    assert(df.count() == 2)
    assert(df.filter(col("VendorID").isNull).count() == 1)
  }

  test("missing schema fields parse to null; extra fields are dropped") {
    val partial = """{"VendorID":1,"timestamp":"2026-01-01T00:00:00","source":"x"}"""
    val df = Json.parseStream(TestSpark.tripJson(Seq(partial)), Schemas.tripStream)
    val r = df.head()
    assert(r.getAs[Integer]("VendorID") == 1)
    assert(r.isNullAt(r.fieldIndex("fare_amount")))
    assert(!df.columns.contains("timestamp") && !df.columns.contains("source"))
  }

  test("JSON null (producer NaN normalization) round-trips to column null") {
    val withNull = """{"VendorID":1,"fare_amount":null,"trip_distance":2.5}"""
    val r = Json.parseStream(TestSpark.tripJson(Seq(withNull)),
      Schemas.tripStream).head()
    assert(r.isNullAt(r.fieldIndex("fare_amount")))
    assert(r.getAs[Double]("trip_distance") == 2.5)
  }

  test("S2: CSV scan with explicit schema round-trips the trip shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val df = Json.parseStream(TestSpark.tripJson(Seq(good)), Schemas.tripStream)
    df.write.option("header", "true").mode("overwrite").csv(dir)
    val back = graft.sources.Tables.csv(spark, dir, Schemas.tripStream)
    assert(back.collect().toSeq == df.collect().toSeq)
  }

  test("producer serialize → consumer parse is identity on schema fields") {
    val df = Json.parseStream(TestSpark.tripJson(Seq(good)), Schemas.tripStream)
    val keyed = Json.toKeyedJson(
      Enrich.withProducerMetadata(df), col("VendorID"))
    assert(keyed.columns.toSeq == Seq("key", "value"))
    assert(keyed.head().getAs[String]("key") == "2")
    val back = Json.parseStream(keyed, Schemas.tripStream)
    assert(back.head() == df.head()) // metadata fields dropped on re-parse
  }
}
