package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.Pipeline

/** T1–T9: the streaming pipeline against a MemoryStream source (no Kafka
  * in CI — SURVEY §7.4), asserting batch/stream DAG equivalence and the
  * warehouse append path.
  */
class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val goodRows = Seq(
    """{"VendorID":1,"tpep_pickup_datetime":"2015-01-15 19:05:39","tpep_dropoff_datetime":"2015-01-15 19:23:42","passenger_count":1,"trip_distance":1.59,"fare_amount":12.0,"tip_amount":3.25,"total_amount":17.05}""",
    """{"VendorID":2,"tpep_pickup_datetime":"2015-01-16 08:00:00","tpep_dropoff_datetime":"2015-01-16 08:30:00","passenger_count":2,"trip_distance":11.5,"fare_amount":30.0,"tip_amount":0.0,"total_amount":30.0}""")
  private val badRows = Seq(
    "not json at all",
    // dropoff == pickup → duration 0 → filtered (open interval)
    """{"VendorID":1,"tpep_pickup_datetime":"2015-01-15 19:00:00","tpep_dropoff_datetime":"2015-01-15 19:00:00","passenger_count":1,"trip_distance":1.0,"fare_amount":5.0,"tip_amount":0.0,"total_amount":5.0}""")

  test("stream and batch runs of the same DAG produce identical warehouse rows") {
    val warehouse = Files.createTempDirectory("graft-wh").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString

    val source = MemoryStream[String](
      implicitly[org.apache.spark.sql.Encoder[String]], spark.sqlContext)
    source.addData(goodRows ++ badRows: _*)

    val query = Pipeline.start(source.toDF(), warehouse, checkpoint,
      Trigger.ProcessingTime("1 second"))
    try query.processAllAvailable()
    finally query.stop()

    val streamed = spark.read.parquet(warehouse)
    val batch = Pipeline.transform((goodRows ++ badRows).toDF("value"))

    // Only the two valid trips survive; malformed JSON and zero-duration
    // rows are dropped by the shared DAG.
    assert(streamed.count() == 2)
    val cols = batch.columns.map(org.apache.spark.sql.functions.col).toSeq
    assert(streamed.select(cols: _*).orderBy("vendor_id").collect().toSeq ==
      batch.orderBy("vendor_id").collect().toSeq)
    // Warehouse layout: date-partitioned (the reference's index analog).
    assert(streamed.columns.contains("pickup_date"))
  }

  test("idempotent streaming sink partitions by batch_id and matches start()") {
    val warehouse = Files.createTempDirectory("graft-wh-idem").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt-idem").toString
    val source = MemoryStream[String](
      implicitly[org.apache.spark.sql.Encoder[String]], spark.sqlContext)
    source.addData(goodRows ++ badRows: _*)
    val query = Pipeline.startIdempotent(source.toDF(), warehouse, checkpoint,
      Trigger.ProcessingTime("1 second"))
    try query.processAllAvailable()
    finally query.stop()
    val streamed = spark.read.parquet(warehouse)
    assert(streamed.count() == 2) // same survivors as start()
    // Layout carries the replay key: batch_id partition + pickup_date.
    assert(streamed.columns.contains("batch_id"))
    assert(streamed.columns.contains("pickup_date"))
  }

  test("empty micro-batches are skipped (no output files, no failure)") {
    val warehouse = Files.createTempDirectory("graft-wh2").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt2").toString
    val source = MemoryStream[String](
      implicitly[org.apache.spark.sql.Encoder[String]], spark.sqlContext)
    val query = Pipeline.start(source.toDF(), warehouse, checkpoint,
      Trigger.ProcessingTime("1 second"))
    try query.processAllAvailable()
    finally query.stop()
    // No batch ever had data → appendTrips never ran → no parquet output.
    assert(!Files.list(java.nio.file.Paths.get(warehouse)).iterator().hasNext ||
      spark.read.parquet(warehouse).isEmpty)
  }
}
