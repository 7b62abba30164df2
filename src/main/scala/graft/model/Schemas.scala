package graft.model

import org.apache.spark.sql.types._

/** Schema constants mirroring the reference's declared shapes.
  *
  * The reference declares two fixed schemas: the 8-field JSON trip schema
  * its stream consumer parses (reference: spark_consumer.py:42-51) and the
  * warehouse tables its database layer owns (database_handler.py:76-164).
  * Here they are `StructType` constants: the stream schema is the
  * `from_json` parse target, and the warehouse shapes are the contracts of
  * the enrichment ([[graft.etl.Enrich]]) and analytics
  * ([[graft.agg.Analytics]]) layers.
  */
object Schemas {

  /** Stream input: parse target for `from_json` (spark_consumer.py:42-51).
    * Datetimes arrive as strings and are converted downstream (P5); fields
    * absent from a message parse to null (PERMISSIVE), extra fields — e.g.
    * the producer metadata `timestamp`/`source` (kafka_producer.py:62-63) —
    * are dropped.
    */
  val tripStream: StructType = StructType(Seq(
    StructField("VendorID", IntegerType),
    StructField("tpep_pickup_datetime", StringType),
    StructField("tpep_dropoff_datetime", StringType),
    StructField("passenger_count", IntegerType),
    StructField("trip_distance", DoubleType),
    StructField("fare_amount", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("total_amount", DoubleType)))

  /** Enriched trip row the pipeline writes to the warehouse — the 12-column
    * projection of spark_consumer.py:93-106 (a subset of the 29-column DDL
    * at database_handler.py:76-108; unwritten columns stay null there and
    * are omitted here).
    */
  val warehouseTrips: StructType = StructType(Seq(
    StructField("vendor_id", IntegerType),
    StructField("pickup_datetime", TimestampType),
    StructField("dropoff_datetime", TimestampType),
    StructField("passenger_count", IntegerType),
    StructField("trip_distance", DoubleType),
    StructField("fare_amount", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("trip_duration_minutes", DoubleType),
    StructField("pickup_hour", IntegerType),
    StructField("trip_category", StringType),
    StructField("tip_percentage", DoubleType)))
}
