package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column layer — the reference's per-record enrichment DAG
  * (reference: spark_consumer.py:63-76), expressed as pure
  * `DataFrame => DataFrame` / `Column => Column` so one DAG serves batch,
  * streaming and tests. Every derivation is a built-in Catalyst expression
  * (whole-stage-codegen'd; no UDFs), so the layer adds zero shuffle and
  * stays inside the scan's codegen stage at any scale.
  */
object Enrich {

  /** P5 — string → timestamp on pickup/dropoff (spark_consumer.py:63-64).
    * Default ISO parse, session timezone (pinned UTC).
    */
  def withEventTimes(df: DataFrame): DataFrame = df
    .withColumn("pickup_datetime", to_timestamp(col("tpep_pickup_datetime")))
    .withColumn("dropoff_datetime", to_timestamp(col("tpep_dropoff_datetime")))

  /** P6 — trip duration in minutes (spark_consumer.py:65-66). Note the
    * reference computes on `unix_timestamp`, i.e. **integer-second**
    * granularity, then divides in double — reproduced exactly.
    */
  def durationMinutes(pickup: Column, dropoff: Column): Column =
    (unix_timestamp(dropoff) - unix_timestamp(pickup)) / 60.0

  /** P7 — guarded average speed in mph (spark_consumer.py:67-69):
    * `duration > 0 AND distance > 0` else 0.
    */
  def speedMph(distance: Column, durationMin: Column): Column =
    when(durationMin > 0 && distance > 0, distance / (durationMin / 60.0))
      .otherwise(lit(0.0))

  /** P9 — 3-way distance bucketing with inclusive bounds
    * (spark_consumer.py:71-73): `<= 2` short, `<= 10` medium, else long.
    */
  def tripCategory(distance: Column, shortMax: Double = 2.0,
                   mediumMax: Double = 10.0): Column =
    when(distance <= shortMax, lit("short"))
      .when(distance <= mediumMax, lit("medium"))
      .otherwise(lit("long"))

  /** P10 — guarded tip percentage (spark_consumer.py:74-76):
    * `fare > 0 ? tip/fare*100 : 0`.
    */
  def tipPercentage(tip: Column, fare: Column): Column =
    when(fare > 0, tip / fare * 100.0).otherwise(lit(0.0))

  /** P15 — producer-side metadata enrichment (kafka_producer.py:62-63):
    * ISO send-timestamp + constant source tag.
    */
  def withProducerMetadata(df: DataFrame, source: String = "nyc_taxi_dataset"): DataFrame = df
    .withColumn("timestamp",
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    .withColumn("source", lit(source))

  /** Full enrichment DAG (P5–P10, P8): timestamps, duration, speed, pickup
    * hour, category, tip percentage — the exact column set of
    * spark_consumer.py:63-76.
    */
  def enrich(df: DataFrame): DataFrame =
    withEventTimes(df)
      .withColumn("trip_duration_minutes",
        durationMinutes(col("pickup_datetime"), col("dropoff_datetime")))
      .withColumn("speed_mph",
        speedMph(col("trip_distance"), col("trip_duration_minutes")))
      .withColumn("pickup_hour", hour(col("pickup_datetime")))
      .withColumn("trip_category", tripCategory(col("trip_distance")))
      .withColumn("tip_percentage",
        tipPercentage(col("tip_amount"), col("fare_amount")))

  /** P4 — the 12-column aliased warehouse projection
    * (spark_consumer.py:93-105).
    */
  def warehouseProjection(df: DataFrame): DataFrame = df.select(
    col("VendorID").as("vendor_id"),
    col("pickup_datetime"),
    col("dropoff_datetime"),
    col("passenger_count"),
    col("trip_distance"),
    col("fare_amount"),
    col("tip_amount"),
    col("total_amount"),
    col("trip_duration_minutes"),
    col("pickup_hour"),
    col("trip_category"),
    col("tip_percentage"))
}
