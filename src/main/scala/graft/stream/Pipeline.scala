package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.{Enrich, Quality}
import graft.ingest.Json
import graft.model.Schemas
import graft.warehouse.Warehouse

/** Streaming ingest pipeline — the reference's consumer end-to-end
  * (reference: spark_consumer.py:40-140), on Structured Streaming.
  *
  * The transform DAG is a pure `DataFrame => DataFrame`, so the identical
  * plan runs in batch tests, against `MemoryStream`, or against a Kafka
  * source — Spark's unified API. Semantics preserved: 10 s processing-time
  * trigger (T1), checkpointed offsets (T3), at-least-once `foreachBatch`
  * append (T4), empty-batch skip (spark_consumer.py:87-88). Deliberately
  * NOT preserved: the reference's `count()`-then-write double execution
  * (spark_consumer.py:86,106) — we persist the batch once (SURVEY §4).
  */
object Pipeline {

  /** parse (P1–P3) → enrich (P5–P10) → validity filter (P11) → warehouse
    * projection (P4). Works on any frame with a `value` column (Kafka
    * layout, MemoryStream[String] aliased, file source).
    */
  def transform(raw: DataFrame): DataFrame =
    Enrich.warehouseProjection(
      Quality.validTrips(
        Enrich.enrich(
          Json.parseStream(raw, Schemas.tripStream))))

  /** T1/T3/T4/T9 — start the sink: micro-batch append to the parquet
    * warehouse via `foreachBatch`.
    */
  def start(raw: DataFrame, warehousePath: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    transform(raw).writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Empty-batch skip (spark_consumer.py:87-88). isEmpty only reads
        // the first non-empty partition — cheaper than the reference's
        // count().
        if (!batch.isEmpty) {
          val once = batch.persist()
          try Warehouse.appendTrips(once, warehousePath)
          finally { once.unpersist(); () }
        }
      }
      .start()

  /** T2/T7/T8 — Kafka source options are configuration, not logic
    * (SURVEY §7.4); provided for completeness when a broker exists.
    */
  def kafkaSource(spark: org.apache.spark.sql.SparkSession,
                  bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
}
