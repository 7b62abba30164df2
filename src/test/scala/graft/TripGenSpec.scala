package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.sources.TripGenSource]] — the DSv2 read path: determinism,
  * column pruning, exact id-range filter pushdown with partition
  * pruning.
  */
object TripGenSpec {
  /** Ids observed across restarts (foreachBatch closures must reference
    * a static sink to survive serialization).
    */
  val seen: java.util.Set[java.lang.Long] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
}

class TripGenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def gen(rows: Long, parts: Int = 4) = spark.read
    .format("graft.sources.TripGenSource")
    .option("rows", rows.toString).option("partitions", parts.toString)
    .load()

  test("generates exactly `rows` deterministic rows") {
    val df = gen(1000)
    assert(df.count() == 1000)
    val a = df.filter(col("id") === 123).select("fare_amount").head().getDouble(0)
    val b = gen(1000, 7).filter(col("id") === 123)
      .select("fare_amount").head().getDouble(0)
    assert(a == b) // independent of partitioning
    assert(df.select(countDistinct(col("id"))).head().getLong(0) == 1000)
  }

  test("id range filters push down exactly and prune partitions") {
    val df = gen(1000, 10).filter(col("id") >= 900 && col("id") < 950)
    assert(df.count() == 50)
    val scan = df.queryExecution.executedPlan.toString
    // The accepted filters appear in the scan description, and only the
    // surviving sub-range is planned (1 partition of 10).
    assert(scan.contains("range=[900,950)"), scan)
    val partsUsed = df.select(spark_partition_id()).distinct().count()
    assert(partsUsed == 1, s"expected 1 planned partition, got $partsUsed")
  }

  test("column pruning reaches the generator") {
    val df = gen(100).select("id", "fare_amount")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("cols=id,fare_amount"), scan)
    assert(df.agg(sum("fare_amount")).head().getDouble(0) > 0)
  }

  test("streams as micro-batches with rate control (V2 unified read path)") {
    val q = spark.readStream
      .format("graft.sources.TripGenSource")
      .option("rows", "250").option("partitions", "3")
      .option("rowsPerTrigger", "100")
      .load()
      .writeStream.format("memory").queryName("tripgen_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tripgen_stream").count() == 250)
      // Rate control: no micro-batch exceeded rowsPerTrigger.
      val batchRows = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchRows.nonEmpty && batchRows.forall(_ <= 100))
      // Same deterministic rows as the batch path.
      val streamed = spark.table("tripgen_stream")
        .filter(col("id") === 123).select("fare_amount").head().getDouble(0)
      val batch = gen(250).filter(col("id") === 123)
        .select("fare_amount").head().getDouble(0)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream restart from checkpoint does not regress or duplicate") {
    val ckpt = java.nio.file.Files.createTempDirectory("tripgen-ckpt").toString
    TripGenSpec.seen.clear()
    def run(): Unit = {
      val q = spark.readStream
        .format("graft.sources.TripGenSource")
        .option("rows", "250").option("rowsPerTrigger", "100")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").collect().foreach(r =>
            TripGenSpec.seen.add(r.getLong(0)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(TripGenSpec.seen.size == 250)
    // Restart on the same checkpoint: a regressed offset would re-emit
    // committed rows (foreachBatch is at-least-once per batch, but a
    // correct source yields NO new batches — the range is exhausted).
    run()
    assert(TripGenSpec.seen.size == 250)
  }

  test("feeds the engine like any table (agg over generated trips)") {
    val out = gen(10000)
      .groupBy("vendor_id")
      .agg(count(lit(1)).as("n"),
        graft.agg.Analytics.dsum(col("fare_amount")).as("revenue"))
      .orderBy("vendor_id").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n")).sum == 10000)
  }
}
