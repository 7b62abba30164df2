package graft.tools

import org.apache.spark.sql.functions._

/** Streaming-curation scale drill (`runMain graft.tools.ScreenDrill
  * [standingDocs] [triggers] [batchSize]`, default 200k / 6 / 1000):
  * builds the standing MinHash index once, then drives
  * [[graft.stream.Pipeline.curationStream]] through repeated triggers
  * of planted batches — per trigger: 10% byte-identical copies of
  * standing docs (must be caught by the novelty screen), 5%
  * blocklisted (must fail the gate), 5% intra-batch twin pairs (one
  * survivor each), the rest fresh (must be kept). Asserts the verdict
  * counts per trigger and prints per-trigger wall — the number that
  * matters at 100 TB is that trigger cost tracks the BATCH, not the
  * standing corpus, and stays flat as the index absorbs survivors.
  * Not part of the driver contract.
  */
object ScreenDrill {
  def main(args: Array[String]): Unit = {
    val standingN = if (args.length > 0) args(0).toLong else 200000L
    val triggers = if (args.length > 1) args(1).toInt else 6
    val batchN = if (args.length > 2) args(2).toInt else 1000
    val spark = ToolSession.local(32)
    import spark.implicits._

    // Long alpha tags keep every doc above the 0.6 alpha-ratio quality
    // boundary even with 5-digit suffixes.
    def tokens(seed: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(29)),
        i => concat(lit("drilltokenword"),
          pmod(xxhash64(seed * 31 + i), lit(50000)))))
    val standing = spark.range(standingN)
      .select(col("id").as("doc_id"), tokens(col("id")).as("text"))
      .localCheckpoint()

    val tmp = java.nio.file.Files
      .createTempDirectory("screen-drill").toString
    val idx = s"$tmp/idx"
    val t0 = System.nanoTime()
    graft.ext.Dedup.buildMinhashIndex(standing, idx)
    println(f"index build ($standingN%d docs): ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String)]],
      spark.sqlContext)
    val query = graft.stream.Pipeline.curationStream(
      source.toDF().toDF("doc_id", "text"), idx,
      s"$tmp/verdicts", s"$tmp/ckpt", blocklist = Seq("plantbad"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))

    val copies = batchN / 10      // planted standing dups
    val blocked = batchN / 20     // planted blocklist hits
    val twinPairs = batchN / 20   // planted intra-batch twin PAIRS
    val fresh = batchN - copies - blocked - 2 * twinPairs
    try {
      (0 until triggers).foreach { trig =>
        val base = standingN * 10L + trig.toLong * batchN
        // copies replay standing seeds; twins share a per-pair seed in
        // the fresh space; everything else gets a never-seen seed.
        val batch = spark.range(base, base + batchN).select(
            col("id").as("doc_id"),
            (col("id") - base).as("k"))
          .select(col("doc_id"),
            when(col("k") < copies, tokens(pmod(col("doc_id"), lit(standingN))))
            .when(col("k") < copies + blocked,
              concat(tokens(col("doc_id")), lit(" plantbad")))
            .when(col("k") < copies + blocked + 2 * twinPairs,
              tokens(lit(-1) - col("doc_id") + pmod(col("k") - copies - blocked, lit(2))))
            .otherwise(tokens(col("doc_id") + 7777777L)).as("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        val tb = System.nanoTime()
        source.addData(batch: _*)
        query.processAllAvailable()
        val sec = (System.nanoTime() - tb) / 1e9
        val v = spark.read.parquet(s"$tmp/verdicts/batch_id=$trig")
        val kept = v.filter(col("kept")).count()
        val caught = v.filter(!col("is_novel")).count()
        val gated = v.filter(!col("blocklist_ok")).count()
        println(f"trigger $trig%d: $sec%6.2f s  kept=$kept%d caught=$caught%d blocked=$gated%d")
        assert(caught == copies, s"trigger $trig: caught $caught != $copies")
        assert(gated == blocked, s"trigger $trig: blocked $gated != $blocked")
        // fresh docs + one survivor per twin pair
        assert(kept == fresh + twinPairs,
          s"trigger $trig: kept $kept != ${fresh + twinPairs}")
      }
    } finally query.stop()
    spark.stop()
  }
}
