package graft.tools

import org.apache.spark.sql.functions._

/** Backfill-shape proof for the single-scan incremental composite
  * (`runMain graft.tools.BackfillDrill [standingDocs] [batchDocs]`,
  * default 2M / 2M): the r14 reshape's payoff claim is the BACKFILL —
  * a corpus-sized "batch" where one saved source scan is corpus-sized
  * — but its A/B ran at trigger sizes. This drill builds the standing
  * MinHash index once, writes a corpus-sized batch to PARQUET (a
  * backfill arrives as files, not a MemoryStream), and runs
  * `screenIncremental(broadcastBatch = false, sorted = false)` — the
  * co-partitioned merge-plan path a backfill wants — end to end.
  *
  * Asserts (the PlanGuard discipline, at this shape):
  *   - the final adaptive plan contains NO FileScan of the batch
  *     parquet (the up-front checkpoint carried the one real scan;
  *     every screen rides it) and no scan of the standing corpus
  *     (only its at-rest index);
  *   - the novelty screen runs a shuffled merge join, never a
  *     broadcast of the corpus-sized batch side;
  *   - planted verdict counts are exact: 10% byte-identical standing
  *     copies caught by the novelty screen, 5% blocklist hits gated,
  *     every fresh doc kept.
  *
  * Prints index-build and screen wall seconds for SCALE.md. Not part
  * of the driver contract.
  */
object BackfillDrill {
  def main(args: Array[String]): Unit = {
    val standingN = if (args.length > 0) args(0).toLong else 2000000L
    val batchN = if (args.length > 1) args(1).toLong else 2000000L
    val spark = ToolSession.local(32)
    import spark.implicits._

    def tokens(seed: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(29)),
        i => concat(lit("drilltokenword"),
          pmod(xxhash64(seed * 31 + i), lit(50000)))))

    val tmp = java.nio.file.Files
      .createTempDirectory("backfill-drill").toString
    val idx = s"$tmp/idx"
    val t0 = System.nanoTime()
    graft.ext.Dedup.buildMinhashIndex(
      spark.range(standingN)
        .select(col("id").as("doc_id"), tokens(col("id")).as("text")),
      idx)
    println(f"index build ($standingN%d docs): ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // The backfill: written to parquet and read back, fully
    // distributed (no driver-side batch construction at this size).
    val copies = batchN / 10
    val blocked = batchN / 20
    val fresh = batchN - copies - blocked
    val batchDir = s"$tmp/batch"
    val base = standingN * 10L
    spark.range(base, base + batchN)
      .select(col("id").as("doc_id"), (col("id") - base).as("k"))
      .select(col("doc_id"),
        when(col("k") < copies, tokens(pmod(col("doc_id"), lit(standingN))))
          .when(col("k") < copies + blocked,
            concat(tokens(col("doc_id")), lit(" plantbad")))
          .otherwise(tokens(col("doc_id") + 7777777L)).as("text"))
      .write.mode("overwrite").parquet(batchDir)
    val batch = spark.read.parquet(batchDir)

    // Time the WHOLE screen: the intra-batch clusterer's convergence
    // loop runs jobs at construction time, so the timer must bracket
    // the screenIncremental call itself, not just the final action.
    val t1 = System.nanoTime()
    val out = graft.ext.CorpusPrep.screenIncremental(batch, idx,
      blocklist = Seq("plantbad"),
      broadcastBatch = false, sorted = false)
    // Materialize the screen ONCE through a lazy checkpoint of its own
    // output: the count() below executes the composite's physical plan
    // exactly (finalizing the adaptive plan the asserts read), and the
    // verdict-count aggregates then ride the checkpointed blocks
    // instead of re-running the final join.
    val ck = out.localCheckpoint(eager = false)
    val total = ck.count()
    val wall = (System.nanoTime() - t1) / 1e9
    println(f"screen ($batchN%d-doc backfill vs $standingN%d standing): $wall%.1f s, $total%d verdicts")

    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains(batchDir),
      s"batch parquet FileScan survived into the final plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"no shuffled join in the merge-path plan (a corpus-sized batch " +
        s"side must never broadcast):\n$p")
    println("plan asserts OK: zero batch FileScans; shuffled merge join")

    val c = ck.agg(
      sum(when(!col("is_novel"), 1L).otherwise(0L)).as("caught"),
      sum(when(!col("blocklist_ok"), 1L).otherwise(0L)).as("gated"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept")).head()
    println(s"caught=${c.getLong(0)} gated=${c.getLong(1)} kept=${c.getLong(2)}")
    assert(c.getLong(0) == copies, s"caught ${c.getLong(0)} != $copies")
    assert(c.getLong(1) == blocked, s"gated ${c.getLong(1)} != $blocked")
    assert(c.getLong(2) == fresh, s"kept ${c.getLong(2)} != $fresh")
    println("plant asserts OK")
    spark.stop()
  }
}
