package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Sampling

/** [[graft.ext.Sampling]] — exact stratified fractions, split stability
  * under corpus growth, packing boundary behavior.
  */
class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stratified sample: exactly ceil(fraction * n) per stratum") {
    val df = (0L until 100L).map(i => (i, if (i < 70) "en" else "de"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, col("lang"), col("id"), 0.1)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("en" -> 7L, "de" -> 3L))
    // Deterministic: same rows on a rerun.
    val a = Sampling.stratifiedSample(df, col("lang"), col("id"), 0.1)
      .select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.stratifiedSample(df, col("lang"), col("id"), 0.1)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(a sameElements b)
  }

  test("dataset split: assignment of a row never changes as corpus grows") {
    val small = (0L until 50L).toDF("id")
    val large = (0L until 500L).toDF("id")
    def splits(df: org.apache.spark.sql.DataFrame) =
      Sampling.datasetSplit(df, col("id")).filter(col("id") < 50)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits(small) == splits(large))
    val all = Sampling.datasetSplit(large, col("id"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 12/2/2 sixteenths ≈ 75/12.5/12.5 — loose sanity bounds.
    assert(all("train") > 300 && all("validation") > 20 && all("test") > 20)
    assert(all.values.sum == 500)
  }

  test("sharded packing equals per-shard unsharded packing") {
    val df = (0L until 200L).map(i => (i % 4, i, 300 + (i % 7).toInt * 100))
      .toDF("shard", "id", "toks")
    val sharded = Sampling.packSequencesSharded(df, col("shard"), col("id"),
        col("toks"), 2048)
      .select("shard", "id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L until 4L).foreach { s =>
      val solo = Sampling.packSequences(df.filter(col("shard") === s),
          col("id"), col("toks"), 2048)
        .select("id", "seq_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      solo.foreach { case (id, seq) => assert(sharded((s, id)) == seq) }
    }
  }

  test("packSequencesGlobal equals the single-window global packing at any bucket count") {
    // 1000 docs, irregular token counts, scrambled partitioning — the
    // distributed prefix sum must reassemble the EXACT global cumsum
    // whatever the quantile buckets look like (including more buckets
    // than rows, and the degenerate 1-bucket form).
    val df = (0L until 1000L).map(i => (i, 1 + (i * 37 % 90).toInt))
      .toDF("doc_id", "toks").repartition(13)
    val reference = Sampling.packSequences(df, col("doc_id"), col("toks"),
        maxTokens = 128)
      .select("doc_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (buckets <- Seq(1, 7, 64, 5000)) {
      val global = Sampling.packSequencesGlobal(df, col("doc_id"),
          col("toks"), maxTokens = 128, buckets = buckets)
        .select("doc_id", "seq_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(global === reference, s"buckets=$buckets diverged")
    }
    // and no single task saw the whole corpus in the windowed pass:
    // the bucketed window runs one partition per bucket id, unlike the
    // reference's single global-order task
    assert(reference.map(_._2).max > 0) // multiple sequences existed
  }

  test("pack sequences: docs fill greedily, boundary doc opens next seq") {
    val df = Seq((1L, 1000), (2L, 1000), (3L, 100), (4L, 2000), (5L, 10))
      .toDF("id", "toks")
    val out = Sampling.packSequences(df, col("id"), col("toks"), 2048)
      .select("id", "seq_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cumsum-before: 0,1000,2000,2100,4100 → seq 0,0,0,1,2
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("negativeSamples draws k distinct pool negatives, never the anchor") {
    val docs = (1L to 20L).toDF("doc_id")
    val pool = Seq(1L, 5L, 10L, 15L, 20L).toDF("doc_id")
    val out = Sampling.negativeSamples(docs, col("doc_id"),
        pool, col("doc_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every anchor gets exactly k rows, ranks 1..k
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.size === 20)
    assert(byAnchor.values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2, 3)))
    // the anchor never samples itself
    assert(out.forall { case (a, _, n) => a != n })
    // deterministic: a second run returns the identical assignment
    val again = Sampling.negativeSamples(docs, col("doc_id"),
        pool, col("doc_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq === out.toSeq)
  }

  test("writeShuffled: one pos-ordered file per shard, replaying the exact permutation") {
    val df = (0L until 400L).toDF("doc_id")
      .withColumn("payload", col("doc_id") * 2)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Sampling.writeShuffled(df, col("doc_id"), numShards = 8, dir, seed = "s")
    val expected = Sampling.shuffleShards(df, col("doc_id"), 8, seed = "s")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).sorted
    // Each shard dir holds exactly ONE parquet file whose physical row
    // order is the permutation order (pos 1..n ascending, no sort).
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 8)
    val all = shardDirs.flatMap { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
      val shard = sd.getName.stripPrefix("shard=").toInt
      val rows = spark.read.parquet(files.head.toString)
        .collect().map(r => (r.getLong(0), shard, r.getLong(2)))
      assert(rows.map(_._3).toSeq == (1L to rows.length).toSeq,
        s"${sd.getName} not in pos order")
      rows
    }
    assert(all.sorted.toSeq == expected.toSeq)
    // shardId (the row-local assignment) agrees with the written layout.
    val ids = df.select(col("doc_id"),
        Sampling.shardId(col("doc_id"), 8, seed = "s").as("shard"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    all.foreach { case (k, sh, _) => assert(ids(k) == sh) }
  }

  test("tokenBudgetPlan sizes targets, epochs, and residual rates exactly") {
    // Source a: 40 tokens (4 docs × 10); source b: 200 (2 × 100);
    // source c is NOT in the mixture and must not appear.
    val docs = (
      (1 to 4).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "a")) ++
      Seq((5L, Seq.fill(100)("w").mkString(" "), "b"),
          (6L, Seq.fill(100)("w").mkString(" "), "b"),
          (7L, "x y z", "c")))
      .toDF("doc_id", "text", "source")
    val out = Sampling.tokenBudgetPlan(docs,
        Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
         r.getDouble(5), r.getLong(6), r.getDouble(7))).toMap
    assert(out.keySet === Set("a", "b"))
    // a: target 50 of 40 tokens → 1.25 epochs = 1 full + 0.25 residual
    assert(out("a") === ((4L, 40L, 0.5, 50L, 1.25, 1L, 0.25)))
    // b: target 50 of 200 tokens → 0.25 epochs, pure downsampling
    assert(out("b") === ((2L, 200L, 0.5, 50L, 0.25, 0L, 0.25)))
  }
}
