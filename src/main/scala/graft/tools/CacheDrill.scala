package graft.tools

import org.apache.spark.sql.functions._

/** IndexCache serving diagnostic (`runMain graft.tools.CacheDrill
  * [standingDocs] [triggers] [cache|nocache]`, default 2M / 4 /
  * cache): drives repeated [[graft.ext.Dedup.minhashNovelAgainstIndex]]
  * probes (the ScreenDrill hot path) against a standing MinHash index
  * and prints, per trigger, the evidence that tells WHERE the at-rest
  * index was served from:
  *
  *   - device read bytes (/proc/self/io) — parquet re-scans hit this
  *     once the page cache is dropped;
  *   - the block manager's cached-RDD inventory (name, memSize,
  *     partition counts) — a WORKING cache shows the per-partition
  *     index mirrors materialized after trigger 0 and stable after;
  *   - whether the trigger's executed plan contains an
  *     InMemoryTableScan over the index tables at all.
  *
  * Built for the round-16 dropcache A/B anomaly: equal per-trigger
  * device reads with the cache ON and OFF mean the persisted mirrors
  * are not serving the probe plan — this drill decides between
  * "cache disabled in the streaming clone", "persist never
  * materializes", and "plan misses the InMemoryRelation".
  * Not part of the driver contract.
  */
object CacheDrill {
  def main(args: Array[String]): Unit = {
    val standingN = if (args.length > 0) args(0).toLong else 2000000L
    val triggers = if (args.length > 1) args(1).toInt else 4
    val useCache = args.length <= 2 || args(2) == "cache"
    val dropCache = true
    def dropPageCache(): Unit = if (dropCache) {
      val rc = new ProcessBuilder("sh", "-c",
        "sync; echo 3 > /proc/sys/vm/drop_caches").start().waitFor()
      if (rc != 0) println(s"[drill] drop_caches failed rc=$rc")
    }
    def ioRead(): Long = ToolSession.ioBytes("read_bytes")

    val spark = ToolSession.local(32)
    if (useCache) spark.conf.set("spark.graft.indexCache", "true")
    import spark.implicits._

    def tokens(seed: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(29)),
        i => concat(lit("drilltokenword"),
          pmod(xxhash64(seed * 31 + i), lit(50000)))))
    val standing = spark.range(standingN)
      .select(col("id").as("doc_id"), tokens(col("id")).as("text"))
      .localCheckpoint()
    val tmp = java.nio.file.Files
      .createTempDirectory("cache-drill").toString
    val idx = s"$tmp/idx"
    val t0 = System.nanoTime()
    graft.ext.Dedup.buildMinhashIndex(standing, idx)
    println(f"index build ($standingN%d docs): ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def storageReport(tag: String): Unit = {
      val sc = spark.sparkContext
      val infos = sc.getRDDStorageInfo
      if (infos.isEmpty) println(s"[$tag] cached RDDs: NONE")
      else infos.sortBy(_.id).foreach { i =>
        println(f"[$tag] rdd ${i.id}%d '${Option(i.name).getOrElse("")}' " +
          f"parts=${i.numCachedPartitions}%d/${i.numPartitions}%d " +
          f"mem=${i.memSize / 1e6}%.1f MB disk=${i.diskSize / 1e6}%.1f MB")
      }
    }

    (0 until triggers).foreach { trig =>
      val base = standingN * 10L + trig.toLong * 1000L
      // 10% planted copies of standing docs, rest fresh — same shape as
      // ScreenDrill's novelty probe.
      val batch = spark.range(base, base + 1000L).select(
          col("id").as("doc_id"),
          when(col("id") % 10 === 0,
            tokens(pmod(col("id"), lit(standingN))))
          .otherwise(tokens(col("id") + 7777777L)).as("text"))
        .localCheckpoint()
      dropPageCache()
      val r0 = ioRead()
      val w0 = System.nanoTime()
      val out = graft.ext.Dedup.minhashNovelAgainstIndex(batch, idx)
      val caught = out.filter(!col("is_novel")).count()
      val wall = (System.nanoTime() - w0) / 1e9
      val readGb = (ioRead() - r0) / 1e9
      println(f"trigger $trig%d: $wall%6.2f s (read $readGb%6.2f GB) caught=$caught%d")
      // The streaming composite's OTHER per-trigger index touch: fold
      // the novel docs in (ScreenDrill's shape). Separate read/wall
      // attribution — if the fold, not the screen, carries a
      // table-sized device read, it shows here and only here.
      val rf = ioRead()
      val wf = System.nanoTime()
      val novel = batch.join(out.filter(col("is_novel")).select("doc_id"),
        Seq("doc_id"))
      graft.ext.Dedup.appendMinhashIndex(novel, idx, ingestId = trig + 1L)
      println(f"  fold  $trig%d: ${(System.nanoTime() - wf) / 1e9}%6.2f s " +
        f"(read ${(ioRead() - rf) / 1e9}%6.2f GB)")
      storageReport(s"after-trigger-$trig")
      // Plan evidence: is the probe served from the mirror at all? The
      // RDD-based mirror (the recache-thrash fix) is CacheManager-
      // invisible BY DESIGN, so a working cache shows a rewrapped
      // "Scan ExistingRDD" node (never an InMemoryTableScan — that
      // node class cannot come from the mirror, so it is NOT accepted
      // as a served signal) whose backing RDD is a named
      // graft-index-mirror block. The signal is the scan node's OWN
      // rdd.name — not "any ExistingRDD in the plan AND any mirror
      // resident anywhere in the context", which would read a parquet
      // re-scan as served whenever an unrelated index's mirror
      // happened to be cached.
      def mirrorScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => mirrorScan(a.executedPlan)
          case r: org.apache.spark.sql.execution.RDDScanExec =>
            Option(r.rdd.name).exists(_.startsWith("graft-index-mirror"))
          case other => other.children.exists(mirrorScan)
        }
      val served = mirrorScan(out.queryExecution.executedPlan)
      println(s"[after-trigger-$trig] probe plan served from index mirror: $served")
    }
    spark.stop()
  }
}
