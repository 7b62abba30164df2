package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{Quantization, Similarity}

/** PQ scale drill: builds both persisted vector indexes — raw IVF
  * (embeddings at rest) and PQ (codes at rest) — over a synthetic
  * 2M × 64-dim corpus, and MEASURES the two claims the operator docs
  * make (`runMain graft.tools.PqDrill [vectors]`): the at-rest size
  * ratio (claimed ~16× before bit-packing: 64 float dims → 4 ints) and
  * the repeated-query cost of pruned ADC vs pruned raw-vector scoring.
  * Also asserts the indexed ADC rows equal the in-frame IVF×PQ
  * composition (the QuantizationSpec equality, at volume). Not part of
  * the driver contract; numbers recorded in SCALE.md.
  */
object PqDrill {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 2000000L
    val dim = 64
    val spark = ToolSession.local(32)
    val emb = spark.range(rows).select(
        col("id").as("vec_id"),
        (col("id") % 5).cast("int").as("label"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => ((pmod(xxhash64(col("id") * 131 + i), lit(2000000)) -
            1000000L) / 1000000.0).cast("float")).as("embedding"))
      .localCheckpoint()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def dirBytes(p: String): Long = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }

    val ivfPath = java.nio.file.Files.createTempDirectory("pq-drill-ivf")
      .toString + "/idx"
    val pqPath = java.nio.file.Files.createTempDirectory("pq-drill-pq")
      .toString + "/idx"
    val books = time("pqTrain (m=4, k=16, 3 rounds)") {
      Quantization.pqTrain(emb, m = 4, k = 16, iters = 3, dim = dim)
    }
    time("build raw IVF index (embeddings at rest)") {
      Similarity.buildIvfIndex(emb, ivfPath, nlist = 64, dim = dim)
    }
    time("build PQ index (codes at rest)") {
      Quantization.buildPqIndex(emb, pqPath, books, dim = dim, nlist = 64)
    }
    val rawB = dirBytes(ivfPath)
    val pqB = dirBytes(pqPath)
    println(f"at rest: raw ${rawB / 1e6}%.0f MB, pq ${pqB / 1e6}%.0f MB, ratio ${rawB.toDouble / pqB}%.1f x")

    val (qv, qn) = Similarity.lookupVec(spark, ivfPath, 42L)
    val raw = time("indexed raw top-10 (pruned, warm 2nd)") {
      Similarity.annTopKIndexed(spark, ivfPath, qv, qn, k = 10,
        nprobe = 4).collect()
      Similarity.annTopKIndexed(spark, ivfPath, qv, qn, k = 10,
        nprobe = 4).collect()
    }
    val adc = time("indexed ADC top-10 (pruned, warm 2nd)") {
      Quantization.pqTopKIndexed(spark, pqPath, qv, k = 10, nprobe = 4)
        .collect()
      Quantization.pqTopKIndexed(spark, pqPath, qv, k = 10, nprobe = 4)
        .collect()
    }
    assert(raw.length == 10 && adc.length == 10)
    val inframe = time("in-frame IVF x PQ (full corpus re-encode)") {
      Quantization.pqTopKIvf(emb, books, queryId = 42L, k = 10, dim = dim,
        nlist = 64, nprobe = 4).collect()
    }
    assert(adc.toSeq == inframe.toSeq,
      "indexed ADC must equal the in-frame composition at volume")
    spark.stop()
  }
}
