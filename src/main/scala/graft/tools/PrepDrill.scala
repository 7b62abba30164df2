package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.CorpusPrep

/** A/B drill for [[graft.ext.CorpusPrep.prepare]]'s shingle-stream
  * sharing (`runMain graft.tools.PrepDrill [docs]`, default 200k):
  * re-scan (each consumer re-runs the compiled hashedShingles pass) vs
  * share (one pass `localCheckpoint`ed, fed to both the near-dup
  * clustering and the contamination screen). Runs each form twice —
  * cold then warm — on the sf0.1 documents table and on a DedupDrill-
  * style synthetic corpus, asserts identical `kept` results, and prints
  * the table SCALE.md records. Not part of the driver contract.
  */
object PrepDrill {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = ToolSession.local(32)

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-40s $s%8.2f s  ($n rows)")
      n
    }

    def ab(tag: String, docs: org.apache.spark.sql.DataFrame,
           eval: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { pass =>
        val lbl = if (pass == 1) "cold" else "warm"
        val kr = time(s"$tag rescan  ($lbl)") {
          CorpusPrep.prepare(docs, eval, shareShingles = false)
            .filter(col("kept")).count()
        }
        val ks = time(s"$tag share   ($lbl)") {
          CorpusPrep.prepare(docs, eval, shareShingles = true)
            .filter(col("kept")).count()
        }
        assert(kr == ks, s"share changed results: $kr != $ks")
      }
    }

    val sf = "/root/testdata/sf0.1"
    val docs01 = graft.sources.Tables.load(spark, sf, "documents")
    val eval01 = docs01.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id") + 1000000L as "doc_id", col("text"))
    ab("sf0.1 documents", docs01, eval01)

    // DedupDrill-style synthetic corpus: 5% exact dups, deterministic.
    val big = spark.range(rows).select(
        col("id").as("doc_id"),
        when(col("id") % 20 === 7, col("id") - 7).otherwise(col("id"))
          .as("seed"))
      .select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(29)),
          i => concat(lit("tok"),
            pmod(xxhash64(col("seed") * 31 + i), lit(5000)))))
          .as("text"))
      .localCheckpoint()
    val evalBig = big.filter(col("doc_id") % 1000 === 3)
      .select(col("doc_id") + 10000000L as "doc_id", col("text"))
      .localCheckpoint()
    ab(s"synthetic ${rows / 1000}k docs", big, evalBig)

    // Full-composite (v2) drill at the same synthetic scale: all four
    // screens on — blocklist (planted: every 500th doc carries a
    // blocked token), containment edges (planted: every 200th doc is a
    // 12-token span quoted from its successor's 30), semantic outliers
    // (synthetic 64-dim embeddings; every 1000th is garbage far from
    // its cell) — asserting the staged plants actually land in the
    // report, plus wall time for SCALE.md.
    val planted = spark.range(rows).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          when(col("id") % 200 === 1,
            concat_ws(" ", transform(sequence(lit(10), lit(21)),
              i => concat(lit("tok"),
                pmod(xxhash64((col("id") + 1) * 31 + i), lit(5000))))))
          .otherwise(concat_ws(" ", transform(sequence(lit(0), lit(29)),
            i => concat(lit("tok"),
              pmod(xxhash64(col("id") * 31 + i), lit(5000)))))),
          when(col("id") % 500 === 4, lit("badtok")).otherwise(lit("")))
          .as("text"))
      .localCheckpoint()
    // One tight 64-dim cloud along e0; every 1000th vector keeps the
    // alignment but carries 300× the noise — low cosine to ANY centroid
    // of the cloud (mutually dissimilar, so the garbage can't claim a
    // stable centroid of its own the way an identical-garbage plant
    // would, which is the σ=0-never-flags trap).
    val mkEmb = udf((id: Long) => {
      val r = new scala.util.Random(id)
      val noise = if (id % 1000 == 5) 3f else 0.01f
      Array.tabulate(64)(j => (if (j == 0) 10f else 0f) +
        (r.nextFloat() * 2 - 1) * noise)
    })
    val emb = spark.range(rows).select(col("id").as("vec_id"),
        lit(0).as("label"), mkEmb(col("id")).as("embedding"))
      .localCheckpoint()
    val screenFlags = graft.ext.Similarity
      .semanticOutliers(emb, k = 8, iters = 4, z = 2.0).count()
    val t0 = System.nanoTime()
    val prepared = CorpusPrep.prepare(planted, evalBig,
        blocklist = Seq("badtok"), containmentThreshold = Some(0.5),
        embeddings = Some(emb))
      .localCheckpoint()
    val rep = CorpusPrep.report(prepared).head()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"v2 composite over $rows%d docs: $sec%.1f s; report: " +
      rep.schema.fieldNames.zip(rep.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(", ") +
      s"; standalone outlier screen flagged $screenFlags")
    assert(rep.getAs[Long]("blocked") >= rows / 500 - 1, "plants missing")
    // composite == screen: whatever the z-cut flags lands in the audit
    assert(screenFlags > 0 &&
      rep.getAs[Long]("outliers") == screenFlags, rep.toString)
    // the containment plants widen the cluster graph: each quoted span
    // clusters with its container (one non-survivor per planted pair)
    assert(rep.getAs[Long]("near_dups") >= rows / 200 - 2, rep.toString)

    spark.stop()
  }
}
