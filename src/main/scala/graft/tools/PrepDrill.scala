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

    spark.stop()
  }
}
