package graft.tools
import graft.ext.Dedup
import graft.sources.Tables
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sp = ToolSession.local(8)
    val docs = Tables.load(sp, "/root/testdata/sf0.1", "documents")
    docs.count() // warm scan
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  ($n rows)")
    }
    time("shingle explode+hash") {
      import org.apache.spark.sql.functions._
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .select(xxhash64(col("sh"))).count()
    }
    time("signatures (native agg)") { Dedup.minhashSignatures(docs).count() }
    time("signatures again") { Dedup.minhashSignatures(docs).count() }
    time("candidates") { Dedup.lshCandidatePairs(Dedup.minhashSignatures(docs), 8, 4).count() }
    time("full near-dup pairs") { Dedup.minhashNearDupPairs(docs).count() }
    sp.stop()
  }
}
