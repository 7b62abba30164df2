package graft.tools

/** Warm-vs-cold profiler: runs each named query three times in one
  * session (`runMain graft.tools.QueryProfile <sfdir> <names…>`), so
  * first-run codegen/JIT cost separates from steady-state compute — the
  * number that predicts cluster behavior. Not part of the driver
  * contract.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q1_agg", "minhash_pairs")
    val spark = ToolSession.local(32)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(s"$n run $i: ${(System.nanoTime() - t0) / 1e9}")
      }
    }
    spark.stop()
  }
}
