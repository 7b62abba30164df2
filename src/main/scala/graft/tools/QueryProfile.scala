package graft.tools

import org.apache.spark.sql.SparkSession

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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
