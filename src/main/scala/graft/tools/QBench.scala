package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch runner: time a handful of SparkEntry queries by name. */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `--split` prefix: per query, separate plan derivation (analysis +
    // optimization + physical planning, forced via executedPlan) from
    // first execution (janino codegen compile + run) and a second, fresh-
    // frame execution (codegen cache warm — the steady-state cost). The
    // cold-warm delta minus the plan time is the one-time codegen tax.
    val (split, names) = args.partition(_ == "--split")
    names.foreach { name =>
      if (split.nonEmpty) {
        def sec(t0: Long) = (System.nanoTime() - t0) / 1e9
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val tP = System.nanoTime(); df.queryExecution.executedPlan
        val planS = sec(tP)
        val t1 = System.nanoTime(); val n = df.count(); val exec1 = sec(t1)
        val t2 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val exec2 = sec(t2)
        println(f"QBENCH $name rows=$n plan=$planS%.2f s exec1=$exec1%.2f s exec2=$exec2%.2f s")
      } else {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"QBENCH $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
  }
}
