package graft.tools

import graft.SparkEntry

/** Executes selected queries and prints the FINAL (post-AQE) physical
  * plan, where runtime exchange reuse and join re-planning are visible —
  * `ExplainDump` shows only the initial plan. Not part of the contract.
  */
object ExecPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = ToolSession.local(4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.collect() // collect (not count) so THIS QueryExecution runs
        println(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
