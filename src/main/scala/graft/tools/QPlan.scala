package graft.tools
import org.apache.spark.sql.SparkSession
object QPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count()  // drive AQE to the final plan
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
  }
}
