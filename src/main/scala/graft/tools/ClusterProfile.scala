package graft.tools
import org.apache.spark.sql.SparkSession
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("dedup_clusters")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      println(s"run $i: ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
