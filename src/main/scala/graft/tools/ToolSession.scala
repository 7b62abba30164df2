package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for the dev tools (NOT the driver
  * contract mains, which own their configuration).
  */
private[tools] object ToolSession {
  def local(cores: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // Match Bench: the default 100-entry generated-class cache
      // thrashes across multi-query tool runs (see Bench.scala).
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
