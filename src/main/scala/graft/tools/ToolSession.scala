package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared local-session builder and host-telemetry readers for the dev
  * tools (NOT the driver contract mains, which own their
  * configuration). The /proc readers are the r16 I/O-counter
  * convention — one implementation so a parsing fix lands once.
  */
private[tools] object ToolSession {
  /** /proc/self/io counter (e.g. "read_bytes", "write_bytes") — actual
    * device I/O, not page-cache hits; -1 when unreadable.
    */
  def ioBytes(field: String): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/self/io")
      try src.getLines()
        .collectFirst { case l if l.startsWith(s"$field:") =>
          l.split("\\s+")(1).toLong }
        .getOrElse(-1L)
      finally src.close()
    } catch { case _: Throwable => -1L }

  /** Host-wide (iowait, steal) jiffies from /proc/stat's aggregate cpu
    * line — the writeback-stall and hypervisor-contention signals the
    * drills delta around each measured phase; (-1, -1) when unreadable.
    */
  def statJiffies: (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")).filter(_.length > 8)
        .map(f => (f(5).toLong, f(8).toLong)).getOrElse((-1L, -1L))
      finally src.close()
    } catch { case _: Throwable => (-1L, -1L) }

  /** The drill corpus token generator (ScreenDrill/PrepBackfillDrill
    * convention): n "drilltokenwordNNNNN" tokens from a 50k vocab —
    * long alpha tags keep every doc above the 0.6 alpha-ratio quality
    * boundary even with 5-digit suffixes.
    */
  def drillTokens(seed: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    concat_ws(" ", transform(sequence(lit(0), lit(n - 1)),
      i => concat(lit("drilltokenword"),
        pmod(xxhash64(seed * 31 + i), lit(50000)))))
  }

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
