package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round job profiler: runs named SparkEntry queries under
  * the Bench session config (production plans, warm codegen cache) and
  * prints every Spark JOB the warm run fires with its wall time and
  * call site — the per-query answer to "where do the seconds go" that
  * QBench's one number can't give. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.OptProbe <name> [<name> ...]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.props("graft.verify.exact") = "false"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same table warm + index warm as Bench so the probe measures
    // steady-state cost, not first-decode init.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        val df = graft.sources.Tables.load(spark, sfDir, t)
        df.select(org.apache.spark.sql.functions.hash(
            org.apache.spark.sql.functions.struct(
              df.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)))
          .count()
      } catch { case _: Throwable => () }
    }
    try graft.SparkEntry.ensureIndexes(spark, sfDir) catch { case _: Throwable => () }

    case class Job(id: Int, desc: String, start: Long, var end: Long = 0L,
                   var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        jobs.put(e.jobId, Job(e.jobId, desc, e.time,
          tasks = e.stageInfos.map(_.numTasks).sum))
        order.add(e.jobId); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time); ()
      }
    })

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // cold run (codegen) — not reported
      fn(spark, sfDir).count()
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerDrain.drain(
        spark.sparkContext, 30000L)
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
      val sumJobs = js.map(j => (j.end - j.start) / 1e3).sum
      println(f"OPTPROBE $name warm=$wall%.2f s jobs=${js.size} jobSum=$sumJobs%.2f s (gaps=${wall - sumJobs}%.2f s)")
      js.foreach { j =>
        println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s tasks=${j.tasks}%4d  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
