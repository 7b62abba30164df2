package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object QStage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"QSTAGE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val raw = li.select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
    t("scan")(li.count())
    t("distinct")(raw.distinct().count())
    val frequent = raw.distinct().groupBy("i").agg(count(lit(1)).as("support")).filter(col("support") >= 3)
    t("frequent")(frequent.count())
    val pf = raw.join(broadcast(frequent.select("i")), Seq("i"), "left_semi")
    t("semi")(pf.count())
    val pruned = pf.groupBy("b").agg(sort_array(collect_set(col("i"))).as("arr"))
    t("sets")(pruned.count())
    val pairs = pruned.select(explode(expr(
      "flatten(transform(arr, (x, ix) -> transform(slice(arr, ix + 2, size(arr)), y -> struct(x AS i1, y AS i2))))")).as("p"))
    t("pairs")(pairs.count())
    t("full")(pairs.select("p.i1","p.i2").groupBy("i1","i2").agg(count(lit(1)).as("n")).orderBy(desc("n"),col("i1"),col("i2")).limit(50).count())
  }
}
