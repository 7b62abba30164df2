package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source/sink format breadth beyond the parquet warehouse: ORC and
  * JSON-lines roundtrips through the same schemas, and the CSV reader's
  * explicit-schema contract.
  */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null, 3.5))
  private def df = rows.toDF("id", "tag", "v")

  // File sources report every column nullable — compare names and types.
  private def shape(s: org.apache.spark.sql.types.StructType) =
    s.fields.map(f => (f.name, f.dataType)).toSeq

  test("ORC roundtrip preserves rows, schema, and nulls") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(shape(back.schema) == shape(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // Predicate pushdown reaches the ORC scan too.
    val plan = back.filter(col("id") > 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"), plan)
  }

  test("JSON-lines roundtrip with explicit schema preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("CSV reader enforces its explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Tables.csv(spark, dir, df.schema)
    assert(shape(back.schema) == shape(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }
}
