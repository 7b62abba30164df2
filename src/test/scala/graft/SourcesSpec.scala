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
    val back = Tables.orc(spark, dir, Some(df.schema))
    assert(shape(back.schema) == shape(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // Predicate pushdown reaches the ORC scan too.
    val plan = back.filter(col("id") > 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"), plan)
    // Footer-schema path (no explicit schema) reads the same shape.
    assert(shape(Tables.orc(spark, dir).schema) == shape(df.schema))
  }

  test("JSON-lines roundtrip with explicit schema preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    df.write.mode("overwrite").json(dir)
    val back = Tables.jsonl(spark, dir, df.schema)
    assert(back.select("id", "tag", "v").orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // Clean lines carry a null corrupt-record column. (Spark disallows
    // plans whose referenced columns are ONLY the corrupt column —
    // QUERY_ONLY_CORRUPT_RECORD_COLUMN — so reference a data column too.)
    assert(back.select("id", "_corrupt_record").collect()
      .forall(_.isNullAt(1)))
  }

  test("JSONL malformed lines surface as corrupt-record rows, not failures") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_bad")
    java.nio.file.Files.writeString(dir.resolve("a.jsonl"),
      """{"id": 1, "tag": "a", "v": 1.5}
        |not json at all
        |{"id": 2, "tag": "b", "v": 2.5}
        |""".stripMargin)
    val back = Tables.jsonl(spark, dir.toString, df.schema)
      .select("id", "_corrupt_record").collect()
    assert(back.count(_.isNullAt(1)) == 2)
    val bad = back.filter(!_.isNullAt(1))
    assert(bad.length == 1)
    assert(bad.head.getString(1).contains("not json"))
  }

  test("XML roundtrip (native Spark 4 source) with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("xml").toString
    df.write.format("xml").option("rootTag", "rows").option("rowTag", "row")
      .mode("overwrite").save(dir)
    val back = Tables.xml(spark, dir, rowTag = "row", Some(df.schema))
    assert(shape(back.schema) == shape(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // Inference path reads the same row count.
    assert(Tables.xml(spark, dir, rowTag = "row").count() == df.count())
  }

  test("CSV reader enforces its explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Tables.csv(spark, dir, df.schema)
    assert(shape(back.schema) == shape(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }
}
