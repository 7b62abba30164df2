package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the driver-side metadata memos ([[IndexStamp
  * .cachedParamsHead]] / [[IndexStamp.schemaMemoRead]]): both cache
  * index CONFIGURATION (a 1-row params Row; an inferred StructType) and
  * are validated by the directory's own FS metadata listing, so a
  * rebuild under the same path must always be observed — a stale row or
  * schema can never be served. In package graft.ext because the memos
  * are private[ext] by design (only the index readers go through them).
  */
class IndexStampMemoSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("cachedParamsHead: hit serves the row jobless-ly; rewrite invalidates") {
    val dir = java.nio.file.Files
      .createTempDirectory("params-memo").toString + "/params"
    Seq((3, 20)).toDF("n", "df_cap").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val r1 = IndexStamp.cachedParamsHead(spark, dir)
    assert(r1.getAs[Int]("n") == 3 && r1.getAs[Int]("df_cap") == 20)
    // Hit path: same listing → same row (no staleness possible yet).
    assert(IndexStamp.cachedParamsHead(spark, dir).getAs[Int]("n") == 3)
    // A rebuild rewrites the part files (fresh names/lengths/mtimes) —
    // the memo must observe it and serve the NEW configuration.
    Seq((7, 5)).toDF("n", "df_cap").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val r2 = IndexStamp.cachedParamsHead(spark, dir)
    assert(r2.getAs[Int]("n") == 7 && r2.getAs[Int]("df_cap") == 5)
    // Missing dir falls through to the canonical read error.
    intercept[org.apache.spark.sql.AnalysisException] {
      IndexStamp.cachedParamsHead(spark, dir + "-nonexistent")
    }
  }

  test("schemaMemoRead: hit reads identical data; a rewrite with a new schema re-infers") {
    val dir = java.nio.file.Files
      .createTempDirectory("schema-memo").toString + "/tbl"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(dir)
    val first = IndexStamp.schemaMemoRead(spark, dir)
    assert(first.schema.fieldNames.toSeq == Seq("id", "s"))
    // Hit path: explicit-schema read, same rows, same schema.
    val hit = IndexStamp.schemaMemoRead(spark, dir)
    assert(hit.schema == first.schema)
    assert(hit.orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b")))
    // Overwrite with a DIFFERENT schema: the listing changes, the memo
    // must re-infer — serving the old StructType would mis-read files.
    Seq((1L, 0.5, true)).toDF("id", "w", "flag")
      .write.mode("overwrite").parquet(dir)
    val second = IndexStamp.schemaMemoRead(spark, dir)
    assert(second.schema.fieldNames.toSeq == Seq("id", "w", "flag"))
    assert(second.head().getBoolean(2))
    // Partitioned layout (the bands/sets shape): partition column and
    // its values survive the memo's hit path.
    val pdir = java.nio.file.Files
      .createTempDirectory("schema-memo-part").toString + "/tbl"
    Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "ingest")
      .write.partitionBy("ingest").mode("overwrite").parquet(pdir)
    val p1 = IndexStamp.schemaMemoRead(spark, pdir)
    val p2 = IndexStamp.schemaMemoRead(spark, pdir) // hit
    assert(p2.schema == p1.schema)
    assert(p2.select("doc_id", "ingest").orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 0L), (2L, 0L)))
  }
}
