package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Layout

/** Z-order layout: the Morton bit math against hand values, and the
  * property the layout exists for — a predicate on the NON-leading
  * column touches far fewer files under z-order than under a linear
  * sort on the other column.
  */
class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (Morton order)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
        (65535L, 65535L))
      .toDF("a", "b")
    val z = df.select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // interleave(a,b): a in even bits, b in odd bits
    assert(z.toSeq === Seq(0L, 1L, 2L, 3L, 4L, 0xFFFFFFFFL))
  }

  test("quantize16 is monotonic and clamps to [0, 65535]") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 105.0).toDF("x")
    val q = df.select(Layout.quantize16(col("x"), 0.0, 100.0).as("q"))
      .collect().map(_.getLong(0))
    assert(q(0) === 0L && q(4) === 65535L)
    assert(q.toSeq === q.toSeq.sorted)
    assert(q(2) === 32767L)
  }

  test("z-order layout prunes files on the non-leading dimension") {
    // 100k rows over a 1000×1000 (a, b) grid, written 16 files both
    // ways. A narrow predicate on b alone: the a-sorted layout spreads
    // matches across EVERY file; z-order concentrates them.
    val df = spark.range(100000).select(
      (col("id") % 1000).as("a"),
      pmod(xxhash64(col("id")), lit(1000)).as("b"))
    val tmp = java.nio.file.Files.createTempDirectory("layout").toString
    Layout.zOrderWrite(df, col("a"), col("b"), s"$tmp/z", 16)
    Layout.linearOrderWrite(df, col("a"), s"$tmp/lin", 16)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("b").between(100, 140))
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(s"$tmp/z")
    val linFiles = filesTouched(s"$tmp/lin")
    assert(linFiles === 16L, s"linear layout should spread b-matches")
    assert(zFiles * 2 <= linFiles,
      s"z-order should halve files touched: z=$zFiles lin=$linFiles")
    // Same rows either way — layout changes placement, not content.
    val a = spark.read.parquet(s"$tmp/z")
      .filter(col("b").between(100, 140)).count()
    val b = spark.read.parquet(s"$tmp/lin")
      .filter(col("b").between(100, 140)).count()
    assert(a === b && a > 0)
  }
}
