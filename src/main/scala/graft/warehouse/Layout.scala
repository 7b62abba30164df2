package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout control for multi-dimensional pruning: Z-ORDER
  * (Morton-curve) clustering, the technique lakehouse table formats use
  * so that range predicates on EITHER of two columns skip most files.
  *
  * A layout sorted by `a` alone prunes `a`-predicates perfectly and
  * `b`-predicates not at all — every file spans the full `b` range. The
  * z-value interleaves the bits of rank-quantized `a` and `b`, so
  * curve-contiguous files are small rectangles in (a, b) space and
  * parquet min/max stats on BOTH columns become selective. At 100 TB
  * this is the difference between scanning one dimension's worth of
  * files and scanning everything when the query filters on the
  * non-leading column.
  *
  * Everything is closed-form column expressions (codegen'd bit mixes —
  * no UDF); the only coordination is a 1-row min/max aggregate for the
  * quantizers and one range repartition by z-value (the same shuffle
  * any global sort pays).
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (Morton
    * "part1by1", the standard magic-number sequence) — a pure
    * shift/mask expression chain, whole-stage-codegen friendly.
    */
  private def spreadBits(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton z-value of two 16-bit quantized coordinates. */
  def zValue(a16: Column, b16: Column): Column =
    spreadBits(a16).bitwiseOR(shiftleft(spreadBits(b16), 1))

  /** Linear 16-bit quantizer over [lo, hi] — monotonic, so per-file
    * min/max of the RAW column stays tight when rows are z-clustered.
    */
  def quantize16(x: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, Double.MinPositiveValue)
    least(greatest(
      ((x.cast("double") - lit(lo)) / lit(span) * lit(65535.0))
        .cast("long"), lit(0L)), lit(65535L))
  }

  /** Write `df` z-ordered by (a, b) into `numFiles` files: quantize
    * both columns against their actual min/max (one 1-row aggregate),
    * range-repartition by z-value (curve-contiguous files), sort within
    * partitions by z. Readers filtering on `a`, `b`, or both then skip
    * files/row-groups via parquet min/max stats on the raw columns.
    */
  def zOrderWrite(df: DataFrame, a: Column, b: Column, path: String,
                  numFiles: Int): Unit = {
    val r = df.agg(min(a).cast("double"), max(a).cast("double"),
      min(b).cast("double"), max(b).cast("double")).head()
    val z = zValue(quantize16(a, r.getDouble(0), r.getDouble(1)),
      quantize16(b, r.getDouble(2), r.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The comparison baseline: the same data linearly sorted by `a`
    * alone (perfect for `a` predicates, blind for `b` predicates).
    */
  def linearOrderWrite(df: DataFrame, a: Column, path: String,
                       numFiles: Int): Unit =
    df.repartitionByRange(numFiles, a)
      .sortWithinPartitions(a)
      .write.mode("overwrite").parquet(path)
}
