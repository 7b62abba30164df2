package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` tier of the custom-aggregation surface (the other
  * two are the native `TypedImperativeAggregate` [[MinHashAgg]] and the
  * codegen `Expression`s): per-group top-k values with a bounded buffer.
  *
  * Scale rationale: the window formulation (`row_number over (partition
  * by g order by v desc) <= k`) sorts EVERY group member through the
  * shuffle; this aggregator carries at most k doubles per (group ×
  * partition) and merges map-side — the per-group analog of
  * `TakeOrderedAndProject`. Output is the descending top-k multiset,
  * which is deterministic under ties (which tied ROW wins is undefined,
  * but the value multiset is not).
  */
class TopKDoubles(k: Int)
    extends Aggregator[java.lang.Double, Seq[Double], Seq[Double]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Double] = Seq.empty

  private def insert(buf: Seq[Double], v: Double): Seq[Double] =
    if (buf.length < k) (v +: buf).sorted // ascending; head = current min
    else if (v > buf.head) (v +: buf.tail).sorted
    else buf

  // Boxed input so NULLs decode instead of failing the encoder; they are
  // SKIPPED, matching built-in aggregates (and the oracle's array_agg
  // over non-null values) on nullable file-source columns.
  override def reduce(buf: Seq[Double], v: java.lang.Double): Seq[Double] =
    if (v == null) buf else insert(buf, v.doubleValue())

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Double]): Seq[Double] =
    buf.sorted(Ordering[Double].reverse)

  override def bufferEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object TopKAgg {

  /** Column form: `top_k_values(col, k)` for use in `agg(...)`. */
  def top_k_values(c: Column, k: Int): Column =
    udaf(new TopKDoubles(k), Encoders.DOUBLE).apply(c)
}
