package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of an `array<float>` column in FIXED-POINT: each
  * component is scaled by 2^scaleBits and rounded to a long before
  * accumulation. Integer addition commutes, so the aggregate is exactly
  * order- and partition-independent — the determinism contract every
  * mean in this engine follows (DECIMAL for scalars; a long vector
  * here). One mutable buffer per group with elementwise-add merge, so
  * partial aggregation happens map-side and the shuffle carries ONE
  * dim-long vector per (group × partition) — the shape that makes a
  * centroid update over 10^12 rows a narrow shuffle instead of the
  * dim× row explosion a posexplode formulation pays.
  *
  * Headroom: |component| ≤ C needs C·2^scaleBits·rows_per_group < 2^63;
  * at the default scaleBits = 24 and unit-scale embeddings that is
  * ~5·10^11 rows per group. The aggregate THROWS on addition overflow
  * (`Math.addExact`) rather than silently wrapping — raise or lower
  * scaleBits to trade precision against headroom.
  */
case class VecSumFixed(
    child: Expression,
    dim: Int,
    scaleBits: Int = 24,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(dim >= 1 && scaleBits >= 0 && scaleBits <= 40,
    s"bad vec_sum_fixed config: dim=$dim scaleBits=$scaleBits")

  private val scale = (1L << scaleBits).toDouble

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sum_fixed"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var i = 0
      while (i < n) {
        buf(i) = Math.addExact(buf(i),
          Math.round(arr.getFloat(i).toDouble * scale))
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) {
      a(i) = Math.addExact(a(i), b(i))
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(_.toDouble / scale))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): VecSumFixed =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VecSumFixed =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VecSumAgg {
  /** Deterministic fixed-point element-wise sum of an `array<float>`
    * column (result descaled to `array<double>`).
    */
  def vec_sum_fixed(embedding: Column, dim: Int,
                    scaleBits: Int = 24): Column =
    GraftColumn(VecSumFixed(GraftColumn.expr(embedding), dim, scaleBits)
      .toAggregateExpression())
}
