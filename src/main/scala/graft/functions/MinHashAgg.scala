package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash sketch as a native aggregate: input is a pre-hashed shingle
  * (int64), the buffer is the running per-function minima, and the result
  * is the `numHashes`-long signature array.
  *
  * Why an aggregate and not `k` separate `min(hash)` columns: one mutable
  * buffer per group replaces `k` aggregate expressions (constant-size
  * codegen regardless of `k` — `k = 128` costs the same plan as `k = 32`),
  * and merge is elementwise min, so partial aggregation happens map-side
  * and the shuffle carries exactly one sketch per (group, partition).
  * The hash family is XXH64 re-seeded per function index — deterministic
  * on every executor.
  */
case class MinHashSketch(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h0 = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val hi = XXH64.hashLong(h0, i.toLong)
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): MinHashSketch =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MinHashSketch =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar twin of [[MinHashSketch]]: the signature computed from an
  * already-collected `array<long>` shingle-hash SET column. Identical
  * hash family (XXH64 re-seeded per function index) and identical result
  * — MIN over a multiset equals MIN over its distinct set — so a plan
  * can aggregate `collect_set(h)` ONCE and derive the banding signature
  * as a projection, instead of running two aggregate functions that
  * column pruning would split into two separate scans (the
  * [[graft.ext.Dedup.lshVerifiedJaccardPairs]] one-scan guarantee
  * depends on this). Codegen'd as one static call.
  */
case class MinHashOfSet(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_of_set"

  override def nullSafeEval(a: Any): Any =
    MinHashAgg.ofSet(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashAgg.ofSet($c, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinHashAgg {
  /** Aggregate a pre-hashed (int64) shingle column into a MinHash
    * signature array.
    */
  def minhash_sketch(hashedShingle: Column, numHashes: Int): Column =
    GraftColumn(MinHashSketch(GraftColumn.expr(hashedShingle), numHashes)
      .toAggregateExpression())

  /** Column API for [[MinHashOfSet]]. */
  def minhash_of_set(shingleSet: Column, numHashes: Int): Column =
    GraftColumn(MinHashOfSet(GraftColumn.expr(shingleSet), numHashes))

  /** Static kernel for [[MinHashOfSet]] (codegen calls this forwarder).
    * Null slots are skipped — intended inputs (`collect_set` output)
    * contain none.
    */
  def ofSet(a: ArrayData, numHashes: Int): ArrayData = {
    val buf = Array.fill(numHashes)(Long.MaxValue)
    val n = a.numElements()
    var j = 0
    while (j < n) {
      if (!a.isNullAt(j)) {
        val h0 = a.getLong(j)
        var i = 0
        while (i < numHashes) {
          val hi = XXH64.hashLong(h0, i.toLong)
          if (hi < buf(i)) buf(i) = hi
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(buf)
  }
}
