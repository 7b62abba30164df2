package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable frequency/membership sketches as native aggregates — the
  * single-pass, bounded-memory analogs of `GROUP BY` count and `IN`
  * membership for 100 TB streams where the exact forms would shuffle the
  * full key set.
  *
  * Both take a PRE-HASHED int64 item (the [[MinHashSketch]] convention:
  * hash once in a projection with `xxhash64`, feed every sketch the same
  * digest). Both buffers are flat `Array[Long]`, merge is elementwise
  * (add / OR), so partial aggregation happens map-side and the shuffle
  * carries exactly one fixed-size sketch per partition — never the items.
  * The hash family is XXH64 re-seeded per row index, deterministic on
  * every executor (no RNG — the engine determinism contract).
  */
object Sketches {

  /** Count-min point estimate: min over the depth rows. Static so
    * generated code calls it directly.
    */
  def cmsEstimate(sketch: ArrayData, item: Long, depth: Int): Long = {
    val total = sketch.numElements()
    val width = total / depth
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val idx = java.lang.Math.floorMod(XXH64.hashLong(item, d.toLong), width.toLong).toInt
      val c = sketch.getLong(d * width + idx)
      if (c < best) best = c
      d += 1
    }
    best
  }

  /** Bloom membership probe: all `numHashes` bit positions set. No false
    * negatives; false-positive rate set by bits-per-item at build time.
    */
  def bloomContains(bits: ArrayData, item: Long, numHashes: Int): Boolean = {
    val numBits = bits.numElements().toLong * 64L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(XXH64.hashLong(item, i.toLong), numBits)
      if ((bits.getLong((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Count-min sketch over a pre-hashed (int64) item column. Result is the
  * flat depth×width counter matrix as `array<long>` — probe it with
  * [[CmsPointEstimate]]. Estimates only ever OVERCOUNT (est ≥ true;
  * est ≤ true + εN with probability 1−δ for width = e/ε, depth = ln 1/δ),
  * so a heavy-hitter screen has no false negatives.
  *
  * Why not exact `GROUP BY item`: at 100 TB the token key space is
  * billions of rows shuffled; the sketch is a constant `depth*width*8`
  * bytes per partition regardless of cardinality, and the whole job is
  * one scan + one tiny all-to-one merge.
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0 && depth.toLong * width <= (1 << 26),
    s"count-min sketch $depth x $width exceeds the 64M-counter cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        val idx =
          java.lang.Math.floorMod(XXH64.hashLong(item, d.toLong), width.toLong).toInt
        buf(d * width + idx) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): CountMinSketch =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinSketch =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Point estimate from a [[CountMinSketch]] result against a pre-hashed
  * item — codegen'd as one static call so sketch probes stay inside
  * whole-stage codegen on the candidate side of a broadcast join.
  */
case class CmsPointEstimate(left: Expression, right: Expression, depth: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, item: Any): Any =
    Sketches.cmsEstimate(sketch.asInstanceOf[ArrayData],
      item.asInstanceOf[Long], depth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, i) => s"graft.functions.Sketches.cmsEstimate($s, $i, $depth)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Bloom filter over a pre-hashed (int64) item column. Result is the
  * bitset as `array<long>` (`numBits` rounded up to a multiple of 64) —
  * probe it with [[BloomMightContain]]. ~10 bits/item + 7 hashes ≈ 1%
  * false positives, zero false negatives, so it is a sound PRESCREEN: a
  * miss is definitely-new, a hit still gets exact verification.
  *
  * At 100 TB the cost model: one scan builds it, the broadcast is
  * `numBits/8` bytes (120 MB covers 100M seen digests at 1%), and the
  * expensive exact anti-join then runs only over the ~dup-rate + 1% of
  * rows that hit — instead of shuffling the entire incoming corpus.
  */
case class BloomSketch(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits <= (1L << 32) && numHashes > 0,
    s"bloom sketch numBits=$numBits numHashes=$numHashes out of range")

  private val numWords: Int = ((numBits + 63) / 64).toInt

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      val bits = numWords.toLong * 64L
      var i = 0
      while (i < numHashes) {
        val pos = java.lang.Math.floorMod(XXH64.hashLong(item, i.toLong), bits)
        buf((pos >>> 6).toInt) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): BloomSketch =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomSketch =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Membership probe against a [[BloomSketch]] result — codegen'd static
  * call; the word count (and so the bit count) rides in the array itself,
  * only the hash count is a plan-time constant.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bits: Any, item: Any): Any =
    Sketches.bloomContains(bits.asInstanceOf[ArrayData],
      item.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, i) => s"graft.functions.Sketches.bloomContains($b, $i, $numHashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchFunctions {
  /** Aggregate a pre-hashed item column into a count-min sketch. */
  def cms_sketch(hashedItem: Column, depth: Int, width: Int): Column =
    GraftColumn(CountMinSketch(GraftColumn.expr(hashedItem), depth, width)
      .toAggregateExpression())

  /** Point-estimate a pre-hashed item against a sketch column. */
  def cms_estimate(sketch: Column, hashedItem: Column, depth: Int): Column =
    GraftColumn(CmsPointEstimate(GraftColumn.expr(sketch),
      GraftColumn.expr(hashedItem), depth))

  /** Aggregate a pre-hashed item column into a bloom bitset. */
  def bloom_sketch(hashedItem: Column, numBits: Long, numHashes: Int): Column =
    GraftColumn(BloomSketch(GraftColumn.expr(hashedItem), numBits, numHashes)
      .toAggregateExpression())

  /** Probe a pre-hashed item against a bloom bitset column. */
  def bloom_contains(bits: Column, hashedItem: Column, numHashes: Int): Column =
    GraftColumn(BloomMightContain(GraftColumn.expr(bits),
      GraftColumn.expr(hashedItem), numHashes))
}
