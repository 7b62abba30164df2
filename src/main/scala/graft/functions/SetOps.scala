package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Set-arithmetic kernel for `array<long>` columns that hold DISTINCT
  * elements (the shape `collect_set` produces — e.g. shingle-hash sets in
  * [[graft.ext.Dedup.exactJaccard]]).
  *
  * Scala top-level objects emit static forwarders, so generated code can
  * call `graft.functions.SetOps.overlap(...)` directly.
  */
object SetOps {

  /** |A ∩ B| in one pass: open-addressing hash table over the smaller
    * array, membership probes from the larger. No result-array
    * allocation — unlike `size(array_intersect(a, b))`, which builds the
    * intersection (and for Jaccard also the union) as real arrays per
    * row only to take their lengths. Null elements are SKIPPED on both
    * sides (they never match anything — `ArrayData.getLong` on a null
    * slot would silently read 0 and miscount), a deliberate divergence
    * from `array_intersect`'s null-matches-null; the intended inputs
    * (`collect_set` output) contain no nulls.
    */
  def overlap(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0
    // Power-of-two capacity ≥ 2n keeps load factor ≤ 0.5. Beyond 2^28
    // elements the ×4 would overflow Int to a negative array size — fail
    // with a message instead of a NegativeArraySizeException (a single
    // collect_set row that large is already far past sane row width).
    if (n > (1 << 28)) throw new IllegalArgumentException(
      s"set_overlap input array has $n elements; max supported is 2^28")
    val cap = java.lang.Integer.highestOneBit(math.max(2, n)) * 4
    val mask = cap - 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var i = 0
    while (i < n) {
      if (!small.isNullAt(i)) {
        val v = small.getLong(i)
        var idx = (java.lang.Long.hashCode(v) * 0x9E3779B9) & mask
        while (used(idx) && table(idx) != v) idx = (idx + 1) & mask
        table(idx) = v
        used(idx) = true
      }
      i += 1
    }
    var cnt = 0
    val m = large.numElements()
    var j = 0
    while (j < m) {
      if (!large.isNullAt(j)) {
        val v = large.getLong(j)
        var idx = (java.lang.Long.hashCode(v) * 0x9E3779B9) & mask
        var probing = true
        while (probing) {
          if (!used(idx)) probing = false
          else if (table(idx) == v) { cnt += 1; probing = false }
          else idx = (idx + 1) & mask
        }
      }
      j += 1
    }
    cnt
  }

  /** Positional agreement count over the common prefix; null slots never
    * agree (same rationale as [[overlap]] — intended inputs hold no
    * nulls).
    */
  def agree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        cnt += 1
      i += 1
    }
    cnt
  }
}

/** Distinct-common-element count of two `array<long>` set columns —
  * codegen'd as a single static call, so it stays inside whole-stage
  * codegen (collection expressions like `array_intersect` do too, but
  * allocate their result arrays; this never allocates per row beyond the
  * probe table).
  */
case class LongSetOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "set_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOps.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetOps.overlap($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two `array<long>` columns agree (common
  * prefix of unequal-length inputs) — the MinHash signature-agreement
  * kernel: `est_jaccard = agree_count(sig_a, sig_b) / k`. The built-in
  * route (`zip_with` + `aggregate`) is interpreted and allocates the
  * zipped array per row; on the LSH candidate-pair join it is the inner
  * loop over every colliding pair. This stays inside whole-stage codegen
  * with zero allocation.
  */
case class LongAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "agree_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOps.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetOps.agree($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {
  /** Column API for [[LongSetOverlap]]. */
  def set_overlap(a: Column, b: Column): Column =
    GraftColumn(LongSetOverlap(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** Column API for [[LongAgreeCount]]. */
  def agree_count(a: Column, b: Column): Column =
    GraftColumn(LongAgreeCount(GraftColumn.expr(a), GraftColumn.expr(b)))
}
