package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: `|distinct(a) ∩ distinct(b)|` for two
  * UNSORTED ARRAY<BIGINT> columns — `size(array_intersect(a, b))`
  * without materializing the intersect array the `size` immediately
  * discards.
  *
  * Unlike [[SortedArrayIntersectSize]] (the faster form when inputs are
  * pre-sorted), this expression carries the built-in's FULL semantics:
  * duplicate elements count once, and a null element present in BOTH
  * arrays counts once (array_intersect's null-matching rule) — so the
  * optimizer may substitute it for the bare built-in with no sortedness
  * or null-freeness precondition. A null ARRAY on either side yields
  * null (BinaryExpression null-safe contract), matching
  * `size(array_intersect)` under ANSI (non-legacy) semantics.
  *
  * The hot loop lives in [[ArrayIntersectSizeImpl]]: one primitive
  * open-addressing table (longs + byte states, linear probing, build
  * from the smaller side) — no boxing, no per-element allocation, one
  * branch-predictable probe pass. Codegen emits a single static-style
  * call so the loop JITs once, independent of the enclosing
  * whole-stage-codegen compilation.
  */
case class ArrayIntersectCountDistinct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayIntersectSizeImpl.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayIntersectSizeImpl.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectCountDistinct =
    copy(left = newLeft, right = newRight)
}

/** Hot loop for [[ArrayIntersectCountDistinct]] — a standalone object so
  * scalac emits a static forwarder the generated Java can call directly.
  */
object ArrayIntersectSizeImpl {

  private final val Empty: Byte = 0
  private final val Used: Byte = 1
  private final val Matched: Byte = 2

  /** `|distinct(a) ∩ distinct(b)|`, null elements matching each other
    * once (array_intersect semantics). */
  def count(aIn: ArrayData, bIn: ArrayData): Int = {
    // build the table from the smaller side, probe with the larger
    val (a, b) =
      if (aIn.numElements() <= bIn.numElements()) (aIn, bIn) else (bIn, aIn)
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0
    var cap = 4
    while (cap < na * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Long](cap)
    val state = new Array[Byte](cap)
    var aHasNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else {
        val v = a.getLong(i)
        var p = mix(v) & mask
        var done = false
        while (!done) {
          if (state(p) == Empty) { state(p) = Used; table(p) = v; done = true }
          else if (table(p) == v) done = true // duplicate in build side
          else p = (p + 1) & mask
        }
      }
      i += 1
    }
    var cnt = 0
    var bHasNull = false
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) bHasNull = true
      else {
        val v = b.getLong(j)
        var p = mix(v) & mask
        var done = false
        while (!done) {
          if (state(p) == Empty) done = true // not in build side
          else if (table(p) == v) {
            if (state(p) == Used) { state(p) = Matched; cnt += 1 }
            done = true // duplicates in probe side count once
          } else p = (p + 1) & mask
        }
      }
      j += 1
    }
    if (aHasNull && bHasNull) cnt + 1 else cnt
  }

  /** Fibonacci-style finalizer: spreads consecutive longs across the
    * table (shingle hashes and ids are often near-sequential). */
  private def mix(v: Long): Int = {
    val h = v * 0x9E3779B97F4A7C15L
    (h >>> 33).toInt & Int.MaxValue
  }
}
