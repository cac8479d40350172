package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Size, SortArray}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: delete the intersect-array materialization from
  * `size(array_intersect(a, b))` over ARRAY<BIGINT>. Two rewrites, both
  * measured strict wins (SCALE.md §Round-7; 100k-row × 8192-element
  * cached micro, medians of 3):
  *
  *  1. `size(array_intersect(sort_array(array_distinct(a)),
  *     sort_array(array_distinct(b))))` — the sorts are already in the
  *     expression, so fuse to the allocation-free two-pointer merge
  *     [[SortedArrayIntersectSize]] (3.58 s vs 4.85 s unfused; null-free
  *     element guard, the merge has no null-matching semantics).
  *  2. BARE `size(array_intersect(a, b))` — fuse to the hash-count
  *     [[ArrayIntersectCountDistinct]] (0.88 s vs 1.94 s built-in):
  *     same per-row hash probe the built-in pays, minus building and
  *     then discarding the intersect ARRAY. Carries array_intersect's
  *     FULL semantics (duplicates once, null matches null), so ANY
  *     element nullability is eligible.
  *
  * WHY NOT insert sorts into the bare form (the round-2 rule): per-row
  * `sort_array(array_distinct(..))` costs more than the hash build it
  * replaces (3.6 s vs 1.9 s built-in). Sorting only wins when paid once
  * per document before a join — invisible to a scalar rewrite, which is
  * why q36 calls `graft_sorted_intersect_size` directly on its
  * pre-sorted shingle arrays (0.56 s in the same micro).
  *
  * Injected by [[GraftExtensions]] (`injectOptimizerRule`) — the
  * SURVEY.md §4 "candidate custom piece": users write the idiomatic
  * built-ins; the engine deletes the redundant work.
  */
object NativeSetOpsRule extends Rule[LogicalPlan] {

  private def nullFreeLongArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.dataType match {
      case ArrayType(LongType, containsNull) => !containsNull && e.resolved
      case _ => false
    }

  private def longArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.dataType match {
      case ArrayType(LongType, _) => e.resolved
      case _ => false
    }

  /** size(null)→-1 under legacy semantics; both fused expressions are
    * null-preserving, so wrap only when asked. */
  private def legacyWrap(fused: org.apache.spark.sql.catalyst.expressions.Expression,
      legacySizeOfNull: Boolean): org.apache.spark.sql.catalyst.expressions.Expression =
    if (legacySizeOfNull) {
      org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(fused, Literal(-1)))
    } else fused

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // most specific first: visible sorts → keep them, fuse the merge
      case Size(ArrayIntersect(
            sa @ SortArray(ArrayDistinct(a), Literal(true, _)),
            sb @ SortArray(ArrayDistinct(b), Literal(true, _))),
          legacySizeOfNull) if nullFreeLongArray(a) && nullFreeLongArray(b) =>
        legacyWrap(SortedArrayIntersectSize(sa, sb), legacySizeOfNull)
      // bare built-in → hash-count with full array_intersect semantics
      case Size(ArrayIntersect(a, b), legacySizeOfNull)
          if longArray(a) && longArray(b) =>
        legacyWrap(ArrayIntersectCountDistinct(a, b), legacySizeOfNull)
    }
}
