package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Size, SortArray}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite
  * `size(array_intersect(sort_array(array_distinct(a)),
  * sort_array(array_distinct(b))))` over null-free ARRAY<BIGINT>
  * columns into the native two-pointer merge
  * `graft_sorted_intersect_size(sort_array(array_distinct(a)), ...)` —
  * keeping the sorts, deleting the per-row hash build AND the
  * intersect-array materialization that `size` immediately discards.
  * Semantics: `size(array_intersect(...))` counts DISTINCT common
  * elements — exactly `|distinct(a) ∩ distinct(b)|`, which the sorted
  * merge computes. Guarded to null-free element types: with null
  * elements `array_intersect` has null-matching semantics the merge
  * does not reproduce.
  *
  * WHY THE SYNTACTIC SORTED-DISTINCT GUARD (round 7, measured in
  * SCALE.md): the round-2 form rewrote BARE `size(array_intersect(a,
  * b))` by inserting the sorts itself — and the per-row
  * sort_array(array_distinct(..)) costs MORE than the hash build it
  * replaces (100k-row × 8192-element micro: rewritten 3.7 s vs 1.9 s
  * built-in vs 0.55 s pre-sorted native). The merge only wins when the
  * sort is already paid — either visible in the expression (this
  * pattern) or amortized per-document before a join, which a scalar
  * rewrite cannot see and which the engine's own q36 therefore does by
  * calling `graft_sorted_intersect_size` directly on its pre-sorted
  * shingle arrays. Firing only on the visible-sort pattern makes the
  * rewrite a strict win every time it applies.
  *
  * Injected by [[GraftExtensions]] (`injectOptimizerRule`) — the
  * SURVEY.md §4 "candidate custom piece": users write the idiomatic
  * built-ins; the engine deletes the redundant hash intersect.
  */
object NativeSetOpsRule extends Rule[LogicalPlan] {

  private def eligible(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.dataType match {
      case ArrayType(LongType, containsNull) => !containsNull && e.resolved
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(
            sa @ SortArray(ArrayDistinct(a), Literal(true, _)),
            sb @ SortArray(ArrayDistinct(b), Literal(true, _))),
          legacySizeOfNull) if eligible(a) && eligible(b) =>
        val fused = SortedArrayIntersectSize(sa, sb)
        // legacySizeOfNull=true maps size(null)→-1; the fused expression
        // is null-preserving, so wrap only under legacy semantics
        if (legacySizeOfNull) {
          org.apache.spark.sql.catalyst.expressions.Coalesce(
            Seq(fused, Literal(-1)))
        } else fused
    }
}
