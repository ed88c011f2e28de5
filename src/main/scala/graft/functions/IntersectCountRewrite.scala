package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule: `size(array_intersect(a, b))` over non-null bigint
  * arrays → codegen'd [[SortedIntersectCount]] over sorted-distinct
  * inputs.
  *
  * `array_intersect` materializes the deduplicated common elements
  * (hash set + result array per row) only for `size` to throw the
  * array away; the merge walk computes the same count allocation-free.
  * Semantics proof: size(array_intersect(a,b)) = |distinct(a) ∩
  * distinct(b)| = SortedIntersectCount(sort(distinct(a)),
  * sort(distinct(b))) for any element order. Guards: element type
  * bigint with containsNull=false (the merge walk reads primitive
  * longs), non-nullable inputs skipped only under legacySizeOfNull
  * (where size(null) = -1 but our cast yields null).
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def eligible(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _                          => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // guard on the MATCHED NODE's legacy flag (captured at construction
      // time), not the live SQLConf — a node built under a different
      // session setting must keep its own null semantics
      case s @ Size(ai @ ArrayIntersect(a, b), legacy)
          if eligible(a) && eligible(b) &&
            !(legacy && (a.nullable || b.nullable)) =>
        // SortArray, not ArraySort: the latter's default comparator is
        // a lambda that would re-enter analysis; SortArray is lambda-free
        Cast(
          SortedIntersectCount(
            SortArray(ArrayDistinct(a), Literal(true)),
            SortArray(ArrayDistinct(b), Literal(true))),
          IntegerType)
    }
}
