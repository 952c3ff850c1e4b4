package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the `row_number() OVER (PARTITION BY ...
  * ORDER BY ...) <= k` filter-over-window idiom into the TopKPerKey
  * operator.
  *
  * The window formulation fully sorts every partition by (key, order)
  * and buffers it before the filter discards all but k rows per key;
  * Spark 4's own InferWindowGroupLimit inserts a group-limit above the
  * sort but still pays the sort. TopKPerKey keeps bounded k-row heaps
  * per key instead — O(n log k) scan, no sort (see TopKPerKey.scala).
  * This rule makes the optimization automatic for declarative user
  * queries, completing the extension ladder: codegen'd expressions →
  * planner strategy → optimizer rewrite, all injected via
  * GraftExtensions.
  *
  * Conservative preconditions: exactly one window expression and it is
  * row_number with the default running frame, a deterministic order,
  * and a filter of the bare shape `rn <= lit` /
  * `rn < lit` / `lit >= rn` / `lit > rn` whose only reference is the
  * row-number attribute. An EMPTY partition spec (global top-k-with-
  * rank) is also claimed: TopKStrategy plans it as a per-partition
  * partial heap under a single-partition k·p-row final, so the full-
  * input single-partition sort the built-in window path would pay (when
  * InferWindowGroupLimit fails to fire) can never happen. The rewrite
  * reuses the alias's exprId so
  * downstream references bind unchanged; it runs in the operator-
  * optimization batch, before InferWindowGroupLimit can claim the plan.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** (rnAttr, k) for filter conditions equivalent to rn <= k. */
  private def limitOf(cond: Expression): Option[(Attribute, Int)] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))    => Some((a, k))
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))           => Some((a, k - 1))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) => Some((a, k))
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)        => Some((a, k - 1))
    case _                                                              => None
  }

  private def isDefaultRowNumberFrame(frame: Expression): Boolean = frame match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case UnspecifiedFrame                                               => true
    case _                                                              => false
  }

  private def rewrite(
      cond: Expression, w: Window): Option[LogicalPlan] = w match {
    case Window(
          Seq(alias @ Alias(
            WindowExpression(RowNumber(), WindowSpecDefinition(part, order, frame)), _)),
          _, _, child, _)
        if order.nonEmpty && order.forall(_.deterministic) &&
          isDefaultRowNumberFrame(frame) =>
      limitOf(cond).collect {
        case (attr, k) if k > 0 && attr.exprId == alias.exprId =>
          val rankAttr =
            AttributeReference(alias.name, IntegerType, nullable = false)(exprId = alias.exprId)
          TopKPerKey(part, order, k, rankAttr, child)
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
    // the same idiom with a pass-through (attribute-only) projection
    // between the filter and the window
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(cond, w).map(topk => Project(projList, topk)).getOrElse(f)
  }
}
