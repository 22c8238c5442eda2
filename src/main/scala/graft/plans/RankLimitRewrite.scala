package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

import graft.plans.GroupTopK.GroupTopKNode

/** Optimizer rule: rewrite the ubiquitous
  * {{{
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k)
  *     .drop("rn")
  * }}}
  * pattern into the bounded-heap [[GroupTopKNode]].
  *
  * The window form sort-shuffles every row of every group; the rewrite
  * caps the exchange at groups × k rows per map partition. Fires only
  * when the rank column is projected away immediately (its values are
  * otherwise observable and must then be computed), the window has a
  * single row_number expression, and the predicate is `rn <= k` /
  * `rn < k` / `rn = 1` with a foldable limit.
  */
object RankLimitRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(_: RowNumber, spec), _)),
            part, order, child, _))) =>
      val rn = al.toAttribute
      val usesRank = projList.exists(_.references.contains(rn))
      val sameSpec = spec.partitionSpec == part && spec.orderSpec == order
      limitOf(cond, rn) match {
        case Some(k) if !usesRank && sameSpec && k > 0 && order.nonEmpty =>
          Project(projList, GroupTopKNode(part, order, k, child))
        case _ => p
      }
  }
}
