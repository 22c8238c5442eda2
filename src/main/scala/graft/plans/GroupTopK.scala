package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-group top-k as a first-class operator: logical node + planner
  * strategy + physical exec, installed via `experimental.extraStrategies`
  * (or `SparkSessionExtensions.injectPlannerStrategy`).
  *
  * Why not `row_number().over(...) <= k`? The window form shuffles and
  * fully sorts EVERY row of every group before discarding all but k — at
  * 100 TB that is a full-table sort-shuffle. This operator keeps a bounded
  * heap of k rows per group on the map side (partial pass), so the
  * exchange carries at most (partitions × groups × k) rows, and the final
  * pass re-reduces after clustering. Same two-phase contract as a partial
  * aggregation, but yielding whole rows.
  */
object GroupTopK {

  /** Logical: semantics only — "the k first rows of each group under
    * `order`". Output schema is the child's, untouched.
    */
  case class GroupTopKNode(groupExprs: Seq[Expression], order: Seq[SortOrder],
      k: Int, child: LogicalPlan) extends UnaryNode {
    require(k > 0, s"k must be positive, got $k")
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKNode =
      copy(child = newChild)
  }

  /** Physical: one implementation, two roles. `partial = true` runs on
    * whatever partitioning the child has (map-side reduction);
    * `partial = false` declares ClusteredDistribution so EnsureRequirements
    * inserts the one hash exchange between the two.
    */
  case class GroupTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
      k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning = child.outputPartitioning

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      // empty group = global top-k: ClusteredDistribution rejects Nil, and
      // the final pass must see every partial's survivors in one place
      else if (groupExprs.isEmpty) AllTuples :: Nil
      else ClusteredDistribution(groupExprs) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val g = groupExprs
      val ord = order
      val kk = k
      child.execute().mapPartitions({ iter =>
        val keyGen = UnsafeProjection.create(g, childOutput)
        // heap root = worst kept row; evict it when a better row arrives
        val cmp = GenerateOrdering.generate(ord, childOutput)
        implicit val rowOrd: Ordering[InternalRow] =
          (a: InternalRow, b: InternalRow) => cmp.compare(a, b)
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        iter.foreach { row =>
          val key = keyGen(row)
          heaps.get(key) match {
            case None =>
              val h = mutable.PriorityQueue.empty[InternalRow]
              h += row.copy()
              heaps.put(key.copy(), h)
            case Some(h) =>
              if (h.size < kk) h += row.copy()
              else if (cmp.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
          }
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
      copy(child = newChild)
  }

  /** Planner: logical node → partial exec feeding final exec. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GroupTopKNode(g, o, k, child) =>
        GroupTopKExec(g, o, k, partial = false,
          GroupTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Public API: keep the k best rows per group, "best" = first under the
    * given (column, ascending) sort spec. Ties are kept arbitrarily —
    * include a unique column in the spec for deterministic output.
    */
  def topK(df: DataFrame, groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ColumnBridge.addStrategy(spark, Strategy)
    val plan = ColumnBridge.analyzed(df)
    val byName = plan.output.map(a => a.name -> a).toMap
    def attr(n: String) = byName.getOrElse(n,
      throw new IllegalArgumentException(s"column $n not in ${plan.output.map(_.name)}"))
    val order = orderSpec.map { case (n, asc) =>
      if (asc) SortOrder(attr(n), org.apache.spark.sql.catalyst.expressions.Ascending)
      else SortOrder(attr(n), org.apache.spark.sql.catalyst.expressions.Descending)
    }
    ColumnBridge.ofRows(spark, GroupTopKNode(groupCols.map(attr), order, k, plan))
  }
}
