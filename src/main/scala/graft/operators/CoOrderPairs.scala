package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct co-order part pairs — the shared edge relation of the j/r
  * graph-statistics family (j9 triangles, j28 rectangles, j30 local
  * bridges, j31 densest subgraph, r9 hash walks, r13 degree CCDF).
  *
  * Formulated as one per-order aggregate + in-stage pair generator
  * instead of the historical broadcast self-join: the join materialized
  * the whole filtered fact table into a broadcast relation (driver-side
  * build, per-task hash probe) to produce pairs that are ORDER-local by
  * definition. `collect_set` state is bounded by the caller's
  * per-order `l_linenumber` cap (≤5 parts per order), and `sort_array`
  * makes `ps[i] < ps[j]` for `i < j`, so the generated pair set is
  * identical to the old `x.l_partkey < y.l_partkey` join's — measured
  * ~0.5 s faster per query at sf0.1 (j9 2.12→1.6, j31 3.0→2.2), and at
  * cluster scale it replaces a broadcast of the fact table with one
  * keyed partial-aggregated shuffle.
  *
  * @param li projection with columns `l_orderkey`, `l_partkey`, already
  *           filtered to the caller's `l_linenumber` cap
  * @return distinct (a, b) pairs with a < b
  */
object CoOrderPairs {
  def undirected(li: DataFrame): DataFrame =
    li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ps) - 2),
           i -> transform(sequence(i + 1, size(ps) - 1),
             j -> struct(ps[i] AS a, ps[j] AS b))))""")).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
}
