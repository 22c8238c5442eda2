package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.route.Mst

/** Round-6 surface extensions, batch 41: minimum spanning forest, exact
  * weighted median by cumulative selection, and sweep-line concurrency.
  *
  *  - j16: MINIMUM SPANNING FOREST ([[graft.route.Mst]] — local Kruskal
  *    under the gate, distributed Borůvka above it; Extended41Spec pins
  *    the two paths equal on this exact graph). The graph is the 64-node
  *    "supernode" contraction of orders (u = custkey mod 64, v = orderkey
  *    mod 64, w = min totalprice over the pair): dense, connected, and
  *    weights are NOT all distinct at sf0.1 — which is the point: the
  *    edge order is the strict total order (w, u, v), so the forest is
  *    unique and the oracle's completely different algorithm (sequential
  *    Prim as a recursive CTE, 63 argmin steps) must land on the
  *    identical 63 edges.
  *  - a20: EXACT weighted median per group without buffering values —
  *    batch 39's histogram-selection discipline extended to weights:
  *    group to (key, value, Σweight), cumulative-sum over values, pick
  *    the first value whose doubled cumulative weight reaches the total.
  *    Weights are summed as BIGINTs (l_quantity is integral), so the
  *    selection predicate `2·cw ≥ tw` is exact integer arithmetic with
  *    no float-order hazard. State ∝ distinct values per group, not rows
  *    — the 100 TB shape Spark's buffering `percentile` cannot take.
  *  - e25: sweep-line MAX CONCURRENCY per event type — each event is an
  *    interval [s, s + ⌊value·10⌋ s); classic +1/−1 boundary-point sweep,
  *    net delta aggregated per (type, second) then one window cumsum.
  *    End-exclusive convention: at equal timestamps ends retire before
  *    starts count, which the per-second NET aggregation encodes with no
  *    intra-tie ordering at all. Integer epochs both sides.
  */
object Extended41 {
  type Q = (SparkSession, String) => DataFrame

  /** The supernode edge relation shared by query and spec. */
  private[graft] def supernodeEdges(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(least(col("o_custkey") % 64, col("o_orderkey") % 64).as("u"),
        greatest(col("o_custkey") % 64, col("o_orderkey") % 64).as("v"),
        col("o_totalprice"))
      .filter(col("u") =!= col("v"))
      .groupBy("u", "v").agg(min("o_totalprice").as("w"))

  val queries: Map[String, Q] = Map(
    // ---- j16: minimum spanning forest ----
    "j16_mst_forest" -> ((s, d) =>
      Mst.minimumSpanningForest(s, supernodeEdges(s, d))
        .select(col("u"), col("v"), round(col("w"), 2).as("w"))
        .orderBy("u", "v")),

    // ---- a20: exact weighted median by cumulative selection ----
    "a20_weighted_median" -> ((s, d) => {
      val g = t(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("flag"), col("l_extendedprice").as("p"))
        .agg(sum(col("l_quantity").cast("long")).as("w"))
      // two-level bucketed selection over the (flag, price, weight)
      // histogram (operators/Selection) — same min-p-with-2cw≥tw rule as
      // the oracle, no full-histogram per-group window. Width 256 keeps
      // both levels bounded on the double price domain (~[900, 105000)).
      graft.operators.Selection.lowerMedianBounded(g, Seq("flag"), "p", "w",
          "wmedian", bucketWidth = 256.0)
        .orderBy("flag")
    }),

    // ---- e25: sweep-line max interval concurrency per event type ----
    // (renamed from a duplicate e22_* in round 7: e22 is the transition
    // matrix; this fills the formerly vacant e25 slot)
    "e25_max_concurrency" -> ((s, d) => {
      val iv = t(s, d, "events").select(col("event_type"),
        unix_timestamp(col("ts")).as("s"),
        (unix_timestamp(col("ts")) + floor(col("value") * 10).cast("long")).as("e"))
      val pts = iv.select(col("event_type"), col("s").as("t"), lit(1L).as("d"))
        .union(iv.select(col("event_type"), col("e"), lit(-1L)))
      val net = pts.groupBy("event_type", "t").agg(sum("d").as("net"))
      val run = net.select(col("event_type"),
        sum("net").over(Window.partitionBy("event_type").orderBy("t")).as("conc"))
      run.groupBy("event_type")
        .agg(max("conc").as("max_concurrency"), count(lit(1)).as("n_points"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j16_mst_forest" ->
      """WITH edges AS (
           SELECT least(o_custkey % 64, o_orderkey % 64) AS u,
                  greatest(o_custkey % 64, o_orderkey % 64) AS v,
                  min(o_totalprice) AS w
           FROM orders WHERE o_custkey % 64 <> o_orderkey % 64 GROUP BY 1, 2),
         mst AS (
           WITH RECURSIVE m AS (
             SELECT [CAST(0 AS BIGINT)] AS visited,
                    CAST(NULL AS BIGINT) AS eu, CAST(NULL AS BIGINT) AS ev,
                    CAST(NULL AS DOUBLE) AS ew, 0 AS step
             UNION ALL
             SELECT list_append(m.visited,
                      CASE WHEN list_contains(m.visited, e.u) THEN e.v ELSE e.u END),
                    e.u, e.v, e.w, m.step + 1
             FROM m, LATERAL (
               SELECT u, v, w FROM edges
               WHERE list_contains(m.visited, u) <> list_contains(m.visited, v)
               ORDER BY w, u, v LIMIT 1) e
             WHERE m.step < 63)
           SELECT * FROM m)
         SELECT eu AS u, ev AS v, round(ew, 2) AS w
         FROM mst WHERE eu IS NOT NULL ORDER BY u, v""",
    "a20_weighted_median" ->
      """WITH g AS (
           SELECT l_returnflag AS flag, l_extendedprice AS p,
                  sum(CAST(l_quantity AS BIGINT)) AS w
           FROM lineitem GROUP BY 1, 2),
         c AS (
           SELECT flag, p,
             sum(w) OVER (PARTITION BY flag ORDER BY p) AS cw,
             sum(w) OVER (PARTITION BY flag) AS tw
           FROM g)
         SELECT flag, min(p) AS wmedian
         FROM c WHERE 2 * cw >= tw GROUP BY flag ORDER BY flag""",
    "e25_max_concurrency" ->
      """WITH iv AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + CAST(floor(value * 10) AS BIGINT) AS e
           FROM events),
         pts AS (
           SELECT event_type, s AS t, 1 AS d FROM iv
           UNION ALL SELECT event_type, e, -1 FROM iv),
         net AS (SELECT event_type, t, sum(d) AS net FROM pts GROUP BY 1, 2),
         run AS (
           SELECT event_type, t,
             sum(net) OVER (PARTITION BY event_type ORDER BY t) AS conc
           FROM net)
         SELECT event_type, CAST(max(conc) AS BIGINT) AS max_concurrency,
           count(*) AS n_points
         FROM run GROUP BY event_type ORDER BY event_type"""
  )
}
