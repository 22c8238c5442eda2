package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.route.Isochrone

/** Round-6 surface extensions, batch 53: the isochrone (walkshed).
  *
  *  - r11: ISOCHRONE from supernode 0 with cutoff 6 over the sparse
  *    supernode graph with small-integer weights (w = 1 + (u+v) mod 3 —
  *    deterministic, positive, and bounded so the oracle's recursive
  *    closure enumerates at most cutoff+1 distinct distances per node).
  *    [[graft.route.Isochrone]] dispatches cutoff-Dijkstra under the
  *    gate and bounded frontier relaxation above it; the oracle is the
  *    defining closure — every path of cost ≤ 6, min per node — which
  *    an exact SSSP must reproduce. Distances are sums of small ints in
  *    doubles (exact), reported as BIGINT.
  */
object Extended53 {
  type Q = (SparkSession, String) => DataFrame

  private[graft] def weightedEdges(s: SparkSession, d: String): DataFrame =
    Extended42.sparseSupernodeEdges(s, d)
      .select(col("u"), col("v"), (lit(1) + (col("u") + col("v")) % 3)
        .cast("double").as("w"))

  val queries: Map[String, Q] = Map(
    "r11_isochrone" -> ((s, d) =>
      Isochrone.isochrone(s, weightedEdges(s, d), source = 0L, cutoff = 6.0)
        .select(col("node"), col("dist").cast("long").as("dist"))
        .orderBy("node"))
  )

  val oracleSql: Map[String, String] = Map(
    "r11_isochrone" ->
      """WITH RECURSIVE edges AS (
           SELECT least(o_custkey % 128, o_orderkey % 128) AS u,
                  greatest(o_custkey % 128, o_orderkey % 128) AS v
           FROM orders
           WHERE o_orderkey % 89 = 0 AND o_custkey % 128 <> o_orderkey % 128
           GROUP BY 1, 2),
         w AS (SELECT u, v, 1 + (u + v) % 3 AS w FROM edges),
         sym AS (SELECT u AS a, v AS b, w FROM w
                 UNION ALL SELECT v, u, w FROM w),
         rr AS (
           SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
           UNION
           SELECT s.b AS node, rr.dist + s.w AS dist
           FROM rr JOIN sym s ON s.a = rr.node
           WHERE rr.dist + s.w <= 6)
         SELECT node, CAST(min(dist) AS BIGINT) AS dist
         FROM rr GROUP BY node ORDER BY node"""
  )
}
