package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 surface extensions, batch 56: link prediction.
  *
  *  - j25: LINK PREDICTION over non-edges (nx link-prediction family) —
  *    for every non-adjacent pair with at least one common neighbor, the
  *    common-neighbor count and Jaccard coefficient |Γ(u)∩Γ(v)| /
  *    |Γ(u)∪Γ(v)|, ranked (cn desc, u, v), top 20. This is the missing-
  *    sidewalk/missing-connection suggestion query over the reference's
  *    street graph. Scores stay INTEGER (the union size is d(u)+d(v)−cn,
  *    so Jaccard is one exact division per pair); candidate pairs come
  *    from the wedge join keyed on the shared neighbor — only pairs at
  *    distance 2 are ever materialized, never the V² non-edge space —
  *    and the adjacency check is one anti-join. Top-20 is TakeOrdered.
  *    (Adamic–Adar is deliberately absent: its Σ 1/log(deg) is a
  *    combine-order-dependent float sum — the exact-parity discipline
  *    keeps scores integer-derived.)
  */
object Extended56 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "j25_link_prediction" -> ((s, d) => {
      val edges = Extended42.sparseSupernodeEdges(s, d).localCheckpoint()
      val sym = edges.select(col("u").as("a"), col("v").as("b"))
        .union(edges.select(col("v").as("a"), col("u").as("b")))
      val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
      val cn = sym.select(col("a").as("u"), col("b").as("w"))
        .join(sym.select(col("a").as("v"), col("b").as("w")), "w")
        .filter(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("cn"))
      val nonedge = cn.join(edges, Seq("u", "v"), "left_anti")
      nonedge
        .join(broadcast(deg.select(col("node").as("u"), col("d").as("du"))), "u")
        .join(broadcast(deg.select(col("node").as("v"), col("d").as("dv"))), "v")
        .select(col("u"), col("v"), col("cn"),
          round(col("cn").cast("double") /
            (col("du") + col("dv") - col("cn")), 4).as("jaccard"))
        .orderBy(col("cn").desc, col("u"), col("v"))
        .limit(20)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j25_link_prediction" ->
      """WITH edges AS (
           SELECT least(o_custkey % 128, o_orderkey % 128) AS u,
                  greatest(o_custkey % 128, o_orderkey % 128) AS v
           FROM orders
           WHERE o_orderkey % 89 = 0 AND o_custkey % 128 <> o_orderkey % 128
           GROUP BY 1, 2),
         sym AS (SELECT u AS a, v AS b FROM edges
                 UNION ALL SELECT v, u FROM edges),
         deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d
                 FROM sym GROUP BY a),
         cn AS (
           SELECT x.a AS u, y.a AS v, CAST(count(*) AS BIGINT) AS cn
           FROM sym x JOIN sym y ON x.b = y.b AND x.a < y.a
           GROUP BY 1, 2),
         nonedge AS (
           SELECT c.u, c.v, c.cn FROM cn c
           WHERE NOT EXISTS (SELECT 1 FROM edges e
                             WHERE e.u = c.u AND e.v = c.v))
         SELECT n.u, n.v, n.cn,
           round(CAST(n.cn AS DOUBLE) / (du.d + dv.d - n.cn), 4) AS jaccard
         FROM nonedge n JOIN deg du ON n.u = du.node
         JOIN deg dv ON n.v = dv.node
         ORDER BY n.cn DESC, n.u, n.v LIMIT 20"""
  )
}
