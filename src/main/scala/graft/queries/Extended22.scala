package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Dedup
import graft.route.Components

/** Round-6 surface extensions, batch 22: quality-canonical near-dedup
  * (keep the BEST copy per duplicate cluster, the production policy), the
  * per-node local clustering coefficient (GraphX TriangleCount generalized
  * from j9's global count, restated by a SQL triangle join on a planted
  * topology), and equal-frequency feature binning (per-group ntile — the
  * feature-engineering discretization step).
  */
object Extended22 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- tp6: near-dedup keeping the longest doc per cluster ----
    // Same LSH → Jaccard-verify → connected-components machinery as
    // dedup_near_pipeline, but the representative is the cluster's
    // highest-n_chars member (ties → smallest id) — "keep the best copy",
    // which is what a production corpus dedup actually does (the
    // first-crawled copy is often the truncated one). The argmax is a
    // single max(struct) aggregation, not a window over cluster members.
    "tp6_near_keep_longest" -> ((s, d) =>
      Dedup.dedupNearKeepBest(t(s, d, "documents"), "doc_id", "text",
          "n_chars", threshold = 0.8)
        .select("doc_id").orderBy("doc_id")),

    // ---- r6: local clustering coefficient on the planted topology ----
    // The r5 clique+chain again (supplier keys 0..7 form an 8-clique, keys
    // 7..n−1 a pendant chain), because its coefficients exercise every
    // branch: interior clique nodes are fully connected (coeff 1), the
    // attachment node mixes clique and chain neighbors (42/56), chain
    // interiors have unlinked neighbors (0), and the tail has degree 1
    // (the d<2 guard). The operator is generic GraphX TriangleCount +
    // degrees; the oracle re-counts triangles with a SQL join.
    "r6_clustering_coeff" -> ((s, d) => {
      val sup = t(s, d, "supplier").select(col("s_suppkey").as("key"))
      val clique = sup.filter(col("key") <= 7)
      val cedges = clique.select(col("key").as("a"))
        .join(clique.select(col("key").as("b")), col("a") < col("b"))
      val chain = sup.select(col("key").as("a"), (col("key") + 1).as("b"))
        .filter(col("a") >= 7)
        .join(sup.select(col("key").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
      Components.clusteringCoefficient(s, cedges.union(chain))
        .select(col("node").as("s_suppkey"), col("degree"),
          col("triangles"), col("coeff"))
        .orderBy("s_suppkey")
    }),

    // ---- w9: equal-frequency feature binning (per-group ntile) ----
    // Discretize order totals into 10 equal-frequency bins WITHIN each
    // priority class — the standard numeric-feature bucketing step before
    // training. The only windows are per-priority (never partitionless),
    // the bin order is made total with the key tiebreak, and the output
    // is the per-bin contract a feature store would persist: population
    // and [min, max] price bounds.
    "w9_ntile_binning" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("bin", ntile(10).over(w))
        .groupBy("o_orderpriority", "bin")
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
        .orderBy("o_orderpriority", "bin")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tp6_near_keep_longest" ->
      s"""WITH RECURSIVE ${LlmQueries.minhashSigCtes},
         cand AS (
           SELECT DISTINCT x1.doc_id AS a, x2.doc_id AS b
           FROM kb x1 JOIN kb x2
             ON x1.band = x2.band AND x1.key = x2.key AND x1.doc_id < x2.doc_id),
         ver AS (
           SELECT cand.a, cand.b FROM cand
             JOIN g ga ON ga.doc_id = cand.a
             JOIN g gb ON gb.doc_id = cand.b
           WHERE CASE WHEN len(ga.grams) + len(gb.grams) = 0 THEN 1.0
             ELSE len(list_intersect(ga.grams, gb.grams)) /
               CAST(len(ga.grams) + len(gb.grams)
                    - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
             END >= 0.8),
         sym AS (SELECT a, b FROM ver UNION SELECT b AS a, a AS b FROM ver),
         reach AS (
           SELECT a AS s, b AS t FROM sym
           UNION
           SELECT r.s, e.b FROM reach r JOIN sym e ON r.t = e.a),
         cl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster
                FROM reach GROUP BY s),
         mem AS (
           SELECT dd.doc_id, coalesce(cl.cluster, dd.doc_id) AS cluster,
                  dd.n_chars
           FROM documents dd LEFT JOIN cl ON cl.doc_id = dd.doc_id),
         k AS (
           SELECT doc_id, row_number() OVER (
             PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC) AS rn
           FROM mem)
         SELECT doc_id FROM k WHERE rn = 1 ORDER BY doc_id""",
    "r6_clustering_coeff" ->
      """WITH sup AS (SELECT s_suppkey AS k FROM supplier),
         e0 AS (
           SELECT a.k AS u, b.k AS v
           FROM sup a JOIN sup b ON a.k < b.k AND b.k <= 7
           UNION ALL
           SELECT a.k AS u, a.k + 1 AS v
           FROM sup a JOIN sup b ON b.k = a.k + 1 WHERE a.k >= 7),
         sym AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
         deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
         tri AS (
           SELECT s1.u, count(*) AS t
           FROM sym s1
             JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
             JOIN e0 e ON e.u = s1.v AND e.v = s2.v
           GROUP BY s1.u)
         SELECT deg.u AS s_suppkey, deg.d AS degree,
           coalesce(tri.t, 0) AS triangles,
           CASE WHEN deg.d >= 2
                THEN 2.0 * coalesce(tri.t, 0) / (deg.d * (deg.d - 1))
                ELSE 0.0 END AS coeff
         FROM deg LEFT JOIN tri ON tri.u = deg.u ORDER BY s_suppkey""",
    "w9_ntile_binning" ->
      """SELECT o_orderpriority, bin, count(*) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
         FROM (
           SELECT o_orderpriority, o_totalprice,
             CAST(ntile(10) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS INT) AS bin
           FROM orders)
         GROUP BY o_orderpriority, bin ORDER BY o_orderpriority, bin"""
  )
}
