package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 101: the two graph-shape statistics left open beside
  * triangles (j9), wedges/clustering (r6) and degree mixing (j22) —
  * even-cycle motifs and directed mutuality.
  *
  *  - j28_rectangles: exact 4-cycle (C₄) count of the co-order part
  *    graph. Triangles measure local closure; rectangles are the
  *    smallest EVEN cycle — the motif bipartite-ish interaction graphs
  *    are full of and triangle counts miss entirely. The identity: every
  *    C₄ has exactly two vertex-disjoint diagonals, so
  *    Σ_{u<v} C(codeg(u,v), 2) — codeg = common-neighbor count — counts
  *    each C₄ exactly twice. The plan is the j9 inverted-index shape:
  *    adjacency → wedge self-join keyed on the CENTER vertex (shuffle
  *    carries (center, endpoint) pairs, reducers see one center's
  *    neighborhood), then one hash aggregate on the endpoint pair; cost
  *    is Σ deg², never all-pairs, and the line-number cap bounds the
  *    per-order clique like j9.
  *  - j29_reciprocity: directed mutuality of the line-succession part
  *    graph (part at line i → part at line i+1 within an order —
  *    direction = picking order). Reciprocity = the fraction of directed
  *    edges whose reverse also exists: one orderkey-keyed self-join to
  *    build edges, one (src,dst)↔(dst,src) hash semi-join to test
  *    reversal — both co-partitioned shuffles, integer counts, one
  *    terminal division.
  *
  * Scale shape: j28 is bounded by Σ deg² with the same per-order cap
  * discipline as j9 (the measured-fastest triangle form); j29 is two
  * hash joins. No windows, no driver loops, no collects.
  *
  * Reference context: the reference ships no motif counters; these
  * extend the j-family graph statistics (SURVEY §2 J2's traversal
  * self-join lineage).
  */
object Extended101 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- j28: exact rectangle (4-cycle) count ----
    "j28_rectangles" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 3)
        .select("l_orderkey", "l_partkey")
      // per-order aggregate + in-stage pair generator (see CoOrderPairs)
      val edges = graft.operators.CoOrderPairs.undirected(li)
        .localCheckpoint() // feeds the count and both adjacency directions
      val nbr = edges.select(col("a").as("w"), col("b").as("u"))
        .unionAll(edges.select(col("b").as("w"), col("a").as("u")))
      // wedges keyed on the center w; u<v canonicalizes the endpoint pair
      val copairs = nbr.as("p").join(nbr.as("q"), Seq("w"))
        .filter(col("p.u") < col("q.u"))
        .select(col("p.u").as("u"), col("q.u").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("c"))
      val agg = copairs.agg(
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_copairs"),
        sum(expr("c * (c - 1) div 2")).as("diag_pairs"))
      edges.agg(count(lit(1)).as("n_edges")).crossJoin(agg)
        .select(col("n_edges"), col("n_copairs"), col("diag_pairs"),
          // each C₄ is seen once per diagonal — exactly twice
          expr("diag_pairs div 2").as("rectangles"))
    }),

    // ---- j29: directed reciprocity of the line-succession graph ----
    "j29_reciprocity" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("y.l_linenumber") === col("x.l_linenumber") + 1)
        .filter(col("x.l_partkey") =!= col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        .distinct()
      // reciprocity from ONE canonical-pair aggregation: each unordered
      // pair {u,v} (src ≠ dst by the filter) carries c ∈ {1,2} distinct
      // directions, so n_edges = Σc and n_recip = 2·|{c = 2}| — exactly
      // the former reversal semi-join's count without materializing the
      // edge set (no checkpoint), probing it, or a second count pass
      edges
        .groupBy(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_edges"),
          sum(when(col("c") === 2, 2L).otherwise(0L)).as("n_recip"))
        .select(col("n_edges"), col("n_recip"),
          round(col("n_recip").cast("double") / col("n_edges").cast("double"),
            6).as("reciprocity"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j28_rectangles" ->
      """WITH li AS (
           SELECT l_orderkey, l_partkey FROM lineitem WHERE l_linenumber <= 3),
         e AS (
           SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
           FROM li x JOIN li y USING (l_orderkey)
           WHERE x.l_partkey < y.l_partkey),
         nbr AS (
           SELECT a AS w, b AS u FROM e
           UNION ALL SELECT b AS w, a AS u FROM e),
         copairs AS (
           SELECT p.u AS u, q.u AS v, CAST(count(*) AS BIGINT) AS c
           FROM nbr p JOIN nbr q USING (w)
           WHERE p.u < q.u GROUP BY 1, 2),
         agg AS (
           SELECT CAST(count(*) FILTER (WHERE c >= 2) AS BIGINT) AS n_copairs,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS diag_pairs
           FROM copairs)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           n_copairs, diag_pairs,
           diag_pairs // 2 AS rectangles
         FROM agg""",
    "j29_reciprocity" ->
      """WITH e AS (
           SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
           FROM lineitem x JOIN lineitem y
             ON x.l_orderkey = y.l_orderkey
             AND y.l_linenumber = x.l_linenumber + 1
           WHERE x.l_partkey <> y.l_partkey)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM e
            WHERE EXISTS (SELECT 1 FROM e r
                          WHERE r.src = e.dst AND r.dst = e.src)) AS n_recip,
           round(CAST((SELECT count(*) FROM e
               WHERE EXISTS (SELECT 1 FROM e r
                             WHERE r.src = e.dst AND r.dst = e.src)) AS DOUBLE)
             / CAST((SELECT count(*) FROM e) AS DOUBLE), 6) AS reciprocity"""
  )
}
