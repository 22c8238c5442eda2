package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 108: tie-strength structure and mixture temperature —
  * one classical network statistic, one multilingual-training staple.
  *
  *  - j30_local_bridges: edges whose endpoints share NO common neighbor
  *    (span > 2) — Granovetter's "local bridges", the weak ties whose
  *    removal lengthens shortest paths. j17's bridges are the global
  *    cut edges; local bridges are the strictly larger set that stays
  *    meaningful in dense graphs. Plan: j9's measured-fastest
  *    edge-centric form — broadcast the adjacency lists, probe each
  *    edge with one array_intersect; empty intersection ⟺ no triangle
  *    through the edge. No wedge shuffle at any scale where the
  *    adjacency broadcasts; above that the same plan degrades to a
  *    shuffled hash join with identical semantics. Output is the count
  *    plus the lexicographically first few bridges (k-bounded
  *    TakeOrdered).
  *  - tp39_mixture_temperature: temperature-scaled sampling weights
  *    w_ℓ ∝ p_ℓ^τ (τ = 0.7, the mT5 convention) over per-language token
  *    counts — the standard fix for low-resource languages starving in
  *    a proportional mix. Counts are exact integers; p^τ = exp(τ·ln p)
  *    is a fixed per-row dag, and the normalizer folds the (few) rows
  *    in language order (pinned-fold discipline). Upsample factor
  *    w/p > 1 flags the languages the temperature boosts.
  *
  * Scale shape: j30 is one edge scan + two broadcast joins (the j9
  * bound); tp39 is one scan → language-bounded aggregate → tiny fold.
  * No windows, no driver loops.
  *
  * Reference context: no counterpart; j30 extends the j-family graph
  * statistics, tp39 the tp-family mixing ops (tp5 domain mix, tp12
  * alpha mixing, tp18 domain upsample).
  */
object Extended108 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- j30: local bridges (span > 2 edges) ----
    "j30_local_bridges" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 3)
        .select("l_orderkey", "l_partkey")
      // per-order aggregate + in-stage pair generator (see CoOrderPairs)
      val edges = graft.operators.CoOrderPairs.undirected(li)
        .localCheckpoint() // feeds the adjacency, the probe and the count
      // j9's edge-centric form: an edge is a local bridge iff its
      // endpoints' neighbor lists don't intersect — two BROADCAST
      // adjacency joins and a per-edge array_intersect, no wedge shuffle
      // (the wedge-pair + anti-join form re-shuffled Σdeg² rows per
      // consumer: measured 7.0 s; this shape ~1.5 s at sf0.1)
      val nbr = edges.select(col("a").as("n"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("n"), col("a").as("v")))
      val adj = nbr.groupBy("n").agg(collect_list("v").as("nb"))
      val flagged = edges
        .join(broadcast(adj.toDF("a", "na")), Seq("a"))
        .join(broadcast(adj.toDF("b", "nbl")), Seq("b"))
        // no self-loops, so the intersection holds exactly the common
        // THIRD vertices — empty ⟺ the edge closes no triangle
        .withColumn("is_bridge",
          size(array_intersect(col("na"), col("nbl"))) === 0)
        .select("a", "b", "is_bridge")
      val counts = flagged.agg(count(lit(1)).as("n_edges"),
        sum(when(col("is_bridge"), 1L).otherwise(0L)).as("n_local_bridges"))
      // headline row + the 10 first bridges for a concrete, stable sample
      val sample = flagged.filter(col("is_bridge"))
        .orderBy("a", "b").limit(10)
        .select(col("a"), col("b"))
      sample.crossJoin(broadcast(counts))
        .select(col("a"), col("b"), col("n_edges"), col("n_local_bridges"),
          round(col("n_local_bridges").cast("double") /
            col("n_edges").cast("double"), 6).as("bridge_ratio"))
        .orderBy("a", "b")
    }),

    // ---- tp39: temperature-scaled language mixture ----
    "tp39_mixture_temperature" -> ((s, d) => {
      val tau = 0.7
      val counts = t(s, d, "documents")
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
        .groupBy("lang").agg(sum("nt").as("tokens"))
      val tot = counts.agg(sum("tokens").as("total"))
      val scored = counts.crossJoin(broadcast(tot))
        .withColumn("p", col("tokens").cast("double") / col("total").cast("double"))
        .withColumn("ptau", exp(lit(tau) * log(col("p"))))
      // normalizer: fold p^τ in language order (language-bounded list)
      val z = scored
        .agg(sort_array(collect_list(struct(col("lang"), col("ptau")))).as("arr"))
        .select(aggregate(transform(col("arr"), x => x("ptau")), lit(0.0),
          (acc, v) => acc + v).as("z"))
      scored.crossJoin(broadcast(z))
        .select(col("lang"), col("tokens"),
          round(col("p"), 6).as("p_natural"),
          round(col("ptau") / col("z"), 6).as("p_temp"),
          round(col("ptau") / col("z") / col("p"), 6).as("upsample"))
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j30_local_bridges" ->
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
           SELECT DISTINCT p.u AS a, q.u AS b
           FROM nbr p JOIN nbr q USING (w) WHERE p.u < q.u),
         bridges AS (
           SELECT e.a, e.b FROM e
           WHERE NOT EXISTS (SELECT 1 FROM copairs c
                             WHERE c.a = e.a AND c.b = e.b)),
         counts AS (
           SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
             CAST(count(*) AS BIGINT) AS n_local_bridges
           FROM bridges)
         SELECT a, b, n_edges, n_local_bridges,
           round(CAST(n_local_bridges AS DOUBLE)
             / CAST(n_edges AS DOUBLE), 6) AS bridge_ratio
         FROM (SELECT a, b FROM bridges ORDER BY a, b LIMIT 10)
         CROSS JOIN counts ORDER BY a, b""",
    "tp39_mixture_temperature" ->
      """WITH counts AS (
           SELECT lang,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM counts),
         scored AS (
           SELECT lang, tokens,
             CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE) AS p,
             exp(0.7 * ln(CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE)))
               AS ptau
           FROM counts CROSS JOIN tot),
         z AS (
           SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(ptau ORDER BY lang)), (a, b) -> a + b) AS z
           FROM scored)
         SELECT lang, tokens, round(p, 6) AS p_natural,
           round(ptau / z, 6) AS p_temp,
           round(ptau / z / p, 6) AS upsample
         FROM scored CROSS JOIN z ORDER BY lang"""
  )
}
