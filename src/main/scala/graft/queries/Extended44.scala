package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.route.Matching

/** Round-6 surface extensions, batch 44: greedy maximal matching, DSIR
  * importance scoring, and exact-integer personalized PageRank.
  *
  *  - j19: GREEDY MAXIMAL MATCHING ([[graft.route.Matching]] — sequential
  *    greedy scan under the gate, parallel local-minimum rounds above it;
  *    the (w, u, v) strict total order makes the matching unique, so the
  *    oracle's sequential scan — a recursive CTE taking the global min
  *    free edge per step — must produce the identical 32 edges on the
  *    64-supernode graph).
  *  - tp16: DSIR-style IMPORTANCE SCORE (Xie et al. 2023 "Data Selection
  *    for Language Models via Importance Resampling", reduced to unigram
  *    MLE): per document, the likelihood ratio of the target-domain
  *    unigram model (docs with lang='en') to the global unigram model,
  *    estimated as (Σ target_count(tok) / T) / (Σ global_count(tok) / G).
  *    Both masses are exact BIGINT sums (state: one row per token via two
  *    count aggregations — at 100 TB the two count tables are the stored
  *    artifact, broadcast when small, bucketed when not); the ratio is
  *    computed with the identical double expression tree on both engines.
  *    Top-20 selection by (ratio, doc_id) — TakeOrdered, no global sort.
  *  - r10: PERSONALIZED PAGERANK with restart at node 0 over the directed
  *    supernode graph (cust→order mod 64), five synchronous iterations in
  *    EXACT INTEGER arithmetic: rank mass is scaled to 10¹², per-edge
  *    shares use integer division (v div deg), damping is (85·inc) div
  *    100 + restart — every operation is a BIGINT op with identical
  *    truncation semantics in Spark (`div`) and DuckDB (`//`), so five
  *    rounds of sum-over-in-edges are bit-reproducible cross-engine (the
  *    v5 power-iteration discipline applied to a graph fixpoint). Scale
  *    shape: each iteration is one join on the edge key + one partial
  *    agg, state one row per node; dangling mass retires (documented —
  *    matches the "no dangling redistribution" PPR variant).
  */
object Extended44 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- j19: greedy maximal matching on the weighted supernode graph ----
    "j19_greedy_matching" -> ((s, d) =>
      Matching.greedyMatching(s, Extended41.supernodeEdges(s, d))
        .select(col("u"), col("v"), round(col("w"), 2).as("w"))
        .orderBy("u", "v")),

    // ---- tp16: DSIR unigram likelihood-ratio importance score ----
    "tp16_importance_score" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tk"))
      val gc = tok.groupBy("tk").agg(count(lit(1)).as("g"))
      val tc = tok.filter(col("lang") === "en")
        .groupBy("tk").agg(count(lit(1)).as("c"))
      val tot = tok.agg(count(lit(1)).as("gt"),
        count_if(col("lang") === "en").as("tt"))
      val per = tok.join(gc, "tk").join(tc, Seq("tk"), "left")
        .groupBy("doc_id")
        .agg(sum(coalesce(col("c"), lit(0L))).as("tgt_mass"),
          sum(col("g")).as("glob_mass"))
      per.crossJoin(broadcast(tot))
        .select(col("doc_id"), col("tgt_mass"), col("glob_mass"),
          round(col("tgt_mass").cast("double") * col("gt") /
            (col("glob_mass").cast("double") * col("tt")), 6).as("lr"))
        .orderBy(col("lr").desc, col("doc_id"))
        .limit(20)
    }),

    // ---- r10: exact-integer personalized PageRank, 5 iterations ----
    "r10_personalized_pagerank" -> ((s, d) => {
      val scale = 1000000000000L
      val edges = t(s, d, "orders")
        .select((col("o_custkey") % 64).as("src"), (col("o_orderkey") % 64).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct()
      val restart = when(col("node") === 0, lit(15L * scale / 100L)).otherwise(lit(0L))
      var v = nodes.select(col("node"),
          when(col("node") === 0, lit(scale)).otherwise(lit(0L)).as("v"))
        .localCheckpoint()
      for (_ <- 1 to 5) {
        val inc = v.join(edges, v("node") === edges("src"))
          .join(deg, "src")
          .select(col("dst").as("node"), expr("v div d").as("share"))
          .groupBy("node").agg(sum("share").as("inc"))
        v = nodes.join(inc, Seq("node"), "left")
          .select(col("node"),
            (expr("(85 * coalesce(inc, 0L)) div 100") + restart).as("v"))
          .localCheckpoint()
      }
      v.select(col("node"), col("v").as("ppr_scaled")).orderBy("node")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j19_greedy_matching" ->
      """WITH RECURSIVE edges AS (
           SELECT least(o_custkey % 64, o_orderkey % 64) AS u,
                  greatest(o_custkey % 64, o_orderkey % 64) AS v,
                  min(o_totalprice) AS w
           FROM orders WHERE o_custkey % 64 <> o_orderkey % 64 GROUP BY 1, 2),
         m AS (
           SELECT CAST([] AS BIGINT[]) AS used, CAST(NULL AS BIGINT) AS mu,
                  CAST(NULL AS BIGINT) AS mv, CAST(NULL AS DOUBLE) AS mw, 0 AS step
           UNION ALL
           SELECT list_append(list_append(m.used, e.u), e.v), e.u, e.v, e.w,
                  m.step + 1
           FROM m, LATERAL (
             SELECT u, v, w FROM edges
             WHERE NOT list_contains(m.used, u) AND NOT list_contains(m.used, v)
             ORDER BY w, u, v LIMIT 1) e
           WHERE m.step < 64)
         SELECT mu AS u, mv AS v, round(mw, 2) AS w FROM m
         WHERE mu IS NOT NULL ORDER BY u, v""",
    "tp16_importance_score" ->
      """WITH tok AS (
           SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk
           FROM documents),
         gc AS (SELECT tk, count(*) AS g FROM tok GROUP BY tk),
         tc AS (SELECT tk, count(*) AS c FROM tok WHERE lang = 'en' GROUP BY tk),
         tot AS (SELECT (SELECT count(*) FROM tok) AS gt,
                        (SELECT count(*) FROM tok WHERE lang = 'en') AS tt),
         per AS (
           SELECT t.doc_id,
             CAST(sum(coalesce(c.c, 0)) AS BIGINT) AS tgt_mass,
             CAST(sum(g.g) AS BIGINT) AS glob_mass
           FROM tok t JOIN gc g ON t.tk = g.tk LEFT JOIN tc c ON t.tk = c.tk
           GROUP BY t.doc_id)
         SELECT p.doc_id, p.tgt_mass, p.glob_mass,
           round(CAST(p.tgt_mass AS DOUBLE) * tot.gt /
             (CAST(p.glob_mass AS DOUBLE) * tot.tt), 6) AS lr
         FROM per p, tot
         ORDER BY lr DESC, p.doc_id LIMIT 20""",
    "r10_personalized_pagerank" ->
      """WITH RECURSIVE edges AS (
           SELECT DISTINCT o_custkey % 64 AS src, o_orderkey % 64 AS dst
           FROM orders WHERE o_custkey % 64 <> o_orderkey % 64),
         deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         nodes AS (SELECT DISTINCT node FROM
           (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
         edges2 AS (SELECT src, dst, FALSE AS zero FROM edges
                    UNION ALL SELECT node, node, TRUE FROM nodes),
         it AS (
           SELECT node, CASE WHEN node = 0 THEN CAST(1000000000000 AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS v, 0 AS i
           FROM nodes
           UNION ALL
           SELECT e.dst AS node,
             85 * sum(CASE WHEN e.zero THEN 0 ELSE it.v // dg.d END) // 100
               + CASE WHEN e.dst = 0
                 THEN 15 * CAST(1000000000000 AS BIGINT) // 100
                 ELSE 0 END AS v,
             max(it.i) + 1 AS i
           FROM it
           JOIN edges2 e ON e.src = it.node
           LEFT JOIN deg dg ON dg.src = e.src
           WHERE it.i < 5
           GROUP BY e.dst)
         SELECT node, v AS ppr_scaled FROM it WHERE i = 5 ORDER BY node"""
  )
}
