package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.graph.PropertyGraph
import graft.route.Route

/** Round-8 batch 96: personalized PageRank, Adamic–Adar link
  * prediction, and the cross-source out-of-vocabulary matrix.
  *
  *  - r14_ppr_chain: [[Route.personalizedPageRank]] (random walk with
  *    restart to a seed set — the "similar nodes" / recommendation
  *    primitive completing the ranking family beside global PageRank and
  *    HITS) run for three iterations on the bidirected nation chain,
  *    seeded at the smallest key. Every node has ≤ 2 in-neighbors, so
  *    each iteration's contribution sum is a two-term float add —
  *    commutative, hence bit-exact under any shuffle order — and the
  *    oracle unrolls the identical three iterations relationally.
  *  - j27_adamic_adar: Adamic–Adar scores for non-edges of the sparse
  *    supernode graph — Σ 1/ln(deg(w)) over common neighbors w, the
  *    degree-discounted upgrade of j25's common-neighbor/Jaccard scores.
  *    The float fold is pinned: both engines sort the common-neighbor
  *    degree list ascending and fold left (the r8 discipline), so the
  *    ranking is bit-stable.
  *  - tp37_cross_source_oov: the |sources|² out-of-vocabulary matrix —
  *    for each (train A, eval B), the fraction of B's token OCCURRENCES
  *    whose word never appears in A. The integer-exact cousin of
  *    cross-entropy domain-shift scoring: vocabulary coverage is the
  *    first thing a mixing plan checks before committing tokens.
  *    Numerators and denominators are exact BIGINTs; one division per
  *    cell.
  *
  * Scale shapes: r14 is per-iteration one join + one keyed sum (no
  * driver state); j27's wedge join is bounded by the 128-supernode
  * contraction (and by arboricity on a real graph — the j9 argument);
  * tp37 is explode → (source, word) hash agg → a |sources|-way fan-out
  * against the vocabulary, never a doc-level cross join.
  *
  * Reference context: extends the centrality family the reference ships
  * (README.md:66-74) with the personalized variant; j27/tp37 have no
  * reference counterpart.
  */
object Extended96 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- r14: personalized PageRank on the nation chain ----
    "r14_ppr_chain" -> ((s, d) => {
      val keys = Extended19.sortedKeys(s, d, "nation", "n_nationkey")
      val path = Extended19.writeTopology("r14", d, keys, lat = 43.0, cycle = false)
      val g = PropertyGraph.fromGeoJson(s, Seq(path))
      val nodes = g.nodes.select(col("_n").as("node"))
      val edges = g.edges.select(col("_u").as("src"), col("_v").as("dst"))
      val idmap = Extended19.nodeIdOf(s, keys, 43.0)
      val seed = idmap.filter(col("key") === keys.min)
        .select(col("_n").as("node"))
      idmap.join(
          Route.personalizedPageRank(s, nodes, edges, seed, iters = 3),
          col("_n") === col("node"))
        .select(col("key").as("n_nationkey"), round(col("rank"), 6).as("ppr"))
        .orderBy("n_nationkey")
    }),

    // ---- j27: Adamic–Adar link prediction on the supernode graph ----
    "j27_adamic_adar" -> ((s, d) => {
      val edges = Extended42.sparseSupernodeEdges(s, d).localCheckpoint()
      val sym = edges.select(col("u").as("a"), col("v").as("b"))
        .union(edges.select(col("v").as("a"), col("u").as("b")))
      val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
      val wedges = sym.select(col("a").as("u"), col("b").as("w"))
        .join(sym.select(col("a").as("v"), col("b").as("w")), "w")
        .filter(col("u") < col("v"))
        .join(broadcast(deg.select(col("node").as("w"), col("d").as("dw"))), "w")
      val scored = wedges.groupBy("u", "v")
        .agg(count(lit(1)).as("cn"),
          sort_array(collect_list(col("dw"))).as("ds"))
        // pinned float fold: ascending degree order, left fold — the same
        // discipline as r8's harmonic sum, restated by the oracle
        .withColumn("aa", expr(
          "aggregate(ds, cast(0.0 as double), (acc, x) -> acc + 1.0 / ln(cast(x as double)))"))
        .drop("ds")
      scored.join(edges, Seq("u", "v"), "left_anti")
        .select(col("u"), col("v"), col("cn"), round(col("aa"), 4).as("adamic_adar"))
        .orderBy(col("cn").desc, col("u"), col("v"))
        .limit(20)
    }),

    // ---- tp37: cross-source out-of-vocabulary matrix ----
    "tp37_cross_source_oov" -> ((s, d) => {
      val wc = t(s, d, "documents")
        .select(col("source").as("b"), explode(split(col("text"), " ")).as("word"))
        .groupBy("b", "word").agg(count(lit(1)).as("c"))
      val vocab = wc.select(col("b").as("a"), col("word")).distinct()
      val srcs = vocab.select(col("a")).distinct()
      val oov = wc.crossJoin(broadcast(srcs))
        .join(vocab, Seq("a", "word"), "left_anti")
        .groupBy("a", "b").agg(sum("c").as("oov_tokens"))
      val tot = wc.groupBy("b").agg(sum("c").as("n_tokens"))
      srcs.crossJoin(broadcast(tot))
        .join(oov, Seq("a", "b"), "left")
        .select(col("a").as("train_source"), col("b").as("eval_source"),
          coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"),
          col("n_tokens"),
          round(coalesce(col("oov_tokens"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"), 6).as("oov_rate"))
        .orderBy("train_source", "eval_source")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "r14_ppr_chain" -> {
      // one unrolled iteration: r_next(j) = 0.15·e(j) + 0.85·Σ r(i)/od(i)
      // over in-neighbors i = j±1 — the same two-term IEEE add as the
      // engine's keyed sum
      def iter(prev: String, next: String) =
        s"""$next AS (
             SELECT x.j,
               0.15 * (CASE WHEN x.j = jmin THEN 1.0 ELSE 0.0 END)
               + 0.85 * coalesce(sum(p.r / od.od), 0.0) AS r
             FROM nodes x
             LEFT JOIN $prev p ON abs(p.j - x.j) = 1
             LEFT JOIN od ON od.j = p.j
             CROSS JOIN lims
             GROUP BY x.j, jmin)"""
      s"""WITH nodes AS (SELECT n_nationkey AS j FROM nation),
         lims AS (SELECT min(j) AS jmin, max(j) AS jmax FROM nodes),
         od AS (
           SELECT j, CASE WHEN j = jmin OR j = jmax THEN 1 ELSE 2 END AS od
           FROM nodes CROSS JOIN lims),
         r0 AS (
           SELECT j, CASE WHEN j = jmin THEN 1.0 ELSE 0.0 END AS r
           FROM nodes CROSS JOIN lims),
         ${iter("r0", "r1")},
         ${iter("r1", "r2")},
         ${iter("r2", "r3")}
         SELECT j AS n_nationkey, round(r, 6) AS ppr
         FROM r3 ORDER BY n_nationkey"""
    },
    "j27_adamic_adar" ->
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
         wedge AS (
           SELECT x.a AS u, y.a AS v, dw.d AS dw
           FROM sym x JOIN sym y ON x.b = y.b AND x.a < y.a
           JOIN deg dw ON dw.node = x.b),
         scored AS (
           SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(list_sort(list(dw)),
                   x -> 1.0 / ln(CAST(x AS DOUBLE)))),
               (acc, x) -> acc + x) AS aa
           FROM wedge GROUP BY u, v),
         nonedge AS (
           SELECT s.u, s.v, s.cn, s.aa FROM scored s
           WHERE NOT EXISTS (SELECT 1 FROM edges e
                             WHERE e.u = s.u AND e.v = s.v))
         SELECT u, v, cn, round(aa, 4) AS adamic_adar
         FROM nonedge ORDER BY cn DESC, u, v LIMIT 20""",
    "tp37_cross_source_oov" ->
      """WITH wc AS (
           SELECT source AS b, unnest(string_split(text, ' ')) AS word
           FROM documents),
         wcc AS (SELECT b, word, count(*) AS c FROM wc GROUP BY 1, 2),
         vocab AS (SELECT DISTINCT b AS a, word FROM wcc),
         srcs AS (SELECT DISTINCT a FROM vocab),
         oov AS (
           SELECT s.a, w.b, CAST(sum(w.c) AS BIGINT) AS oov_tokens
           FROM wcc w CROSS JOIN srcs s
           WHERE NOT EXISTS (SELECT 1 FROM vocab v
                             WHERE v.a = s.a AND v.word = w.word)
           GROUP BY 1, 2),
         tot AS (SELECT b, CAST(sum(c) AS BIGINT) AS n_tokens
                 FROM wcc GROUP BY 1)
         SELECT s.a AS train_source, t.b AS eval_source,
           coalesce(o.oov_tokens, 0) AS oov_tokens, t.n_tokens,
           round(CAST(coalesce(o.oov_tokens, 0) AS DOUBLE)
             / CAST(t.n_tokens AS DOUBLE), 6) AS oov_rate
         FROM srcs s CROSS JOIN tot t
         LEFT JOIN oov o ON o.a = s.a AND o.b = t.b
         ORDER BY train_source, eval_source"""
  )
}
