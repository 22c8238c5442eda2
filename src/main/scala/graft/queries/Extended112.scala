package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.route.Components

/** Round-8 batch 112: the held-out language-model surprisal probe and
  * the community-quality score.
  *
  *  - t34_bigram_surprisal: an add-1-smoothed bigram LM trained on the
  *    md5-coin half A of the corpus (t7's engine-portable split) and
  *    evaluated on half B — the top-20 eval bigrams by frequency with
  *    their train count and surprisal −ln((c₁₂+1)/(c₁+V)). This is the
  *    cheap "how familiar is the new shard to the old corpus?"
  *    LM-based screen (tp2 measures raw bigram mass; this one is a
  *    PROBABILITY under a held-out model, the perplexity building
  *    block). Counts and V are exact integers; each output row is one
  *    division and one ln (catalyst ln ≡ DuckDB ln, the a33 pin).
  *    Scale shape: the ≤20-row probe set is BROADCAST into left_semi
  *    prefilters on the train aggregates, so the big train relation is
  *    never shuffled to meet a 20-row side.
  *  - r15_modularity: Newman modularity Q of the r7 label-propagation
  *    partition on the r7 topology (8-clique + pendant chain). Per
  *    community, the contribution e_c/m − (d_c/2m)² is computed on the
  *    EXACT integer identity 4m²·Q_c = 4m·e_c − d_c², so each output
  *    row is one division of exact BIGINTs — no cross-community float
  *    fold in the parity surface. The partition itself is the
  *    deterministic 3-round LPA the r7 oracle already replays; internal
  *    edge counts come from two label joins on the canonical a<b edge
  *    list, degrees from one union aggregate.
  *
  * Scale shape: t34 is two explode→hash-aggregate passes (train, eval)
  * plus bounded probe joins; r15 is the LPA fixpoint (one shuffle per
  * round) plus two label equi-joins — no windows, no driver loops
  * (scalars ride 1-row broadcast crosses).
  *
  * Reference context: no counterpart; extends the text-analysis layer
  * (t7 split, tp2 familiarity, a33 KL) and the graph layer (r7 LPA).
  */
object Extended112 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** t7's engine-portable coin flip: md5 hex digit < '8' → half A. */
  private def inA: Column =
    (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
      .cast("long")

  val queries: Map[String, Q] = Map(
    // ---- t34: held-out add-1 bigram surprisal, top-20 eval bigrams ----
    "t34_bigram_surprisal" -> ((s, d) => {
      val bi = t(s, d, "documents")
        .select(col("doc_id"), inA.as("a"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("a"), explode(expr(
          "transform(slice(ws, 1, size(ws) - 1), " +
            "(x, i) -> struct(x AS w1, ws[i + 1] AS w2))")).as("g"))
        .select(col("a"), col("g.w1"), col("g.w2"))
      val train = bi.filter(col("a") === 1L)
      val eval_ = bi.filter(col("a") === 0L)
      val c12 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
      val vocab = train.agg(countDistinct("w2").as("v"))
      val top = eval_.groupBy("w1", "w2").agg(count(lit(1)).as("n_eval"))
        .orderBy(col("n_eval").desc, col("w1"), col("w2")).limit(20)
      // the 20-row probe broadcasts into semi-filters; the train
      // aggregates are never shuffled toward a 20-row side
      val c12f = c12.join(broadcast(top.select("w1", "w2")),
        Seq("w1", "w2"), "left_semi")
      val c1f = c1.join(broadcast(top.select("w1")), Seq("w1"), "left_semi")
      top.join(c12f, Seq("w1", "w2"), "left")
        .join(c1f, Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"), col("n_eval"),
          coalesce(col("c12"), lit(0L)).as("c_train"),
          round(-log(
            (coalesce(col("c12"), lit(0L)) + 1L).cast("double") /
              (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")), 6)
            .as("surprisal"))
        .orderBy(col("n_eval").desc, col("w1"), col("w2"))
    }),

    // ---- r15: modularity of the r7 LPA communities ----
    "r15_modularity" -> ((s, d) => {
      val sup = t(s, d, "supplier").select(col("s_suppkey").as("key"))
      val clique = sup.filter(col("key") <= 7)
      val cedges = clique.select(col("key").as("a"))
        .join(clique.select(col("key").as("b")), col("a") < col("b"))
      val chain = sup.select(col("key").as("a"), (col("key") + 1).as("b"))
        .filter(col("a") >= 7)
        .join(sup.select(col("key").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
      val e0 = cedges.union(chain).localCheckpoint()
      val labels = Components.labelPropagation(s, e0, rounds = 3)
      val mDf = e0.agg(count(lit(1)).as("m"))
      val deg = e0.select(col("a").as("node"))
        .unionAll(e0.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val nodeStats = labels.join(deg, "node")
        .groupBy("label")
        .agg(count(lit(1)).as("n_nodes"), sum("deg").as("deg_sum"))
      val eIn = e0
        .join(labels.select(col("node").as("a"), col("label").as("la")), "a")
        .join(labels.select(col("node").as("b"), col("label").as("lb")), "b")
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_in"))
      nodeStats.join(eIn, Seq("label"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .crossJoin(broadcast(mDf))
        .select(col("label"), col("n_nodes"), col("e_in"), col("deg_sum"),
          // 4m²·Q_c = 4m·e_c − d_c² — exact BIGINTs, one division
          round((dec(lit(4L)) * dec(col("m")) * dec(col("e_in")) -
              dec(col("deg_sum")) * dec(col("deg_sum"))).cast("double") /
            (dec(lit(4L)) * dec(col("m")) * dec(col("m"))).cast("double"), 6)
            .as("q_contrib"))
        .orderBy("label")
    })
  )

  val oracleSql: Map[String, String] = {
    // the r7 oracle's LPA round, verbatim (Extended26)
    def lpaRound(prev: String, v: String, next: String) =
      s"""$v AS (SELECT e.a AS node, l.label, count(*) AS c
             FROM e JOIN $prev l ON l.node = e.b GROUP BY e.a, l.label),
         $next AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn FROM $v)
             WHERE rn = 1)"""
    Map(
      "t34_bigram_surprisal" ->
        """WITH w AS (
             SELECT doc_id,
               CAST(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                 AS BIGINT) AS a,
               string_split(text, ' ') AS ws
             FROM documents),
           b AS (
             SELECT a, ws[i+1] AS w1, ws[i+2] AS w2
             FROM w, LATERAL (SELECT unnest(range(0, len(ws) - 1)) AS i) r
             WHERE len(ws) >= 2),
           c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                   FROM b WHERE a = 1 GROUP BY w1, w2),
           c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
                  FROM b WHERE a = 1 GROUP BY w1),
           vocab AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v
                     FROM b WHERE a = 1),
           top AS (
             SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_eval
             FROM b WHERE a = 0 GROUP BY w1, w2
             ORDER BY n_eval DESC, w1, w2 LIMIT 20)
           SELECT t.w1, t.w2, t.n_eval,
             COALESCE(c12.c12, 0) AS c_train,
             round(-ln(CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(c1.c1, 0) + vocab.v AS DOUBLE)), 6)
               AS surprisal
           FROM top t
           LEFT JOIN c12 ON t.w1 = c12.w1 AND t.w2 = c12.w2
           LEFT JOIN c1 ON t.w1 = c1.w1
           CROSS JOIN vocab
           ORDER BY t.n_eval DESC, t.w1, t.w2""",
      "r15_modularity" ->
        s"""WITH sup AS (SELECT s_suppkey AS k FROM supplier),
           e0 AS (
             SELECT a.k AS a, b.k AS b FROM sup a JOIN sup b ON a.k < b.k
             WHERE a.k <= 7 AND b.k <= 7
             UNION ALL
             SELECT a.k, a.k + 1 FROM sup a JOIN sup b ON b.k = a.k + 1
             WHERE a.k >= 7),
           e AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
           l0 AS (SELECT k AS node, k AS label FROM sup
                  WHERE k IN (SELECT a FROM e)),
           ${lpaRound("l0", "v1", "l1")},
           ${lpaRound("l1", "v2", "l2")},
           ${lpaRound("l2", "v3", "l3")},
           m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
           deg AS (
             SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
               SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
             GROUP BY node),
           ns AS (
             SELECT l.label, CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(deg.deg) AS BIGINT) AS deg_sum
             FROM l3 l JOIN deg ON l.node = deg.node GROUP BY l.label),
           ein AS (
             SELECT la.label, CAST(count(*) AS BIGINT) AS e_in
             FROM e0 JOIN l3 la ON e0.a = la.node
                     JOIN l3 lb ON e0.b = lb.node
             WHERE la.label = lb.label GROUP BY la.label)
           SELECT ns.label, ns.n_nodes, COALESCE(ein.e_in, 0) AS e_in,
             ns.deg_sum,
             round(CAST(4 * CAST(m.m AS HUGEINT) * COALESCE(ein.e_in, 0)
                 - CAST(ns.deg_sum AS HUGEINT) * ns.deg_sum AS DOUBLE)
               / CAST(4 * CAST(m.m AS HUGEINT) * m.m AS DOUBLE), 6)
               AS q_contrib
           FROM ns LEFT JOIN ein ON ns.label = ein.label CROSS JOIN m
           ORDER BY ns.label"""
    )
  }
}
