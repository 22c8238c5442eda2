package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 117: TextRank keyword extraction (Mihalcea & Tarau,
  * EMNLP'04 — public formulation).
  *
  * t35_textrank_keywords: graph-based keyword ranking over the corpus —
  * the unsupervised upgrade of frequency-ranked terms (t5 tf-idf ranks
  * per doc; this ranks corpus-wide by co-occurrence centrality).
  *
  *  - Candidate vocabulary: the top-100 words by corpus frequency
  *    (TakeOrdered, (count desc, word) tie-break) — the standard
  *    candidate-filter step of TextRank in practice, and what makes the
  *    GRAPH a bounded artifact: ≤100 nodes, ≤100² weighted edges, at
  *    ANY corpus size. Only the co-occurrence counting is
  *    corpus-proportional (one lead window per doc + one hash agg).
  *  - Edges: adjacent-word co-occurrence (window 2), canonicalized
  *    undirected with integer weights, symmetrized for scoring.
  *  - Ranking: three damped iterations of the weighted PageRank
  *    recurrence s'_i = 0.15 + 0.85·Σ_j (w_ij / W_j)·s_j. Weights and
  *    strengths W_j are exact BIGINTs; each term is one division and
  *    one multiply; and the per-node sum FOLDS OVER THE
  *    NEIGHBOR-SORTED LIST on both engines (`aggregate(sort_array(...))`
  *    ↔ `list_reduce(list(x ORDER BY j))`) — the a46/a31 discipline, so
  *    the float accumulation order cannot drift even on a 99-neighbor
  *    hub. The oracle unrolls the identical three iterations.
  *  - Output: top-20 keywords by final score (raw-double order, word
  *    tie-break; the rounded score is presentation).
  *
  * Scale shape: one corpus scan → (doc-keyed lead window) → hash agg
  * builds the bounded graph; the three iterations run on the ≤100-node
  * artifact (broadcast joins). No global windows, no driver loops.
  *
  * Reference context: no counterpart; extends the text-analysis layer
  * (t5 tf-idf, t10 collocations, r-family PageRank machinery).
  */
object Extended117 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "t35_textrank_keywords" -> ((s, d) => {
      // NO fanOut here: the word posexplode is cheap per row relative to
      // the round-robin shuffle of the full documents projection the r12
      // fanOut paid for it (1.46 → 1.73 s medians shipped) — the doc-keyed
      // lead window below repartitions by doc_id anyway, so the explode's
      // scan parallelism never carries past the first exchange
      val words = t(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
      val cand = words.groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(100)
        .select("w")
      // adjacent co-occurrence via a doc-keyed lead window (per-doc
      // parallelism — never a corpus self-join), endpoints restricted
      // to the candidates
      val adj = words
        .withColumn("wb", lead("w", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("pos")))
        .filter(col("wb").isNotNull)
        .select(col("w").as("wa"), col("wb"))
        .filter(col("wa") =!= col("wb"))
        .join(broadcast(cand.withColumnRenamed("w", "wa")), Seq("wa"), "left_semi")
        .join(broadcast(cand.withColumnRenamed("w", "wb")), Seq("wb"), "left_semi")
      val und = adj
        .select(least(col("wa"), col("wb")).as("a"),
          greatest(col("wa"), col("wb")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("wt"))
      val sym = und.select(col("a").as("i"), col("b").as("j"), col("wt"))
        .unionAll(und.select(col("b").as("i"), col("a").as("j"), col("wt")))
        .localCheckpoint() // ≤2·100² rows, reused every iteration
      val strength = sym.groupBy(col("j")).agg(sum("wt").as("wj"))
      val withW = sym.join(strength, "j")
      val nodes = sym.select(col("i")).distinct()
      // three damped iterations; the per-node sum folds neighbor-sorted
      def step(prev: DataFrame): DataFrame = {
        val terms = withW
          .join(prev.withColumnRenamed("i", "j"), "j")
          .select(col("i"), col("j"),
            (col("wt").cast("double") / col("wj").cast("double") *
              col("s")).as("term"))
        nodes.join(
            terms.groupBy("i").agg(
              aggregate(sort_array(collect_list(struct(col("j"),
                  col("term")))),
                lit(0.0), (acc, x) => acc + x("term")).as("contrib")),
            Seq("i"), "left")
          .select(col("i"),
            (lit(0.15) + lit(0.85) * coalesce(col("contrib"), lit(0.0)))
              .as("s"))
      }
      val s0 = nodes.select(col("i"), lit(1.0).as("s"))
      val s3 = step(step(step(s0)))
      s3.orderBy(col("s").desc, col("i")).limit(20)
        .select(col("i").as("word"), round(col("s"), 6).as("score"))
    })
  )

  val oracleSql: Map[String, String] = {
    def step(prev: String, next: String) =
      s"""$next AS (
           SELECT n.i,
             CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * coalesce((
               SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(CAST(e.wt AS DOUBLE) / CAST(st.wj AS DOUBLE) * p.s
                   ORDER BY e.j)), (a, b) -> a + b)
               FROM sym e JOIN strength st ON st.j = e.j
                 JOIN $prev p ON p.i = e.j
               WHERE e.i = n.i), CAST(0 AS DOUBLE)) AS s
           FROM nodes n)"""
    Map(
      "t35_textrank_keywords" ->
        s"""WITH w AS (
             SELECT doc_id, ws[i+1] AS w, i AS pos
             FROM (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
               LATERAL (SELECT unnest(range(0, len(ws))) AS i) r
             WHERE len(ws[i+1]) > 0),
           wr AS (
             SELECT doc_id, w, row_number() OVER (
               PARTITION BY doc_id ORDER BY pos) AS rp
             FROM w),
           cand AS (
             SELECT w FROM (
               SELECT w, count(*) AS cnt FROM w GROUP BY w
               ORDER BY cnt DESC, w LIMIT 100)),
           adj AS (
             SELECT x.w AS wa, y.w AS wb
             FROM wr x JOIN wr y
               ON x.doc_id = y.doc_id AND y.rp = x.rp + 1
             WHERE x.w <> y.w
               AND x.w IN (SELECT w FROM cand)
               AND y.w IN (SELECT w FROM cand)),
           und AS (
             SELECT least(wa, wb) AS a, greatest(wa, wb) AS b,
               CAST(count(*) AS BIGINT) AS wt
             FROM adj GROUP BY 1, 2),
           sym AS (
             SELECT a AS i, b AS j, wt FROM und
             UNION ALL SELECT b, a, wt FROM und),
           strength AS (
             SELECT j, CAST(sum(wt) AS BIGINT) AS wj FROM sym GROUP BY j),
           nodes AS (SELECT DISTINCT i FROM sym),
           s0 AS (SELECT i, CAST(1 AS DOUBLE) AS s FROM nodes),
           ${step("s0", "s1")},
           ${step("s1", "s2")},
           ${step("s2", "s3")}
           SELECT i AS word, round(s, 6) AS score
           FROM s3 ORDER BY s DESC, i LIMIT 20"""
    )
  }
}
