package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 49: rich-club coefficient and
  * Flesch readability.
  *
  *  - j23: RICH-CLUB COEFFICIENT (nx `rich_club_coefficient`, unnormalized):
  *    for each degree threshold k, the edge density among nodes of degree
  *    > k — φ(k) = 2·E_k / (N_k·(N_k−1)). "Do the hubs talk to each
  *    other?" — the connectivity-concentration question road/infra
  *    analysts ask of a network. All counting is exact BIGINT (every
  *    edge pre-joined to its endpoint degrees once, then ONE pass
  *    bucketing by min-degree against the tiny k frame — broadcast
  *    non-equi join, never an edges×edges product); φ is one double
  *    expression. The k frame is bounded by max degree (12 here), so
  *    state is |k| rows.
  *  - t21: FLESCH READING EASE per document — the classic quality/
  *    difficulty prior for curation (readability-based filtering à la
  *    textbook-quality selection): 206.835 − 1.015·(words/sentences) −
  *    84.6·(syllables/words), with sentences = [.!?]+ group count
  *    (floored at 1) and syllables approximated by vowel-group count —
  *    the standard regex reduction, identical `regexp_extract_all`
  *    semantics both engines, one shared double expression tree. One
  *    corpus scan, three regex/split evaluations, no shuffle at all
  *    until the final order.
  */
object Extended49 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- j23: rich-club coefficient over degree thresholds ----
    "j23_rich_club" -> ((s, d) => {
      import s.implicits._
      val edges = Extended42.sparseSupernodeEdges(s, d)
      val deg = edges.select(col("u").as("node"))
        .union(edges.select(col("v")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val ks = broadcast((0 until 12).toDF("k"))
      val nk = ks.join(deg, col("d") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_nodes"))
      val mind = edges
        .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
        .select(least(col("du"), col("dv")).as("mind"))
      val ekk = ks.join(mind, col("mind") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_edges"))
      nk.join(ekk, Seq("k"), "left")
        .filter(col("n_nodes") >= 2)
        .select(col("k"), col("n_nodes"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          round(lit(2.0) * coalesce(col("n_edges"), lit(0L)) /
            (col("n_nodes") * (col("n_nodes") - lit(1.0))), 6).as("phi"))
        .orderBy("k")
    }),

    // ---- t21: Flesch reading ease per document ----
    "t21_readability" -> ((s, d) => {
      val words = size(split(col("text"), " ")).cast("long")
      val sentences = greatest(
        size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
        .cast("long")
      val syllables = size(
        expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")).cast("long")
      t(s, d, "documents")
        .select(col("doc_id"), words.as("words"), sentences.as("sentences"),
          syllables.as("syllables"))
        .withColumn("flesch", round(lit(206.835)
          - lit(1.015) * (col("words").cast("double") / col("sentences"))
          - lit(84.6) * (col("syllables").cast("double") / col("words")), 4))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j23_rich_club" ->
      """WITH edges AS (
           SELECT least(o_custkey % 128, o_orderkey % 128) AS u,
                  greatest(o_custkey % 128, o_orderkey % 128) AS v
           FROM orders
           WHERE o_orderkey % 89 = 0 AND o_custkey % 128 <> o_orderkey % 128
           GROUP BY 1, 2),
         deg AS (
           SELECT node, CAST(count(*) AS BIGINT) AS d FROM
             (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
           GROUP BY node),
         ks AS (SELECT unnest(range(0, 12)) AS k),
         nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
                FROM ks JOIN deg ON deg.d > ks.k GROUP BY k),
         ekk AS (
           SELECT ks.k, CAST(count(*) AS BIGINT) AS n_edges
           FROM ks JOIN (
             SELECT least(du.d, dv.d) AS mind
             FROM edges e JOIN deg du ON e.u = du.node
             JOIN deg dv ON e.v = dv.node) m
           ON m.mind > ks.k GROUP BY ks.k)
         SELECT nk.k, nk.n_nodes, coalesce(ekk.n_edges, 0) AS n_edges,
           round(2.0 * coalesce(ekk.n_edges, 0)
             / (nk.n_nodes * (nk.n_nodes - 1.0)), 6) AS phi
         FROM nk LEFT JOIN ekk ON nk.k = ekk.k
         WHERE nk.n_nodes >= 2
         ORDER BY nk.k""",
    "t21_readability" ->
      """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
             AS sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
             AS syllables,
           round(206.835
             - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
                        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
             - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS DOUBLE)
                       / len(string_split(text, ' '))), 4) AS flesch
         FROM documents ORDER BY doc_id"""
  )
}
