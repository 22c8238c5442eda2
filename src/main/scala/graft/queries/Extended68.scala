package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Dedup

/** Round-7 batch 68: audit-style profiles — Benford digit conformance
  * and the near-dup cluster-size distribution.
  *
  *  - a32_benford: leading-digit profile of price cents against the
  *    Benford expectation — the classic synthetic-/corrupted-data smell
  *    test. Observed shares are one grouped count + a broadcast total;
  *    the nine expected shares are PRECOMPUTED double literals embedded
  *    verbatim in both engines (log10(1+1/d) never evaluates at query
  *    time, so no transcendental enters the parity surface); the
  *    per-digit χ²-style contribution is the identical IEEE sequence.
  *    Nine output rows, no cross-digit sum.
  *  - tp26_cluster_profile: the SIZE HISTOGRAM of near-duplicate
  *    clusters from the LSH → verify → connected-components pipeline
  *    (dedup_near_pipeline's machinery, [[graft.llm.Dedup.clusters]]) —
  *    the dedup-audit view ("how big do dup families get?") that
  *    decides keep-policy and shard budgets. Paired docs get their
  *    component off GraphX CC; singletons are counted by an anti-join;
  *    the histogram is two keyed aggregates over the (id, cluster)
  *    labels. Oracle: the same recursive-closure CTEs as
  *    dedup_near_pipeline, rolled up to sizes.
  *
  * Reference context: no counterpart in the reference; extends the
  * a-family audit statistics and the dedup layer's tp-views.
  */
object Extended68 {
  type Q = (SparkSession, String) => DataFrame

  /** log10(1 + 1/d), d = 1..9, precomputed so both engines read the
    * same literal doubles.
    */
  private val Benford: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
    3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
    5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
    9 -> 0.04575749056067514)

  val queries: Map[String, Q] = Map(
    // ---- a32: Benford leading-digit conformance of price cents ----
    "a32_benford" -> ((s, d) => {
      val obs = t(s, d, "lineitem")
        .select(substring(round(col("l_extendedprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = obs.agg(sum("n").as("tot"))
      val exp = element_at(
        map(Benford.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("digit"))
      obs.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("tot").cast("double")).as("share"),
          exp.as("expected"))
        .withColumn("contrib",
          (col("share") - col("expected")) * (col("share") - col("expected"))
            / col("expected"))
        .orderBy("digit")
    }),

    // ---- tp26: near-dup cluster-size histogram ----
    "tp26_cluster_profile" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.8)
      val comp = Dedup.clusters(pairs)
      val paired = comp.groupBy("cluster").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"))
      val singletons = docs.join(comp, docs("doc_id") === comp("id"),
          "left_anti")
        .agg(count(lit(1)).as("n_clusters"))
        .select(lit(1L).as("size"), col("n_clusters"))
        .filter(col("n_clusters") > 0)
      paired.unionByName(singletons)
        .groupBy("size").agg(sum("n_clusters").as("n_clusters"))
        .orderBy("size")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a32_benford" -> {
      val values = Benford.map { case (k, v) => s"($k, $v)" }.mkString(", ")
      s"""WITH obs AS (
           SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
               AS VARCHAR), 1, 1) AS INT) AS digit,
             CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM obs),
         b(digit, expected) AS (VALUES $values)
         SELECT obs.digit, obs.n,
           CAST(obs.n AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS share,
           b.expected,
           (CAST(obs.n AS DOUBLE) / CAST(tot.tot AS DOUBLE) - b.expected)
             * (CAST(obs.n AS DOUBLE) / CAST(tot.tot AS DOUBLE) - b.expected)
             / b.expected AS contrib
         FROM obs CROSS JOIN tot JOIN b ON b.digit = obs.digit
         ORDER BY obs.digit"""
    },
    "tp26_cluster_profile" ->
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
         rep AS (SELECT s, least(s, min(t)) AS rep FROM reach GROUP BY s),
         sizes AS (SELECT rep, CAST(count(*) AS BIGINT) AS size
                   FROM rep GROUP BY rep),
         hist AS (
           SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
           FROM sizes GROUP BY size
           UNION ALL
           SELECT CAST(1 AS BIGINT) AS size, CAST(count(*) AS BIGINT)
           FROM documents WHERE doc_id NOT IN (SELECT s FROM rep)
             HAVING count(*) > 0)
         SELECT size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters
         FROM hist GROUP BY size ORDER BY size"""
  )
}
