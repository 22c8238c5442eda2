package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.llm.Similarity

/** Round-6 surface extensions, batch 48: degree assortativity and kNN
  * label agreement.
  *
  *  - j22: DEGREE ASSORTATIVITY (Newman's r — nx
  *    `degree_assortativity_coefficient`): the Pearson correlation of
  *    endpoint degrees over edges, computed ENTIRELY from integer power
  *    sums: with j, k the endpoint degrees of each canonical edge and M
  *    the edge count, r = (4M·Σjk − (Σ(j+k))²) / (2M·Σ(j²+k²) −
  *    (Σ(j+k))²) — the textbook formula cleared of fractions, so every
  *    aggregation is an exact BIGINT fold (combine-order-proof) and the
  *    whole statistic is ONE double division at the end. Scale shape:
  *    one degree aggregation + two broadcast-joinable degree lookups +
  *    one partial-agg pass over edges.
  *  - v7: kNN LABEL AGREEMENT — the label-noise screen (confident-
  *    learning's first step): for each embedding in a deterministic
  *    1-in-7 subset, the fraction of its 10 nearest neighbours (cosine,
  *    within the subset) that share its label. Low agreement flags
  *    probable mislabels. Pair scores ride the native codegen cosine
  *    kernel; per-point top-10 is the bounded-heap GroupTopK. The
  *    subset keeps the demonstration pair join quadratic-in-subset only;
  *    the LSH/IVF candidate generation (ann_*) is the documented scale
  *    path, exactly as with dedup_embedding_cosine.
  */
object Extended48 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- j22: degree assortativity from integer power sums ----
    "j22_assortativity" -> ((s, d) => {
      val edges = Extended42.sparseSupernodeEdges(s, d)
      val deg = edges.select(col("u").as("node"))
        .union(edges.select(col("v")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val ek = edges
        .join(broadcast(deg.select(col("node").as("u"), col("d").as("j"))), "u")
        .join(broadcast(deg.select(col("node").as("v"), col("d").as("k"))), "v")
      val sums = ek.agg(count(lit(1)).as("m"),
        sum(col("j") + col("k")).as("s1"),
        sum(col("j") * col("k")).as("s2"),
        sum(col("j") * col("j") + col("k") * col("k")).as("s3"))
      sums.select(col("m").as("n_edges"),
        round((lit(4L) * col("m") * col("s2") - col("s1") * col("s1"))
            .cast("double") /
          (lit(2L) * col("m") * col("s3") - col("s1") * col("s1"))
            .cast("double"), 6).as("assortativity"))
    }),

    // ---- v7: kNN label agreement (label-noise screen) ----
    "v7_knn_label_agreement" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("vec_id") % 7 === 0)
        .select(col("vec_id"), col("embedding"), col("label"))
      val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"),
        col("label").as("la"))
      val pairs = e.crossJoin(broadcast(a))
        .filter(col("vec_id") =!= col("ia"))
        .select(col("ia"), col("la"), col("label").as("lb"),
          Similarity.cosine(col("embedding"), col("va")).as("s"),
          col("vec_id").as("ib"))
      graft.plans.GroupTopK.topK(pairs, Seq("ia"),
          Seq(("s", false), ("ib", true)), 10)
        .groupBy(col("ia").as("vec_id"), col("la").as("label"))
        .agg(count(lit(1)).as("n_nn"),
          count_if(col("lb") === col("la")).as("n_agree"))
        .withColumn("agree_frac",
          round(col("n_agree") * lit(1.0) / col("n_nn"), 4))
        .orderBy("vec_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j22_assortativity" ->
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
         ek AS (
           SELECT du.d AS j, dv.d AS k
           FROM edges e JOIN deg du ON e.u = du.node
           JOIN deg dv ON e.v = dv.node),
         s AS (
           SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(j + k) AS BIGINT) AS s1,
             CAST(sum(j * k) AS BIGINT) AS s2,
             CAST(sum(j * j + k * k) AS BIGINT) AS s3
           FROM ek)
         SELECT m AS n_edges,
           round(CAST(4 * m * s2 - s1 * s1 AS DOUBLE) /
                 CAST(2 * m * s3 - s1 * s1 AS DOUBLE), 6) AS assortativity
         FROM s""",
    "v7_knn_label_agreement" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
             FROM embeddings WHERE vec_id % 7 = 0),
         pairs AS (
           SELECT a.vec_id AS ia, a.label AS la, b.vec_id AS ib,
             b.label AS lb, list_cosine_similarity(a.v, b.v) AS s
           FROM e a JOIN e b ON a.vec_id <> b.vec_id),
         nn AS (
           SELECT ia, la, lb,
             row_number() OVER (PARTITION BY ia ORDER BY s DESC, ib) AS rn
           FROM pairs)
         SELECT ia AS vec_id, la AS label,
           CAST(count(*) AS BIGINT) AS n_nn,
           CAST(count(*) FILTER (WHERE lb = la) AS BIGINT) AS n_agree,
           round(count(*) FILTER (WHERE lb = la) * 1.0 / count(*), 4)
             AS agree_frac
         FROM nn WHERE rn <= 10
         GROUP BY ia, la ORDER BY ia"""
  )
}
