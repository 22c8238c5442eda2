package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 39: EXACT global quantiles by
  * histogram selection — the scale-safe mechanism. Spark's exact
  * `percentile` buffers every value per group (fine per-key, an OOM at a
  * 100 TB global quantile); the selection algorithm here is one
  * aggregation keyed on the (bounded-domain) scaled-cent value plus a
  * cumulative walk over the DISTINCT values — state ∝ |distinct prices|,
  * not ∝ rows. The quantile convention is pinned explicitly (1-based
  * rank ⌈q·n⌉ over ascending values — quantile_disc semantics) and the
  * oracle restates the identical selection, so the hash match certifies
  * the algorithm, not a library's tie convention.
  */
object Extended39 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- v6: exact distributed Gram matrix (XᵀX over the corpus) ----
    // The covariance/PCA building block as one self-join + partial agg:
    // ×1000-quantized int64 entries (v5's discipline), so all 64×64
    // accumulations are exact and the oracle is a hash-identical unnest²
    // restatement. Products bound: 578² × 2000 rows ≈ 6.7e11 < 2⁶³. At
    // scale the join is vec_id-local (co-partitioned explode of the same
    // row) — shuffle carries (pos, pos, partial) cells, 64² per task.
    "v6_gram_matrix" -> ((s, d) => {
      val xs = t(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"),
          round(col("x") * 1000).cast("long").as("xs"))
      xs.as("a").join(xs.as("b"), "vec_id")
        .filter(col("a.pos") <= col("b.pos")) // symmetric: upper triangle
        .groupBy(col("a.pos").as("i"), col("b.pos").as("j"))
        .agg(sum(col("a.xs") * col("b.xs")).as("g"))
        .orderBy("i", "j")
    }),

    "a19_exact_median_hist" -> ((s, d) => {
      val hist = t(s, d, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
        .groupBy("v").agg(count(lit(1)).as("c"))
        .localCheckpoint() // three rank selections reuse it
      // rank ⌈q·n⌉ per quantile by TWO-LEVEL selection over the cent-price
      // domain (operators/Selection): bucket partial sums in a parallel
      // hash agg; the cumulative walk runs over the BOUNDED bucket
      // summaries (domain/4096 rows — sf-invariant) and all three
      // quantiles share the two passes. ceil(q·tw) is the identical
      // double expression the oracle evaluates.
      val qs = Seq(0.5, 0.9, 0.99)
      graft.operators.Selection.selectRanksBounded(hist, Seq.empty, "v", "c",
          qs.map(q => (q.toString, (tw: Long) => math.ceil(q * tw).toLong)),
          "q", "v")
        .select(col("q").cast("double").as("q"),
          round(col("v").cast("double") / 100.0, 2).as("value"))
        .orderBy("q")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "v6_gram_matrix" ->
      """WITH e AS (
           SELECT vec_id,
             [CAST(round(x * 1000) AS BIGINT) for x in CAST(embedding AS DOUBLE[])] AS xs
           FROM embeddings)
         SELECT CAST(i - 1 AS INT) AS i, CAST(j - 1 AS INT) AS j,
           CAST(sum(xs[i] * xs[j]) AS BIGINT) AS g
         FROM e, range(1, 65) a(i), range(1, 65) b(j)
         WHERE i <= j
         GROUP BY i, j ORDER BY i, j""",
    "a19_exact_median_hist" ->
      """WITH h AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             count(*) AS c
           FROM lineitem GROUP BY 1),
         cum AS (
           SELECT v, CAST(sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum
           FROM h),
         n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h)
         SELECT q, round(CAST(v AS DOUBLE) / 100.0, 2) AS value FROM (
           SELECT CAST(0.5 AS DOUBLE) AS q, min(v) AS v FROM cum, n WHERE cum >= ceil(0.5 * n)
           UNION ALL
           SELECT CAST(0.9 AS DOUBLE), min(v) FROM cum, n WHERE cum >= ceil(0.9 * n)
           UNION ALL
           SELECT CAST(0.99 AS DOUBLE), min(v) FROM cum, n WHERE cum >= ceil(0.99 * n))
         ORDER BY q"""
  )
}
