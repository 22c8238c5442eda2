package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 92: extreme-value statistics — the tail-risk view of the
  * drift/monitoring family (a16/a39 describe the middle of the
  * distribution; these two describe the part that breaks systems).
  *
  *  - a42_gumbel_block_maxima: daily block maxima of the event value
  *    (exact milli-unit MAX per calendar day — an integer aggregate),
  *    then the Gumbel method-of-moments fit over the ~30-row block
  *    summary: β = s·√6/π, μ = m − γ·β (Euler–Mascheroni γ as a shared
  *    literal). Mean and variance come from exact BIGINT Σx/Σx² over
  *    the bounded block table, so the only floats are the terminal
  *    fit arithmetic — identical IEEE dags in both engines.
  *  - a43_hill_tail_index: the Hill estimator of the document-length
  *    power-law tail at k = 64 — ξ = (1/k)·Σ ln(x_(i)/x_(k+1)) over the
  *    65 largest n_chars. The top-65 come through TakeOrdered (bounded
  *    heap, no global sort); the ln-sum folds over the DESC-SORTED
  *    65-element list on BOTH engines (`aggregate` ↔ `list_reduce`, the
  *    a33/r8 discipline), so the float sum order is pinned, not hoped
  *    for. α = 1/ξ is the reported tail exponent.
  *
  * Scale shape: a42 is one scan → ≤366-row block table → 1-row fit;
  * a43 is one TakeOrdered (per-partition 65-heaps) → a single-row fold.
  *
  * Reference context: no counterpart; completes the monitoring family
  * with the extreme-value pair (block maxima / peaks-over-threshold
  * tail index).
  */
object Extended92 {
  type Q = (SparkSession, String) => DataFrame

  /** Euler–Mascheroni constant, shared literal with the oracle. */
  private val Gamma = "0.5772156649015329"

  val queries: Map[String, Q] = Map(
    "a42_gumbel_block_maxima" -> ((s, d) => {
      val blocks = t(s, d, "events")
        .select(date_trunc("day", col("ts")).as("day"),
          round(col("value") * 1000).cast("long").as("mv"))
        .groupBy("day").agg(max("mv").as("bx"))
      val agg = blocks.agg(count(lit(1)).as("n"),
        sum("bx").as("sx"),
        sum(col("bx") * col("bx")).as("sxx"))
      val n = col("n").cast("double")
      val mean = col("sx").cast("double") / n / 1000.0
      // sample variance from exact sums: (n·Σx² − (Σx)²)/(n(n−1)), then
      // rescale milli-units² → units²
      val variance = (col("n").cast("decimal(38,0)") * col("sxx") -
        col("sx").cast("decimal(38,0)") * col("sx")).cast("double") /
        (col("n") * (col("n") - 1)).cast("double") / 1000000.0
      val beta = sqrt(variance) * math.sqrt(6.0) / math.Pi
      agg.select(col("n").as("n_blocks"),
        round(mean, 6).as("mean_max"),
        round(sqrt(variance), 6).as("sd_max"),
        round(beta, 6).as("gumbel_beta"),
        round(mean - lit(Gamma.toDouble) * beta, 6).as("gumbel_mu"))
    }),

    "a43_hill_tail_index" -> ((s, d) => {
      val top = t(s, d, "documents")
        .select(col("n_chars").cast("double").as("x"))
        .orderBy(col("x").desc).limit(65)
      // single-row artifact: fold ln(x_i / x_65) over the desc-sorted list
      val xs = top.agg(reverse(sort_array(collect_list("x"))).as("xs"))
      xs.select(
          lit(64L).as("k"),
          element_at(col("xs"), 65).as("x_k1"),
          aggregate(slice(col("xs"), 1, 64), lit(0.0),
            (acc, e) => acc + log(e / element_at(col("xs"), 65))).as("lnsum"))
        .select(col("k"), col("x_k1"),
          round(col("lnsum") / 64.0, 6).as("hill_xi"),
          round(lit(64.0) / col("lnsum"), 6).as("tail_alpha"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a42_gumbel_block_maxima" ->
      s"""WITH b AS (
           SELECT date_trunc('day', ts) AS day,
             CAST(max(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS bx
           FROM events GROUP BY day),
         a AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(bx) AS BIGINT) AS sx,
             CAST(sum(bx * bx) AS BIGINT) AS sxx
           FROM b),
         f AS (
           SELECT n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0 AS mean,
             CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
               AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) / 1000000.0 AS var
           FROM a)
         SELECT n AS n_blocks, round(mean, 6) AS mean_max,
           round(sqrt(var), 6) AS sd_max,
           round(sqrt(var) * sqrt(6.0) / pi(), 6) AS gumbel_beta,
           round(mean - $Gamma * (sqrt(var) * sqrt(6.0) / pi()), 6)
             AS gumbel_mu
         FROM f""",
    "a43_hill_tail_index" ->
      """WITH top AS (
           SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
           ORDER BY x DESC LIMIT 65),
         l AS (
           SELECT list_sort(list(x), 'DESC') AS xs FROM top),
         s AS (
           SELECT xs[65] AS x_k1,
             list_reduce(list_prepend(0.0,
               list_transform(xs[1:64], e -> ln(e / xs[65]))),
               (a, b) -> a + b) AS lnsum
           FROM l)
         SELECT CAST(64 AS BIGINT) AS k, x_k1,
           round(lnsum / 64.0, 6) AS hill_xi,
           round(64.0 / lnsum, 6) AS tail_alpha
         FROM s"""
  )
}
