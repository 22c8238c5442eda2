package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-3 surface extensions, batch 14: linear-regression aggregates and
  * higher-moment statistics (skewness / kurtosis).
  *
  * Both engines implement regr_ and stddev aggregates with order-dependent incremental
  * (Welford-style) accumulation, so cross-engine bit-parity of the raw
  * aggregates is not guaranteed. These queries instead derive every
  * statistic from raw power sums (n, Sx, Sy, Sxy, Sx2, Sx3, Sx4) over
  * integral-valued columns: the sums are exact integers (< 2^53), the
  * statistics are closed-form divisions over them, and the result is
  * bit-identical on any IEEE engine regardless of partitioning or row
  * order — the distributed-determinism property the incremental forms
  * lack. Same single-pass partial-aggregation plan shape as the built-ins.
  */
object Extended14 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- linear regression y = a·x + b per group, from exact sums ----
    "a16_regr_battery" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          col("l_linenumber").cast("long").as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        // cast each SUM to double BEFORE any product: the sums themselves
        // are exact int64, but products like n·sxx or sx·sx overflow int64
        // at ~sf100 — where DuckDB silently promotes to 128-bit and Spark
        // wraps. Double products of identically-cast operands are
        // correctly rounded and therefore still bit-identical cross-engine.
        .select(col("l_returnflag"), col("n"),
          round((col("n").cast("double") * col("sxy").cast("double") -
                 col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
             col("sx").cast("double") * col("sx").cast("double")), 9).as("slope"),
          round((col("sy").cast("double") * col("sxx").cast("double") -
                 col("sx").cast("double") * col("sxy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
             col("sx").cast("double") * col("sx").cast("double")), 9).as("intercept"),
          round(((col("n").cast("double") * col("sxy").cast("double") -
                  col("sx").cast("double") * col("sy").cast("double")) *
                 (col("n").cast("double") * col("sxy").cast("double") -
                  col("sx").cast("double") * col("sy").cast("double"))) /
            ((col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
             (col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 9).as("r2"))
        .orderBy("l_returnflag")),

    // ---- skewness and excess kurtosis per group, from exact power sums ----
    "a17_moments" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
        .select(col("l_returnflag"), col("n"),
          round(col("s1").cast("double") / col("n"), 9).as("mean"),
          // central moments from power sums: m_k = E[(x-μ)^k]
          round(expr("""
            (s3 / CAST(n AS DOUBLE)
              - 3.0d * (s1 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE))
              + 2.0d * pow(s1 / CAST(n AS DOUBLE), 3))
            / pow(s2 / CAST(n AS DOUBLE) - pow(s1 / CAST(n AS DOUBLE), 2), 1.5d)"""), 9)
            .as("skewness"),
          round(expr("""
            (s4 / CAST(n AS DOUBLE)
              - 4.0d * (s1 / CAST(n AS DOUBLE)) * (s3 / CAST(n AS DOUBLE))
              + 6.0d * pow(s1 / CAST(n AS DOUBLE), 2) * (s2 / CAST(n AS DOUBLE))
              - 3.0d * pow(s1 / CAST(n AS DOUBLE), 4))
            / pow(s2 / CAST(n AS DOUBLE) - pow(s1 / CAST(n AS DOUBLE), 2), 2) - 3.0d"""), 9)
            .as("kurtosis"))
        .orderBy("l_returnflag"))
  )

  val oracleSql: Map[String, String] = Map(
    "a16_regr_battery" ->
      """WITH s AS (
           SELECT l_returnflag, count(*) AS n,
             sum(CAST(l_quantity AS BIGINT)) AS sx,
             sum(CAST(l_linenumber AS BIGINT)) AS sy,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS sxy,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
             sum(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS syy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                  CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS slope,
           round((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE) -
                  CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS intercept,
           round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                   CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
                  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                   CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
             ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
              (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
               CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS r2
         FROM s ORDER BY l_returnflag""",
    "a17_moments" ->
      """WITH s AS (
           SELECT l_returnflag, count(*) AS n,
             sum(CAST(l_quantity AS BIGINT)) AS s1,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) *
                 CAST(l_quantity AS BIGINT)) AS s3,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) *
                 CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           round(CAST(s1 AS DOUBLE) / n, 9) AS mean,
           round((CAST(s3 AS DOUBLE) / n
               - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
               + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3))
             / pow(CAST(s2 AS DOUBLE) / n - pow(CAST(s1 AS DOUBLE) / n, 2), 1.5), 9)
             AS skewness,
           round((CAST(s4 AS DOUBLE) / n
               - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
               + 6.0 * pow(CAST(s1 AS DOUBLE) / n, 2) * (CAST(s2 AS DOUBLE) / n)
               - 3.0 * pow(CAST(s1 AS DOUBLE) / n, 4))
             / pow(CAST(s2 AS DOUBLE) / n - pow(CAST(s1 AS DOUBLE) / n, 2), 2) - 3.0, 9)
             AS kurtosis
         FROM s ORDER BY l_returnflag"""
  )
}
