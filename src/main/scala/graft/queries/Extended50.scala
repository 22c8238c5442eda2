package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 50: snapshot differencing and the
  * 2-D skyline (Pareto frontier).
  *
  *  - u7: SNAPSHOT DIFF — the CDC bootstrap: given two snapshots of a
  *    keyed table (A = orders before 1998; B = before 1999, with
  *    simulated updates — status rewritten where key % 97 = 0 — and
  *    simulated deletes — keys % 101 = 0 dropped), emit the
  *    insert/update/delete delta via ONE full outer join on the key +
  *    column compare. This is how a maintained table is reconciled
  *    against a fresh extract when no changelog exists; at 100 TB both
  *    snapshots bucket by the key and the join is co-partitioned,
  *    shuffle-free. Reported as per-op counts + key ranges (the delta
  *    itself is the operator's output; the rollup keeps the oracle row
  *    set stable).
  *  - j24: 2-D SKYLINE (Pareto frontier) of customers over
  *    (recency, monetary): the customers NOT strictly dominated on both
  *    axes. Spark computes it with the SELECTION DISCIPLINE, not a
  *    quadratic dominance join: pre-aggregate max(monetary) per distinct
  *    recency day, one cumulative-max window over DISTINCT days
  *    descending (state ∝ distinct days — the a19 bound), broadcast the
  *    tiny (day, bestAfter) relation back, keep rows whose monetary ≥
  *    every strictly-later day's best. The oracle is the definition
  *    itself — a correlated NOT EXISTS dominance test — so two
  *    completely different algorithms must agree on the frontier.
  */
object Extended50 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- u7: snapshot diff (CDC bootstrap) ----
    "u7_snapshot_diff" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").as("tp"))
      val b = o.filter(col("o_orderdate") < lit("1999-01-01") &&
          !(col("o_orderkey") % 101 === 0 &&
            col("o_orderdate") < lit("1998-01-01")))
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 97 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("st"),
          col("o_totalprice").as("tp"))
      val diff = a.select(col("k").as("ak"), col("st").as("ast"),
          col("tp").as("atp"))
        .join(b, col("ak") === col("k"), "full_outer")
        .select(coalesce(col("ak"), col("k")).as("key"),
          when(col("ak").isNull, "I")
            .when(col("k").isNull, "D")
            .when(col("ast") =!= col("st") || col("atp") =!= col("tp"), "U")
            .otherwise(lit(null)).as("op"))
        .filter(col("op").isNotNull)
      diff.groupBy("op")
        .agg(count(lit(1)).as("n"), min("key").as("min_key"),
          max("key").as("max_key"))
        .orderBy("op")
    }),

    // ---- j24: 2-D skyline via per-day best + cumulative over days ----
    "j24_skyline" -> ((s, d) => {
      val c = t(s, d, "orders")
        .groupBy(col("o_custkey").as("cust"))
        .agg(expr("unix_timestamp(max(o_orderdate)) div 86400").as("r"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("mc"))
        .localCheckpoint()
      // bestAfter(day) = max monetary over strictly later days: cumulative
      // max over DISTINCT days (descending), shifted by one row
      val perDay = c.groupBy("r").agg(max("mc").as("daymax"))
      val after = perDay.withColumn("best_after",
        max("daymax").over(Window.orderBy(col("r").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      c.join(broadcast(after.select(col("r"), col("best_after"))), "r")
        .filter(col("best_after").isNull || col("best_after") <= col("mc"))
        .select(col("cust"), col("r"), col("mc"))
        .orderBy("cust")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "u7_snapshot_diff" ->
      """WITH a AS (
           SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
           FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
         b AS (
           SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END AS st,
             o_totalprice AS tp
           FROM orders
           WHERE o_orderdate < TIMESTAMP '1999-01-01'
             AND NOT (o_orderkey % 101 = 0
                      AND o_orderdate < TIMESTAMP '1998-01-01')),
         d AS (
           SELECT coalesce(a.k, b.k) AS key,
             CASE WHEN a.k IS NULL THEN 'I'
                  WHEN b.k IS NULL THEN 'D'
                  WHEN a.st <> b.st OR a.tp <> b.tp THEN 'U'
                  ELSE NULL END AS op
           FROM a FULL OUTER JOIN b ON a.k = b.k)
         SELECT op, CAST(count(*) AS BIGINT) AS n,
           CAST(min(key) AS BIGINT) AS min_key,
           CAST(max(key) AS BIGINT) AS max_key
         FROM d WHERE op IS NOT NULL GROUP BY op ORDER BY op""",
    "j24_skyline" ->
      """WITH c AS (
           SELECT o_custkey AS cust,
             CAST(floor(epoch(max(o_orderdate))) AS BIGINT) // 86400 AS r,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mc
           FROM orders GROUP BY 1)
         SELECT cust, r, mc FROM c
         WHERE NOT EXISTS (
           SELECT 1 FROM c c2 WHERE c2.r > c.r AND c2.mc > c.mc)
         ORDER BY cust"""
  )
}
