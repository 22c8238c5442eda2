package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 55: integer-exact sequential
  * monitoring statistics.
  *
  * Both operators are RUNNING-EXTREMUM walks kept entirely in BIGINT
  * (values scaled to milli-units, deviations from an integer reference),
  * so every window is key-local AND every number is combine-order exact —
  * the float-free way to do sequential monitoring cross-engine:
  *
  *  - e28: MAX DRAWDOWN per user over the signed engagement balance
  *    (credits: purchase/signup; debits: everything else): drawdown_t =
  *    runmax(balance) − balance_t, answer = max_t. The classic
  *    peak-to-trough statistic, exact on the integer walk.
  *  - e29: CUSUM MAX EXCURSION per event type — S_t = Σ(v − global
  *    median), excursion_t = S_t − runmin(S_t): the one-sided CUSUM
  *    change-detection statistic (Page), reported as its maximum. The
  *    global median is the a19 selection over the (value, count)
  *    histogram (an exact integer), so the whole pipeline is integers.
  *
  * The per-key total order is (ts, event_id) — event_id unique, so walks
  * are deterministic under tied timestamps on both engines.
  */
object Extended55 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- e28: max drawdown of the signed engagement balance ----
    "e28_max_drawdown" -> ((s, d) => {
      val v = round(col("value") * 1000).cast("long")
      val x = t(s, d, "events").select(col("user_id"),
        when(col("event_type").isin("purchase", "signup"), v)
          .otherwise(-v).as("v"),
        col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
      val byUser = Window.partitionBy("user_id").orderBy("rn")
      val bal = x.withColumn("bal", sum("v").over(byUser))
      val dd = bal.withColumn("drawdown",
        max("bal").over(byUser) - col("bal"))
      dd.groupBy("user_id")
        .agg(max("drawdown").as("max_drawdown_milli"))
        .orderBy("user_id")
    }),

    // ---- e29: CUSUM max excursion vs the exact global median ----
    "e29_cusum_excursion" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          round(col("value") * 1000).cast("long").as("v"))
        .localCheckpoint()
      val cnt = ev.groupBy("v").agg(count(lit(1)).as("n"))
      // global lower median via driver-assisted bounded selection (the
      // value domain is milli-scaled and fixed, so the artifact is
      // sf-invariant) — NOT a sum-over-Window.orderBy cumulative walk,
      // which would serialize the whole histogram through one reducer
      val med = graft.operators.Selection
        .lowerMedianBounded(cnt, Seq.empty, "v", "n", "m")
      val x = ev.crossJoin(broadcast(med))
        .select(col("event_type"), (col("v") - col("m")).as("dv"),
          col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("ts", "event_id")))
      val byType = Window.partitionBy("event_type").orderBy("rn")
      val st = x.withColumn("st", sum("dv").over(byType))
      val exc = st.withColumn("e", col("st") - min("st").over(byType))
      exc.groupBy("event_type")
        .agg(max("e").as("max_excursion_milli"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e28_max_drawdown" ->
      """WITH x AS (
           SELECT user_id,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN CAST(round(value * 1000) AS BIGINT)
                  ELSE -CAST(round(value * 1000) AS BIGINT) END AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
           FROM events),
         bal AS (
           SELECT user_id, rn,
             sum(v) OVER (PARTITION BY user_id ORDER BY rn) AS bal
           FROM x),
         dd AS (
           SELECT user_id,
             max(bal) OVER (PARTITION BY user_id ORDER BY rn) - bal AS drawdown
           FROM bal)
         SELECT user_id, CAST(max(drawdown) AS BIGINT) AS max_drawdown_milli
         FROM dd GROUP BY user_id ORDER BY user_id""",
    "e29_cusum_excursion" ->
      """WITH h AS (SELECT CAST(round(value * 1000) AS BIGINT) AS v, count(*) AS n
                 FROM events GROUP BY 1),
         med AS (
           SELECT min(v) AS m FROM (
             SELECT v, sum(n) OVER (ORDER BY v) AS cw, sum(n) OVER () AS tw
             FROM h) WHERE 2 * cw >= tw),
         x AS (
           SELECT event_type,
             CAST(round(value * 1000) AS BIGINT) - med.m AS dv,
             row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
               AS rn
           FROM events, med),
         s AS (
           SELECT event_type, rn,
             sum(dv) OVER (PARTITION BY event_type ORDER BY rn) AS st
           FROM x),
         exc AS (
           SELECT event_type,
             st - min(st) OVER (PARTITION BY event_type ORDER BY rn) AS e
           FROM s)
         SELECT event_type, CAST(max(e) AS BIGINT) AS max_excursion_milli
         FROM exc GROUP BY event_type ORDER BY event_type"""
  )
}
