package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 97: seasonality strength, inter-event regularity, and
  * ship-latency SLA.
  *
  *  - a46_seasonality_strength: η² (eta-squared) of the hour-of-week
  *    profile per event type — the fraction of cent-value variance
  *    explained by the 168 hour-of-week cells, the variance-decomposition
  *    measure of "how seasonal is this signal". SS_between and SS_total
  *    reduce to per-cell (count, Σy, Σy²) with y an exact cent BIGINT, so
  *    η² = (Σ_c S_c²/n_c − S²/n) / (Σy² − S²/n) is a fixed IEEE dag over
  *    exact integers — no float enters until the final divisions.
  *    Completes the monitoring family beside a34 (ACF) and e31 (hourly
  *    profile itself).
  *  - e37_gap_regularity: per event type, the mean and coefficient of
  *    variation of inter-event gaps (MINUTE-floored so squared sums stay
  *    far inside BIGINT) — the burstiness/regularity screen (CV ≈ 1 is
  *    Poisson, ≪ 1 is a drumbeat, ≫ 1 is bursty). Gaps come from one
  *    per-type lag window (type-keyed, never global); moments are exact
  *    integer sums.
  *  - q27_ship_sla: the warehouse SLA classic — per order priority, the
  *    share of lineitems shipped within 30/60/90 days of their order
  *    date. One broadcast join of the priority dimension onto lineitem,
  *    day-exact integer date arithmetic, three conditional counts.
  *
  * Scale shapes: a46 is one scan → 168·|types| cells → per-type fold;
  * e37's window is type-keyed (|types|-way parallel, gap lists never
  * driver-side); q27 is scan + broadcast join + hash agg.
  *
  * Reference context: no counterpart; extends the a- (monitoring), e-
  * (event analytics) and q- (warehouse) layers.
  */
object Extended97 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- a46: hour-of-week eta-squared per event type ----
    "a46_seasonality_strength" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_type"),
        // hour-of-week 0..167 anchored on the epoch (Thursday 00:00 —
        // same integer anchor in the oracle, so cells agree exactly)
        expr("(unix_micros(ts) div 3600000000) % 168").as("how"),
        round(col("value") * 100).cast("long").as("y"))
      val cells = ev.groupBy("event_type", "how")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"),
          sum(col("y") * col("y")).as("syy"))
      cells.groupBy("event_type")
        .agg(sum("n").as("n"), sum("sy").as("s"), sum("syy").as("q"),
          // Σ_c S_c²/n_c folded as DOUBLE per 168-cell group; the
          // per-cell term is exact-integer-sourced and the fold order is
          // the same hash-agg order risk both engines share only through
          // rounding — so the BETWEEN sum is computed from the exact
          // per-cell integers via a sorted list fold, pinned below
          sort_array(collect_list(struct(col("how"), col("sy"), col("n"))))
            .as("cl"))
        .withColumn("between", expr(
          """aggregate(cl, cast(0.0 as double),
               (acc, x) -> acc + cast(x.sy as double) * cast(x.sy as double)
                 / cast(x.n as double))"""))
        .select(col("event_type"),
          round((col("between")
            - col("s").cast("double") * col("s").cast("double") / col("n").cast("double"))
            / (col("q").cast("double")
              - col("s").cast("double") * col("s").cast("double") / col("n").cast("double")),
            6).as("eta_sq"))
        .orderBy("event_type")
    }),

    // ---- e37: inter-event gap regularity (mean, CV) per type ----
    "e37_gap_regularity" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), col("event_id"),
          expr("unix_micros(ts) div 60000000").as("mn"))
      val w = Window.partitionBy("event_type").orderBy("mn", "event_id")
      val gaps = ev.withColumn("g", col("mn") - lag("mn", 1).over(w))
        .filter(col("g").isNotNull)
      gaps.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("g").as("sg"),
          sum(col("g") * col("g")).as("sgg"))
        .select(col("event_type"), col("n"),
          round(col("sg").cast("double") / col("n").cast("double"), 6)
            .as("mean_gap_min"),
          // sample CV: sqrt((n·Σg² − (Σg)²)/(n·(n−1))) / (Σg/n)
          round(sqrt((col("n") * col("sgg") - col("sg") * col("sg")).cast("double")
              / (col("n") * (col("n") - 1)).cast("double"))
            / (col("sg").cast("double") / col("n").cast("double")), 6).as("cv"))
        .orderBy("event_type")
    }),

    // ---- q27: ship-latency SLA attainment by order priority ----
    "q27_ship_sla" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("unix_timestamp(o_orderdate) div 86400").as("od"))
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"),
          expr("unix_timestamp(l_shipdate) div 86400").as("sd"))
      // lineitem⋈orders is the canonical big-big equi-join on orderkey —
      // no broadcast hint: at scale both sides shuffle on the key (AQE
      // still picks broadcast at test sizes on its own)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("lat", col("sd") - col("od"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("lat") <= 30, 1L).otherwise(0L)).as("in30"),
          sum(when(col("lat") <= 60, 1L).otherwise(0L)).as("in60"),
          sum(when(col("lat") <= 90, 1L).otherwise(0L)).as("in90"))
        .select(col("o_orderpriority"), col("n_items"),
          round(col("in30").cast("double") / col("n_items").cast("double"), 6)
            .as("sla30"),
          round(col("in60").cast("double") / col("n_items").cast("double"), 6)
            .as("sla60"),
          round(col("in90").cast("double") / col("n_items").cast("double"), 6)
            .as("sla90"))
        .orderBy("o_orderpriority")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a46_seasonality_strength" ->
      """WITH ev AS (
           SELECT event_type,
             (epoch_us(ts) // 3600000000) % 168 AS how,
             CAST(round(value * 100) AS BIGINT) AS y
           FROM events),
         cells AS (
           SELECT event_type, how, count(*) AS n,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy
           FROM ev GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(sy) AS BIGINT) AS s, CAST(sum(syy) AS BIGINT) AS q,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(
                   list_sort(list({'how': how, 'sy': sy, 'n': n})),
                   x -> CAST(x.sy AS DOUBLE) * CAST(x.sy AS DOUBLE)
                     / CAST(x.n AS DOUBLE))),
               (acc, x) -> acc + x) AS between_sum
           FROM cells GROUP BY event_type)
         SELECT event_type,
           round((between_sum
             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)),
             6) AS eta_sq
         FROM tot ORDER BY event_type""",
    "e37_gap_regularity" ->
      """WITH ev AS (
           SELECT event_type, event_id,
             epoch_us(ts) // 60000000 AS mn
           FROM events),
         g AS (
           SELECT event_type,
             mn - lag(mn) OVER (PARTITION BY event_type
               ORDER BY mn, event_id) AS g
           FROM ev),
         m AS (
           SELECT event_type, count(*) AS n, CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(g * g) AS BIGINT) AS sgg
           FROM g WHERE g IS NOT NULL GROUP BY 1)
         SELECT event_type, n,
           round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_min,
           round(sqrt(CAST(n * sgg - sg * sg AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE))
             / (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cv
         FROM m ORDER BY event_type""",
    "q27_ship_sla" ->
      """WITH o AS (
           SELECT o_orderkey, o_orderpriority,
             epoch(o_orderdate) // 86400 AS od
           FROM orders),
         li AS (
           SELECT l_orderkey, epoch(l_shipdate) // 86400 AS sd
           FROM lineitem),
         j AS (
           SELECT o_orderpriority, sd - od AS lat
           FROM li JOIN o ON l_orderkey = o_orderkey)
         SELECT o_orderpriority, count(*) AS n_items,
           round(CAST(count(*) FILTER (WHERE lat <= 30) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS sla30,
           round(CAST(count(*) FILTER (WHERE lat <= 60) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS sla60,
           round(CAST(count(*) FILTER (WHERE lat <= 90) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS sla90
         FROM j GROUP BY 1 ORDER BY o_orderpriority"""
  )
}
