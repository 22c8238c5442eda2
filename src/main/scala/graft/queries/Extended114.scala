package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Selection

/** Round-8 batch 114: seasonal forecasting and variance homogeneity —
  * the two remaining classical instruments beside e30 (Holt) and a39
  * (Welch).
  *
  *  - e40_holt_winters: additive Holt–Winters (level + trend + 24-hour
  *    seasonal cycle) over each type's hourly count series, with
  *    α = 0.25, β = 0.5, γ = 0.25 (all binary-exact). Init is the
  *    standard first-cycle scheme (l₀ = mean of the first 24 hours,
  *    b₀ = 0, s_j = x_j − l₀); the recurrence then folds the REMAINING
  *    series through
  *      l' = α(x − s_i) + (1−α)(l + b)
  *      b' = β(l' − l) + (1−β)b
  *      s'_i = γ(x − l') + (1−γ)s_i
  *    as an ordered `aggregate` with struct state (step counter, level,
  *    trend, 24-slot seasonal array rebuilt by slice‖concat). The
  *    oracle runs the identical recurrence as a recursive CTE with a
  *    LIST state — the e30 discipline one seasonal dimension richer;
  *    both engines execute the same IEEE sequence step for step. The
  *    one-step forecast is l + b + s_next.
  *  - a60_brown_forsythe: the median-based Levene test (Brown–Forsythe
  *    1974) for variance homogeneity across event types — one-way
  *    ANOVA F on z = |x − median_g|, the robust "are the groups equally
  *    spread?" gate run before trusting a pooled variance. Group
  *    medians come from the two-level bounded selection (the a19/a22
  *    exact-median spine — no per-group sort); z is an exact integer,
  *    so between = Σ_g (Z_g·N − Z·n_g)²/(n_g·N²) and
  *    within = Σ_g (n_g·ZZ_g − Z_g²)/n_g have exact BIGINT/DECIMAL
  *    numerators with one division per group, folded in type order on
  *    both engines (k terms); F = (N−k)/(k−1) · between/within.
  *
  * Scale shape: e40's per-type series are TIME-proportional bounded
  * artifacts (the e30/a34 contract); a60 is scan → histogram →
  * bounded selection → one hash aggregate per group — no global
  * windows, no driver loops beyond the bounded-selection walk.
  *
  * Reference context: no counterpart; completes the time-series family
  * (e30 Holt → e40 seasonal) and the spread-testing family (a39 Welch
  * pairwise → a60 k-group).
  */
object Extended114 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  val queries: Map[String, Q] = Map(
    // ---- e40: additive Holt–Winters with a 24-hour season ----
    "e40_holt_winters" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("h"))
        .groupBy("event_type", "h").agg(count(lit(1)).as("x"))
      val series = hourly.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("sr"))
        .filter(size(col("sr")) > 24)
      // init from the first cycle: l0 = mean of first 24, s_j = x_j − l0
      val l0 = expr(
        "aggregate(slice(sr, 1, 24), 0.0d, (a, e) -> a + e.x) / 24.0d")
      val withInit = series
        .withColumn("l0", l0)
        .withColumn("s0", expr(
          "transform(slice(sr, 1, 24), e -> CAST(e.x AS DOUBLE) - l0)"))
      val state = aggregate(
        expr("slice(sr, 25, size(sr) - 24)"),
        struct(lit(0).as("i"), col("l0").as("l"), lit(0.0).as("b"),
          col("s0").as("s")),
        (acc, e) => {
          val x = e("x").cast("double")
          val idx = pmod(acc("i"), lit(24)) + 1
          val sIdx = element_at(acc("s"), idx)
          val l2 = lit(0.25) * (x - sIdx) +
            lit(0.75) * (acc("l") + acc("b"))
          val b2 = lit(0.5) * (l2 - acc("l")) + lit(0.5) * acc("b")
          val sNew = lit(0.25) * (x - l2) + lit(0.75) * sIdx
          struct((acc("i") + 1).as("i"), l2.as("l"), b2.as("b"),
            concat(slice(acc("s"), lit(1), idx - 1), array(sNew),
              slice(acc("s"), idx + 1, lit(24) - idx)).as("s"))
        })
      withInit.select(col("event_type"),
          size(col("sr")).cast("long").as("n_obs"), state.as("st"))
        .select(col("event_type"), col("n_obs"),
          round(col("st.l"), 6).as("level"),
          round(col("st.b"), 6).as("trend"),
          round(col("st.l") + col("st.b") +
            element_at(col("st.s"), pmod(col("st.i"), lit(24)) + 1), 6)
            .as("forecast1"))
        .orderBy("event_type")
    }),

    // ---- a60: Brown–Forsythe robust variance-homogeneity F ----
    "a60_brown_forsythe" -> ((s, d) => {
      val v = t(s, d, "events")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("x"))
      val hist = v.groupBy("event_type", "x").agg(count(lit(1)).as("n"))
      val med = Selection.lowerMedian(hist, Seq("event_type"), "x", "n",
        "medv")
      val z = v.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("x") - col("medv")).as("z"))
      val grp = z.groupBy("event_type").agg(
        count(lit(1)).as("ng"), sum("z").as("zg"),
        sum(dec(col("z")) * dec(col("z"))).as("zzg"))
      val tot = grp.agg(sum("ng").as("n"), sum(dec(col("zg"))).as("zt"),
        count(lit(1)).as("k"))
      // per-group exact-integer numerators, one division each, folded
      // in type order (k terms) on both engines
      val terms = grp.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n"), col("k"),
          { val bNum = dec(col("zg")) * dec(col("n")) -
              col("zt") * dec(col("ng"))
            ((bNum * bNum).cast("double") /
              (dec(col("ng")) * dec(col("n")) * dec(col("n")))
                .cast("double")).as("bt") },
          ((dec(col("ng")) * col("zzg") - dec(col("zg")) * dec(col("zg")))
            .cast("double") / col("ng").cast("double")).as("wt"))
      terms.groupBy("n", "k")
        .agg(aggregate(
          sort_array(collect_list(struct(col("event_type"), col("bt"),
            col("wt")))),
          struct(lit(0.0).as("bs"), lit(0.0).as("ws")),
          (acc, x) => struct((acc("bs") + x("bt")).as("bs"),
            (acc("ws") + x("wt")).as("ws"))).as("f"))
        .select(col("k").as("k_groups"), col("n"),
          round((col("n") - col("k")).cast("double") /
            (col("k") - 1L).cast("double") *
            (col("f.bs") / col("f.ws")), 6).as("f_stat"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e40_holt_winters" ->
      """WITH RECURSIVE hourly AS (
           SELECT event_type,
             CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         idxd AS (
           SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM hourly),
         eligible AS (SELECT DISTINCT event_type, n FROM idxd WHERE n > 24),
         init AS (
           SELECT e.event_type, e.n,
             (SELECT sum(CAST(x AS DOUBLE)) FROM idxd
              WHERE event_type = e.event_type AND i <= 24) / 24.0 AS l0,
             (SELECT list(CAST(x AS DOUBLE) ORDER BY i) FROM idxd
              WHERE event_type = e.event_type AND i <= 24) AS f24
           FROM eligible e),
         rec AS (
           SELECT event_type, n, 0 AS steps, l0 AS l, CAST(0 AS DOUBLE) AS b,
             list_transform(f24, v -> v - l0) AS s
           FROM init
           UNION ALL
           SELECT r.event_type, r.n, r.steps + 1,
             0.25 * (x.x - r.s[(r.steps % 24) + 1])
               + 0.75 * (r.l + r.b) AS l,
             0.5 * ((0.25 * (x.x - r.s[(r.steps % 24) + 1])
                 + 0.75 * (r.l + r.b)) - r.l) + 0.5 * r.b AS b,
             r.s[1 : (r.steps % 24)]
               || [0.25 * (x.x - (0.25 * (x.x - r.s[(r.steps % 24) + 1])
                    + 0.75 * (r.l + r.b)))
                  + 0.75 * r.s[(r.steps % 24) + 1]]
               || r.s[(r.steps % 24) + 2 : 24] AS s
           FROM rec r JOIN idxd x
             ON x.event_type = r.event_type AND x.i = r.steps + 25),
         fin AS (
           SELECT event_type, n, steps, l, b, s FROM rec
           WHERE steps = n - 24)
         SELECT event_type, n AS n_obs, round(l, 6) AS level,
           round(b, 6) AS trend,
           round(l + b + s[(steps % 24) + 1], 6) AS forecast1
         FROM fin ORDER BY event_type""",
    "a60_brown_forsythe" ->
      """WITH v AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
           FROM events),
         hist AS (
           SELECT event_type, x, CAST(count(*) AS BIGINT) AS n
           FROM v GROUP BY 1, 2),
         cum AS (
           SELECT event_type, x,
             sum(n) OVER (PARTITION BY event_type ORDER BY x) AS c,
             sum(n) OVER (PARTITION BY event_type) AS tot
           FROM hist),
         med AS (
           SELECT event_type, min(x) AS medv FROM cum
           WHERE 2 * c >= tot GROUP BY event_type),
         z AS (
           SELECT v.event_type, abs(v.x - med.medv) AS z
           FROM v JOIN med USING (event_type)),
         grp AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(z) AS BIGINT) AS zg,
             sum(CAST(z AS HUGEINT) * z) AS zzg
           FROM z GROUP BY event_type),
         tot AS (
           SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(sum(zg) AS HUGEINT) AS zt,
             CAST(count(*) AS BIGINT) AS k
           FROM grp),
         terms AS (
           SELECT g.event_type, t.n, t.k,
             CAST((CAST(g.zg AS HUGEINT) * t.n - t.zt * g.ng)
                 * (CAST(g.zg AS HUGEINT) * t.n - t.zt * g.ng) AS DOUBLE)
               / CAST(CAST(g.ng AS HUGEINT) * t.n * t.n AS DOUBLE) AS bt,
             CAST(CAST(g.ng AS HUGEINT) * g.zzg
                 - CAST(g.zg AS HUGEINT) * g.zg AS DOUBLE)
               / CAST(g.ng AS DOUBLE) AS wt
           FROM grp g, tot t),
         folded AS (
           SELECT n, k,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(bt ORDER BY event_type)), (a, b) -> a + b) AS bs,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(wt ORDER BY event_type)), (a, b) -> a + b) AS ws
           FROM terms GROUP BY n, k)
         SELECT k AS k_groups, n,
           round(CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
             * (bs / ws), 6) AS f_stat
         FROM folded"""
  )
}
