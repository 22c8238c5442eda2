package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 104: the symmetric drift divergence and the residual
  * autocorrelation test — closing two classical gaps in the a-family
  * (a33 KL is asymmetric and unbounded; a34 ACF tests the SERIES, not a
  * fitted model's residuals).
  *
  *  - a50_jensen_shannon: JS divergence between the weekday and weekend
  *    event-type distributions. KL(P‖Q) blows up when Q has a zero cell
  *    and depends on direction; JS (mean of both KLs against the
  *    mixture M=(P+Q)/2) is symmetric, bounded by ln 2, and
  *    zero-tolerant — the production drift gate. The a33 discipline:
  *    counts are exact integers from one hash aggregate, each type's
  *    contribution ½·p·ln(p/m) + ½·q·ln(q/m) is a fixed per-row IEEE
  *    dag, and rows are emitted PER TYPE so no cross-type float sum
  *    enters the parity surface.
  *  - a51_durbin_watson: the Durbin–Watson statistic on the residuals
  *    of the per-type daily-volume linear trend. The OLS fit uses the
  *    five exact integer sums (n, Σt, Σy, Σt², Σty) — never a float
  *    regression — so β̂ and α̂ are one fixed dag each; residuals are
  *    per-row dags over (t, y, α̂, β̂); and the two quadratic forms
  *    Σ(eₜ−eₜ₋₁)² and Σeₜ² fold in day order via the pinned-list
  *    discipline (calendar-bounded lists). DW ≈ 2 means the trend
  *    left no lag-1 structure; DW→0 says "the residuals still trend"
  *    — the check that a45/e30's fitted models actually explained the
  *    series.
  *
  * Scale shape: a50 is one scan → one hash aggregate on a categorical
  * domain; a51 is one scan → calendar-bounded daily aggregate →
  * type-keyed folds. No global windows, no driver loops.
  *
  * Reference context: no counterpart; extends the a-family drift and
  * diagnostics layers.
  */
object Extended104 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- a50: Jensen–Shannon divergence, weekday vs weekend ----
    "a50_jensen_shannon" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"),
          // Spark dayofweek: 1=Sunday..7=Saturday — weekend = {1, 7}
          // (the oracle's dayofweek is 0=Sunday..6=Saturday → IN (0, 6))
          (dayofweek(col("ts")).isin(1, 7)).cast("long").as("we"))
      val o = ev.groupBy("event_type")
        .agg(sum(lit(1L) - col("we")).as("cwd"), sum("we").as("cwe"))
      val tot = o.agg(sum("cwd").as("nwd"), sum("cwe").as("nwe"))
      val p = col("cwd").cast("double") / col("nwd").cast("double")
      val qq = col("cwe").cast("double") / col("nwe").cast("double")
      val m = (p + qq) / lit(2.0)
      o.crossJoin(broadcast(tot))
        .select(col("event_type"), col("cwd"), col("cwe"),
          round(p, 6).as("p_weekday"), round(qq, 6).as("q_weekend"),
          round(when(p > 0, p * log(p / m) / lit(2.0)).otherwise(0.0) +
            when(qq > 0, qq * log(qq / m) / lit(2.0)).otherwise(0.0), 9)
            .as("js_contrib"))
        .orderBy("event_type")
    }),

    // ---- a51: Durbin–Watson on detrended daily volumes ----
    "a51_durbin_watson" -> ((s, d) => {
      val dy = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
        .withColumn("idx", row_number()
          .over(Window.partitionBy("event_type").orderBy("day")).cast("long"))
      // exact OLS spine: five integer sums per type (decimal against sf1+)
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val fit = dy.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("idx").as("st"), sum(dec(col("y"))).as("sy"),
        sum(col("idx") * col("idx")).as("stt"),
        sum(dec(col("idx")) * dec(col("y"))).as("sty"))
        .select(col("event_type"), col("n"),
          ((dec(col("n")) * col("sty") - dec(col("st")) * col("sy"))
            .cast("double") /
            (dec(col("n")) * dec(col("stt")) - dec(col("st")) * dec(col("st")))
              .cast("double")).as("beta"),
          col("sy").cast("double").as("syd"), col("st").cast("double").as("std"))
        .withColumn("alpha",
          (col("syd") - col("beta") * col("std")) / col("n").cast("double"))
      val resid = dy.join(fit, "event_type")
        .withColumn("e", col("y").cast("double") - col("alpha") -
          col("beta") * col("idx").cast("double"))
      // fold both quadratic forms in day order — calendar-bounded lists
      resid.groupBy(col("event_type"), col("n"))
        .agg(sort_array(collect_list(struct(col("idx"), col("e")))).as("arr"))
        .select(col("event_type"), col("n").as("n_days"),
          { val es = transform(col("arr"), x => x("e"))
            val see = aggregate(es, lit(0.0), (acc, e) => acc + e * e)
            // equal-length slices: zip_with null-pads the shorter side, so
            // both successor/predecessor views must be exactly n−1 long
            val m = (size(col("arr")) - 1).cast("int")
            val sdd = aggregate(
              zip_with(slice(es, lit(2), m), slice(es, lit(1), m),
                (cur, prev) => (cur - prev) * (cur - prev)),
              lit(0.0), (acc, v) => acc + v)
            round(sdd / see, 6).as("dw")
          })
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a50_jensen_shannon" ->
      """WITH e AS (
           SELECT event_type,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we
           FROM events),
         o AS (
           SELECT event_type, CAST(sum(1 - we) AS BIGINT) AS cwd,
             CAST(sum(we) AS BIGINT) AS cwe
           FROM e GROUP BY event_type),
         tot AS (SELECT CAST(sum(cwd) AS BIGINT) AS nwd,
             CAST(sum(cwe) AS BIGINT) AS nwe FROM o)
         SELECT event_type, cwd, cwe,
           round(CAST(cwd AS DOUBLE) / nwd, 6) AS p_weekday,
           round(CAST(cwe AS DOUBLE) / nwe, 6) AS q_weekend,
           round(
             CASE WHEN cwd > 0 THEN (CAST(cwd AS DOUBLE) / nwd)
               * ln((CAST(cwd AS DOUBLE) / nwd)
                 / ((CAST(cwd AS DOUBLE) / nwd + CAST(cwe AS DOUBLE) / nwe)
                   / 2.0)) / 2.0 ELSE 0.0 END
             + CASE WHEN cwe > 0 THEN (CAST(cwe AS DOUBLE) / nwe)
               * ln((CAST(cwe AS DOUBLE) / nwe)
                 / ((CAST(cwd AS DOUBLE) / nwd + CAST(cwe AS DOUBLE) / nwe)
                   / 2.0)) / 2.0 ELSE 0.0 END, 9) AS js_contrib
         FROM o CROSS JOIN tot ORDER BY event_type""",
    "a51_durbin_watson" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idxd AS (
           SELECT event_type, y, CAST(row_number() OVER (
             PARTITION BY event_type ORDER BY day) AS BIGINT) AS idx
           FROM dy),
         fit AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST((count(*)::HUGEINT * sum(CAST(idx AS HUGEINT) * y)
               - sum(idx)::HUGEINT * sum(y)) AS DOUBLE)
               / CAST((count(*)::HUGEINT * sum(CAST(idx AS HUGEINT) * idx)
                 - sum(idx)::HUGEINT * sum(idx)) AS DOUBLE) AS beta,
             CAST(sum(y) AS DOUBLE) AS syd, CAST(sum(idx) AS DOUBLE) AS std
           FROM idxd GROUP BY event_type),
         fit2 AS (
           SELECT *, (syd - beta * std) / CAST(n AS DOUBLE) AS alpha FROM fit),
         resid AS (
           SELECT i.event_type, f.n, i.idx,
             CAST(i.y AS DOUBLE) - f.alpha - f.beta * CAST(i.idx AS DOUBLE) AS e
           FROM idxd i JOIN fit2 f ON i.event_type = f.event_type),
         folded AS (
           SELECT event_type, n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(e * e ORDER BY idx)), (a, b) -> a + b) AS see,
             list(e ORDER BY idx) AS es
           FROM resid GROUP BY event_type, n)
         SELECT event_type, n AS n_days,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(range(2, CAST(len(es) AS INT) + 1),
               i -> (es[i] - es[i-1]) * (es[i] - es[i-1]))),
             (a, b) -> a + b) / see, 6) AS dw
         FROM folded ORDER BY event_type"""
  )
}
