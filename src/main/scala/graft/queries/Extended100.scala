package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 100: long-memory estimation and the classical control
  * chart — the two time-series monitors left open beside a34 (ACF),
  * a45 (change point), e29 (CUSUM) and e30 (Holt).
  *
  *  - e38_hurst: the rescaled-range (R/S) Hurst exponent of the daily
  *    cent-volume series per event type — H≈0.5 means a memoryless
  *    series, H→1 long-range dependence (load that trends), H→0
  *    mean-reversion. The integer spine: within each size-m block of
  *    the day-indexed series, m·Z_k = m·Σ_{i≤k}y_i − k·S (S = block
  *    sum) is an EXACT integer for every prefix k, so the range
  *    R = (max−min)/m and the population σ = √(m·Σy²−S²)/m give
  *    R/σ = (max−min)/√(m·Σy²−S²) — one float op per block over two
  *    exact integers. Blocks for m ∈ {4,8,16} come from one explode —
  *    the largest size stays below the smallest per-type day count the
  *    fixtures produce (30 at sf0.001), so every scale factor yields at
  *    least one complete block at every size;
  *    all windows are (type, m, block)-keyed (≤ 32 rows per reducer,
  *    never a global window). Per-(type,m) means fold block R/S values
  *    in block order (pinned list fold); with log₂m symmetric around 8
  *    the 3-point OLS slope collapses to H = (log₂(rs₁₆)−log₂(rs₄))/2 —
  *    a fixed dag both engines share.
  *  - e39_shewhart: the individuals-and-moving-range (I-MR) control
  *    chart on the same series — center = ȳ, limits ȳ ± 2.66·MR̄ (the
  *    d₂-based constant for n=2 subgroups). Σy, ΣMR, day counts are
  *    exact integers from type-keyed lags; the limits and the
  *    out-of-control count/first day are a fixed dag over them. The
  *    chart is the deploy-gate a45/e29 alarms feed.
  *
  * Scale shape: both are calendar-bounded after the first hash
  * aggregate (days × types rows); every window is keyed by type (and
  * block), so reducers see bounded rows at any corpus size.
  *
  * Reference context: no counterpart; extends the e-family monitors.
  */
object Extended100 {
  type Q = (SparkSession, String) => DataFrame

  /** daily cent volume per event type with a dense per-type day index */
  private def daily(s: SparkSession, d: String): DataFrame = {
    val dy = t(s, d, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("y"))
    dy.withColumn("idx",
      row_number().over(Window.partitionBy("event_type").orderBy("day")))
  }

  val queries: Map[String, Q] = Map(
    // ---- e38: R/S Hurst exponent per event type ----
    "e38_hurst" -> ((s, d) => {
      val base = daily(s, d)
      val sized = base.select(col("event_type"), col("idx"), col("y"),
          explode(array(lit(4), lit(8), lit(16))).as("m"))
        .withColumn("blk", expr("(idx - 1) div m"))
        .withColumn("pos", (col("idx") - 1) % col("m"))
      // complete blocks only: drop the ragged tail block per (type, m)
      val nDays = base.groupBy("event_type").agg(count(lit(1)).as("t"))
      val complete = sized.join(broadcast(nDays), "event_type")
        .filter(col("blk") < expr("t div m"))
      val wOrd = Window.partitionBy("event_type", "m", "blk").orderBy("pos")
      val wAll = Window.partitionBy("event_type", "m", "blk")
      val pre = complete
        .withColumn("cum", sum("y").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("stot", sum("y").over(wAll))
        // m·Z_k = m·cum_k − k·S — exact integer prefix deviation
        .withColumn("mz", col("m") * col("cum") - (col("pos") + 1) * col("stot"))
      // Σy² and q = m·Σy²−S² as DECIMAL(38,0): y² crosses 2^63 once daily
      // volumes pass ~3·10⁹ cents, so the exact spine is overflow-loud
      // (HUGEINT in the oracle); mz stays BIGINT — its bound is
      // m²·max|y| ≈ 10³·max|y|, safe until ~10¹⁵-cent days
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val blocks = pre.groupBy("event_type", "m", "blk").agg(
          max("mz").as("mzmax"), min("mz").as("mzmin"),
          sum(dec(col("y"))).as("sy"), sum(dec(col("y")) * dec(col("y")))
            .as("syy"))
        .withColumn("q", dec(col("m")) * col("syy") - col("sy") * col("sy"))
        .filter(col("q") > 0)
        .withColumn("rs",
          (col("mzmax") - col("mzmin")).cast("double") /
            sqrt(col("q").cast("double")))
      // mean R/S per (type, m): fold block values in block order (pinned)
      val rsBar = blocks.groupBy("event_type", "m")
        .agg(sort_array(collect_list(struct(col("blk"), col("rs")))).as("a"))
        .select(col("event_type"), col("m"),
          (aggregate(transform(col("a"), x => x("rs")), lit(0.0),
            (acc, x) => acc + x) / size(col("a")).cast("double")).as("rsbar"))
      val byM = rsBar.groupBy("event_type").pivot("m", Seq(4, 8, 16))
        .agg(first("rsbar"))
        .select(col("event_type"), col("4").as("rs4"), col("8").as("rs8"),
          col("16").as("rs16"))
      byM.select(col("event_type"),
          round(col("rs4"), 6).as("rs4"), round(col("rs8"), 6).as("rs8"),
          round(col("rs16"), 6).as("rs16"),
          // symmetric 3-point OLS slope on (log2 m, log2 rs) = half the
          // endpoint difference — the x-design makes the middle weight 0
          round((log2(col("rs16")) - log2(col("rs4"))) / lit(2.0), 6)
            .as("hurst"))
        .orderBy("event_type")
    }),

    // ---- e39: Shewhart I-MR control chart ----
    "e39_shewhart" -> ((s, d) => {
      val base = daily(s, d)
      val byType = Window.partitionBy("event_type").orderBy("day")
      val mr = base.withColumn("mr",
        abs(col("y") - lag("y", 1).over(byType)))
      val agg = mr.groupBy("event_type").agg(
        count(lit(1)).as("n_days"), sum("y").as("sy"),
        count(col("mr")).as("n_mr"), sum("mr").as("smr"))
      val lim = agg
        .withColumn("center", col("sy").cast("double") / col("n_days").cast("double"))
        .withColumn("mrbar", col("smr").cast("double") / col("n_mr").cast("double"))
        .withColumn("ucl", col("center") + lit(2.66) * col("mrbar"))
        .withColumn("lcl", col("center") - lit(2.66) * col("mrbar"))
      val flagged = base.join(lim, "event_type")
        .withColumn("out",
          (col("y").cast("double") > col("ucl")) ||
            (col("y").cast("double") < col("lcl")))
      flagged.groupBy("event_type").agg(
          first("n_days").as("n_days"),
          round(first("center"), 4).as("center"),
          round(first("ucl"), 4).as("ucl"),
          round(first("lcl"), 4).as("lcl"),
          sum(when(col("out"), 1L).otherwise(0L)).as("n_out"),
          min(when(col("out"), col("day"))).as("first_out_day"))
        .orderBy("event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e38_hurst" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idxd AS (
           SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx
           FROM dy),
         nd AS (SELECT event_type, count(*) AS t FROM idxd GROUP BY 1),
         sized AS (
           SELECT i.event_type, i.idx, i.y, m.m,
             (i.idx - 1) // m.m AS blk, (i.idx - 1) % m.m AS pos
           FROM idxd i CROSS JOIN (SELECT unnest([4, 8, 16]) AS m) m
           JOIN nd ON i.event_type = nd.event_type
           WHERE (i.idx - 1) // m.m < nd.t // m.m),
         pre AS (
           SELECT *,
             CAST(m * sum(y) OVER (PARTITION BY event_type, m, blk
               ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - (pos + 1) * sum(y) OVER (PARTITION BY event_type, m, blk)
               AS BIGINT) AS mz
           FROM sized),
         blocks AS (
           SELECT event_type, m, blk,
             CAST(max(mz) AS BIGINT) AS mzmax, CAST(min(mz) AS BIGINT) AS mzmin,
             m * sum(CAST(y AS HUGEINT) * y) - sum(CAST(y AS HUGEINT))
               * sum(CAST(y AS HUGEINT)) AS q
           FROM pre GROUP BY event_type, m, blk),
         rs AS (
           SELECT event_type, m, blk,
             CAST(mzmax - mzmin AS DOUBLE) / sqrt(CAST(q AS DOUBLE)) AS rs
           FROM blocks WHERE q > 0),
         rsbar AS (
           SELECT event_type, m,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(rs ORDER BY blk)), (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS rsbar
           FROM rs GROUP BY event_type, m),
         wide AS (
           SELECT event_type,
             max(CASE WHEN m = 4 THEN rsbar END) AS rs4,
             max(CASE WHEN m = 8 THEN rsbar END) AS rs8,
             max(CASE WHEN m = 16 THEN rsbar END) AS rs16
           FROM rsbar GROUP BY event_type)
         SELECT event_type, round(rs4, 6) AS rs4, round(rs8, 6) AS rs8,
           round(rs16, 6) AS rs16,
           round((log2(rs16) - log2(rs4)) / 2.0, 6) AS hurst
         FROM wide ORDER BY event_type""",
    "e39_shewhart" ->
      """WITH dy AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         mr AS (
           SELECT *, abs(y - lag(y) OVER (PARTITION BY event_type
             ORDER BY day)) AS mr
           FROM dy),
         agg AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(count(mr) AS BIGINT) AS n_mr, CAST(sum(mr) AS BIGINT) AS smr
           FROM mr GROUP BY event_type),
         lim AS (
           SELECT *,
             CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE) AS center,
             CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)
               + 2.66 * (CAST(smr AS DOUBLE) / CAST(n_mr AS DOUBLE)) AS ucl,
             CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)
               - 2.66 * (CAST(smr AS DOUBLE) / CAST(n_mr AS DOUBLE)) AS lcl
           FROM agg)
         SELECT d.event_type, lim.n_days,
           round(lim.center, 4) AS center, round(lim.ucl, 4) AS ucl,
           round(lim.lcl, 4) AS lcl,
           CAST(count(*) FILTER (WHERE CAST(d.y AS DOUBLE) > lim.ucl
             OR CAST(d.y AS DOUBLE) < lim.lcl) AS BIGINT) AS n_out,
           min(CASE WHEN CAST(d.y AS DOUBLE) > lim.ucl
             OR CAST(d.y AS DOUBLE) < lim.lcl THEN d.day END) AS first_out_day
         FROM dy d JOIN lim ON d.event_type = lim.event_type
         GROUP BY d.event_type, lim.n_days, lim.center, lim.ucl, lim.lcl
         ORDER BY d.event_type"""
  )
}
