package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-2 surface extensions, batch 7: corpus collocation mining with a
  * rational PMI score (bit-exact across engines, no log tolerance) and a
  * calendar/interval scalar battery — each with a DuckDB oracle.
  */
object Extended7 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- collocations: top bigrams by rational PMI ----
    // score = c_xy * N / (c_x * c_y) — the monotone inside of PMI's log, so
    // the ranking is identical while every operation (exact long products
    // into one correctly-rounded division) is bit-equal across engines.
    // Bigram pairs are built map-side with transform() (no position
    // self-join shuffle); frequency floor >= 5 kills noise.
    "t11_collocations" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val toks = docs.select(explode(col("ws")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cw"))
      // if() guard: sequence(1, 0) is the DESCENDING [1, 0], not empty, so
      // a <=1-token document would index ws out of bounds (an ANSI-mode
      // crash) without it
      val bigrams = docs.select(explode(expr(
          "if(size(ws) > 1, " +
            "filter(transform(sequence(1, size(ws) - 1), " +
              "i -> struct(ws[i-1] AS w1, ws[i] AS w2)), " +
              "p -> length(p.w1) > 0 AND length(p.w2) > 0), " +
            "array())")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val cxy = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
      val n = bigrams.count()
      cxy.filter(col("cxy") >= 5)
        .join(toks.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c1"), "w1")
        .join(toks.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c2"), "w2")
        .withColumn("score",
          (col("cxy") * lit(n)).cast("double") / (col("c1") * col("c2")))
        .select(col("w1"), col("w2"), col("cxy"), round(col("score"), 6).as("pmi_ratio"))
        .orderBy(col("score").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // ---- calendar / interval scalar battery ----
    // dayofweek is surfaced in Spark's 1..7 (Sunday=1) convention; the
    // oracle shifts DuckDB's 0..6 to match.
    "f14_interval_battery" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30d"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3mo"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          datediff(lit("2002-01-01"), col("o_orderdate")).as("days_left"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow"),
          weekofyear(col("o_orderdate")).as("iso_week"))
        .orderBy("o_orderkey"))
  )

  val oracleSql: Map[String, String] = Map(
    "t11_collocations" ->
      """WITH docs AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         tok AS (
           SELECT unnest(ws) AS w FROM docs),
         cw AS (
           SELECT w, count(*) AS cw FROM tok WHERE length(w) > 0 GROUP BY w),
         big AS (
           SELECT unnest(list_transform(range(1, len(ws)), i ->
             struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS b
           FROM docs),
         big2 AS (
           SELECT b.w1 AS w1, b.w2 AS w2 FROM big
           WHERE length(b.w1) > 0 AND length(b.w2) > 0),
         n AS (SELECT count(*) AS n FROM big2),
         cxy AS (
           SELECT w1, w2, count(*) AS cxy FROM big2 GROUP BY w1, w2)
         SELECT w1, w2, cxy,
           round((cxy * n.n)::DOUBLE / (a.cw * b.cw), 6) AS pmi_ratio
         FROM cxy
         JOIN cw a ON cxy.w1 = a.w
         JOIN cw b ON cxy.w2 = b.w
         CROSS JOIN n
         WHERE cxy >= 5
         ORDER BY (cxy * n.n)::DOUBLE / (a.cw * b.cw) DESC, w1, w2
         LIMIT 20""",
    "f14_interval_battery" ->
      """SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30d,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           date_diff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_left,
           quarter(o_orderdate) AS qtr,
           dayofweek(o_orderdate) + 1 AS dow,
           weekofyear(o_orderdate) AS iso_week
         FROM orders ORDER BY o_orderkey"""
  )
}
