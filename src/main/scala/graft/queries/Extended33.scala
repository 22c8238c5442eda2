package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 33: information-theoretic text
  * signals, exact-arithmetic spectral iteration, and one-pass data
  * profiling.
  *
  *  - t20: per-document character-level Shannon entropy — the
  *    gibberish/compression-quality filter every curation stack runs.
  *    The float entropy sum folds the (char, count) list in CHAR order
  *    on both engines (`aggregate(sort_array(...))` vs DuckDB
  *    `list_reduce(list_sort(...))`), the batch-30 determinism pattern.
  *  - v5: two power-iteration steps toward the corpus's top principal
  *    direction, in EXACT fixed-point integer arithmetic: embeddings
  *    quantized to ×1000 longs, dot products and accumulations are
  *    exact int64 (bounds: dot ≤ 64·10⁶, accum ≤ 5·10¹⁴), and each
  *    renormalization divides two exact integers — so a 100 TB-shape
  *    linear-algebra fixpoint (join → partial agg per iteration, 64-row
  *    driver vector) faces a hash-exact oracle with NO float-sum-order
  *    hazard at all.
  *  - s13: ANALYZE-style one-pass column profile (count / nulls /
  *    distincts / min / max per column, unpivoted) — the metadata scan
  *    that drives optimizer statistics, as a query.
  */
object Extended33 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- t20: char-level Shannon entropy per document ----
    "t20_char_entropy" -> ((s, d) => {
      val cnt = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy("doc_id")
        .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"))
      // canonical ascending fold by char: -Σ (c/n)·ln(c/n) / ln 2
      cnt.join(tot, "doc_id")
        .groupBy(col("doc_id"), col("n"), col("n_distinct"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("ch"), col("c")))), lit(0.0),
          (acc, s0) => {
            val p = s0.getField("c").cast("double") / col("n").cast("double")
            acc - p * log(p)
          }).as("nats"))
        .select(col("doc_id"), col("n").as("n_chars_counted"),
          col("n_distinct"),
          round(col("nats") / log(lit(2.0)), 6).as("entropy_bits"))
        .orderBy("doc_id")
    }),

    // ---- v5: exact fixed-point power iteration (top principal direction) ----
    "v5_power_iteration" -> ((s, d) => {
      import s.implicits._
      val xs = t(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"),
          round(col("x") * 1000).cast("long").as("xs"))
      // v0 = all-ones at scale 1000; two iterations of v ← normalize(AᵀAv)
      var v: Map[Int, Long] = (0 until 64).map(_ -> 1000L).toMap
      for (_ <- 1 to 2) {
        val vDf = v.toSeq.toDF("pos", "v")
        val dot = xs.join(broadcast(vDf), "pos")
          .groupBy("vec_id").agg(sum(col("xs") * col("v")).as("dot"))
        val sVec = xs.join(dot, "vec_id")
          .groupBy("pos").agg(sum(col("dot") * col("xs")).as("sj"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val m = sVec.values.map(math.abs).max
        // truncation, not rounding: JVM half-up vs DuckDB half-away-from-zero
        // differ on negative .5 ties; trunc-toward-zero is engine-identical
        v = sVec.map { case (p, sj) =>
          p -> ((sj * 1000L).toDouble / m).toLong }
      }
      v.toSeq.sortBy(_._1).toDF("pos", "v").orderBy("pos")
    }),

    // ---- s13: one-pass column profile ----
    "s13_profile_stats" -> ((s, d) => {
      // fanOut: three countDistincts plan as an expand (3x rows) feeding
      // multi-phase aggregation — per-row work a single-split scan would
      // serialize
      val o = graft.operators.Par.fanOut(t(s, d, "orders")
        .select("o_custkey", "o_orderstatus", "o_totalprice"))
      val agg = o.agg(
        count(lit(1)).as("n"),
        count_if(col("o_custkey").isNull).as("null_custkey"),
        countDistinct(col("o_custkey")).as("nd_custkey"),
        min(col("o_custkey")).cast("string").as("min_custkey"),
        max(col("o_custkey")).cast("string").as("max_custkey"),
        count_if(col("o_orderstatus").isNull).as("null_status"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        min(col("o_orderstatus")).as("min_status"),
        max(col("o_orderstatus")).as("max_status"),
        count_if(col("o_totalprice").isNull).as("null_price"),
        countDistinct(col("o_totalprice")).as("nd_price"),
        min(round(col("o_totalprice"), 2)).cast("string").as("min_price"),
        max(round(col("o_totalprice"), 2)).cast("string").as("max_price"))
      agg.select(col("n"), expr(
        """stack(3,
           'o_custkey', null_custkey, nd_custkey, min_custkey, max_custkey,
           'o_orderstatus', null_status, nd_status, min_status, max_status,
           'o_totalprice', null_price, nd_price, min_price, max_price)
           AS (col_name, n_null, n_distinct, min_s, max_s)"""))
        .select(col("col_name"), col("n"), col("n_null"), col("n_distinct"),
          col("min_s"), col("max_s"))
        .orderBy("col_name")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t20_char_entropy" ->
      """WITH ch AS (
           SELECT doc_id, unnest([text[i] for i in range(1, len(text) + 1)]) AS ch
           FROM documents),
         cnt AS (
           SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
           FROM ch WHERE len(ch) > 0 GROUP BY doc_id, ch),
         tot AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             count(*) AS n_distinct
           FROM cnt GROUP BY doc_id),
         folded AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list_transform(
                   list_sort(list(struct_pack(ch := ch, c := c))),
                   s -> -(CAST(s.c AS DOUBLE) / n) * ln(CAST(s.c AS DOUBLE) / n))),
               (acc, x) -> acc + x) AS nats
           FROM cnt JOIN tot USING (doc_id)
           GROUP BY doc_id, n)
         SELECT doc_id, n AS n_chars_counted, n_distinct,
           round(nats / ln(2.0), 6) AS entropy_bits
         FROM folded JOIN tot USING (doc_id)
         ORDER BY doc_id""",
    "v5_power_iteration" ->
      """WITH e AS (
           SELECT vec_id,
             [CAST(round(x * 1000) AS BIGINT) for x in CAST(embedding AS DOUBLE[])] AS xs
           FROM embeddings),
         d1 AS (
           SELECT vec_id,
             CAST(list_reduce(list_transform(xs, x -> x * 1000),
               (a, b) -> a + b) AS BIGINT) AS dot
           FROM e),
         s1 AS (
           SELECT i - 1 AS pos, CAST(sum(dot * xs[i]) AS BIGINT) AS sj
           FROM e JOIN d1 USING (vec_id), range(1, 65) t(i)
           GROUP BY i),
         m1 AS (SELECT max(abs(sj)) AS m FROM s1),
         v1 AS (
           SELECT pos, CAST(trunc(CAST(sj * 1000 AS DOUBLE) / m) AS BIGINT) AS v
           FROM s1, m1),
         d2 AS (
           SELECT vec_id, CAST(sum(e.xs[v1.pos + 1] * v1.v) AS BIGINT) AS dot
           FROM e CROSS JOIN v1 GROUP BY vec_id),
         s2 AS (
           SELECT i - 1 AS pos, CAST(sum(dot * xs[i]) AS BIGINT) AS sj
           FROM e JOIN d2 USING (vec_id), range(1, 65) t(i)
           GROUP BY i),
         m2 AS (SELECT max(abs(sj)) AS m FROM s2),
         v2 AS (
           SELECT pos, CAST(trunc(CAST(sj * 1000 AS DOUBLE) / m) AS BIGINT) AS v
           FROM s2, m2)
         SELECT CAST(pos AS INT) AS pos, v FROM v2 ORDER BY pos""",
    "s13_profile_stats" ->
      """WITH a AS (
           SELECT count(*) AS n,
             CAST(count_if(o_custkey IS NULL) AS BIGINT) AS null_custkey,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_custkey,
             CAST(min(o_custkey) AS VARCHAR) AS min_custkey,
             CAST(max(o_custkey) AS VARCHAR) AS max_custkey,
             CAST(count_if(o_orderstatus IS NULL) AS BIGINT) AS null_status,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
             min(o_orderstatus) AS min_status,
             max(o_orderstatus) AS max_status,
             CAST(count_if(o_totalprice IS NULL) AS BIGINT) AS null_price,
             CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd_price,
             CAST(min(round(o_totalprice, 2)) AS VARCHAR) AS min_price,
             CAST(max(round(o_totalprice, 2)) AS VARCHAR) AS max_price
           FROM orders)
         SELECT col_name, n, n_null, n_distinct, min_s, max_s FROM (
           SELECT 'o_custkey' AS col_name, n, null_custkey AS n_null,
             nd_custkey AS n_distinct, min_custkey AS min_s, max_custkey AS max_s
           FROM a
           UNION ALL SELECT 'o_orderstatus', n, null_status, nd_status,
             min_status, max_status FROM a
           UNION ALL SELECT 'o_totalprice', n, null_price, nd_price,
             min_price, max_price FROM a)
         ORDER BY col_name"""
  )
}
