package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-2 operator extensions (SURVEY §2.8 — categories absent from the
  * reference, provided as Spark built-ins): multidimensional aggregation
  * (CUBE / GROUPING SETS), statistical aggregates, range-frame and
  * top-k-per-group windows, band (range) joins, full-outer joins,
  * deterministic hash splits, corpus n-gram statistics, stream dedup, and
  * string/math scalar batteries.
  *
  * Same conventions as [[Relational]]: identical aliases both sides,
  * deterministic ORDER BY, doubles rounded; order-insensitive aggregates
  * (count/min/max) preferred where a float summation order could flip a
  * low bit.
  */
object Extended {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- multidimensional aggregation ----
    "a7_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),
    "a8_grouping_sets" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("price"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),
    // ---- statistical aggregates ----
    "a9_stats" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qd"))
        .orderBy("l_returnflag")),

    // ---- windows ----
    // value-range frame (RANGE BETWEEN): trailing 1-hour sum per user —
    // frame membership depends on the ORDER BY value, so ties share a
    // result and the output is deterministic
    "w4_range_frame" -> ((s, d) => {
      val ev = t(s, d, "events").withColumn("sec", unix_timestamp(col("ts")))
      ev.select(col("event_id"), col("user_id"), col("sec"),
          round(sum(col("value")).over(
            Window.partitionBy("user_id").orderBy("sec")
              .rangeBetween(-3600, 0)), 4).as("w_sum"))
        .orderBy("event_id")
    }),
    // top-k per group: 3 priciest parts per brand
    "w5_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, d, "part")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "p_retailprice")
        .orderBy("p_brand", "rk")
    }),

    // ---- joins ----
    // band join via grid bucketing (no nested-loop theta join): suppliers
    // paired with customers whose balance is within ±10
    "j7_band_join" -> ((s, d) =>
      graft.operators.BandJoin.join(
          t(s, d, "supplier"), t(s, d, "customer"), "s_acctbal", "c_acctbal", 10.0)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_close"),
          round(min("c_acctbal"), 2).as("lo"),
          round(max("c_acctbal"), 2).as("hi"))
        .orderBy("s_suppkey")),
    "j8_full_outer" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"))
      val o = t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("spend"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          round(coalesce(col("spend"), lit(0.0)), 2).as("spend"))
        .orderBy("custkey")
    }),

    // ---- training-pipeline utilities ----
    // deterministic train/val/test split on a content-independent key hash:
    // stable across runs, engines, and partitionings (md5 hex is the shared
    // primitive both engines implement identically)
    "t7_hash_split" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
      t(s, d, "documents").select(col("doc_id"),
          when(h < "c", "train").when(h.isin("c", "d"), "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),
    // corpus bigram document frequencies (top 20)
    "t8_top_bigrams" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(graft.llm.Dedup.shingles(col("text"), 2)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("gram")).limit(20)),

    // ---- stream dedup (batch-checkable form of the streaming dedup) ----
    // keep the earliest event per (user, type); ties broken by event_id
    "e8_stream_dedup" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    }),

    // ---- vector aggregation ----
    // per-bucket embedding centroid (element-wise mean): posexplode turns
    // the array column into (pos, x) rows so the aggregation is a plain
    // hash agg on (bucket, pos) — partial map-side combine, one shuffle,
    // no array-valued accumulator; the building block for IVF training
    // and cluster summaries
    "v1_centroids" -> ((s, d) =>
      t(s, d, "embeddings")
        .select((col("vec_id") % 10).as("bucket"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy("bucket", "pos")
        .agg(round(avg("x"), 6).as("c"))
        .orderBy("bucket", "pos")),

    // ---- scalar batteries ----
    "f5_string_battery" -> ((s, d) =>
      t(s, d, "part").select(
          col("p_partkey"),
          length(col("p_name")).as("len"),
          lower(col("p_type")).as("lo"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          reverse(col("p_brand")).as("rev"),
          instr(col("p_name"), "a").as("pos"),
          expr("left(p_name, 3)").as("l3"),
          expr("replace(p_name, ' ', '_')").as("und"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cw"))
        .orderBy("p_partkey")),
    "f6_math_battery" -> ((s, d) =>
      t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(log10(col("l_extendedprice")), 6).as("log10_p"),
          round(sqrt(col("l_quantity")), 6).as("sq_q"),
          round(pow(col("l_discount") + 1, 3), 6).as("pw"),
          round(abs(col("l_tax") - lit(0.04)), 4).as("ab"),
          signum(col("l_discount") - 0.05).cast("int").as("sg"),
          floor(col("l_extendedprice") / 100).cast("long").as("fl"),
          ceil(col("l_quantity")).cast("long").as("ce"),
          round(greatest(col("l_quantity"), col("l_tax") * 100), 4).as("gr"))
        .orderBy("l_orderkey", "l_linenumber"))
  )

  val oracleSql: Map[String, String] = Map(
    "a7_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "a8_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_extendedprice), 2) AS price
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "a9_stats" ->
      """SELECT l_returnflag,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(stddev_samp(l_extendedprice), 2) AS sd_price,
         round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
         round(covar_samp(l_quantity, l_discount), 4) AS cov_qd
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "w4_range_frame" ->
      """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         round(sum(value) OVER (
           PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS w_sum
         FROM events ORDER BY event_id""",
    "w5_topk_per_group" ->
      """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
           SELECT p_brand, p_partkey, p_retailprice,
             CAST(row_number() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rk
           FROM part)
         WHERE rk <= 3 ORDER BY p_brand, rk""",
    "j7_band_join" ->
      """SELECT s_suppkey, count(*) AS n_close,
         round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
         FROM supplier JOIN customer ON abs(s_acctbal - c_acctbal) <= 10
         GROUP BY s_suppkey ORDER BY s_suppkey""",
    "j8_full_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
         coalesce(n_orders, 0) AS n_orders,
         round(coalesce(spend, 0), 2) AS spend
         FROM (SELECT c_custkey FROM customer) c
         FULL OUTER JOIN (
           SELECT o_custkey, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS spend
           FROM orders GROUP BY o_custkey) o
         ON c.c_custkey = o.o_custkey
         ORDER BY custkey""",
    "t7_hash_split" ->
      """SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
              ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "t8_top_bigrams" ->
      """WITH w AS (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         g AS (
           SELECT doc_id,
             list_distinct([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS grams
           FROM w)
         SELECT gr AS gram, count(*) AS df
         FROM (SELECT unnest(grams) AS gr FROM g)
         GROUP BY gr ORDER BY df DESC, gram LIMIT 20""",
    "e8_stream_dedup" ->
      """SELECT user_id, event_type, event_id FROM (
           SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS rn
           FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "v1_centroids" ->
      """WITH u AS (
           SELECT vec_id % 10 AS bucket,
             unnest(list_zip(range(1, len(embedding) + 1),
                             CAST(embedding AS DOUBLE[]))) AS z
           FROM embeddings)
         SELECT bucket, CAST(z[1] - 1 AS INT) AS pos, round(avg(z[2]), 6) AS c
         FROM u GROUP BY 1, 2 ORDER BY bucket, pos""",
    "f5_string_battery" ->
      """SELECT p_partkey, length(p_name) AS len, lower(p_type) AS lo,
         lpad(p_brand, 12, '*') AS lp, reverse(p_brand) AS rev,
         CAST(strpos(p_name, 'a') AS INT) AS pos, left(p_name, 3) AS l3,
         replace(p_name, ' ', '_') AS und,
         concat_ws('-', p_brand, p_type) AS cw
         FROM part ORDER BY p_partkey""",
    "f6_math_battery" ->
      """SELECT l_orderkey, l_linenumber,
         round(ln(l_extendedprice), 6) AS ln_p,
         round(log10(l_extendedprice), 6) AS log10_p,
         round(sqrt(l_quantity), 6) AS sq_q,
         round(pow(l_discount + 1, 3), 6) AS pw,
         round(abs(l_tax - 0.04), 4) AS ab,
         CAST(sign(l_discount - 0.05) AS INT) AS sg,
         CAST(floor(l_extendedprice / 100) AS BIGINT) AS fl,
         CAST(ceil(l_quantity) AS BIGINT) AS ce,
         round(greatest(l_quantity, l_tax * 100), 4) AS gr
         FROM lineitem ORDER BY l_orderkey, l_linenumber"""
  )
}
