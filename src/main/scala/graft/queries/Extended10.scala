package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-2 surface extensions, batch 10: exact distinct counting via
  * mergeable bitmaps (the scalable alternative to count(DISTINCT) when the
  * key space is dense), percentile winsorization (outlier clamping, a
  * standard feature-cleaning step), a bitwise scalar battery, and
  * share-of-total windows over aggregates. All with DuckDB oracles.
  */
object Extended10 {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ---- exact distinct via bucketed bitmaps: bitmap_construct_agg is a
    // mergeable partial aggregate (map-side combine works), so this scales
    // where count(DISTINCT) needs a full re-shuffle of raw keys. The
    // bucket layer keeps each bitmap ≤ 32k bits regardless of key range.
    "a13_bitmap_distinct" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_returnflag, CAST(sum(cnt) AS BIGINT) AS n_distinct
        FROM (
          SELECT l_returnflag, bitmap_bucket_number(l_suppkey) AS bkt,
            bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_suppkey))) AS cnt
          FROM v_lineitem GROUP BY 1, 2)
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    }),

    // ---- winsorization: clamp a feature to its per-group [p05, p95] and
    // report the cleaned mean. Exact interpolated percentiles (proved ==
    // DuckDB quantile_cont in a5), broadcast back onto the fact rows.
    "t15_winsorize" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val bounds = li.groupBy("l_returnflag").agg(
        expr("percentile(l_extendedprice, 0.05)").as("p05"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      li.join(broadcast(bounds), "l_returnflag")
        .select(col("l_returnflag"),
          greatest(col("p05"), least(col("p95"), col("l_extendedprice"))).as("w"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(avg("w"), 4).as("avg_winsorized"))
        .orderBy("l_returnflag")
    }),

    // ---- bitwise scalar battery: shifts, AND/OR/XOR, popcount — the
    // primitives under bloom filters, bitmap indexes, and hash mixing.
    "f17_bitwise_battery" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          shiftleft(col("l_orderkey"), 3).as("shl"),
          shiftright(col("l_orderkey"), 2).as("shr"),
          bitwise_not(col("l_orderkey")).as("flip"),
          (col("l_orderkey").bitwiseAND(255)).as("band"),
          (col("l_orderkey").bitwiseOR(col("l_linenumber"))).as("bor"),
          (col("l_orderkey").bitwiseXOR(col("l_linenumber"))).as("bxor"),
          bit_count(col("l_orderkey")).as("pop"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- share-of-total: window over an aggregate (two grouping levels in
    // one plan, no self-join). The partial agg shrinks the window input to
    // |groups| rows, so the unpartitioned window is a non-issue at scale.
    "q9_share_of_total" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          round(rev, 2) AS rev,
          round(rev / sum(rev) OVER (PARTITION BY l_returnflag), 6) AS share_in_flag,
          round(rev / sum(rev) OVER (), 6) AS share_total
        FROM (
          SELECT l_returnflag, l_linestatus,
            sum(l_extendedprice * (1 - l_discount)) AS rev
          FROM v_lineitem GROUP BY 1, 2)
        ORDER BY l_returnflag, l_linestatus""")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "a13_bitmap_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_distinct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "t15_winsorize" ->
      """WITH b AS (
           SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS p05,
             quantile_cont(l_extendedprice, 0.95) AS p95
           FROM lineitem GROUP BY 1)
         SELECT l.l_returnflag, count(*) AS n,
           round(avg(greatest(p05, least(p95, l_extendedprice))), 4) AS avg_winsorized
         FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
         GROUP BY l.l_returnflag ORDER BY l.l_returnflag""",
    "f17_bitwise_battery" ->
      """SELECT l_orderkey, l_linenumber,
           l_orderkey << 3 AS shl, l_orderkey >> 2 AS shr,
           ~l_orderkey AS flip, l_orderkey & 255 AS band,
           l_orderkey | l_linenumber AS bor,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS bxor,
           CAST(bit_count(l_orderkey) AS INT) AS pop
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q9_share_of_total" ->
      """SELECT l_returnflag, l_linestatus, round(rev, 2) AS rev,
           round(rev / sum(rev) OVER (PARTITION BY l_returnflag), 6) AS share_in_flag,
           round(rev / sum(rev) OVER (), 6) AS share_total
         FROM (
           SELECT l_returnflag, l_linestatus,
             sum(l_extendedprice * (1 - l_discount)) AS rev
           FROM lineitem GROUP BY 1, 2)
         ORDER BY l_returnflag, l_linestatus"""
  )
}
