package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-7 batch 90: sequential-pattern mining over user journeys, and
  * the degree-distribution tail of the co-order graph.
  *
  *  - e33_path_trigrams: the top-10 most frequent 3-step event-type
  *    paths across all user journeys — each user's events ordered by
  *    (ts, event_id), consecutive triples formed with two user-keyed
  *    lead() windows (per-user parallelism; no cross-user state), one
  *    hash aggregate, and a deterministic top-10 (count desc, path asc)
  *    through TakeOrdered. The e22 transition matrix is the order-1
  *    view; this is the order-2 pattern a funnel designer actually
  *    mines.
  *  - r13_degree_ccdf: the log2-binned degree distribution and CCDF of
  *    the co-ordered-parts graph (the j9/j22 graph) — the heavy-tail
  *    evidence behind every "orientation bounds the wedge work" claim.
  *    Degrees and bin counts are exact BIGINTs; bin = len(bin(deg))
  *    (integer bit-length — the tp33 trick), CCDF via a cumulative sum
  *    over the ≤64-row bin summary; the only division is the terminal
  *    share.
  *
  * Scale shape: e33 shuffles once on user_id for the windows and once
  * on the ≤|types|³ trigram domain; r13's windows run over the bounded
  * bin summary, and the degree aggregate is the same one j9's
  * orientation already pays.
  *
  * Reference context: no counterpart; extends the event-sequence family
  * (e22/e23) and the graph-audit family (j22 assortativity, j23
  * rich-club).
  */
object Extended90 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "e33_path_trigrams" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("us"), col("event_type"))
      ev.select(col("event_type").as("t1"),
          lead("event_type", 1).over(w).as("t2"),
          lead("event_type", 2).over(w).as("t3"))
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),

    "r13_degree_ccdf" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_linenumber") <= 5)
        .select("l_orderkey", "l_partkey")
      // per-order aggregate + in-stage pair generator (see CoOrderPairs)
      val pairs = graft.operators.CoOrderPairs.undirected(li)
      val deg = pairs.select(col("a").as("n"))
        .unionAll(pairs.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val bins = deg.select(length(bin(col("deg"))).cast("long").as("b"))
        .groupBy("b").agg(count(lit(1)).as("n_nodes"))
      val tot = Window.orderBy(lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val above = Window.orderBy("b").rowsBetween(
        Window.currentRow, Window.unboundedFollowing)
      // both windows run over the <=64-row bin summary — bounded artifact
      bins.select(col("b"), col("n_nodes"),
          sum("n_nodes").over(above).as("n_at_least"),
          sum("n_nodes").over(tot).as("n_total"))
        .select(col("b"), col("n_nodes"), col("n_at_least"),
          round(col("n_at_least").cast("double") /
            col("n_total").cast("double"), 6).as("ccdf"))
        .orderBy("b")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e33_path_trigrams" ->
      """WITH e AS (
           SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us,
             event_type
           FROM events),
         tri AS (
           SELECT event_type || '>' ||
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY us, event_id) || '>' ||
             lead(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS path
           FROM e)
         SELECT path, CAST(count(*) AS BIGINT) AS n
         FROM tri WHERE path IS NOT NULL
         GROUP BY path ORDER BY n DESC, path LIMIT 10""",
    "r13_degree_ccdf" ->
      """WITH li AS (
           SELECT l_orderkey, l_partkey FROM lineitem WHERE l_linenumber <= 5),
         e AS (
           SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
           FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                              AND x.l_partkey < y.l_partkey),
         deg AS (
           SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
             SELECT a AS n FROM e UNION ALL SELECT b FROM e)
           GROUP BY n),
         bins AS (
           SELECT CAST(length(bin(deg)) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS n_nodes
           FROM deg GROUP BY 1)
         SELECT b, n_nodes,
           CAST(sum(n_nodes) OVER (ORDER BY b
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
             AS n_at_least,
           round(CAST(sum(n_nodes) OVER (ORDER BY b
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
             / CAST(sum(n_nodes) OVER () AS DOUBLE), 6) AS ccdf
         FROM bins ORDER BY b"""
  )
}
