package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.AsOfJoin
import graft.route.{Components, Route}

/** Round-6 surface extensions, batch 21: the remaining graph fixpoints and
  * the event-attribution shape, gated the batch-19/20 way — build a
  * topology (or a tie-free event relation) with a closed-form or exactly
  * restatable answer FROM the driver's tables, and let the general
  * distributed operator face the DuckDB oracle.
  *
  *  - r4: the Catalyst-native static-PageRank fixpoint on a chain, where
  *    every in-degree is ≤ 1 so float sums have exactly one operand order
  *    and a recursive-CTE oracle replays the identical IEEE recurrence.
  *  - r5: k-core decomposition (iterative distributed peeling) on a
  *    planted clique+chain whose 3-core is known by construction.
  *  - e18: last-touch marketing attribution — the as-of join operator
  *    against a LEFT JOIN LATERAL restatement, made tie-free by
  *    deterministic per-(user, second) touch dedup so the operator's
  *    hash tie-break never has to fire.
  */
object Extended21 {
  type Q = (SparkSession, String) => DataFrame

  /** Attribution lookback: a touch older than this many seconds before
    * the conversion gets no credit. */
  private val LookbackSec = 3L * 24 * 3600

  val queries: Map[String, Q] = Map(
    // ---- r4: static PageRank (DataFrame fixpoint) on the nation chain ----
    // nation keys are the dense 0..24, so the chain 0→1→…→24 is built with
    // one self-semi-join. On a chain every node's in-degree is ≤ 1: each
    // round's rank is exactly one add and one multiply on its
    // predecessor's rank, so 15 distributed rounds are bit-replayable by a
    // 15-step recursive-CTE scalar recurrence (see oracle) — node j<15
    // bottoms out at the dangling head (pinned at resetProb from round 1),
    // node j≥15 still carries the initial mass through f^15(1.0).
    "r4_pagerank_chain" -> ((s, d) => {
      val nodes = t(s, d, "nation").select(col("n_nationkey").as("node"))
      val edges = nodes
        .select(col("node").as("src"), (col("node") + 1).as("dst"))
        .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
      Route.pageRankStatic(s, nodes, edges, iters = 15)
        .select(col("node").as("n_nationkey"), col("rank"))
        .orderBy("n_nationkey")
    }),

    // ---- r5: k-core decomposition on a planted clique + pendant chain ----
    // supplier keys are dense 0..n−1: keys 0..7 form an 8-clique (every
    // degree 7), keys 7..n−1 a pendant chain (every degree ≤ 2). The
    // 3-core peels the whole chain in one round and keeps exactly the
    // clique — the oracle states membership from the generative rule while
    // the operator earns it by generic distributed peeling.
    "r5_kcore" -> ((s, d) => {
      val sup = t(s, d, "supplier").select(col("s_suppkey").as("key"))
      val clique = sup.filter(col("key") <= 7)
      val cedges = clique.select(col("key").as("a"))
        .join(clique.select(col("key").as("b")), col("a") < col("b"))
      val chain = sup.select(col("key").as("a"), (col("key") + 1).as("b"))
        .filter(col("a") >= 7)
        .join(sup.select(col("key").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
      Components.kCore(s, cedges.union(chain), k = 3)
        .select(col("node").as("s_suppkey"))
        .orderBy("s_suppkey")
    }),

    // ---- e18: last-touch attribution (as-of join under the oracle) ----
    // Each purchase is attributed to the user's latest click/view at or
    // before it, but only if within the lookback window — the canonical
    // marketing-attribution shape, and the canonical as-of join: the
    // operator's single merge-sort window replaces the per-row correlated
    // subquery a naive engine would run. Touches are pre-deduped to one
    // per (user, second) by greatest (type, id) — deterministic, SQL-
    // restatable, and it removes the only tie the as-of join would
    // otherwise break by hash (not restatable in the oracle).
    "e18_attribution" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("sec"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"), col("sec"))
        .agg(max(struct(col("event_type"), col("event_id"))).as("m"))
        .select(col("user_id"), col("sec"),
          col("sec").as("t_sec"), col("m.event_type").as("touch_type"),
          col("m.event_id").as("touch_id"))
      val attributed = AsOfJoin.backward(conv, touches, Seq("user_id"), "sec",
        rightCols = Seq("t_sec", "touch_type", "touch_id"))
      val inWindow = col("t_sec").isNotNull &&
        col("sec") - col("t_sec") <= LookbackSec
      attributed.select(col("event_id"),
          when(inWindow, col("touch_type")).otherwise(lit("none")).as("channel"),
          when(inWindow, col("touch_id")).as("touch_id"))
        .orderBy("event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "r4_pagerank_chain" ->
      """WITH RECURSIVE it(m, a, b) AS (
           SELECT 0, CAST(0.15 AS DOUBLE), CAST(1.0 AS DOUBLE)
           UNION ALL
           SELECT m + 1, 0.15 + 0.85 * a, 0.15 + 0.85 * b
           FROM it WHERE m < 15)
         SELECT n_nationkey,
           CASE WHEN n_nationkey < 15
                THEN (SELECT a FROM it WHERE m = n_nationkey)
                ELSE (SELECT b FROM it WHERE m = 15) END AS rank
         FROM nation ORDER BY n_nationkey""",
    "r5_kcore" ->
      """SELECT s_suppkey FROM supplier WHERE s_suppkey <= 7
         ORDER BY s_suppkey""",
    "e18_attribution" ->
      s"""WITH ev AS (
           SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         conv AS (
           SELECT event_id, user_id, sec FROM ev
           WHERE event_type = 'purchase'),
         tch AS (
           SELECT user_id, sec, event_type AS touch_type, event_id AS touch_id
           FROM (
             SELECT user_id, sec, event_type, event_id,
               row_number() OVER (
                 PARTITION BY user_id, sec
                 ORDER BY event_type DESC, event_id DESC) AS rn
             FROM ev WHERE event_type IN ('click', 'view'))
           WHERE rn = 1),
         att AS (
           SELECT c.event_id, c.sec, t.touch_type, t.touch_id, t.sec AS t_sec
           FROM conv c LEFT JOIN LATERAL (
             SELECT * FROM tch t
             WHERE t.user_id = c.user_id AND t.sec <= c.sec
             ORDER BY t.sec DESC LIMIT 1) t ON TRUE)
         SELECT event_id,
           CASE WHEN t_sec IS NOT NULL AND sec - t_sec <= $LookbackSec
                THEN touch_type ELSE 'none' END AS channel,
           CASE WHEN t_sec IS NOT NULL AND sec - t_sec <= $LookbackSec
                THEN touch_id END AS touch_id
         FROM att ORDER BY event_id"""
  )
}
