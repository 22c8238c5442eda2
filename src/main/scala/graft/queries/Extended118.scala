package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-8 batch 118: Bradley–Terry preference-strength fitting
  * (Hunter 2004 MM algorithm — public formulation), the pairwise-
  * preference primitive of reward-model / RLHF data auditing.
  *
  * a62_bradley_terry: which event type "wins" the daily volume duel?
  * Every day each unordered type pair is one comparison: the type with
  * the strictly larger daily cent volume wins (equal days are excluded
  * — the standard tie handling). Three MM iterations of
  *
  *   p'_i = W_i / Σ_{j≠i} n_ij / (p_i + p_j)
  *
  * fit the strengths. The comparison counts n_ij and win totals W_i
  * are exact BIGINTs from ONE day-keyed pair join over the
  * calendar-bounded daily summary (≤ |types|² rows per day); the
  * iteration runs on the ≤|types|-node artifact with the per-item sum
  * FOLDED OVER THE OPPONENT-SORTED LIST on both engines (the t35/a46
  * discipline), so the float order cannot drift. The oracle unrolls
  * the identical three iterations with correlated ORDER BY j folds.
  *
  * Scale shape: the only corpus-proportional pass is the daily
  * aggregate; the duel join is day-bounded, the fit domain-bounded.
  *
  * Reference context: no counterpart; extends the evaluation layer
  * (tp32 kappa — agreement; a62 — strength from preferences).
  */
object Extended118 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "a62_bradley_terry" -> ((s, d) => {
      val dy = t(s, d, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("y"))
      val duels = dy.as("x").join(dy.as("y"),
          col("x.day") === col("y.day") &&
            col("x.event_type") < col("y.event_type"))
        .filter(col("x.y") =!= col("y.y"))
        .select(col("x.event_type").as("a"), col("y.event_type").as("b"),
          when(col("x.y") > col("y.y"), 1L).otherwise(0L).as("a_wins"))
      val pairStats = duels.groupBy("a", "b")
        .agg(count(lit(1)).as("nij"), sum("a_wins").as("wa"))
        .localCheckpoint() // ≤|types|² rows, reused every iteration
      // symmetric opponent view: (i, j, n_ij) both directions
      val opp = pairStats.select(col("a").as("i"), col("b").as("j"), col("nij"))
        .unionAll(pairStats.select(col("b").as("i"), col("a").as("j"),
          col("nij")))
      val wins = pairStats.select(col("a").as("i"), col("wa").as("w"))
        .unionAll(pairStats.select(col("b").as("i"),
          (col("nij") - col("wa")).as("w")))
        .groupBy("i").agg(sum("w").as("wi"))
      def step(prev: DataFrame): DataFrame = {
        val terms = opp
          .join(prev.select(col("i"), col("p").as("pi")), "i")
          .join(prev.select(col("i").as("j"), col("p").as("pj")), "j")
          .select(col("i"), col("j"),
            (col("nij").cast("double") / (col("pi") + col("pj"))).as("term"))
        wins.join(
            terms.groupBy("i").agg(
              aggregate(sort_array(collect_list(struct(col("j"),
                  col("term")))),
                lit(0.0), (acc, x) => acc + x("term")).as("den")),
            Seq("i"))
          .select(col("i"), (col("wi").cast("double") / col("den")).as("p"))
      }
      val p0 = wins.select(col("i"), lit(1.0).as("p"))
      val p3 = step(step(step(p0)))
      wins.join(p3, "i")
        .select(col("i").as("event_type"), col("wi").as("wins"),
          round(col("p"), 6).as("bt_strength"))
        .orderBy(col("p").desc, col("i"))
    })
  )

  val oracleSql: Map[String, String] = {
    def step(prev: String, next: String) =
      s"""$next AS (
           SELECT w.i,
             CAST(w.wi AS DOUBLE) / (
               SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(CAST(o.nij AS DOUBLE) / (pi.p + pj.p) ORDER BY o.j)),
                 (a, b) -> a + b)
               FROM opp o JOIN $prev pi ON pi.i = o.i
                 JOIN $prev pj ON pj.i = o.j
               WHERE o.i = w.i) AS p
           FROM wins w)"""
    Map(
      "a62_bradley_terry" ->
        s"""WITH dy AS (
             SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
           duels AS (
             SELECT x.event_type AS a, y.event_type AS b,
               CASE WHEN x.y > y.y THEN 1 ELSE 0 END AS a_wins
             FROM dy x JOIN dy y
               ON x.day = y.day AND x.event_type < y.event_type
             WHERE x.y <> y.y),
           ps AS (
             SELECT a, b, CAST(count(*) AS BIGINT) AS nij,
               CAST(sum(a_wins) AS BIGINT) AS wa
             FROM duels GROUP BY a, b),
           opp AS (
             SELECT a AS i, b AS j, nij FROM ps
             UNION ALL SELECT b, a, nij FROM ps),
           wins AS (
             SELECT i, CAST(sum(w) AS BIGINT) AS wi FROM (
               SELECT a AS i, wa AS w FROM ps
               UNION ALL SELECT b, nij - wa FROM ps)
             GROUP BY i),
           p0 AS (SELECT i, CAST(1 AS DOUBLE) AS p FROM wins),
           ${step("p0", "p1")},
           ${step("p1", "p2")},
           ${step("p2", "p3")}
           SELECT w.i AS event_type, w.wi AS wins,
             round(p3.p, 6) AS bt_strength
           FROM wins w JOIN p3 ON p3.i = w.i
           ORDER BY p3.p DESC, w.i"""
    )
  }
}
