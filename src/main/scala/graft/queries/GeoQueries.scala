package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** The reference's spatial-operator semantics (SURVEY §2.5) exercised over
  * the synthetic tables so the DuckDB oracle can check them: bbox filter
  * (G1), candidate-prune + exact-refine distance query with nearest-first
  * sort (G2/G3), haversine (G6), plus the BFS traversal (J2/§2.7) with a
  * recursive-CTE oracle. The GeoJSON-native forms of the same operators
  * live in graft.spatial/graft.route and are pinned by the parity specs.
  */
object GeoQueries {
  type Q = (SparkSession, String) => DataFrame

  // synthetic plane over events: x = value, y = user_id with 4× stretch
  private val (cx, cy, radius) = (100.0, 7.0, 40.0)

  val queries: Map[String, Q] = Map(
    // G1: bbox predicate — pushed to the parquet scan
    "g1_bbox" -> ((s, d) =>
      t(s, d, "events")
        .filter(col("value") >= 50 && col("value") <= 150 &&
          col("user_id") >= 5 && col("user_id") <= 20)
        .select("event_id").orderBy("event_id")),

    // G2: dwithin candidate stage — the buffered bounding box
    "g2_dwithin_candidates" -> ((s, d) =>
      t(s, d, "events")
        .filter(col("value").between(cx - radius, cx + radius) &&
          col("user_id").between(cy - radius / 4, cy + radius / 4))
        .select("event_id").orderBy("event_id")),

    // G3: exact refine, strict < radius, nearest-first
    "g3_dwithin_sort" -> ((s, d) => {
      val dist = sqrt(pow(col("value") - cx, 2) + pow((col("user_id") - cy) * 4, 2))
      t(s, d, "events")
        .filter(col("value").between(cx - radius, cx + radius) &&
          col("user_id").between(cy - radius / 4, cy + radius / 4))
        .withColumn("dist", round(dist, 4))
        .filter(col("dist") < radius)
        .select("event_id", "dist")
        .orderBy("dist", "event_id")
    }),

    // G6: haversine over synthetic lon/lat pairs
    "g6_haversine" -> ((s, d) => {
      val lon1 = (abs(col("c_acctbal")) % 180.0) - 90.0
      val lat1 = ((col("c_custkey") % 160) - 80).cast("double") * 0.5
      val lon2 = ((col("c_nationkey") * 13.7) % 180.0) - 90.0
      val lat2 = ((col("c_nationkey") * 7) % 160 - 80).cast("double") * 0.5
      val h = pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
      t(s, d, "customer")
        .select(col("c_custkey"),
          round(lit(2.0 * 6371000.0) * asin(sqrt(h)), 0).as("dist_m"))
        .orderBy("c_custkey")
    }),

    // J3: distributed proximity self-join (grid-bucketed; the brute-force
    // theta join is only the oracle's job)
    "g4_proximity_join" -> ((s, d) => {
      val pts = t(s, d, "events").filter(col("event_type") === "error")
        .select(col("event_id"), col("value").as("x"),
          (col("user_id") * 4.0).as("y"))
      graft.spatial.Spatial.planarProximityJoin(pts, "event_id", "x", "y", 25.0)
        .select(col("a"), col("b"), round(col("_distance"), 4).as("dist"))
        .orderBy("a", "b")
    }),

    // J2/§2.7: bounded BFS (min hop distance ≤ 3) on the part↔part graph
    // induced by shared orders — iterative frontier joins, the DataFrame
    // form of a Pregel superstep loop.
    "j3_bfs_hops" -> ((s, d) => {
      // frontier expansion as two semi-joins per hop (parts → their orders
      // → those orders' parts): the co-membership edge set (|li|²/|orders|
      // pairs) is never materialized. Both the frontier AND the visited set
      // stay distributed DataFrames — nothing is collect()ed to the driver,
      // so a reachable part-set of tens of millions of ids costs executor
      // memory, not driver heap. Dedup against visited is a per-hop
      // left_anti join; AQE picks broadcast for small frontiers at bench
      // scale and falls back to a shuffle semi-join when a frontier grows
      // past the broadcast threshold — the 100 TB-safe degradation.
      // localCheckpoint (eager) per hop materializes the frontier once and
      // truncates the iterated-join lineage so hop N's plan doesn't re-run
      // hops 1..N-1; it also lets li be unpersisted before the caller's
      // final action. cache: li is scanned twice per hop, so without it
      // the two-column projection rescans parquet up to 6×.
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey").cache()
      import s.implicits._
      var visited = Seq((0L, 0)).toDF("p", "depth")
      var frontier = visited.select("p")
      try {
        for (i <- 1 to 3) {
          val ords = li.join(frontier, li("l_partkey") === frontier("p"), "left_semi")
            .select("l_orderkey")
          val next = li.join(ords, Seq("l_orderkey"), "left_semi")
            .select(col("l_partkey").as("p")).distinct()
            .join(visited, Seq("p"), "left_anti")
            .withColumn("depth", lit(i))
            .localCheckpoint()
          visited = visited.union(next)
          frontier = next.select("p")
        }
        visited.localCheckpoint().orderBy("p")
      } finally li.unpersist(blocking = false)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g1_bbox" ->
      """SELECT event_id FROM events
         WHERE value >= 50 AND value <= 150 AND user_id >= 5 AND user_id <= 20
         ORDER BY event_id""",
    "g2_dwithin_candidates" ->
      s"""SELECT event_id FROM events
         WHERE value BETWEEN ${cx - radius} AND ${cx + radius}
           AND user_id BETWEEN ${cy - radius / 4} AND ${cy + radius / 4}
         ORDER BY event_id""",
    "g3_dwithin_sort" ->
      s"""SELECT event_id, dist FROM (
           SELECT event_id,
             round(sqrt(pow(value - $cx, 2) + pow((user_id - $cy) * 4, 2)), 4) AS dist
           FROM events
           WHERE value BETWEEN ${cx - radius} AND ${cx + radius}
             AND user_id BETWEEN ${cy - radius / 4} AND ${cy + radius / 4})
         WHERE dist < $radius ORDER BY dist, event_id""",
    "g6_haversine" ->
      """SELECT c_custkey,
           round(2.0 * 6371000.0 * asin(sqrt(
             pow(sin(radians(lat2 - lat1) / 2), 2) +
             cos(radians(lat1)) * cos(radians(lat2)) *
             pow(sin(radians(lon2 - lon1) / 2), 2))), 0) AS dist_m
         FROM (
           SELECT c_custkey,
             (abs(c_acctbal) % 180.0) - 90.0 AS lon1,
             CAST((c_custkey % 160) - 80 AS DOUBLE) * 0.5 AS lat1,
             ((c_nationkey * 13.7) % 180.0) - 90.0 AS lon2,
             CAST((c_nationkey * 7) % 160 - 80 AS DOUBLE) * 0.5 AS lat2
           FROM customer)
         ORDER BY c_custkey""",
    "g4_proximity_join" ->
      """SELECT a.event_id AS a, b.event_id AS b,
           round(sqrt(pow(a.value - b.value, 2) +
                      pow((a.user_id - b.user_id) * 4.0, 2)), 4) AS dist
         FROM events a, events b
         WHERE a.event_type = 'error' AND b.event_type = 'error'
           AND a.event_id < b.event_id
           AND sqrt(pow(a.value - b.value, 2) +
                    pow((a.user_id - b.user_id) * 4.0, 2)) < 25.0
         ORDER BY a, b""",
    "j3_bfs_hops" ->
      """WITH RECURSIVE r AS (
           SELECT CAST(0 AS BIGINT) AS p, 0 AS depth
           UNION
           SELECT b.l_partkey AS p, r.depth + 1 AS depth
           FROM r, lineitem a, lineitem b
           WHERE a.l_partkey = r.p AND b.l_orderkey = a.l_orderkey
             AND b.l_partkey <> a.l_partkey AND r.depth < 3)
         SELECT p, min(depth) AS depth FROM r GROUP BY p ORDER BY p"""
  )
}
