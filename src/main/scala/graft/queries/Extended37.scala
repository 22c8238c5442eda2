package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-6 surface extensions, batch 37: grid-density hotspot clustering
  * — the distributed DBSCAN-lite shape. Points land in fixed grid cells
  * (one groupBy); "dense" is RELATIVE (cell count > 1.5× the mean cell
  * density, integer-exact as n·nc·2 > 3·total, so the operator is
  * scale-free); clusters are connected components of 8-adjacent dense
  * cells (GraphX CC over the small dense-cell graph — the heavy lifting,
  * the grid aggregation, happened on the full data already). The oracle
  * replays density arithmetic exactly and resolves components with a
  * recursive reachability closure + min-label — the j10/r3 fixpoint
  * discipline.
  *
  * Scale: the full point set is touched by exactly ONE aggregation keyed
  * on the cell; everything after operates on |dense cells| rows (hundreds
  * at sf0.1). Adjacency is a 3×3-ring equi-join (explode 9 neighbor keys,
  * join on the key), never an all-pairs distance test.
  */
object Extended37 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "g10_hotspot_clusters" -> ((s, d) => {
      import s.implicits._
      val cells = t(s, d, "events").filter(col("event_type") === "click")
        .select(col("value").as("x"), (col("user_id") * 4.0).as("y"))
        .select(floor(col("x") / 10).cast("long").as("cx"),
          floor(col("y") / 10).cast("long").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum("n").as("t"), count(lit(1)).as("nc"))
      val dense = cells.join(broadcast(tot))
        .filter(col("n") * col("nc") * 2 > lit(3) * col("t"))
        .select(col("cx"), col("cy"), col("n"),
          (col("cx") * 1000003L + col("cy")).as("id"))
      // 8-adjacency (plus self) as a 9-key ring equi-join on cell ids
      val ring = dense.select(col("id").as("ia"), explode(expr(
          """flatten(transform(sequence(-1, 1), dx ->
             transform(sequence(-1, 1), dy ->
               (cx + dx) * 1000003 + (cy + dy))))""")).as("nbr"))
      val edges = ring.join(dense.select(col("id").as("ib")),
        col("nbr") === col("ib")).select("ia", "ib")
      // min-label CC over the dense-cell graph: FastCC's forest contraction
      // (2 jobs) replaces the O(diameter) GraphX Pregel supersteps — same
      // labels, same localCheckpoint lifecycle, GraphX fallback above the
      // single-task gate
      val labels = graft.graph.FastCC.labels(
        edges.select("ia", "ib"), "id", "cluster_id")
      dense.join(labels, "id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_cells"), sum("n").as("n_points"))
        .orderBy("cluster_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g10_hotspot_clusters" ->
      """WITH RECURSIVE cells AS (
           SELECT CAST(floor(value / 10) AS BIGINT) AS cx,
             CAST(floor(user_id * 4.0 / 10) AS BIGINT) AS cy,
             CAST(count(*) AS BIGINT) AS n
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS t, count(*) AS nc FROM cells),
         dense AS (
           SELECT cx, cy, n, cx * 1000003 + cy AS id FROM cells, tot
           WHERE n * nc * 2 > 3 * t),
         edges AS (
           SELECT a.id AS ia, b.id AS ib FROM dense a JOIN dense b
           ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
         reach(src, dst) AS (
           SELECT ia, ib FROM edges
           UNION
           SELECT r.src, e.ib FROM reach r JOIN edges e ON r.dst = e.ia),
         labels AS (SELECT src AS id, min(dst) AS cluster_id
                    FROM reach GROUP BY src)
         SELECT cluster_id, count(*) AS n_cells,
           CAST(sum(n) AS BIGINT) AS n_points
         FROM labels JOIN dense USING (id)
         GROUP BY cluster_id ORDER BY cluster_id"""
  )
}
