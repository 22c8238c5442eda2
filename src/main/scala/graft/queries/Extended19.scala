package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.geo.GeoFunctions
import graft.graph.PropertyGraph
import graft.route.Route

/** Round-6 surface extensions, batch 19: the centrality surface under the
  * DuckDB oracle gate. General betweenness/closeness are not
  * SQL-expressible, but on closed-form topologies they are — a chain's
  * betweenness is `2·j·(n−1−j)` ordered-pair intermediacies and a cycle's
  * closeness is `(n−1)/⌊n²/4⌋` — so building those topologies FROM the
  * driver's own tables lets the full distributed machinery (the batched
  * multi-source Brandes fixpoints, the multi-landmark Pregel pass) face a hash-exact
  * restatement. All values are small-integer sums / single IEEE
  * divisions, so both engines agree bit-for-bit.
  */
object Extended19 {
  type Q = (SparkSession, String) => DataFrame

  /** Write a GeoJSON chain (or cycle) over `keys`, one unit-weight
    * LineString per consecutive pair; returns (path, key→lon mapping fn).
    * Coordinates derive from the key so the node-id mapping is
    * reconstructible with the same [[GeoFunctions.nodeId]] the ingest
    * uses.
    */
  private[queries] def writeTopology(tag: String, d: String, keys: Seq[Long],
      lat: Double, cycle: Boolean): String = {
    def lon(k: Long) = 3.0 + k * 0.01
    val pairs = keys.zip(keys.tail) ++
      (if (cycle) Seq(keys.last -> keys.head) else Nil)
    val features = pairs.map { case (a, b) =>
      s"""{"type":"Feature","properties":{"w":1},
         |"geometry":{"type":"LineString","coordinates":[[${lon(a)},$lat],[${lon(b)},$lat]]}}""".stripMargin
    }.mkString(",")
    val dir = Paths.get(Scratch.dir(tag, d))
    Files.createDirectories(dir)
    val p = dir.resolve(s"$tag.geojson")
    Files.writeString(p,
      s"""{"type":"FeatureCollection","features":[$features]}""")
    p.toString
  }

  /** (key, _n) mapping under the ingest's default 7-digit node ids. */
  private[queries] def nodeIdOf(s: SparkSession, keys: Seq[Long], lat: Double): DataFrame = {
    import s.implicits._
    keys.toDF("key").select(col("key"),
      GeoFunctions.nodeId(lit(3.0) + col("key") * 0.01, lit(lat), 7).as("_n"))
  }

  private[queries] def sortedKeys(s: SparkSession, d: String, table: String,
      keyCol: String): Seq[Long] =
    t(s, d, table).select(keyCol).collect()
      .map(_.getAs[Number](0).longValue).sorted.toSeq

  val queries: Map[String, Q] = Map(
    // ---- exact Brandes betweenness on the region chain ----
    // A bidirected chain over the region keys: every ordered pair routes
    // through the unique shortest path, so betweenness(v_j) is exactly
    // 2·j·(n−1−j). All |V| nodes are sources — the "sampled" machinery
    // running unsampled, which is its exactness contract.
    "r1_betweenness_chain" -> ((s, d) => {
      val keys = sortedKeys(s, d, "region", "r_regionkey")
      val path = writeTopology("r1", d, keys, lat = 40.0, cycle = false)
      val g = PropertyGraph.fromGeoJson(s, Seq(path))
      val sources = g.nodes.select("_n").collect().map(_.getString(0)).toSeq
      // maxLocalEdges = -1 pins the DISTRIBUTED batched-Brandes path under
      // the oracle — certifying the driver-side gate here would be trivial
      nodeIdOf(s, keys, 40.0)
        .join(Route.betweenness(s, g, sources, "w", maxLocalEdges = -1), Seq("_n"))
        .select(col("key").as("r_regionkey"), col("betweenness"))
        .orderBy("r_regionkey")
    }),

    // ---- exact closeness on the nation cycle (one Pregel pass) ----
    // All 25 nodes are landmarks (≤64 fits the single multi-landmark
    // Pregel run); on the unit cycle every node's mean distance is
    // ⌊n²/4⌋/(n−1), an exact binary rational, so 1/avg is bit-stable.
    "r2_closeness_cycle" -> ((s, d) => {
      val keys = sortedKeys(s, d, "nation", "n_nationkey")
      val path = writeTopology("r2", d, keys, lat = 50.0, cycle = true)
      val g = PropertyGraph.fromGeoJson(s, Seq(path))
      val landmarks = g.nodes.select("_n").collect().map(_.getString(0)).toSeq
      // maxLocalEdges = -1: the multi-landmark Pregel pass stays under the
      // oracle (same reasoning as r1)
      nodeIdOf(s, keys, 50.0)
        .join(Route.closeness(s, g, landmarks, "w", maxLocalEdges = -1), Seq("_n"))
        .select(col("key").as("n_nationkey"), col("closeness"))
        .orderBy("n_nationkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "r1_betweenness_chain" ->
      """SELECT r_regionkey,
         CAST(2*r_regionkey*((SELECT count(*) FROM region)-1-r_regionkey) AS DOUBLE)
           AS betweenness
         FROM region ORDER BY r_regionkey""",
    "r2_closeness_cycle" ->
      """WITH c AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation)
         SELECT n_nationkey, 1.0/(floor(n*n/4)/(n-1.0)) AS closeness
         FROM nation, c ORDER BY n_nationkey"""
  )
}
