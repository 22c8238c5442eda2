package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables
import graft.graph.PropertyGraph
import graft.route.Route
import graft.streaming.EventStream

/** Round-6 surface extensions, batch 30: two more centrality measures on
  * closed-form topologies (Extended19's pattern — the distributed
  * machinery faces a hash-exact DuckDB restatement) and the stream-stream
  * LEFT OUTER interval join surfaced under the oracle gate.
  *
  *  - r7: eccentricity on the region chain — ecc(v_j) = max(j, n−1−j)
  *    unit hops, the pseudo-diameter building block.
  *  - r8: harmonic centrality on the nation chain — node j's distance
  *    multiset is {1..j} ∪ {1..n−1−j}; BOTH engines fold 1/d over the
  *    ascending-sorted multiset (Spark: `aggregate(sort_array(...))`,
  *    DuckDB: `list_reduce(list_transform(list_sort(...)))`), so the IEEE
  *    sum is bit-identical — float-sum order is pinned, not hoped for.
  *  - st8: `EventStream.funnelLeftJoin` (watermark-evicted outer state)
  *    replayed to completion; sentinel far-future rows on both inputs
  *    push the final watermark past every band so unmatched purchases
  *    emit their null-click rows deterministically. Oracle = the batch
  *    `e16_interval_left_join` SQL (same aggregation of the join).
  */
object Extended30 {
  type Q = (SparkSession, String) => DataFrame

  /** Stage the event log plus one far-future click+purchase pair (user
    * 9,999,999) as a SECOND parquet part: the outer join can only emit
    * its unmatched rows once the watermark passes their band end, and
    * the sentinels move it 30 days past the real data. Idempotent per
    * (tag, sf-dir) via the Scratch registry.
    */
  private[queries] def stagedOuterDir(s: SparkSession, d: String): String = {
    val dir = Paths.get(Scratch.dir("st8_events", d))
    val done = dir.resolve("_staged")
    Scratch.sync(dir.toString) { if (!Files.exists(done)) {
      Files.createDirectories(dir)
      Files.copy(Paths.get(d, "events.parquet"), dir.resolve("events.parquet"))
      val raw = s.read.parquet(dir.toString)
      val maxMicros = Tables.normalizeTs(raw)
        .agg(max(unix_micros(col("ts")))).head.getLong(0)
      val farMicros = maxMicros + 30L * 24 * 3600 * 1000000L
      // sentinel ts must be written in the SAME physical flavor as the
      // staged file (long nanos / NTZ / LTZ) or the fixed-schema file
      // stream would mis-read the appended part
      val farCol = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => lit(farMicros * 1000L)
        case org.apache.spark.sql.types.TimestampNTZType =>
          timestamp_micros(lit(farMicros))
            .cast(org.apache.spark.sql.types.TimestampNTZType)
        case _ => timestamp_micros(lit(farMicros))
      }
      def sent(id: Long, typ: String) = raw.limit(1)
        .withColumn("event_id", lit(id)).withColumn("ts", farCol)
        .withColumn("user_id", lit(9999999L))
        .withColumn("event_type", lit(typ))
        .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      sent(-1L, "click").union(sent(-2L, "purchase"))
        .select(raw.columns.map(col): _*)
        .write.mode("append").parquet(dir.toString)
      Files.createFile(done)
    } }
    dir.toString
  }

  val queries: Map[String, Q] = Map(
    // ---- exact eccentricity on the region chain ----
    "r7_eccentricity_chain" -> ((s, d) => {
      val keys = Extended19.sortedKeys(s, d, "region", "r_regionkey")
      val path = Extended19.writeTopology("r7", d, keys, lat = 41.0, cycle = false)
      val g = PropertyGraph.fromGeoJson(s, Seq(path))
      val landmarks = g.nodes.select("_n").collect().map(_.getString(0)).toSeq
      // maxLocalEdges = -1 pins the distributed multi-landmark Pregel pass
      // under the oracle (the driver gate is certified by RouteSpec)
      Extended19.nodeIdOf(s, keys, 41.0)
        .join(Route.eccentricity(s, g, landmarks, "w", maxLocalEdges = -1),
          Seq("_n"))
        .select(col("key").as("r_regionkey"), col("eccentricity"))
        .orderBy("r_regionkey")
    }),

    // ---- exact harmonic centrality on the nation chain ----
    "r8_harmonic_chain" -> ((s, d) => {
      val keys = Extended19.sortedKeys(s, d, "nation", "n_nationkey")
      val path = Extended19.writeTopology("r8", d, keys, lat = 42.0, cycle = false)
      val g = PropertyGraph.fromGeoJson(s, Seq(path))
      val landmarks = g.nodes.select("_n").collect().map(_.getString(0)).toSeq
      Extended19.nodeIdOf(s, keys, 42.0)
        .join(Route.harmonic(s, g, landmarks, "w", maxLocalEdges = -1), Seq("_n"))
        .select(col("key").as("n_nationkey"), col("harmonic"))
        .orderBy("n_nationkey")
    }),

    // ---- stream-stream LEFT OUTER interval join, replayed ----
    "st8_stream_left_join" -> ((s, d) => {
      val dir = stagedOuterDir(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
      val j = EventStream.funnelLeftJoin(stream)
      Extended18.runToCompletion(s, j, "st8_mem", OutputMode.Append(),
        partitions = 4)
        .filter(col("user_id") =!= 9999999L)
        .groupBy("user_id", "purchase_id")
        .agg(count(col("click_id")).as("n_clicks"),
          min(col("c_ts")).as("first_click"))
        .orderBy("user_id", "purchase_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "r7_eccentricity_chain" ->
      """SELECT r_regionkey,
           CAST(greatest(r_regionkey,
             (SELECT count(*) FROM region) - 1 - r_regionkey) AS DOUBLE)
             AS eccentricity
         FROM region ORDER BY r_regionkey""",
    "r8_harmonic_chain" ->
      """WITH n AS (SELECT count(*) AS n FROM nation)
         SELECT n_nationkey,
           list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(
                 list_sort(flatten([range(1, n_nationkey + 1),
                                    range(1, CAST(n - n_nationkey AS BIGINT))])),
                 d -> 1.0 / d)),
             (acc, x) -> acc + x) AS harmonic
         FROM nation, n ORDER BY n_nationkey""",
    "st8_stream_left_join" ->
      """WITH b AS (SELECT user_id, event_id AS purchase_id, ts AS b_ts
                    FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
                  FROM events WHERE event_type = 'click')
         SELECT b.user_id, b.purchase_id,
           count(c.click_id) AS n_clicks, min(c.c_ts) AS first_click
         FROM b LEFT JOIN c
           ON b.user_id = c.user_id
           AND c.c_ts <= b.b_ts
           AND c.c_ts >= b.b_ts - INTERVAL 30 MINUTE
         GROUP BY b.user_id, b.purchase_id
         ORDER BY b.user_id, b.purchase_id"""
  )
}
