package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.Tables.t
import graft.streaming.EventStream

/** Round-6 surface extensions, batch 18: the XML format family (KML, GML,
  * OSM) exercised end-to-end through a mixed-format build with a DuckDB
  * oracle, and the Structured Streaming surface run to completion
  * (Trigger.AvailableNow) so its results face the same oracle gate as the
  * batch twins — streaming plans are only "done" here when a full replay
  * of the event log through the streaming operators hash-matches the
  * batch SQL restatement.
  */
object Extended18 {
  type Q = (SparkSession, String) => DataFrame

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render the nation table as deterministic KML / GML / OSM fixtures.
    * One LineString per nation per format; coordinates derive
    * arithmetically from the keys (per-format latitude bands keep node
    * ids distinct across layers), properties carry the name and the
    * nation key, so a DuckDB oracle can restate every aggregate straight
    * from the parquet.
    */
  private def writeXmlFixtures(s: SparkSession, d: String): Seq[String] = {
    val rows = t(s, d, "nation")
      .select("n_nationkey", "n_regionkey", "n_name").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getString(2)))
      .sortBy(_._1)
    def lon(k: Long) = 1.0 + k * 0.01
    def lat(base: Double, rk: Long) = base + rk * 0.01

    val kml = rows.map { case (k, rk, name) =>
      val (x, y) = (lon(k), lat(10.0, rk))
      s"""<Placemark><name>${esc(name)}</name>
         |<ExtendedData><Data name="w"><value>$k</value></Data></ExtendedData>
         |<LineString><coordinates>$x,$y ${x + 0.001},$y</coordinates></LineString>
         |</Placemark>""".stripMargin
    }.mkString(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<kml xmlns=\"http://www.opengis.net/kml/2.2\"><Document>\n",
      "\n", "\n</Document></kml>\n")

    val gml = rows.map { case (k, rk, name) =>
      val (x, y) = (lon(k), lat(20.0, rk))
      s"""<gml:featureMember><Road>
         |<name>${esc(name)}</name><w>$k</w>
         |<gml:LineString srsDimension="2"><gml:posList>$x $y ${x + 0.001} $y</gml:posList></gml:LineString>
         |</Road></gml:featureMember>""".stripMargin
    }.mkString(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<gml:FeatureCollection xmlns:gml=\"http://www.opengis.net/gml\">\n",
      "\n", "\n</gml:FeatureCollection>\n")

    val osm = {
      val nodes = rows.flatMap { case (k, rk, _) =>
        val (x, y) = (lon(k), lat(30.0, rk))
        Seq(s"""<node id="${2 * k + 1}" lon="$x" lat="$y"/>""",
          s"""<node id="${2 * k + 2}" lon="${x + 0.001}" lat="$y"/>""")
      }
      val ways = rows.map { case (k, _, name) =>
        s"""<way id="${1000 + k}"><nd ref="${2 * k + 1}"/><nd ref="${2 * k + 2}"/>""" +
          s"""<tag k="name" v="${esc(name)}"/><tag k="w" v="$k"/></way>"""
      }
      (nodes ++ ways).mkString(
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n",
        "\n", "\n</osm>\n")
    }

    val dir = Paths.get(Scratch.dir("s12", d))
    Files.createDirectories(dir)
    Seq("xml_kml.kml" -> kml, "xml_gml.gml" -> gml, "xml_osm.osm" -> osm)
      .map { case (fn, content) =>
        val p = dir.resolve(fn)
        Files.writeString(p, content)
        p.toString
      }
  }

  /** The file stream source reads directories, but the sf dirs store the
    * event log as a single parquet FILE — stage it (once per process)
    * into a scratch directory the source can watch. A real deployment
    * streams a directory of arriving files; this keeps the registry
    * query self-contained on the driver-provided layout.
    */
  private def stagedEventsDir(d: String): String = {
    val dir = Paths.get(Scratch.dir("st_events", d))
    Files.createDirectories(dir)
    val dst = dir.resolve("events.parquet")
    if (!Files.exists(dst))
      Files.copy(Paths.get(d, "events.parquet"), dst)
    dir.toString
  }

  /** Run a streaming plan over the sf dir's event log to completion and
    * hand back the memory-sink table. A fresh checkpoint per invocation
    * makes every call a full, idempotent replay (bench reps included);
    * the sink table is tiny relative to the stream, which is the whole
    * point of the streaming operators.
    */
  private def runToCompletion(s: SparkSession, out: DataFrame, name: String,
      mode: OutputMode): DataFrame = {
    s.catalog.dropTempView(name)
    val ckpt = Files.createTempDirectory(s"graft_ckpt_$name").toString
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(mode).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name)
  }

  val queries: Map[String, Q] = Map(
    // ---- XML format family through the mixed-format build pipeline ----
    // KML + GML + OSM fixtures ingest through their three readers and the
    // common GeoJSON feature pipeline (reverse edges, node ids, dynamic
    // props, offset fids) in ONE PropertyGraph build; the per-layer
    // aggregate is restated by the oracle from the nation parquet. Edge
    // count doubles the feature count (reversals); node count is two
    // endpoints per feature; w sums over both directions.
    "s12_xml_ingest" -> ((s, d) => {
      val paths = writeXmlFixtures(s, d)
      graft.graph.PropertyGraph.fromGeoJson(s, paths).edges
        .groupBy("_layer")
        .agg(count(lit(1)).as("n_edges"),
          countDistinct(col("_u")).as("n_nodes"),
          sum(col("w")).cast("long").as("sum_w"),
          max(col("name")).as("max_name"))
        .orderBy("_layer")
    }),

    // ---- streaming twin of e1: watermarked tumbling-window aggregate ----
    // The full event log replays through readStream → window agg; the
    // memory sink's final table must equal the batch hourly aggregate.
    "st1_stream_hourly" -> ((s, d) => {
      val agg = EventStream.hourlyAgg(EventStream.readEvents(s, stagedEventsDir(d)))
      runToCompletion(s, agg, "st1_mem", OutputMode.Complete())
        .orderBy("hour_ts", "event_type")
    }),

    // ---- streaming twin of the funnel interval join (append mode) ----
    // Stream-stream inner join with watermark-bounded state: every
    // click × purchase pair within the hour band, emitted exactly once
    // across the replay.
    "st2_stream_funnel" -> ((s, d) => {
      val j = EventStream.funnelJoin(EventStream.readEvents(s, stagedEventsDir(d)))
      runToCompletion(s, j, "st2_mem", OutputMode.Append())
        .orderBy("user_id", "click_id", "purchase_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "s12_xml_ingest" ->
      """SELECT t.l AS _layer,
         2*count(*) AS n_edges,
         2*count(*) AS n_nodes,
         CAST(2*sum(n.n_nationkey) AS BIGINT) AS sum_w,
         max(n.n_name) AS max_name
         FROM nation n CROSS JOIN (VALUES ('xml_gml'),('xml_kml'),('xml_osm')) AS t(l)
         GROUP BY t.l ORDER BY _layer""",
    "st1_stream_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts, event_type,
         count(*) AS n, round(sum(value),2) AS total
         FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""",
    "st2_stream_funnel" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
         FROM events a JOIN events b
           ON b.user_id = a.user_id
          AND a.event_type = 'click' AND b.event_type = 'purchase'
          AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
         ORDER BY 1, 2, 3"""
  )
}
