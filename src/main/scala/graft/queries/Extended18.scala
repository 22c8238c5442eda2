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
    Scratch.sync(dir.toString) {
      Files.createDirectories(dir)
      val dst = dir.resolve("events.parquet")
      if (!Files.exists(dst))
        Files.copy(Paths.get(d, "events.parquet"), dst)
    }
    dir.toString
  }

  /** Staging for the session replay: the event log plus TWO sentinel
    * waves (user −1, 4 h and 8 h past the max event time) as separate
    * files with increasing mtimes. With `maxFilesPerTrigger=1` the file
    * source feeds three micro-batches: after batch 2 the watermark has
    * passed every real session's `end + gap`, so batch 3 fires all their
    * event-time timeouts — the replay emits every real session
    * deterministically, with no polling. Sentinel sessions are filtered
    * by user id.
    */
  private def stagedSessionDir(s: SparkSession, d: String): String = {
    val dir = Paths.get(Scratch.dir("st3_events", d))
    val ready = dir.resolve("_READY")
    Scratch.sync(dir.toString) { if (!Files.exists(ready)) {
      Files.createDirectories(dir)
      val events = dir.resolve("a_events.parquet")
      if (!Files.exists(events))
        Files.copy(Paths.get(d, "events.parquet"), events)
      val raw = s.read.parquet(s"$d/events.parquet")
      val tsType = raw.schema("ts").dataType
      val tsIsLong = tsType == org.apache.spark.sql.types.LongType
      val tsIsNtz = tsType == org.apache.spark.sql.types.TimestampNTZType
      val maxTs = raw.agg(max(col("ts"))).head.get(0) match {
        case l: java.lang.Long => l.longValue
        case t: java.sql.Timestamp => t.getTime * 1000000L
        case ldt: java.time.LocalDateTime => // NTZ read: wall clock IS UTC
          ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L +
            ldt.getNano
      }
      val hour = if (tsIsLong) 3600L * 1000000000L else 1L // ns vs Timestamp
      Seq(("b_sent1.parquet", 4L), ("c_sent2.parquet", 8L)).foreach {
        case (name, hours) =>
          val ltz = timestamp_micros(lit(maxTs / 1000L + hours * 3600L * 1000000L))
          val ts =
            if (tsIsLong) lit(maxTs + hours * hour)
            // sentinel files must carry the SAME parquet timestamp flavor
            // as the copied event log, or the file source's fixed schema
            // would mis-read them; UTC session ⇒ the cast keeps the instant
            else if (tsIsNtz) ltz.cast(org.apache.spark.sql.types.TimestampNTZType)
            else ltz
          val tmp = Files.createTempDirectory("graft_sent")
          raw.limit(1).withColumn("user_id", lit(-1L)).withColumn("ts", ts)
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = Files.list(tmp).filter(_.getFileName.toString.startsWith("part-"))
            .findFirst.get
          Files.copy(part, dir.resolve(name))
      }
      // file-source ordering is by modification time: pin it
      Seq("a_events.parquet", "b_sent1.parquet", "c_sent2.parquet").zipWithIndex
        .foreach { case (n, i) =>
          Files.setLastModifiedTime(dir.resolve(n),
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
        }
      Files.createFile(ready)
    } }
    dir.toString
  }

  /** Run a streaming plan over the sf dir's event log to completion and
    * hand back the memory-sink table. A fresh checkpoint per invocation
    * makes every call a full, idempotent replay (bench reps included);
    * the sink table is tiny relative to the stream, which is the whole
    * point of the streaming operators.
    */
  /** `noDataBatches = false` skips the trailing watermark-advance
    * micro-batches (`spark.sql.streaming.noDataMicroBatches.enabled`).
    * Safe ONLY for replays whose final sink table is fully emitted by the
    * DATA batches — Complete/Update-mode aggregates, inner joins,
    * stateless enrichment, dropDuplicates (emit-on-arrival). The replays
    * whose final emissions happen IN the no-data batch — event-time
    * timeouts (st3) and outer-join null-row release (st8/st11) — must
    * keep the default. A multi-wave watermarked replay otherwise pays one
    * no-data batch per wave, each a full state-store commit cycle for
    * zero rows: pure machinery floor (VERDICT r9 next-#3).
    */
  private[queries] def runToCompletion(s: SparkSession, out: DataFrame, name: String,
      mode: OutputMode, partitions: Int = 4,
      noDataBatches: Boolean = true): DataFrame = {
    s.catalog.dropTempView(name)
    // replay checkpoints are throwaway (fresh per invocation — the replay
    // IS the unit of work, nothing recovers across it), so they belong on
    // tmpfs when one exists: every micro-batch fsyncs offsets + commits +
    // per-partition state snapshots, and that disk latency — not state
    // size — was the floor under the 14-query replay block. Durable
    // checkpoints are for deployments that need recovery (RecoverySpec
    // exercises that path with real on-disk checkpoints).
    val ckptBase = Paths.get("/dev/shm")
    val ckpt = (if (Files.isDirectory(ckptBase) && Files.isWritable(ckptBase))
      Files.createTempDirectory(ckptBase, s"graft_ckpt_$name")
    else Files.createTempDirectory(s"graft_ckpt_$name")).toString
    // streaming state parallelism sized to the replay: every micro-batch
    // commits one state store PER shuffle partition PER stateful operator
    // (a stream-stream join holds FOUR stores per partition), so a
    // multi-wave replay at the batch default (32) pays hundreds of store
    // commits for kilobytes of state. 4 is the measured sweet spot at
    // sf0.1: a round-10 A/B at 2 partitions saved store commits but cost
    // MORE wall on every replay with real per-row work (st3/7/8/9/11 all
    // slower — the 100k-row batches want the parallelism). A real
    // deployment sizes this to its key cardinality at first start (the
    // checkpoint pins it thereafter — fresh checkpoint per run here, so
    // the scope-down is safe).
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = s.conf.get(noDataKey, "true")
    s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    s.conf.set(noDataKey, noDataBatches.toString)
    try {
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(mode).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // dev-loop floor profiler (the driver never sets it): dump each
      // micro-batch's durationMs decomposition so the replay overhead can
      // be attributed (planning vs state commit vs WAL vs addBatch) —
      // the evidence behind SCALING.md's streaming-floor section
      if (sys.env.contains("SPARK_GRAFT_ST_PROFILE"))
        q.recentProgress.foreach { p =>
          System.err.println(s"[st-profile] $name batch=${p.batchId} " +
            s"rows=${p.numInputRows} durationMs=${p.durationMs}")
        }
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.conf.set(noDataKey, prevNoData)
      // throwaway checkpoint: reclaim it now — a bench session replays
      // 14 queries × reps and a tmpfs checkpoint left behind is RAM held
      // until process exit (the sink table is already materialized)
      try
        graft.store.GraphPackage.walkTree(Paths.get(ckpt))(
          _.toSeq.reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_)))
      catch { case scala.util.control.NonFatal(_) => () }
    }
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
    // One staged file → one data wave: cross-batch state is st3–st9's
    // job; this query certifies the windowed-agg semantics themselves.
    "st1_stream_hourly" -> ((s, d) => {
      val agg = EventStream.hourlyAgg(EventStream.readEvents(s, stagedEventsDir(d)))
      runToCompletion(s, agg, "st1_mem", OutputMode.Complete(),
          noDataBatches = false) // Complete mode: every batch emits all
        .orderBy("hour_ts", "event_type")
    }),

    // ---- streaming twin of the funnel interval join (append mode) ----
    // Stream-stream inner join with watermark-bounded state: every
    // click × purchase pair within the hour band, emitted exactly once
    // across the replay. One staged file → one data wave (join-state
    // handoff across batches is st8's job).
    "st2_stream_funnel" -> ((s, d) => {
      val j = EventStream.funnelJoin(EventStream.readEvents(s, stagedEventsDir(d)))
      runToCompletion(s, j, "st2_mem", OutputMode.Append(), partitions = 4,
          noDataBatches = false) // inner join: matches emit in data batches
        .orderBy("user_id", "click_id", "purchase_id")
    }),

    // ---- streaming gap sessions via event-time timeout (append mode) ----
    // The flatMapGroupsWithState session operator replayed to completion:
    // sessions close either by a later event past the gap or by their
    // event-time TIMEOUT once the sentinel waves push the watermark past
    // end+gap. The emitted set must equal the batch session_window
    // aggregate of the same log — the oracle restates it as
    // gaps-and-islands SQL.
    "st3_stream_sessions" -> ((s, d) => {
      val dir = stagedSessionDir(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
      val sess = EventStream.timedSessions(s, stream, gapSec = 1800L)
      runToCompletion(s, sess, "st3_mem", OutputMode.Append())
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("sess_start"), col("sess_end"),
          col("n"), round(col("total"), 2).as("total"))
        .orderBy("user_id", "sess_start")
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
         ORDER BY 1, 2, 3""",
    "st3_stream_sessions" ->
      """WITH g AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         sess AS (
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM g)
         SELECT user_id, epoch_us(min(ts)) AS sess_start,
           epoch_us(max(ts)) AS sess_end,
           count(*) AS n, round(sum(value), 2) AS total
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, sess_start"""
  )
}
