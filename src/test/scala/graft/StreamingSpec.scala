package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The streaming plans must produce exactly the batch results when fed the
  * same parquet — one batch of files driven synchronously through the
  * memory sink.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // FileStreamSource needs a directory: stage the single events file into one
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming hourly agg == batch hourly agg") {
    val stream = EventStream.readEvents(spark, dir)
    assert(stream.isStreaming)
    val q = EventStream.hourlyAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_out")
      .orderBy("hour_ts", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    val batch = EventStream.normalize(Tables.events(spark, "/root/testdata/sf0.001"))
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy("hour_ts", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    assert(got.length == batch.length && got.sameElements(batch))
  }

  test("streaming sliding-window agg == batch e5 query") {
    val stream = EventStream.readEvents(spark, dir)
    val agg = EventStream.normalize(stream)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("total"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sliding_out").orderBy("win_start", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = SparkEntry.queries("e5_sliding_agg")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == batch.length && got.sameElements(batch))
  }

  test("streaming sessionization == batch sessionization") {
    val stream = EventStream.readEvents(spark, dir)
    val q = EventStream.sessionize(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sess_out")
    val batch = SparkEntry.queries("e2_sessionize")(spark, "/root/testdata/sf0.001")
    assert(got.count() == batch.count())
    val diff = got.join(batch.withColumnRenamed("session_id", "batch_session"),
        Seq("user_id", "event_id"))
      .filter(col("session_id") =!= col("batch_session")).count()
    assert(diff == 0)
  }

  test("streaming dedup keeps exactly one event per (user, type) — batch e8 keys") {
    val stream = EventStream.readEvents(spark, dir)
    val dedup = EventStream.normalize(stream)
      .withWatermark("ts", "2 hours")
      .dropDuplicates("user_id", "event_type")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("dedup_out").select("user_id", "event_type")
    // streaming dropDuplicates keeps the first arrival (source order, not ts
    // order), so only the KEY SET is comparable to the batch keep-earliest
    // form — same dedup domain, documented arrival-order difference
    val batch = SparkEntry.queries("e8_stream_dedup")(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_type")
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("stateful running user stats accumulate all events") {
    val stream = EventStream.readEvents(spark, dir)
    val q = EventStream.runningUserStats(spark, stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("user_stats").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("user_stats")
      .groupBy("userId").agg(max("events").as("events"))
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id").as("userId")).agg(count(lit(1)).as("events"))
    val diff = got.join(batch, "userId")
      .filter(got("events") =!= batch("events")).count()
    assert(diff == 0)
    assert(got.count() == batch.count())
  }

  test("streaming funnel interval join == batch interval join") {
    val stream = EventStream.readEvents(spark, dir)
    val q = EventStream.funnelJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("funnel_out")
      .orderBy("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val a = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("ta"), col("event_id").as("click_id"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("ub"), col("ts").as("tb"),
        col("event_id").as("purchase_id"))
    val batch = a.join(b, a("user_id") === b("ub") &&
        b("tb") >= a("ta") && b("tb") <= a("ta") + expr("interval 1 hour"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .orderBy("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(got.nonEmpty && got.length == batch.length && got.sameElements(batch))
  }

  test("streaming left-outer interval join == batch e16 query") {
    // outer-join rows with no match only emit once the watermark closes
    // their band, and a file stream's watermark stops at max(ts) − delay —
    // so stage a copy of the data plus a far-future sentinel pair that
    // pushes both input watermarks past every real purchase's band
    val d2 = java.nio.file.Files.createTempDirectory("graft-stream-loj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d2.resolve("events.parquet"))
    // sentinel rows must carry ts in the SAME flavor as the staged file
    // (long nanos / NTZ / LTZ), or the file stream's fixed schema would
    // mis-read the appended part-file — derive them from the source frame
    val raw = spark.read.parquet(dir)
    val maxMicros = Tables.normalizeTs(raw)
      .agg(max(unix_micros(col("ts")))).head.getLong(0)
    val sentinelUser = 9999999L
    val farMicros = maxMicros + 30L * 24 * 3600 * 1000000L
    val farCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => lit(farMicros * 1000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        timestamp_micros(lit(farMicros))
          .cast(org.apache.spark.sql.types.TimestampNTZType)
      case _ => timestamp_micros(lit(farMicros))
    }
    def sent(id: Long, typ: String) = raw.limit(1)
      .withColumn("event_id", lit(id)).withColumn("ts", farCol)
      .withColumn("user_id", lit(sentinelUser))
      .withColumn("event_type", lit(typ))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    sent(-1L, "click").union(sent(-2L, "purchase"))
      .select(raw.columns.map(col): _*)
      .write.mode("append").parquet(d2.toString)

    val q = EventStream.funnelLeftJoin(EventStream.readEvents(spark, d2.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("loj_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("loj_out")
      .filter(col("user_id") =!= sentinelUser)
      .groupBy("user_id", "purchase_id")
      .agg(count(col("click_id")).as("n_clicks"),
        min(col("c_ts")).as("first_click"))
    val batch = SparkEntry.queries("e16_interval_left_join")(
      spark, "/root/testdata/sf0.001")
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // unmatched purchases (null first_click) must actually be present —
    // that's the part an inner join cannot express
    assert(got.filter(col("first_click").isNull).count() > 0)
  }

  test("streaming FULL outer interval join == batch full join restatement") {
    // both unmatched sides must surface: purchases with no click in band
    // (null click_id) AND clicks matching no purchase (null purchase_id).
    // Same sentinel staging as the left-outer proof — the registry query
    // st11 runs the same plan under the DuckDB oracle.
    val d2 = java.nio.file.Files.createTempDirectory("graft-stream-foj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d2.resolve("events.parquet"))
    val raw = spark.read.parquet(dir)
    val maxMicros = Tables.normalizeTs(raw)
      .agg(max(unix_micros(col("ts")))).head.getLong(0)
    val sentinelUser = 9999999L
    val farMicros = maxMicros + 30L * 24 * 3600 * 1000000L
    val farCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => lit(farMicros * 1000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        timestamp_micros(lit(farMicros))
          .cast(org.apache.spark.sql.types.TimestampNTZType)
      case _ => timestamp_micros(lit(farMicros))
    }
    def sent(id: Long, typ: String) = raw.limit(1)
      .withColumn("event_id", lit(id)).withColumn("ts", farCol)
      .withColumn("user_id", lit(sentinelUser))
      .withColumn("event_type", lit(typ))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    sent(-1L, "click").union(sent(-2L, "purchase"))
      .select(raw.columns.map(col): _*)
      .write.mode("append").parquet(d2.toString)

    val q = EventStream.funnelFullJoin(EventStream.readEvents(spark, d2.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("foj_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("foj_out").filter(col("user_id") =!= sentinelUser)
    // batch restatement of the full join over the same band
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("purchase_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val batch = b.join(c,
        col("b_user") === col("c_user") &&
        col("c_ts") <= col("b_ts") &&
        col("c_ts") >= col("b_ts") - expr("interval 30 minutes"), "full_outer")
      .select(coalesce(col("b_user"), col("c_user")).as("user_id"),
        col("purchase_id"), col("click_id"), col("c_ts"))
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // both outer directions must actually occur
    assert(got.filter(col("click_id").isNull).count() > 0,
      "purchases with no click in band must emit")
    assert(got.filter(col("purchase_id").isNull).count() > 0,
      "clicks matching no purchase must emit")
  }

  test("streaming native session_window == batch e13 query") {
    val stream = EventStream.readEvents(spark, dir)
    val agg = EventStream.normalize(stream)
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("total"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_win_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sess_win_out").orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val batch = SparkEntry.queries("e13_session_window")(spark, "/root/testdata/sf0.001")
      .select("user_id", "session_start", "n_events", "total")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length == batch.length && got.sameElements(batch))
  }

  test("stream-static broadcast enrichment == batch join") {
    // the dimension is a static DataFrame joined into every micro-batch —
    // Spark broadcasts it per batch; no stateful join machinery involved
    val users = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id")).distinct()
      .withColumn("cohort", col("user_id") % 5)
    val stream = EventStream.readEvents(spark, dir)
    val q = stream.join(broadcast(users), "user_id")
      .groupBy("cohort")
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enrich_out").orderBy("cohort")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .join(users, "user_id").groupBy("cohort")
      .agg(count(lit(1)).as("n")).orderBy("cohort")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && got.sameElements(batch))
  }

  test("streaming first-wins dedup emits one keeper per key, exactly once per id") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-firstwins-src")
    // wave 1: key A twice, key B once; wave 2: A again (late dup), C twice
    val wave1 = Seq(("A", 2L), ("A", 1L), ("B", 3L)).toDF("fp", "doc_id")
    val wave2 = Seq(("A", 4L), ("C", 6L), ("C", 5L)).toDF("fp", "doc_id")
    TestSpark.stageSingleParquet(wave1, src, "wave1.parquet")

    val stream = spark.readStream.schema(wave1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = EventStream.firstWins(spark, stream, "fp", "doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("firstwins_out").start()
    try {
      q.processAllAvailable()
      TestSpark.stageSingleParquet(wave2, src, "wave2.parquet")
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("firstwins_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // min-id-wins within the first wave a key appears in; every later
    // arrival — same wave or later wave — is a dup; each id exactly once
    assert(spark.table("firstwins_out").count() == 6)
    assert(got == Set(
      1L -> "keep", 2L -> "dup", 3L -> "keep",
      4L -> "dup", 5L -> "keep", 6L -> "dup"))
  }

  test("streaming running top-k final state equals the batch window top-k") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-topk-src")
    // wave 2 displaces part of wave 1's top set and ties on value (id asc)
    val wave1 = Seq(("A", 5.0, 1L), ("A", 3.0, 2L), ("A", 4.0, 3L),
      ("B", 1.0, 4L)).toDF("event_type", "value", "event_id")
    val wave2 = Seq(("A", 6.0, 5L), ("A", 4.0, 0L), ("B", 1.0, 6L))
      .toDF("event_type", "value", "event_id")
    TestSpark.stageSingleParquet(wave1, src, "wave1.parquet")

    val stream = spark.readStream.schema(wave1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = EventStream.runningTopK(spark, stream, 2)
      .writeStream.outputMode("update")
      .format("memory").queryName("topk_out").start()
    try {
      q.processAllAvailable()
      TestSpark.stageSingleParquet(wave2, src, "wave2.parquet")
      q.processAllAvailable()
    } finally q.stop()

    val mem = spark.table("topk_out")
    val fin = mem.groupBy("event_type")
      .agg(max(struct(col("n_seen"), col("top_values"), col("top_ids"))).as("m"))
      .select(col("event_type"), col("m.top_values").as("top_values"),
        col("m.top_ids").as("top_ids"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Double](1).toList, r.getSeq[Long](2).toList))
      .toMap
    // A: 6.0#5 arrives in wave 2 and displaces; 5.0#1 stays second
    assert(fin("A")._1 == Seq(6.0, 5.0) && fin("A")._2 == Seq(5L, 1L))
    // B: both 1.0s, tie by id asc
    assert(fin("B")._1 == Seq(1.0, 1.0) && fin("B")._2 == Seq(4L, 6L))
    // each key emitted once per wave it appeared in
    assert(mem.count() == 4)
  }

  test("event-time-timeout sessions (flatMapGroupsWithState) == batch session_window") {
    val events = Tables.events(spark, "/root/testdata/sf0.001").cache()
    val src = java.nio.file.Files.createTempDirectory("graft-timeout-src")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      TestSpark.stageSingleParquet(df, src, name)
    // two in-event-time-order waves, then a far-future sentinel event that
    // drags the watermark past every real session's end + gap so all of
    // them time out and emit
    val mid = events.agg(expr("percentile(unix_timestamp(ts), 0.5)")).head.getDouble(0).toLong
    val maxTs = events.agg(max(unix_timestamp(col("ts")))).head.getLong(0)
    stage(events.filter(unix_timestamp(col("ts")) <= mid), "wave1.parquet")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = EventStream.timedSessions(spark, stream, gapSec = 1800L)
      .writeStream.outputMode("append")
      .format("memory").queryName("timeout_sess_out").start()
    try {
      q.processAllAvailable()
      stage(events.filter(unix_timestamp(col("ts")) > mid), "wave2.parquet")
      q.processAllAvailable()
      val sentinel = events.limit(1)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", timestamp_seconds(lit(maxTs + 4 * 3600)))
      stage(sentinel, "wave3.parquet")
      q.processAllAvailable()
      // the timeout fires in a no-data micro-batch after the watermark
      // moves; give it a bounded wait
      val deadline = System.currentTimeMillis() + 30000
      def emitted() = spark.table("timeout_sess_out").count()
      val expected = EventStream.normalize(events)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .count().count()
      while (emitted() < expected && System.currentTimeMillis() < deadline) {
        Thread.sleep(250); q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("timeout_sess_out")
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "sess_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        math.rint(r.getDouble(4) * 100) / 100))
    val batch = EventStream.normalize(events)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"),
        min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("e"))
      .select(col("user_id"), col("s"), col("e"), col("n"), col("total"))
      .orderBy("user_id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        math.rint(r.getDouble(4) * 100) / 100))
    events.unpersist()
    assert(got.length == batch.length,
      s"emitted ${got.length} sessions, batch has ${batch.length}")
    got.zip(batch).foreach { case (g, b) =>
      assert(g._1 == b._1 && g._2 == b._2 && g._3 == b._3 && g._4 == b._4, s"$g vs $b")
      assert(math.abs(g._5 - b._5) <= 0.02, s"$g vs $b")
    }
  }

  // ---- explicit two-batch state-handoff fixtures ----
  // The sf-sweep registry replays (st5/st6/st9/st13/st14) run in ONE
  // micro-batch — their operators sort per-group batch rows by (event
  // time, id), so wave count cannot change their output. The cross-batch
  // handoff each operator's state performs is certified HERE instead,
  // where the two-wave schedule costs milliseconds, not sweep seconds.

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "sec", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  test("transition pairs chain across micro-batches through state") {
    val src = java.nio.file.Files.createTempDirectory("graft-trans2-src")
    // user 1: view@100, click@200 arrive in batch 1; purchase@300 in
    // batch 2 — the (click, purchase) pair SPANS the batch boundary and
    // exists only if batch 1's last event survived in state
    val wave1 = eventsDf(Seq((1L, 1L, 100L, "view", 1.0), (1L, 2L, 200L, "click", 1.0),
      (2L, 3L, 150L, "view", 1.0)))
    val wave2 = eventsDf(Seq((1L, 4L, 300L, "purchase", 1.0),
      (2L, 5L, 250L, "click", 1.0)))
    TestSpark.stageSingleParquet(wave1, src, "wave1.parquet")
    val stream = spark.readStream.schema(wave1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = EventStream.transitionPairs(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("trans2_out").start()
    try {
      q.processAllAvailable()
      TestSpark.stageSingleParquet(wave2, src, "wave2.parquet")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trans2_out")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == Seq("click" -> "purchase", "view" -> "click", "view" -> "click"))
  }

  test("as-of enrichment: views in batch k satisfy purchases in batch k+1") {
    val src = java.nio.file.Files.createTempDirectory("graft-asof2-src")
    // user 1's only view arrives in batch 1; its purchase in batch 2 must
    // be enriched from STATE. user 2's purchase precedes any view → nulls.
    val wave1 = eventsDf(Seq((1L, 1L, 100L, "view", 2.5),
      (2L, 2L, 120L, "purchase", 9.0)))
    val wave2 = eventsDf(Seq((1L, 3L, 300L, "purchase", 7.0),
      (2L, 4L, 400L, "view", 1.0)))
    TestSpark.stageSingleParquet(wave1, src, "wave1.parquet")
    val stream = spark.readStream.schema(wave1.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = EventStream.asOfEnrich(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof2_out").start()
    try {
      q.processAllAvailable()
      TestSpark.stageSingleParquet(wave2, src, "wave2.parquet")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof2_out").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (2L, 2L, None, None),                                   // no prior view
      (1L, 3L, Some(100L * 1000000L), Some(2500L))))          // from batch-1 state
  }

  test("running totals (transformWithState) continue from batch-1 ValueState") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = java.nio.file.Files.createTempDirectory("graft-rt2-src")
      val wave1 = eventsDf(Seq((1L, 1L, 100L, "view", 1.00),
        (1L, 2L, 200L, "click", 2.00)))
      val wave2 = eventsDf(Seq((1L, 3L, 300L, "purchase", 3.00)))
      TestSpark.stageSingleParquet(wave1, src, "wave1.parquet")
      val stream = spark.readStream.schema(wave1.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
      val q = EventStream.runningTotals(spark, stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("rt2_out").start()
      try {
        q.processAllAvailable()
        TestSpark.stageSingleParquet(wave2, src, "wave2.parquet")
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("rt2_out").orderBy("n_so_far")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      // batch-2 row continues n=3, cents=600 — only possible if batch 1's
      // (2, 300) pair was read back from the RocksDB ValueState
      assert(got.toSeq == Seq((1L, 1L, 100L), (2L, 2L, 300L), (3L, 3L, 600L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
