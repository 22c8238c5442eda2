package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables.t
import graft.operators.AsOfJoin
import graft.streaming.EventStream

/** Round-6 surface extensions, batch 25: streaming stateful top-k under
  * the oracle gate (exact incremental per-key top-k — the cross-batch
  * state handoff is certified by StreamingSpec's two-wave fixture; the
  * sweep replay runs one micro-batch), and sliding-window DISTINCT
  * counting (the non-mergeable sliding aggregate, via the BandJoin
  * operator rather than a window sort).
  */
object Extended25 {
  type Q = (SparkSession, String) => DataFrame

  /** Stage the event log as two wave files by event_id parity with pinned
    * increasing mtimes, once per (process, sf dir). */
  private[queries] def stagedEventWaves(s: SparkSession, d: String): String = {
    val dir = Paths.get(Scratch.dir("st5_events", d))
    val ready = dir.resolve("_READY")
    Scratch.sync(dir.toString) { if (!Files.exists(ready)) {
      Files.createDirectories(dir)
      val ev = s.read.parquet(s"$d/events.parquet")
      Seq(("a_wave0.parquet", 0), ("b_wave1.parquet", 1)).foreach {
        case (name, par) =>
          val tmp = Files.createTempDirectory("graft_st5")
          ev.filter(col("event_id") % 2 === par).coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          val part = Files.list(tmp)
            .filter(_.getFileName.toString.startsWith("part-")).findFirst.get
          Files.copy(part, dir.resolve(name))
      }
      Seq("a_wave0.parquet", "b_wave1.parquet").zipWithIndex.foreach {
        case (n, i) =>
          Files.setLastModifiedTime(dir.resolve(n),
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      Files.createFile(ready)
    } }
    dir.toString
  }

  val queries: Map[String, Q] = Map(
    // ---- st5: streaming running top-k ----
    // Per event type, the exact top-3 (value desc, id asc) maintained in
    // mapGroupsWithState; the final emission per key (its max n_seen row —
    // n_seen strictly grows) must equal the batch window top-3 of the
    // whole log. NO per-file wave cap: incremental top-k maintenance is
    // exact under ANY arrival order (a total order merges associatively),
    // so extra micro-batches certify nothing the one-batch replay doesn't —
    // cross-batch state handoff is st4/st12's job. The post-aggregation
    // is wave-count-agnostic either way.
    "st5_stream_topk" -> ((s, d) => {
      val dir = stagedEventWaves(s, d)
      val schema = graft.streaming.EventStream.cachedSchema(s, dir)
      val stream = EventStream.normalize(s.readStream.schema(schema)
        .parquet(dir))
      val tk = EventStream.runningTopK(s, stream, 3)
      val mem = Extended18.runToCompletion(s, tk, "st5_mem", OutputMode.Update())
      // final state per key = its max-n_seen emission; argmax via one
      // struct max (n_seen strictly grows, so arrays never tie-compare) —
      // a self-join on the memory sink would conflict on attribute ids
      mem.groupBy("event_type")
        .agg(max(struct(col("n_seen"), col("top_values"), col("top_ids"))).as("m"))
        .select(col("event_type"), posexplode(expr(
          "zip_with(m.top_values, m.top_ids, (v, i) -> struct(v AS value, i AS event_id))")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
          col("col.value").as("value"), col("col.event_id").as("event_id"))
        .orderBy("event_type", "rank")
    }),

    // ---- e21: SCD2 point-in-time dimension lookup ----
    // The classic temporal-warehouse join: signups build a per-user
    // versioned dimension (valid_from = signup time, versions ordered per
    // user), and each purchase joins the version valid AT its own
    // timestamp. With non-overlapping versions the containment join IS a
    // backward as-of on valid_from — one merge window, no interval
    // explosion; purchases before any version keep NULLs. Same-second
    // signups dedup deterministically (max event_id) so the as-of has no
    // ties to break.
    "e21_pit_lookup" -> ((s, d) => {
      val ev = t(s, d, "events").withColumn("sec", unix_timestamp(col("ts")))
      val sv = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("sec"))
        .agg(max(struct(col("event_id"), col("value"))).as("m"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("sec")
      val dim = sv.select(col("user_id"), col("sec"),
          col("sec").as("version_from"), col("m.value").as("vvalue"))
        .withColumn("version_no", row_number().over(w))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("sec"))
      AsOfJoin.backward(p, dim, Seq("user_id"), "sec",
          rightCols = Seq("version_no", "version_from", "vvalue"))
        .select(col("event_id"), col("version_no"), col("version_from"),
          round(col("vvalue"), 2).as("version_value"))
        .orderBy("event_id")
    }),

    // ---- j14: skew-salted join + two-phase salted aggregation ----
    // The SkewOps remedies under the hash gate (previously spec-only):
    // lineitem collapsed onto 10 deliberately hot keys, enriched through
    // the broadcast-replicated salted join (one hot key spreads over 8
    // reducers), then aggregated with the explicit two-phase salted agg.
    // Values are integer-valued doubles, so every partial and the final
    // sum are exact in any order — the salting cannot perturb the hash.
    "j14_skew_salted" -> ((s, d) => {
      val li = t(s, d, "lineitem").select((col("l_suppkey") % 10).as("k"),
        col("l_quantity"), col("l_orderkey"))
      val dim = s.range(10).select(col("id").as("k"),
        (col("id") * 7 + 1).as("factor"))
      val joined = graft.operators.SkewOps.saltedJoin(
        li, dim, "k", 8, col("l_orderkey"))
      graft.operators.SkewOps.saltedAgg(
          joined.withColumn("v", col("l_quantity") * col("factor")),
          "k", Some("v"), 8, col("l_orderkey"))
        .select(col("k"), col("n"), col("total"))
        .orderBy("k")
    }),

    // ---- f24: array_sort with a comparator lambda ----
    // The custom-comparator HOF (f19 covers the predicate/fold family):
    // words ordered by (length desc, alpha asc) entirely inside the
    // codegen'd expression — no explode/window round trip. The oracle
    // restates the comparator as a sortable struct key, proving the
    // lambda implements exactly that total order.
    "f24_comparator_sort" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), expr(Extended9.toks).as("ws"))
        .select(col("doc_id"), expr(
          """array_join(slice(array_sort(array_distinct(ws), (l, r) ->
             CASE WHEN length(l) > length(r) THEN -1
                  WHEN length(l) < length(r) THEN 1
                  WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END),
             1, 5), ' ')""").as("top5"))
        .orderBy("doc_id")),

    // ---- e20: sliding-window distinct users ----
    // Distinct users in the trailing hour, evaluated at every 30-minute
    // mark present in the log. DISTINCT does not merge across overlapping
    // windows (unlike the e5 sums), so the scale shape is a band join of
    // events against the (tiny) mark relation — each event meets the ≤ 3
    // marks whose window can hold it via the bucketed BandJoin, never a
    // window sort or an O(marks × events) theta join.
    "e20_sliding_distinct" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
      val marks = ev
        .select((floor(col("sec") / 1800) * 1800).cast("long").as("m"))
        .distinct()
      graft.operators.BandJoin.join(ev, marks, "sec", "m", 3600.0)
        .filter(col("sec") > col("m") - 3600 && col("sec") <= col("m"))
        .groupBy(col("m").as("win_end"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("win_end")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "st5_stream_topk" ->
      """WITH r AS (
           SELECT event_type, value, event_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY value DESC, event_id ASC) AS rn
           FROM events)
         SELECT event_type, CAST(rn AS INT) AS rank, value, event_id
         FROM r WHERE rn <= 3 ORDER BY event_type, rank""",
    "e21_pit_lookup" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         sv AS (
           SELECT user_id, sec, value,
             row_number() OVER (
               PARTITION BY user_id, sec ORDER BY event_id DESC) AS rn
           FROM ev WHERE event_type = 'signup'),
         dim AS (
           SELECT user_id, sec AS version_from, value,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY sec) AS INT) AS version_no
           FROM sv WHERE rn = 1),
         p AS (
           SELECT event_id, user_id, sec FROM ev
           WHERE event_type = 'purchase')
         SELECT p.event_id, t.version_no, t.version_from,
           round(t.value, 2) AS version_value
         FROM p LEFT JOIN LATERAL (
           SELECT * FROM dim
           WHERE dim.user_id = p.user_id AND dim.version_from <= p.sec
           ORDER BY dim.version_from DESC LIMIT 1) t ON TRUE
         ORDER BY p.event_id""",
    "j14_skew_salted" ->
      """WITH li AS (
           SELECT l_suppkey % 10 AS k, l_quantity FROM lineitem),
         dim AS (SELECT i AS k, i * 7 + 1 AS factor FROM range(10) t(i))
         SELECT li.k, count(*) AS n,
           sum(li.l_quantity * dim.factor) AS total
         FROM li JOIN dim USING (k)
         GROUP BY li.k ORDER BY k""",
    "f24_comparator_sort" ->
      """WITH w AS (
           SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '),
               x -> len(x) > 0)) AS ws
           FROM documents)
         SELECT doc_id,
           array_to_string(
             list_transform(
               list_sort(list_transform(ws,
                 x -> {'nk': -length(x), 'w': x})),
               s -> s.w)[1:5], ' ') AS top5
         FROM w ORDER BY doc_id""",
    "e20_sliding_distinct" ->
      """WITH ev AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         marks AS (
           SELECT DISTINCT CAST(floor(sec / 1800) * 1800 AS BIGINT) AS m
           FROM ev)
         SELECT m.m AS win_end, count(DISTINCT e.user_id) AS n_users
         FROM marks m JOIN ev e
           ON e.sec > m.m - 3600 AND e.sec <= m.m
         GROUP BY m.m ORDER BY win_end"""
  )
}
