package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape. The same
  * aggregations as the batch EventQueries, expressed as streaming plans
  * with watermarks — `readStream` on a directory of parquet (or any
  * streaming source with this schema) instead of `read`.
  */
object EventStream {

  /** Normalize a raw events frame (ts possibly long nanos —
    * see Tables.events) to a proper timestamp column.
    */
  def normalize(df: DataFrame): DataFrame = graft.Tables.normalizeTs(df)

  /** Process-wide parquet schema cache for the staged replay directories.
    * The staged fixtures are written once per process (Scratch.sync) and
    * never change shape afterwards, so the footer-read job (a real Spark
    * job, ~50–150 ms of driver+task time) need not be paid again on every
    * replay invocation — at 14 st queries × 3 bench reps that job alone
    * was a measurable slice of the streaming block's machinery floor.
    * Keyed by directory path; Scratch paths embed the pid and sf dir, so
    * entries can never alias across datasets or processes.
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()
  def cachedSchema(spark: SparkSession,
      dir: String): org.apache.spark.sql.types.StructType =
    schemaCache.computeIfAbsent(dir, p => spark.read.parquet(p).schema)

  /** Open a streaming read of event parquet files under `dir`. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    normalize(spark.readStream.schema(cachedSchema(spark, dir)).parquet(dir))

  /** Tumbling-window counts/sums per event type with a watermark — the
    * streaming form of the batch `e1_hourly_agg` oracle query.
    */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    normalize(events)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n"), col("total"))

  /** Overlapping sliding-window counts/sums per event type — the
    * streaming form of the batch `e5_sliding_agg` query. Every event
    * lands in TWO window states (1 h windows every 30 min), which is the
    * shape that distinguishes sliding from tumbling state management:
    * the store carries ~2× the live windows and each row updates both.
    * With time-ordered arrival the watermark never drops input, so a
    * Complete-mode replay equals the batch aggregate exactly.
    */
  def slidingAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    normalize(events)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("total"))

  /** Streaming gap-based sessionization via flatMapGroupsWithState: state
    * carries (last event second, session counter) per user; each batch's
    * rows are ordered and numbered continuing from state. Produces exactly
    * the batch `e2_sessionize` assignment when batches arrive in event-time
    * order (file streams / watermarked sources).
    */
  case class SessState(lastSec: Long, session: Long)

  def sessionize(spark: SparkSession, events: DataFrame,
      gapSec: Long = 1800L): DataFrame = {
    import spark.implicits._
    val typed = normalize(events)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
          var (lastSec, sess) = state.getOption
            .map(s => (s.lastSec, s.session)).getOrElse((Long.MinValue, 0L))
          val out = sorted.map { case (_, eid, sec) =>
            if (lastSec == Long.MinValue || sec - lastSec > gapSec) sess += 1
            lastSec = sec
            (uid, eid, sess)
          }
          state.update(SessState(lastSec, sess))
          out.iterator
      }
      .toDF("user_id", "event_id", "session_id")
  }

  /** Streaming keyed first-wins dedup — the streaming form of the
    * incremental-dedup batch shape: documents arrive in waves, the first
    * arrival of each content fingerprint is emitted as the keeper, every
    * later arrival as a duplicate, exactly once each. State per key is a
    * single boolean, so the store holds O(distinct keys) bits (a
    * production deployment bounds it further with the RocksDB provider
    * and state TTL; semantics are unchanged for duplicates arriving
    * within the TTL, which is the case near-dup clusters overwhelmingly
    * are). Within a micro-batch, same-key arrivals are ordered by id, so
    * a replay of the same waves reproduces the batch min-id-wins
    * assignment bit-for-bit.
    */
  /** Streaming per-key running top-k: state is the exact top-k of
    * everything absorbed so far under (value desc, id asc) — incremental
    * maintenance is exact for a total order, so the final emission per
    * key equals the batch top-k regardless of arrival order. Each
    * micro-batch emits (key, n_seen, top values, top ids) in Update
    * mode; `n_seen` strictly grows, so a replay's final state is the row
    * with the key's max `n_seen`. State is O(keys × k).
    */
  case class TopKState(n: Long, top: List[(Double, Long)])

  def runningTopK(spark: SparkSession, events: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    require(k > 0, s"k must be positive, got $k")
    events.select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[TopKState, (String, Long, Seq[Double], Seq[Long])](
        GroupStateTimeout.NoTimeout) { case (key, rows, state) =>
        val prev = state.getOption.getOrElse(TopKState(0L, Nil))
        var n = prev.n
        var top = prev.top
        rows.foreach { case (_, v, id) =>
          n += 1
          top = ((v, id) :: top)
            .sortBy { case (vv, ii) => (-vv, ii) }.take(k)
        }
        state.update(TopKState(n, top))
        (key, n, top.map(_._1), top.map(_._2))
      }
      .toDF("event_type", "n_seen", "top_values", "top_ids")
  }

  def firstWins(spark: SparkSession, docs: DataFrame, keyCol: String,
      idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(keyCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val ids = rows.map(_._2).toSeq.sorted
          val out =
            if (state.exists) ids.map(_ -> "dup")
            else ids.take(1).map(_ -> "keep") ++ ids.drop(1).map(_ -> "dup")
          state.update(true)
          out.iterator
      }
      .toDF(idCol, "status")
  }

  /** Watermarked stream-stream interval join: each click pairs with the
    * same user's purchases in the following hour (the streaming form of the
    * batch `e10_funnel` attribution join). Watermarks on both inputs plus
    * the time-band condition let Spark bound the join state — click rows
    * are evicted once the purchase watermark passes click ts + 1 hour, so
    * state is O(in-flight window), not O(stream history).
    */
  def funnelJoin(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val n = normalize(events)
    val clicks = n.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val buys = n.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("b_ts", watermark)
    clicks.join(buys,
        col("c_user") === col("b_user") &&
        col("b_ts") >= col("c_ts") &&
        col("b_ts") <= col("c_ts") + expr("interval 1 hour"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Watermarked stream-stream LEFT OUTER interval join: every purchase
    * emits exactly once — once per same-user click in the preceding 30
    * minutes, or alone (null click) after the click watermark passes the
    * purchase's band, which is when Spark can prove no match will arrive.
    * Watermarks on both inputs plus the band bound the state exactly as in
    * [[funnelJoin]]; the outer side additionally holds unmatched purchases
    * only until the watermark closes their band. Batch twin with oracle:
    * `e16_interval_left_join`.
    */
  def funnelLeftJoin(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val n = normalize(events)
    val buys = n.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("b_ts", watermark)
    val clicks = n.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    buys.join(clicks,
        col("b_user") === col("c_user") &&
        col("c_ts") <= col("b_ts") &&
        col("c_ts") >= col("b_ts") - expr("interval 30 minutes"), "left_outer")
      .select(col("b_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("c_ts"))
  }

  /** Stream-stream FULL OUTER interval join — completes the join-mode
    * family (inner [[funnelJoin]], left [[funnelLeftJoin]]): unmatched
    * purchases emit null-click rows AND unmatched clicks emit
    * null-purchase rows, each side released only when the watermark
    * proves its band can no longer match. State on both sides is
    * watermark-bounded exactly as in the left form.
    */
  def funnelFullJoin(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val n = normalize(events)
    val buys = n.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("b_ts", watermark)
    val clicks = n.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    buys.join(clicks,
        col("b_user") === col("c_user") &&
        col("c_ts") <= col("b_ts") &&
        col("c_ts") >= col("b_ts") - expr("interval 30 minutes"), "full_outer")
      .select(coalesce(col("b_user"), col("c_user")).as("user_id"),
        col("purchase_id"), col("click_id"), col("c_ts"))
  }

  /** Streaming user-journey transition pairs via flatMapGroupsWithState:
    * state carries the user's last (event-time µs, event_id, type); each
    * batch sorts its rows by (µs, event_id) and emits one (prev_type,
    * cur_type) pair per event, chaining across micro-batches through the
    * state — the streaming twin of the batch `e22_transition_matrix` lag.
    * Exact when batches arrive in event-time order (time-split waves /
    * watermarked upstream), matching the batch lag() semantics row-for-row.
    */
  case class LastEvent(micros: Long, eventId: Long, typ: String)

  def transitionPairs(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = normalize(events)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, (String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
          sorted.foreach { case (_, eid, us, typ) =>
            prev.foreach(p => out += ((p.typ, typ)))
            prev = Some(LastEvent(us, eid, typ))
          }
          prev.foreach(state.update)
          out.iterator
      }
      .toDF("prev_type", "cur_type")
  }

  /** Streaming point-in-time (as-of) enrichment — the feature-store
    * lookup pattern: every `purchase` event is decorated with the most
    * recent preceding `view` event's (event-time µs, exact milli-value)
    * for the same user, "preceding" in the (ts, event_id) total order.
    * State per user is ONE row — the latest view seen — so the store is
    * keyed and O(users), never a buffer of history; each batch sorts its
    * group's rows by (µs, event_id) and replays the order-respecting
    * state machine, chaining across micro-batches through the state
    * (exact under time-split waves / watermarked in-order upstream,
    * matching the batch IGNORE-NULLS window row-for-row — the same
    * arrival contract transitionPairs and runningTotals certify).
    * Purchases with no prior view emit null lookup columns (the LEFT
    * as-of semantics).
    */
  case class LastView(micros: Long, mv: Long)

  def asOfEnrich(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = normalize(events)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), round(col("value") * 1000).cast("long").as("mv"))
      .as[(Long, Long, Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastView, (Long, Long, Long, Option[Long], Option[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
          var last = state.getOption
          val out = scala.collection.mutable
            .ArrayBuffer[(Long, Long, Long, Option[Long], Option[Long])]()
          sorted.foreach { case (_, eid, us, typ, mv) =>
            if (typ == "view") last = Some(LastView(us, mv))
            else out += ((uid, eid, us, last.map(_.micros), last.map(_.mv)))
          }
          last.foreach(state.update)
          out.iterator
      }
      .toDF("user_id", "event_id", "p_us", "view_us", "view_mv")
  }

  /** Stateful per-user running counters via mapGroupsWithState — the
    * custom-state extension point (session tracking, rate limiting, …).
    */
  case class UserStat(userId: Long, events: Long, totalValue: Double)

  def runningUserStats(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = normalize(events)
      .select(col("user_id").as("userId"), col("value"))
      .as[(Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.events
          var tot = prev.totalValue
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserStat(uid, n, tot)
          state.update(next)
          next
      }
      .toDF()
  }

  /** One gap-session aggregate per (user, session), closed by EVENT-TIME
    * TIMEOUT — the flatMapGroupsWithState pattern native session_window
    * can't express when the emission must carry custom per-session state.
    * A user's open session lives in state; it is emitted either when a new
    * event arrives past the gap (session provably over) or when the
    * watermark passes `session end + gap` (no event can extend it anymore —
    * Spark runs a no-data micro-batch to fire these timeouts).
    *
    * State is O(open sessions) = O(active users), the property that makes
    * this run indefinitely at scale; nothing buffers raw events.
    *
    * Emits exactly the batch
    * `groupBy(user_id, session_window(ts, gap))` aggregate for every
    * session the final watermark has passed (proved in StreamingSpec).
    */
  case class OpenSess(start: Long, end: Long, n: Long, total: Double)

  /** `sess_start`/`sess_end` are epoch MICROseconds — the gap decision runs
    * at full timestamp precision (a whole-second truncation would merge
    * sessions whose true gap lies in (gap, gap+1s), diverging from batch
    * session_window).
    */
  def timedSessions(spark: SparkSession, events: DataFrame,
      gapSec: Long = 1800L, watermark: String = "1 second"): DataFrame = {
    import spark.implicits._
    val gapMicros = gapSec * 1000000L
    // ts must flow through AS the watermarked timestamp column — converting
    // it to a long here would strip the watermark and fail the event-time-
    // timeout analysis check; micros are derived inside the state function
    val typed = normalize(events)
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSess, (Long, Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, _, state) if state.hasTimedOut =>
          val s = state.get
          state.remove()
          Iterator.single((uid, s.start, s.end, s.n, s.total))
        case (uid, rows, state) =>
          // event-time order within the batch; across batches the file
          // source's in-order arrival (same contract as sessionize) holds
          val sorted = rows.map { case (_, ts, v) =>
            ((ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L, v)
          }.toIndexedSeq.sortBy(_._1)
          var closed = List.empty[OpenSess]
          var cur = state.getOption
          sorted.foreach { case (us, v) =>
            cur = cur match {
              // strictly-greater break matches session_window, which still
              // merges an event landing exactly at end + gap
              case Some(s) if us - s.end > gapMicros =>
                closed ::= s
                Some(OpenSess(us, us, 1L, v))
              case Some(s) =>
                Some(OpenSess(s.start, math.max(s.end, us), s.n + 1, s.total + v))
              case None => Some(OpenSess(us, us, 1L, v))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // must stay ahead of the watermark or Spark rejects the stamp
            state.setTimeoutTimestamp(math.max((s.end + gapMicros) / 1000 + 1000,
              state.getCurrentWatermarkMs() + 1000))
          }
          closed.reverseIterator.map(s => (uid, s.start, s.end, s.n, s.total))
      }
      .toDF("user_id", "sess_start", "sess_end", "n", "total")
  }

  /** Per-user running (event count, spend cents) after EVERY event, via
    * the arbitrary-state v2 API (`transformWithState` +
    * [[org.apache.spark.sql.streaming.ValueState]]) — the modern
    * replacement for mapGroupsWithState. State is one (count, cents)
    * pair per user in the RocksDB store (the v2 API's required
    * provider); each micro-batch sorts its per-user rows by (event
    * time, event_id) and folds from the persisted totals, so the
    * emitted rows are a deterministic function of the replay's
    * time-ordered waves. Cents are exact integers (round(value·100)),
    * so cross-batch accumulation is combine-order-proof.
    */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val typed = normalize(events)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("user_id", "event_id", "n_so_far", "cents_so_far")
  }
}

/** State-v2 processor behind [[EventStream.runningTotals]]: one
  * ValueState[(count, cents)] per user, folded in (event time, id)
  * order within each batch.
  */
class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long, Long), (Long, Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var tot: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    tot = getHandle.getValueState[(Long, Long)]("tot",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
    var (n, cents) = if (tot.exists()) tot.get() else (0L, 0L)
    val out = sorted.map { case (uid, eid, _, c) =>
      n += 1; cents += c
      (uid, eid, n, cents)
    }
    tot.update((n, cents))
    out.iterator
  }
}
