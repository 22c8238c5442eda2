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

  /** Open a streaming read of event parquet files under `dir`. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    normalize(spark.readStream.schema(schema).parquet(dir))
  }

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
}
