package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-52 operators against hand-computed fixtures. */
class Extended52Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("e52spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("streaks: runs split on interruptions, ties break to smallest type") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"1995-01-01 00:$m%02d:00")
    // user 1: a a a b a a -> 'a' runs of 3 and 2, 'b' run of 1 -> max 3 'a'
    // user 2: c c d d     -> runs of 2 and 2 tie -> smallest type 'c'
    val rows = Seq(
      (1L, ts(1), 1L, "a", 0.0, "{}"), (2L, ts(2), 1L, "a", 0.0, "{}"),
      (3L, ts(3), 1L, "a", 0.0, "{}"), (4L, ts(4), 1L, "b", 0.0, "{}"),
      (5L, ts(5), 1L, "a", 0.0, "{}"), (6L, ts(6), 1L, "a", 0.0, "{}"),
      (7L, ts(1), 2L, "c", 0.0, "{}"), (8L, ts(2), 2L, "c", 0.0, "{}"),
      (9L, ts(3), 2L, "d", 0.0, "{}"), (10L, ts(4), 2L, "d", 0.0, "{}")
    )
    val tmp = writeEvents(rows)
    val out = graft.queries.Extended52.queries("w11_longest_streak")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(out == List((1L, 3L, "a"), (2L, 2L, "c")))
  }

  test("active users: WAU unions the trailing window, stickiness exact") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"1995-01-${day + 1}%02d 12:00:00")
    // day 0: users {1,2}; day 1: {2}; day 8: {3} (outside day-1's window)
    val rows = Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"), (2L, ts(0), 2L, "a", 0.0, "{}"),
      (3L, ts(1), 2L, "a", 0.0, "{}"), (4L, ts(8), 3L, "a", 0.0, "{}")
    )
    val tmp = writeEvents(rows)
    val out = graft.queries.Extended52.queries("e26_active_users")(spark, tmp)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    // day0: dau 2, wau 2; day1: dau 1, wau 2 (users 1,2 in window) -> 0.5
    // day8: dau 1, wau 2 (day1's user 2 is 7 days back -> within d-6? no:
    //   8-6=2 > 1, so only user 3) -> wau 1
    assert(out == List((2L, 2L, 1.0), (1L, 2L, 0.5), (1L, 1L, 1.0)))
  }
}
