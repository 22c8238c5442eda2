package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-55: drawdown and CUSUM against hand-computed walks. */
class Extended55Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("max drawdown is the largest peak-to-trough of the signed walk") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"1995-01-01 00:$m%02d:00")
    // user 1 walk (milli): +5000 (purchase), -2000 (click), -1000 (view),
    // +4000 (signup), -6000 (error)
    // balance: 5000, 3000, 2000, 6000, 0 ; runmax: 5000,5000,5000,6000,6000
    // drawdown: 0, 2000, 3000, 0, 6000 -> max 6000
    val rows = Seq(
      (1L, ts(1), 1L, "purchase", 5.0, "{}"),
      (2L, ts(2), 1L, "click", 2.0, "{}"),
      (3L, ts(3), 1L, "view", 1.0, "{}"),
      (4L, ts(4), 1L, "signup", 4.0, "{}"),
      (5L, ts(5), 1L, "error", 6.0, "{}")
    )
    val tmp = java.nio.file.Files.createTempDirectory("e55spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.queries.Extended55.queries("e28_max_drawdown")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(out == List((1L, 6000L)))
  }

  test("CUSUM excursion measures the sustained upward shift vs the median") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"1995-01-01 00:$m%02d:00")
    // values 1,1,1,3,3 (milli 1000 x3, 3000 x2); global median 1000.
    // type A deviations: 0, 0, +2000, +2000 -> S: 0,0,2000,4000;
    //   runmin 0 -> excursion max 4000
    // type B single value 1 -> S: 0 -> excursion 0
    val rows = Seq(
      (1L, ts(1), 1L, "A", 1.0, "{}"), (2L, ts(2), 1L, "A", 1.0, "{}"),
      (3L, ts(3), 1L, "A", 3.0, "{}"), (4L, ts(4), 1L, "A", 3.0, "{}"),
      (5L, ts(5), 1L, "B", 1.0, "{}")
    )
    val tmp = java.nio.file.Files.createTempDirectory("e55spec2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.queries.Extended55.queries("e29_cusum_excursion")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out == List(("A", 4000L), ("B", 0L)))
  }
}
