package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-54: robust outliers against a planted-anomaly fixture. */
class Extended54Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("robust z-score flags the planted spike and nothing else") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"1995-01-01 00:$m%02d:00")
    // type A: values 1.0 ×5, 1.002, and one spike 50.0
    //   med = 1.0, MAD = 0.0... -> MAD 0 guard: dev values are 0 (x5),
    //   0.002, 49.0 -> lower-median dev = 0 -> madv = 0 -> n_outliers 0
    //   (the documented MAD=0 degenerate guard)
    // type B: 1..7 with spike 100 -> med 4, MAD 2, z(100) huge -> exactly 1
    val rows =
      (1 to 5).map(i => (i.toLong, ts(i), 1L, "A", 1.0, "{}")) ++
      Seq((6L, ts(6), 1L, "A", 1.002, "{}"), (7L, ts(7), 1L, "A", 50.0, "{}")) ++
      (1 to 7).map(i => (10L + i, ts(i), 2L, "B", i.toDouble, "{}")) ++
      Seq((18L, ts(8), 2L, "B", 100.0, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("e54spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.queries.Extended54.queries("e27_robust_outliers")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toList
    assert(out == List(("A", 1.0, 0.0, 0L), ("B", 4.0, 2.0, 1L)))
  }
}
