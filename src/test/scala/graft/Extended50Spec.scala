package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-50 operators against hand-computed fixtures. */
class Extended50Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("skyline keeps exactly the non-dominated points, ties survive") {
    import spark.implicits._
    val day0 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00").getTime
    def ts(d: Int) = new java.sql.Timestamp(day0 + d * 86400000L)
    // customers: (cust, day, price)
    //   1: (d0, 5.00)  dominated by 3 (later day, more money)
    //   2: (d2, 3.00)  frontier (latest day)
    //   3: (d1, 6.00)  frontier (nobody later has more)
    //   4: (d1, 6.00)  frontier (tie with 3 — strict dominance spares it)
    //   5: (d0, 6.00)  frontier: 3 is later but NOT strictly richer (tie)
    val orders = Seq(
      (1L, 1L, ts(0), 5.0), (2L, 2L, ts(2), 3.0), (3L, 3L, ts(1), 6.0),
      (4L, 4L, ts(1), 6.0), (5L, 5L, ts(0), 6.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val tmp = java.nio.file.Files.createTempDirectory("e50spec").toString
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = graft.queries.Extended50.queries("j24_skyline")(spark, tmp)
      .collect().map(_.getLong(0)).toList
    assert(out == List(2L, 3L, 4L, 5L))
  }

  test("snapshot diff classifies inserts, updates, deletes") {
    import spark.implicits._
    // keys: 97*2=194 (in A, updated in B), 101*3=303 (in A, deleted in B),
    // 500 unchanged in both, 9000 only in B's wider window
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val orders = Seq(
      (194L, 1L, ts("1997-05-01 00:00:00"), 10.0, "F"),
      (303L, 2L, ts("1997-06-01 00:00:00"), 20.0, "F"),
      (500L, 3L, ts("1997-07-01 00:00:00"), 30.0, "O"),
      (9000L, 4L, ts("1998-07-01 00:00:00"), 40.0, "O")
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
      "o_orderstatus")
    val tmp = java.nio.file.Files.createTempDirectory("e50spec2").toString
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = graft.queries.Extended50.queries("u7_snapshot_diff")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List(("D", 1L, 303L), ("I", 1L, 9000L), ("U", 1L, 194L)))
  }
}
