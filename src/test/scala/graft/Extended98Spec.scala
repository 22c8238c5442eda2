package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-98: runs test + CDC time travel, pinned to local replays. */
class Extended98Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a47 runs statistic matches a local sign-sequence walk") {
    val got = graft.queries.Extended98.queries("a47_runs_test")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val daily = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((ty, day), rows) => (ty, day, rows.map(_._3).sum) }.toSeq
    daily.groupBy(_._1).foreach { case (ty, rows) =>
      val ys = rows.sortBy(_._2).map(_._3)
      val mvs = ys.zip(ys.tail).map { case (a, b) => java.lang.Long.signum(b - a) }
        .filter(_ != 0)
      val r = 1L + mvs.zip(mvs.tail).count { case (a, b) => a != b }
      val np = mvs.count(_ == 1).toLong
      val nn = mvs.count(_ == -1).toLong
      val n = np + nn
      val mu = 2.0 * (np * nn).toDouble / n.toDouble + 1.0
      val z = (r.toDouble - mu) / math.sqrt((mu - 1.0) * (mu - 2.0) / (n - 1).toDouble)
      assert(got(ty)._1 == r && got(ty)._2 == np && got(ty)._3 == nn, s"$ty counts")
      assert(got(ty)._4 == r6(z), s"$ty z")
    }
    // the daily series must produce a real alternating sequence
    assert(got.values.forall(v => v._1 > 1 && v._2 > 0 && v._3 > 0))
  }

  test("u10 snapshot equals a local as-of fold and is a strict subset of u8") {
    val got = graft.queries.Extended98.queries("u10_cdc_asof")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val bounds = graft.Tables.t(spark, d, "events")
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
    val cutoff = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val ops = graft.Tables.t(spark, d, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("seq"), col("event_id"),
        substring(md5(col("event_id").cast("string").cast("binary")), 1, 1).as("h"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.getString(3) == "0" || r.getString(3) == "1") "D" else "U",
        r.getLong(4)))
    val expected = ops.filter(_._2 <= cutoff).groupBy(_._1).flatMap {
      case (key, rows) =>
        val last = rows.maxBy(r => (r._2, r._3))
        if (last._4 == "D") None else Some(key -> (last._2, last._3, last._5))
    }
    assert(got == expected)
    assert(got.nonEmpty)
    // as-of state may keep keys whose CURRENT state is deleted, and vice
    // versa — but every as-of row's seq is at or below the cutoff
    assert(got.values.forall(_._1 <= cutoff))
    // the cutoff must bite: some key's snapshot row differs from its
    // final u8 row (otherwise the filter pushdown proves nothing)
    val finalState = ops.groupBy(_._1).flatMap { case (key, rows) =>
      val last = rows.maxBy(r => (r._2, r._3))
      if (last._4 == "D") None else Some(key -> (last._2, last._3, last._5))
    }
    assert(got.exists { case (k, v) => finalState.get(k).exists(_ != v) })
  }
}
