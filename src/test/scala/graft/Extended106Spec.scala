package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-106: coverage curve + Theil decomposition, local replays. */
class Extended106Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("tp38 coverage equals the top-k sum from a local sorted vocabulary") {
    val got = graft.queries.Extended106.queries("tp38_coverage_curve")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val counts = graft.Tables.t(spark, d, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sorted = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val nTokens = counts.values.sum
    Seq(100L, 1000L, 5000L).foreach { k =>
      val kEff = math.min(k, sorted.length.toLong).toInt
      val covered = sorted.take(kEff).map(_._2).sum
      assert(got(k)._1 == sorted.length.toLong, s"k=$k n_types")
      assert(got(k)._2 == nTokens, s"k=$k n_tokens")
      assert(got(k)._3 == covered, s"k=$k covered")
      assert(math.abs(got(k)._4 - covered.toDouble / nTokens) < 1e-6)
    }
    // coverage is monotone in k and ends at 1 when k >= vocab
    val cs = Seq(100L, 1000L, 5000L).map(got(_)._4)
    assert(cs.sliding(2).forall(p => p.head <= p.last + 1e-12))
    if (sorted.length <= 5000) assert(cs.last == 1.0)
  }

  test("a53 decomposition satisfies T_total = T_between + sum share*T_g") {
    val rows = graft.queries.Extended106.queries("a53_theil_decomposition")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val daily = graft.Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((ty, dy), rs) =>
        (ty, dy, rs.map(_._3).sum)
      }.toSeq
    val yy = daily.map(_._3).sum.toDouble
    val nn = daily.size.toLong
    // local totals per group
    val byType = daily.groupBy(_._1)
    rows.foreach { case (ty, nDays, share, tw, tb) =>
      val cells = byType(ty).sortBy(_._2)
      val yg = cells.map(_._3).sum.toDouble
      val ng = cells.size.toLong
      val twL = cells.map { case (_, _, y) =>
        (y / yg) * math.log(ng * y / yg)
      }.sum
      assert(nDays == ng, s"$ty n")
      assert(math.abs(share - yg / yy) < 1e-8, s"$ty share")
      assert(math.abs(tw - twL) < 1e-6, s"$ty t_within")
      assert(tb >= -1e-12, s"$ty t_between nonneg")
    }
    // decomposition identity against an independent total fold
    val tTotal = daily.map { case (_, _, y) =>
      (y / yy) * math.log(nn * y / yy)
    }.sum
    val recomposed = rows.head._5 +
      rows.map(r => r._3 * r._4).sum
    assert(math.abs(tTotal - recomposed) < 1e-8)
    assert(rows.length == 5)
  }
}
