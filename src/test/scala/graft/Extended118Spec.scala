package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-118: Bradley–Terry MM fitting, pinned to a local replay. */
class Extended118Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("a62 strengths match a local three-step MM fit") {
    val got = graft.queries.Extended118.queries("a62_bradley_terry")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toList

    val daily = Tables.t(spark, d, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((ty, day), rs) =>
        (ty, day, rs.map(_._3).sum) }.toSeq
    val byDay = daily.groupBy(_._2)
    val duels = byDay.values.flatMap { rows =>
      for {
        x <- rows; y <- rows
        if x._1 < y._1 && x._3 != y._3
      } yield (x._1, y._1, x._3 > y._3)
    }.toSeq
    val nij = duels.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.size.toLong }
    val winCount = duels.flatMap { case (a, b, aw) =>
      Seq(a -> (if (aw) 1L else 0L), b -> (if (aw) 0L else 1L)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val items = winCount.keys.toSeq.sorted
    val opponents = items.map { i =>
      i -> items.filter(j => j != i &&
        (nij.contains((i, j)) || nij.contains((j, i))))
    }.toMap
    def n(i: String, j: String): Long =
      nij.getOrElse((i, j), nij.getOrElse((j, i), 0L))
    var p: Map[String, Double] = items.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      p = items.map { i =>
        val den = opponents(i).sorted.map(j => n(i, j).toDouble / (p(i) + p(j))).sum
        i -> winCount(i).toDouble / den
      }.toMap
    }
    val want = items.map(i => (i, winCount(i), p(i)))
      .sortBy { case (i, _, s) => (-s, i) }
    assert(got.map(_._1) == want.map(_._1).toList, "strength order")
    got.zip(want).foreach { case ((ty, w, s), (_, ww, ws)) =>
      assert(w == ww, s"$ty wins")
      assert(math.abs(s - ws) < 1e-5, s"$ty strength")
    }
    // more daily wins must never mean lower fitted strength on this
    // balanced design (every pair duels every complete day)
    assert(got.map(_._3).distinct.size > 1, "strengths separate the types")
  }
}
