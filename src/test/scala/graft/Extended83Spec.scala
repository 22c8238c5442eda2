package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-83: grid kNN + type co-occurrence PMI, pinned to local brute
  * force over collected events.
  */
class Extended83Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private lazy val events: Array[(Long, Long, Long, String)] =
    graft.Tables.t(spark, d, "events")
      .select(col("event_id"), round(col("value") * 100).cast("long"),
        col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("g11 returns the 5 nearest in-ring events per query, integer-exact order") {
    val got = graft.queries.Extended83.queries("g11_grid_knn")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val points = Seq((0L, 10000L, 8000L), (1L, 25000L, 20000L),
      (2L, 40000L, 40000L), (3L, 5000L, 50000L), (4L, 33300L, 12000L))
    val want = points.flatMap { case (qid, qxc, qyc) =>
      val (qcx, qcy) = (qxc / 4000, qyc / 4000)
      events.iterator.map { case (id, xc, uid, _) =>
        val yc = uid * 400
        (id, xc, yc)
      }.filter { case (_, xc, yc) =>
        math.abs(xc / 4000 - qcx) <= 1 && math.abs(yc / 4000 - qcy) <= 1
      }.map { case (id, xc, yc) =>
        val d2 = (xc - qxc) * (xc - qxc) + (yc - qyc) * (yc - qyc)
        (qid, id, d2)
      }.toSeq.sortBy(t => (t._3, t._2)).take(5)
    }
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want)
    got.foreach { case (_, _, d2, dist) =>
      assert(dist == BigDecimal(math.sqrt(d2.toDouble) / 100.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("j26 PMI counts match a local brute force over distinct (user, type)") {
    val got = graft.queries.Extended83.queries("j26_type_cooccurrence_pmi")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    val ut = events.map(e => (e._3, e._4)).distinct
    val n = ut.map(_._1).distinct.length.toLong
    val perType = ut.groupBy(_._2).map { case (t0, xs) => t0 -> xs.length.toLong }
    val byUser = ut.groupBy(_._1).values
    val pairCounts = byUser.flatMap { rows =>
      val ts = rows.map(_._2).sorted
      for (i <- ts.indices; j <- (i + 1) until ts.size) yield (ts(i), ts(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    assert(got.nonEmpty)
    assert(got.length == pairCounts.size)
    got.foreach { case (ta, tb, cab, ca, cb, gn, pmi) =>
      assert(cab == pairCounts((ta, tb)), s"pair=($ta,$tb)")
      assert(ca == perType(ta) && cb == perType(tb) && gn == n)
      val want = math.log((n * cab).toDouble / (ca * cb).toDouble)
      assert(pmi == BigDecimal(want)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"pair=($ta,$tb)")
    }
  }
}
