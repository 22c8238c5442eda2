package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-120: Cramér–von Mises drift and Croston forecasting, pinned
  * to local replays.
  */
class Extended120Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("a63 omega2 matches a direct local ECDF computation") {
    val row = graft.queries.Extended120
      .queries("a63_cramer_von_mises")(spark, d).collect().head
    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def inA(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString.charAt(0) < '8'
    }
    val (a, b) = docs.partition(t => inA(t._1))
    val na = a.length; val nb = b.length
    val values = docs.map(_._2).distinct.sorted
    val ts = values.map { v =>
      val c = docs.count(_._2 == v).toLong
      val cuma = a.count(_._2 <= v).toLong
      val cumb = b.count(_._2 <= v).toLong
      BigInt(c) * BigInt(nb.toLong * cuma - na.toLong * cumb).pow(2)
    }.sum
    val n = na.toLong + nb
    val want = ts.toDouble / (BigInt(n) * BigInt(n) * na * nb).toDouble
    assert(row.getLong(0) == na.toLong && row.getLong(1) == nb.toLong)
    assert(math.abs(row.getDouble(2) - want) < 1e-6,
      s"omega2 ${row.getDouble(2)} vs $want")
    assert(row.getDouble(2) >= 0.0)
  }

  test("e41 state matches the local Croston recurrence") {
    val got = graft.queries.Extended120.queries("e41_croston")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val dm = Tables.t(spark, d, "events")
      .filter(col("value") > 100.0)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((ty, day), rs) =>
        (ty, day, rs.map(_._3).sum) }
      .groupBy(_._1).map { case (ty, rows) =>
        ty -> rows.toSeq.sortBy(_._2).map(r => (r._2, r._3)) }
    dm.filter(_._2.size >= 2).foreach { case (ty, series) =>
      var pd = series.head._1
      var z = series.head._2.toDouble
      var p = 1.0
      series.tail.foreach { case (day, y) =>
        z = z + 0.25 * (y - z)
        p = p + 0.25 * ((day - pd).toDouble - p)
        pd = day
      }
      val g = got(ty)
      assert(g._1 == series.size.toLong, s"$ty n")
      assert(math.abs(g._2 - z) < 1e-5, s"$ty z")
      assert(math.abs(g._3 - p) < 1e-5, s"$ty p")
      assert(math.abs(g._4 - z / p) < 1e-5, s"$ty forecast")
      // genuinely intermittent at this threshold: mean gap above one day
      assert(g._3 > 1.0 - 1e-9, s"$ty interval sanity")
    }
    assert(got.nonEmpty)
  }
}
