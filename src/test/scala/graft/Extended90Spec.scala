package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-90: path trigram mining + degree CCDF, pinned to local brute
  * force over collected rows.
  */
class Extended90Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("e33 top-10 trigrams equal a local sequence replay") {
    val got = graft.queries.Extended90.queries("e33_path_trigrams")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val ev = graft.Tables.t(spark, d, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val want = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._3, e._2)).map(_._4).sliding(3)
        .filter(_.size == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      .toList.sortBy(t => (-t._2, t._1)).take(10)
    assert(got == want)
  }

  test("r13 bins partition the node set; CCDF is a proper tail") {
    val got = graft.queries.Extended90.queries("r13_degree_ccdf")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(got.map(_._1) == got.map(_._1).sorted)
    val total = got.map(_._2).sum
    assert(got.head._3 <= total && got.map(_._3).max == total ||
      got.head._3 == total)
    // n_at_least is the suffix sum of n_nodes
    val suffix = got.map(_._2).scanRight(0L)(_ + _).init
    assert(got.map(_._3) == suffix)
    assert(got.last._4 > 0 && got.head._4 == 1.0)
    // bin = bit length of the degree: recompute one bin from scratch
    val ev = graft.Tables.t(spark, d, "lineitem")
      .filter(col("l_linenumber") <= 5).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val ps = es.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.toSet
    val deg = pairs.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map(_._2.size)
    val wantBins = deg.groupBy(dd => java.lang.Long.toBinaryString(dd.toLong).length.toLong)
      .map { case (b, xs) => (b, xs.size.toLong) }
    assert(got.map(t => (t._1, t._2)).toMap == wantBins)
  }
}
