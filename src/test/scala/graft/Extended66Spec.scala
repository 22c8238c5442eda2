package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-66 operators: exact Spearman and Cramér's V. */
class Extended66Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  /** Midrank assignment over a sequence with ties. */
  private def midranks(xs: Seq[Long]): Map[Long, Double] = {
    val sorted = xs.sorted
    xs.distinct.map { v =>
      val lo = sorted.indexOf(v) + 1
      val hi = sorted.lastIndexOf(v) + 1
      v -> (lo + hi) / 2.0
    }.toMap
  }

  test("a30 equals the textbook midrank Spearman computed locally") {
    val row = graft.queries.Extended66.queries("a30_spearman")(spark, d).head()
    val (n, rho) = (row.getLong(0), row.getDouble(1))

    val data = Tables.t(spark, d, "lineitem")
      .select(col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(n == data.length.toLong)
    val rq = midranks(data.map(_._1))
    val rp = midranks(data.map(_._2))
    val pts = data.map { case (q, p) => (rq(q), rp(p)) }
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(t => t._1 * t._2).sum
    val sxx = pts.map(t => t._1 * t._1).sum
    val syy = pts.map(t => t._2 * t._2).sum
    val want = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(math.abs(rho - want) < 1e-9, s"got $rho want $want")
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("a31 equals the local contingency chi-square and is in [0, 1]") {
    val row = graft.queries.Extended66.queries("a31_cramers_v")(spark, d).head()
    val (n, chi2, v) = (row.getLong(0), row.getDouble(1), row.getDouble(2))

    val docs = Tables.t(spark, d, "documents")
      .select(col("lang"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(n == docs.length.toLong)
    val cells = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val contribs = cells.toSeq.sortBy(_._1).map { case ((l, s), o) =>
      val num = o * n - rt(l) * ct(s)
      (num.toDouble * num.toDouble) / (n.toDouble * rt(l) * ct(s))
    }
    val wantChi2 = contribs.foldLeft(0.0)(_ + _)
    assert(math.abs(chi2 - wantChi2) < 1e-9)
    val wantV = math.sqrt(wantChi2 /
      (n * math.min(rt.size - 1, ct.size - 1)).toDouble)
    assert(math.abs(v - wantV) < 1e-12)
    assert(v >= 0.0 && v <= 1.0)
  }
}
