package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-82: Welch's t-test + hourly seasonality, pinned to local brute
  * force over collected rows.
  */
class Extended82Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("a39 Welch t and dof match a local brute force over exact sums") {
    val r = graft.queries.Extended82.queries("a39_welch_ttest")(spark, d)
      .collect()(0)
    val xs = graft.Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(row => (md5hex(row.getLong(0).toString).charAt(0) < '8',
        row.getLong(1)))
    val a = xs.filter(_._1).map(_._2)
    val b = xs.filterNot(_._1).map(_._2)
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(r.getLong(2) == a.sum && r.getLong(3) == b.sum)
    assert(r.getLong(4) == a.map(x => x * x).sum)
    assert(r.getLong(5) == b.map(x => x * x).sum)
    def se2(v: Array[Long]): Double = {
      val n = v.length.toDouble
      val mean = v.sum / n
      v.map(x => (x - mean) * (x - mean)).sum / (n - 1) / n
    }
    val (sa, sb) = (se2(a), se2(b))
    val t = (a.sum.toDouble / a.length - b.sum.toDouble / b.length) /
      math.sqrt(sa + sb)
    val dof = (sa + sb) * (sa + sb) /
      (sa * sa / (a.length - 1) + sb * sb / (b.length - 1))
    assert(math.abs(r.getDouble(6) - t) < 1e-5, s"t got=${r.getDouble(6)} want=$t")
    assert(math.abs(r.getDouble(7) - dof) < 1e-3, s"dof got=${r.getDouble(7)} want=$dof")
  }

  test("e31 seasonality profile: shares sum to 1 per type; sums match a recount") {
    val got = graft.queries.Extended82.queries("e31_hourly_seasonality")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    assert(got.forall { case (_, h, _, _, _, _) => h >= 0 && h <= 23 })
    // per-type event counts must partition the table
    val totalRows = graft.Tables.t(spark, d, "events").count()
    assert(got.map(_._3).sum == totalRows)
    // one cell recounted exactly
    val (et, hod, n, mvSum, mean, _) = got.head
    val cell = graft.Tables.t(spark, d, "events")
      .filter(col("event_type") === et && hour(col("ts")) === hod)
      .select(count(lit(1)), sum(round(col("value") * 1000).cast("long")))
      .collect()(0)
    assert(cell.getLong(0) == n && cell.getLong(1) == mvSum)
    assert(mean == BigDecimal(mvSum.toDouble / n / 1000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // shares within a type sum to ~1
    got.groupBy(_._1).values.foreach { rows =>
      assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-4)
    }
  }
}
