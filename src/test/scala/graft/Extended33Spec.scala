package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-33 operators against local recomputations at sf0.001 (DuckDB
  * hash gate at sf0.01 via Verify/oracle_check).
  */
class Extended33Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.queries.Extended33.queries(name)(spark, d)

  test("t20 entropy matches a local per-doc recomputation, bit-exact") {
    val got = q("t20_char_entropy").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val docs = Tables.t(spark, d, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val counts = text.toSeq.groupBy(identity).map { case (c, cs) =>
        c.toString -> cs.size.toLong }
      val n = counts.values.sum
      // same ascending-by-char fold as the engine
      val nats = counts.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, c)) =>
        val p = c.toDouble / n.toDouble
        acc - p * math.log(p)
      }
      val bits = BigDecimal(nats / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gd, ge) = got(id)
      assert(gn == n && gd == counts.size)
      assert(ge == bits, s"doc $id: $ge != $bits")
    }
  }

  test("v5 power iteration aligns with the dominant direction and is exact") {
    val rows = q("v5_power_iteration").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.size == 64)
    // scale invariant: the max-|v| coordinate sits at ±1000 (normalized)
    assert(rows.values.map(math.abs).max == 1000L)
    // local exact recomputation of the same fixed-point iteration
    val xs = Tables.t(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](1).toArray.map(x => math.round(x * 1000)))
    var v = Array.fill(64)(1000L)
    for (_ <- 1 to 2) {
      val dots = xs.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val sv = Array.tabulate(64)(j =>
        xs.zip(dots).map { case (row, dt) => dt * row(j) }.sum)
      val m = sv.map(math.abs).max
      v = sv.map(sj => ((sj * 1000L).toDouble / m).toLong)
    }
    (0 until 64).foreach(j => assert(rows(j) == v(j), s"pos $j"))
  }

  test("s13 profile matches direct column statistics") {
    val o = Tables.t(spark, d, "orders")
    val got = q("s13_profile_stats").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val n = o.count()
    got.values.foreach { case (gn, _, _) => assert(gn == n) }
    assert(got("o_custkey")._3 ==
      o.select("o_custkey").distinct().count())
    assert(got("o_orderstatus")._3 ==
      o.select("o_orderstatus").distinct().count())
    assert(got.values.forall(_._2 == 0L)) // no nulls in the synthetic data
  }
}
