package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-92: Gumbel block maxima + Hill tail index, pinned to local
  * brute force over collected rows.
  */
class Extended92Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a42 Gumbel moments match a local block-maxima replay") {
    val r = graft.queries.Extended92.queries("a42_gumbel_block_maxima")(spark, d)
      .collect()(0)
    val maxima = graft.Tables.t(spark, d, "events")
      .select(date_trunc("day", col("ts")).as("day"),
        round(col("value") * 1000).cast("long").as("mv"))
      .collect().map(row => (row.get(0).toString, row.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).max).toSeq
    val n = maxima.size
    assert(r.getLong(0) == n.toLong)
    val mean = maxima.sum.toDouble / n / 1000.0
    val varU = (n.toDouble * maxima.map(x => BigInt(x) * BigInt(x)).sum.toDouble -
      BigInt(maxima.sum).pow(2).toDouble) / (n.toDouble * (n - 1)) / 1e6
    assert(math.abs(r.getDouble(1) - mean) < 1e-5)
    assert(math.abs(r.getDouble(2) - math.sqrt(varU)) < 1e-4)
    val beta = math.sqrt(varU) * math.sqrt(6.0) / math.Pi
    assert(math.abs(r.getDouble(3) - beta) < 1e-4)
    assert(math.abs(r.getDouble(4) - (mean - 0.5772156649015329 * beta)) < 1e-4)
  }

  test("a43 Hill estimate matches the definitional top-65 fold") {
    val r = graft.queries.Extended92.queries("a43_hill_tail_index")(spark, d)
      .collect()(0)
    val xs = graft.Tables.t(spark, d, "documents")
      .select(col("n_chars").cast("double")).collect().map(_.getDouble(0))
      .sorted(Ordering[Double].reverse).take(65)
    assert(r.getLong(0) == 64L && r.getDouble(1) == xs(64))
    val lnsum = xs.take(64).map(x => math.log(x / xs(64))).sum
    assert(r.getDouble(2) == r6(lnsum / 64.0))
    assert(r.getDouble(3) == r6(64.0 / lnsum))
    // a genuine heavy-ish tail: xi positive, alpha finite
    assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
  }
}
