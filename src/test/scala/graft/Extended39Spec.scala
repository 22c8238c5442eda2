package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch-39: histogram-selection quantiles equal a full local sort at
  * sf0.001 (DuckDB hash gate at sf0.01 via Verify/oracle_check).
  */
class Extended39Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("v6 Gram matrix equals the local exact XᵀX on quantized vectors") {
    val got = graft.queries.Extended39.queries("v6_gram_matrix")(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val xs = Tables.t(spark, d, "embeddings")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray.map(x => math.round(x * 1000)))
    assert(got.size == 64 * 65 / 2)
    for (i <- 0 until 64; j <- i until 64) {
      val want = xs.map(row => row(i) * row(j)).sum
      assert(got((i, j)) == want, s"cell ($i,$j)")
    }
    // diagonal is a sum of squares — non-negative
    (0 until 64).foreach(i => assert(got((i, i)) >= 0))
  }

  test("a19 histogram selection equals the sorted ceil-rank element") {
    val got = graft.queries.Extended39.queries("a19_exact_median_hist")(spark, d)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val vals = Tables.t(spark, d, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long")).collect()
      .map(_.getLong(0)).sorted
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val rank = math.ceil(q * vals.length).toLong.max(1L)
      val want = vals(rank.toInt - 1) / 100.0
      assert(got(q) == BigDecimal(want)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"q=$q")
    }
  }
}
