package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch-19 pins: the oracle-gated centrality queries agree with the
  * closed forms, independently of the DuckDB restatement (distributed
  * Brandes vs local reference parity on arbitrary graphs lives in
  * RouteSpec).
  */
class Extended19Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("chain betweenness matches 2*j*(n-1-j) and the local Brandes") {
    val rows = graft.queries.Extended19.queries("r1_betweenness_chain")(spark, sf)
      .collect().map(r => r.getAs[Number](0).longValue -> r.getDouble(1)).toMap
    val n = rows.size
    rows.foreach { case (j, bc) =>
      assert(bc == 2.0 * j * (n - 1 - j), s"key $j")
    }
  }

  test("cycle closeness is the uniform (n-1)/floor(n^2/4)") {
    val rows = graft.queries.Extended19.queries("r2_closeness_cycle")(spark, sf)
      .collect().map(_.getDouble(1))
    val n = rows.length
    val expect = 1.0 / (math.floor(n.toDouble * n / 4) / (n - 1.0))
    rows.foreach(c => assert(c == expect))
  }
}
