package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.Isochrone

/** Batch-53: isochrone against hand-computed fixtures, both dispatch
  * paths.
  */
class Extended53Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def distMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("isochrone stops at the cutoff and takes the cheaper route") {
    import spark.implicits._
    // 1 -2-> 2 -2-> 3 -2-> 4 ; shortcut 1 -5-> 3 (worse than 2+2=4);
    // cutoff 5: node 4 costs 6 -> excluded; node 3 costs 4 via the chain
    val edges = Seq((1L, 2L, 2.0), (2L, 3L, 2.0), (3L, 4L, 2.0), (1L, 3L, 5.0))
      .toDF("u", "v", "w")
    val expected = Map(1L -> 0.0, 2L -> 2.0, 3L -> 4.0)
    assert(distMap(Isochrone.isochrone(spark, edges, 1L, 5.0)) == expected)
    assert(distMap(Isochrone.isochrone(spark, edges, 1L, 5.0,
      maxLocalEdges = 0)) == expected)
  }

  test("dispatch paths agree on the sf0.001 weighted supernode graph") {
    val d = "/root/testdata/sf0.001"
    val edges = graft.queries.Extended53.weightedEdges(spark, d)
    val local = distMap(Isochrone.isochrone(spark, edges, 0L, 6.0))
    val dist = distMap(Isochrone.isochrone(spark, edges, 0L, 6.0,
      maxLocalEdges = 0))
    assert(local == dist)
    assert(local(0L) == 0.0)
  }
}
