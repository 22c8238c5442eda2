package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.Bridges

/** Batch-43 operators: 2-edge-connected components against hand-computed
  * fixtures (both bridge dispatch paths) and the exact mode tie-break.
  */
class Extended43Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def compMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2ecc on the two-triangles-and-a-bridge fixture") {
    import spark.implicits._
    // triangles {1,2,3} and {5,6,7} joined by bridge 3-5, pendant 7-8:
    // components are {1,2,3}, {5,6,7}, {8} (pendant severed)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 5L),
      (5L, 6L), (6L, 7L), (5L, 7L),
      (7L, 8L)
    ).toDF("u", "v")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L)
    assert(compMap(Bridges.twoEdgeConnectedComponents(spark, edges)) == expected)
    assert(compMap(Bridges.twoEdgeConnectedComponents(spark, edges,
      maxLocalEdges = 0)) == expected)
  }

  test("2ecc of a tree is all singletons; of a cycle, one component") {
    import spark.implicits._
    val tree = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("u", "v")
    assert(compMap(Bridges.twoEdgeConnectedComponents(spark, tree)) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    assert(compMap(Bridges.twoEdgeConnectedComponents(spark, cycle)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("2ecc labels agree across dispatch paths on the sf0.001 supernode graph") {
    val edges = graft.queries.Extended42.sparseSupernodeEdges(spark, d)
    val local = compMap(Bridges.twoEdgeConnectedComponents(spark, edges))
    val dist = compMap(Bridges.twoEdgeConnectedComponents(spark, edges,
      maxLocalEdges = 0))
    assert(local == dist)
    // the graph has bridges (16 at sf0.001), so severing them must leave
    // more components than the raw graph's connected components
    assert(local.values.toSet.size > 1)
  }

  test("a21 mode breaks count ties on the smallest value") {
    import spark.implicits._
    // flag X: value 2 and 7 both appear twice -> mode must be 2
    val li = Seq(("X", 7.0), ("X", 7.0), ("X", 2.0), ("X", 2.0), ("X", 5.0),
      ("Y", 3.0)).toDF("l_returnflag", "l_quantity")
    val tmp = java.nio.file.Files.createTempDirectory("e43spec").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = graft.queries.Extended43.queries("a21_mode")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List(("X", 2L, 2L), ("Y", 3L, 1L)))
  }
}
