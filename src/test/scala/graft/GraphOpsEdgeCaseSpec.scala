package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.route.{Bridges, DagPath, Isochrone, Matching, Mst, Components}

/** Zero-row and degenerate-input behavior of the round-6 graph
  * operators: empty edge relations, self-loop-only inputs, and isolated
  * sources must return empty/identity results, not crash — the guard
  * against empty partitions and filtered-to-nothing inputs at scale.
  */
class GraphOpsEdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emptyEdges = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("u", "v")
  }
  private def emptyWeighted = {
    import spark.implicits._
    Seq.empty[(Long, Long, Double)].toDF("u", "v", "w")
  }

  test("every graph operator returns empty on an empty edge relation") {
    assert(Bridges.bridges(spark, emptyEdges).isEmpty)
    assert(Bridges.twoEdgeConnectedComponents(spark, emptyEdges).isEmpty)
    assert(Mst.minimumSpanningForest(spark, emptyWeighted).isEmpty)
    assert(Matching.greedyMatching(spark, emptyWeighted).isEmpty)
    assert(DagPath.longestPath(spark, emptyEdges).isEmpty)
    assert(Components.kTruss(spark, emptyEdges, 3).isEmpty)
  }

  test("self-loop-only input collapses to nothing everywhere") {
    import spark.implicits._
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("u", "v")
    val loopsW = Seq((1L, 1L, 2.0)).toDF("u", "v", "w")
    assert(Bridges.bridges(spark, loops).isEmpty)
    assert(Mst.minimumSpanningForest(spark, loopsW).isEmpty)
    assert(Matching.greedyMatching(spark, loopsW).isEmpty)
    assert(Components.kTruss(spark, loops, 3).isEmpty)
  }

  test("isochrone from an isolated source is just the source at distance 0") {
    import spark.implicits._
    // source 99 touches no edge
    val edges = Seq((1L, 2L, 1.0)).toDF("u", "v", "w")
    val out = Isochrone.isochrone(spark, edges, 99L, 10.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(out == List((99L, 0.0)))
    // distributed path too
    val outD = Isochrone.isochrone(spark, edges, 99L, 10.0, maxLocalEdges = 0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(outD == List((99L, 0.0)))
  }

  test("cutoff zero keeps only the source") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("u", "v", "w")
    val out = Isochrone.isochrone(spark, edges, 1L, 0.0)
      .collect().map(_.getLong(0)).toList
    assert(out == List(1L))
  }
}
