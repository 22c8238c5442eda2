package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PropertyGraph
import graft.route.Route

/** Routing parity with the reference's README Dijkstra example
  * (`README.md:59-74`): stock shortest path over the star fixture.
  */
class RouteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val g: PropertyGraph =
    PropertyGraph.fromGeoJson(spark, Seq(Fixture.path)).toInMemory()

  val leafWest = "-122.3144401, 47.6598872"

  test("weighted shortest path goes leaf → hub → leaf") {
    val Some((path, cost)) =
      Route.shortestPath(g, leafWest, Fixture.TestNode1, "_length")
    assert(path == Seq(leafWest, Fixture.TestNode2, Fixture.TestNode1))
    // cost = sum of the two segment lengths
    val l1 = graft.geo.Geo.haversine(-122.3144401, 47.6598872, -122.3141965, 47.6598870)
    val l2 = graft.geo.Geo.haversine(-122.3141965, 47.6598870, -122.3132940, 47.6598762)
    assert(math.abs(cost - (l1 + l2)) < 1e-6)
  }

  test("path to self is the single node at cost 0") {
    val Some((path, cost)) = Route.shortestPath(g, Fixture.TestNode1, Fixture.TestNode1, "_length")
    assert(path == Seq(Fixture.TestNode1))
    assert(cost == 0.0)
  }

  test("unreachable/unknown nodes yield None") {
    assert(Route.shortestPath(g, "nope", Fixture.TestNode1, "_length").isEmpty)
  }

  test("local fast path and distributed Pregel agree") {
    val local = Route.shortestPathLocal(g, leafWest, Fixture.TestNode1, "_length")
    val pregel = Route.shortestPathPregel(g, leafWest, Fixture.TestNode1, "_length")
    assert(local.isDefined && pregel.isDefined)
    assert(local.get._1 == pregel.get._1)
    assert(math.abs(local.get._2 - pregel.get._2) < 1e-9)
    assert(Route.shortestPathLocal(g, "nope", Fixture.TestNode1, "_length").isEmpty)
    assert(Route.shortestPathLocal(g, Fixture.TestNode1, Fixture.TestNode1, "_length")
      .contains((Seq(Fixture.TestNode1), 0.0)))
  }

  test("multi-landmark distances agree with point-to-point Dijkstra") {
    val landmarks = Seq(leafWest, Fixture.TestNode1)
    val dists = Route.landmarkDistances(spark, g, landmarks, "_length")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // distance leafWest -> TestNode1 equals the dedicated query
    val Some((_, cost)) = Route.shortestPathPregel(g, leafWest, Fixture.TestNode1, "_length")
    assert(math.abs(dists((Fixture.TestNode1, leafWest)) - cost) < 1e-9)
    // landmarks are at distance 0 of themselves
    assert(dists((leafWest, leafWest)) == 0.0)
    // symmetric graph: both directions agree
    assert(math.abs(dists((Fixture.TestNode1, leafWest)) - dists((leafWest, Fixture.TestNode1))) < 1e-9)
    // every node reaches both landmarks (connected star)
    assert(dists.size == 5 * 2)
    val close = Route.closeness(spark, g, landmarks, "_length").collect()
    assert(close.nonEmpty && close.forall(_.getDouble(1) > 0))
  }

  test("pageRank: hub outranks leaves") {
    val ranks = Route.pageRank(spark, g).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 5)
    val hub = ranks(Fixture.TestNode2)
    assert(ranks.filterNot(_._1 == Fixture.TestNode2).values.forall(_ < hub))
  }
}
