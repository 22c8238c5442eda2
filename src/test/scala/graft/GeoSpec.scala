package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo

class GeoSpec extends AnyFunSuite {

  test("haversine: one degree of longitude at the equator") {
    val d = Geo.haversine(0, 0, 1, 0)
    assert(math.abs(d - 111194.9) < 1.0) // R * pi / 180
  }

  test("haversine: zero distance and symmetry") {
    assert(Geo.haversine(10, 20, 10, 20) == 0.0)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val (lon1, lat1) = (rnd.nextDouble * 358 - 179, rnd.nextDouble * 170 - 85)
      val (lon2, lat2) = (rnd.nextDouble * 358 - 179, rnd.nextDouble * 170 - 85)
      val d1 = Geo.haversine(lon1, lat1, lon2, lat2)
      val d2 = Geo.haversine(lon2, lat2, lon1, lat1)
      assert(d1 >= 0.0)
      assert(math.abs(d1 - d2) < 1e-6)
    }
  }

  test("polyline length equals segment sum and reversal-invariant") {
    val line = Seq(Array(-122.3141965, 47.6598870), Array(-122.3132940, 47.6598762),
      Array(-122.3130000, 47.6600000))
    val l = Geo.polylineLength(line)
    assert(l > 0)
    assert(math.abs(l - Geo.polylineLength(line.reverse)) < 1e-9)
    assert(Geo.polylineLength(line.take(1)) == 0.0)
  }

  test("point-segment distance: on-segment point is ~0; perpendicular offset is accurate") {
    // point exactly at segment start
    assert(Geo.pointSegmentDistance(0, 0, 0, 0, 1, 0) < 1e-9)
    // 0.001 deg ≈ 111.19 m north of an east-west segment at equator
    val d = Geo.pointSegmentDistance(0.5, 0.001, 0, 0, 1, 0)
    assert(math.abs(d - 111.19) < 0.2)
    // beyond the endpoint: distance to the endpoint itself
    val d2 = Geo.pointSegmentDistance(2.0, 0.0, 0, 0, 1, 0)
    assert(math.abs(d2 - Geo.haversine(1, 0, 2, 0)) / d2 < 0.01)
  }

  test("fmtCoord reproduces Python f-string of round(x, 7) (io.py:21-29)") {
    assert(Geo.fmtCoord(-122.3132940, 7) == "-122.313294")
    assert(Geo.fmtCoord(47.6598870, 7) == "47.659887")
    assert(Geo.fmtCoord(-122.3141965, 7) == "-122.3141965")
    assert(Geo.fmtCoord(-122.0, 7) == "-122.0")
    assert(Geo.fmtCoord(0.0, 7) == "0.0")
    assert(Geo.nodeId(-122.3132940, 47.6598762, 7) == Fixture.TestNode1)
    assert(Geo.nodeId(-122.3141965, 47.6598870, 7) == Fixture.TestNode2)
  }

  test("envelope covers all points") {
    val (minX, minY, maxX, maxY) =
      Geo.envelope(Seq(Array(1.0, 5.0), Array(-2.0, 7.0), Array(3.0, 6.0)))
    assert((minX, minY, maxX, maxY) == ((-2.0, 5.0, 3.0, 7.0)))
  }
}
