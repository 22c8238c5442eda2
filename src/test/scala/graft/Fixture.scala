package graft

import java.nio.file.{Files, Paths}

/** The reference's micro fixture: 4 LineString features sharing a hub
  * coordinate (data from `tests/constants.py:1-49`; 8 edges / 5 nodes after
  * reversal per `tests/test_digraphdbview.py:5-6`).
  */
object Fixture {
  // well-known node ids (tests/test_digraphdb.py:5-6)
  val TestNode1 = "-122.313294, 47.6598762"
  val TestNode2 = "-122.3141965, 47.659887"

  val geojson: String =
    """{
      |  "type": "FeatureCollection",
      |  "features": [
      |    {"type": "Feature", "properties": {},
      |     "geometry": {"type": "LineString", "coordinates":
      |       [[-122.3141965, 47.6598870], [-122.3132940, 47.6598762]]}},
      |    {"type": "Feature", "properties": {},
      |     "geometry": {"type": "LineString", "coordinates":
      |       [[-122.3144401, 47.6598872], [-122.3141965, 47.6598870]]}},
      |    {"type": "Feature", "properties": {},
      |     "geometry": {"type": "LineString", "coordinates":
      |       [[-122.3141965, 47.6598870], [-122.3142026, 47.6597293]]}},
      |    {"type": "Feature", "properties": {},
      |     "geometry": {"type": "LineString", "coordinates":
      |       [[-122.3141795, 47.6605333], [-122.3141965, 47.6598870]]}}
      |  ]
      |}""".stripMargin

  /** Writes the fixture to a temp file and returns its path. */
  lazy val path: String = {
    val dir = Files.createTempDirectory("graft-fixture")
    val p = dir.resolve("star.geojson")
    Files.writeString(p, geojson)
    p.toString
  }
}
