package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PropertyGraph
import graft.ingest.{GeoJsonIngest, KmlIngest}

/** KML ingest parity: the same two line features ingested as KML and as
  * GeoJSON must produce IDENTICAL canonical edges (node ids, reverse
  * edges, _length, flattened properties) — the ingest pipelines converge
  * on GeoJsonIngest.fromFeatures by construction, and this pins it.
  */
class KmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val kml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<kml xmlns="http://www.opengis.net/kml/2.2">
      |  <Document>
      |    <Placemark>
      |      <name>west segment</name>
      |      <ExtendedData>
      |        <Data name="surface"><value>asphalt</value></Data>
      |        <Data name="width"><value>2.5</value></Data>
      |        <Data name="lanes"><value>2</value></Data>
      |      </ExtendedData>
      |      <LineString>
      |        <coordinates>
      |          -122.3144401,47.6598872,0 -122.3141965,47.6598870,0
      |        </coordinates>
      |      </LineString>
      |    </Placemark>
      |    <Placemark>
      |      <name>east segment</name>
      |      <ExtendedData>
      |        <SchemaData schemaUrl="#s1">
      |          <SimpleData name="surface">gravel</SimpleData>
      |        </SchemaData>
      |      </ExtendedData>
      |      <LineString>
      |        <coordinates>-122.3141965,47.6598870 -122.3132940,47.6598762</coordinates>
      |      </LineString>
      |    </Placemark>
      |    <Placemark>
      |      <name>a point, skipped</name>
      |      <Point><coordinates>-122.31,47.65</coordinates></Point>
      |    </Placemark>
      |    <Placemark><name>no geometry, skipped</name></Placemark>
      |  </Document>
      |</kml>""".stripMargin

  private val geojson =
    """{"type":"FeatureCollection","features":[
      |  {"type":"Feature","properties":{"name":"west segment","surface":"asphalt","width":2.5,"lanes":2},
      |   "geometry":{"type":"LineString","coordinates":[[-122.3144401,47.6598872],[-122.3141965,47.6598870]]}},
      |  {"type":"Feature","properties":{"name":"east segment","surface":"gravel"},
      |   "geometry":{"type":"LineString","coordinates":[[-122.3141965,47.6598870],[-122.3132940,47.6598762]]}}
      |]}""".stripMargin

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("kml-spec")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("KML LineString placemarks ingest; Points and geometry-less are skipped") {
    val edges = KmlIngest.readEdges(spark, Seq(write("roads.kml", kml)))
    // 2 line placemarks × forward+reverse
    assert(edges.count() == 4)
    val cols = edges.columns.toSet
    assert(Set("_u", "_v", "_length", "name", "surface", "width", "lanes")
      .subsetOf(cols))
    val west = edges.filter(col("name") === "west segment" && col("_length") > 0)
    assert(west.count() == 2)
    // number sniffing: width double, lanes long
    assert(edges.schema("width").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(edges.schema("lanes").dataType ==
      org.apache.spark.sql.types.LongType)
    // SimpleData path populates too
    assert(edges.filter(col("surface") === "gravel").count() == 2)
  }

  test("KML ingest is row-identical to the GeoJSON ingest of the same features") {
    val viaKml = KmlIngest.readEdges(spark, Seq(write("roads.kml", kml)))
    val viaGeo = GeoJsonIngest.readEdges(spark, Seq(write("roads.geojson", geojson)))
    assert(viaKml.columns.sorted.toSeq == viaGeo.columns.sorted.toSeq)
    val cols = viaKml.columns.sorted.map(col).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols: _*).orderBy("_u", "_v").collect().toSeq
    assert(rows(viaKml) == rows(viaGeo))
  }

  test("mixed-format build unions KML with GeoJSON under unique fids") {
    val g = PropertyGraph.fromGeoJson(spark,
      Seq(write("a.geojson", geojson), write("b.kml", kml)))
    assert(g.size() == 8) // 4 edges from each source
    val fids = g.edges.select("fid").collect().map(_.getLong(0))
    assert(fids.distinct.length == fids.length, "fids must stay unique across formats")
  }

  test("external entities are refused (XXE hardening)") {
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE kml [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
        |<Placemark><name>&xxe;</name>
        |<LineString><coordinates>0,0 1,1</coordinates></LineString>
        |</Placemark></Document></kml>""".stripMargin
    val ex = intercept[org.apache.spark.SparkException] {
      KmlIngest.readEdges(spark, Seq(write("evil.kml", evil))).count()
    }
    assert(ex.getMessage != null)
  }
}
