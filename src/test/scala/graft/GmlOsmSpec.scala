package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PropertyGraph
import graft.ingest.{GeoJsonIngest, GmlIngest, OsmIngest}

/** GML and OSM XML ingest parity: the same line features ingested as
  * GML / OSM and as GeoJSON must produce IDENTICAL canonical edges —
  * all readers converge on GeoJsonIngest.fromFeatures by construction,
  * and these tests pin it (same contract as KmlSpec / ShapefileSpec).
  */
class GmlOsmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("gmlosm-spec")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  // GML 3 posList + GML 2 coordinates variants of the same two segments
  // the KML/GeoJSON fixtures use (lon lat order, srsDimension 2 and 3).
  private val gml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml"
      |    xmlns:app="http://example.com/app">
      |  <gml:featureMember>
      |    <app:road>
      |      <app:name>west segment</app:name>
      |      <app:surface>asphalt</app:surface>
      |      <app:width>2.5</app:width>
      |      <app:lanes>2</app:lanes>
      |      <app:geom>
      |        <gml:LineString>
      |          <gml:posList srsDimension="2">-122.3144401 47.6598872 -122.3141965 47.6598870</gml:posList>
      |        </gml:LineString>
      |      </app:geom>
      |    </app:road>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <app:road>
      |      <app:name>east segment</app:name>
      |      <app:surface>gravel</app:surface>
      |      <app:geom>
      |        <gml:LineString>
      |          <gml:coordinates>-122.3141965,47.6598870 -122.3132940,47.6598762</gml:coordinates>
      |        </gml:LineString>
      |      </app:geom>
      |    </app:road>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <app:poi>
      |      <app:name>a point, skipped</app:name>
      |      <app:geom><gml:Point><gml:pos>-122.31 47.65</gml:pos></gml:Point></app:geom>
      |    </app:poi>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <app:note><app:name>no geometry, skipped</app:name></app:note>
      |  </gml:featureMember>
      |</gml:FeatureCollection>""".stripMargin

  private val geojsonForGml =
    """{"type":"FeatureCollection","features":[
      |  {"type":"Feature","properties":{"name":"west segment","surface":"asphalt","width":2.5,"lanes":2},
      |   "geometry":{"type":"LineString","coordinates":[[-122.3144401,47.6598872],[-122.3141965,47.6598870]]}},
      |  {"type":"Feature","properties":{"name":"east segment","surface":"gravel"},
      |   "geometry":{"type":"LineString","coordinates":[[-122.3141965,47.6598870],[-122.3132940,47.6598762]]}}
      |]}""".stripMargin

  // Two ways sharing node 2 (a junction), one way referencing a missing
  // node, one closed area=yes way (skipped as a polygon), one relation.
  private val osm =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<osm version="0.6" generator="test">
      |  <node id="1" lat="47.6598872" lon="-122.3144401"/>
      |  <node id="2" lat="47.6598870" lon="-122.3141965"/>
      |  <node id="3" lat="47.6598762" lon="-122.3132940"/>
      |  <node id="10" lat="47.66" lon="-122.32"/>
      |  <node id="11" lat="47.661" lon="-122.32"/>
      |  <node id="12" lat="47.661" lon="-122.319"/>
      |  <way id="101">
      |    <nd ref="1"/><nd ref="2"/>
      |    <tag k="name" v="west segment"/>
      |    <tag k="surface" v="asphalt"/>
      |    <tag k="width" v="2.5"/>
      |    <tag k="lanes" v="2"/>
      |  </way>
      |  <way id="102">
      |    <nd ref="2"/><nd ref="3"/>
      |    <tag k="name" v="east segment"/>
      |    <tag k="surface" v="gravel"/>
      |  </way>
      |  <way id="103">
      |    <nd ref="1"/><nd ref="999"/>
      |    <tag k="name" v="dangling, skipped"/>
      |  </way>
      |  <way id="104">
      |    <nd ref="10"/><nd ref="11"/><nd ref="12"/><nd ref="10"/>
      |    <tag k="area" v="yes"/><tag k="name" v="a plaza, skipped"/>
      |  </way>
      |  <relation id="201"><member type="way" ref="101" role=""/></relation>
      |</osm>""".stripMargin

  private val geojsonForOsm =
    """{"type":"FeatureCollection","features":[
      |  {"type":"Feature","properties":{"osm_id":101,"name":"west segment","surface":"asphalt","width":2.5,"lanes":2},
      |   "geometry":{"type":"LineString","coordinates":[[-122.3144401,47.6598872],[-122.3141965,47.6598870]]}},
      |  {"type":"Feature","properties":{"osm_id":102,"name":"east segment","surface":"gravel"},
      |   "geometry":{"type":"LineString","coordinates":[[-122.3141965,47.6598870],[-122.3132940,47.6598762]]}}
      |]}""".stripMargin

  private def rows(df: org.apache.spark.sql.DataFrame) = {
    val cols = df.columns.sorted.map(col).toSeq
    df.select(cols: _*).orderBy("_u", "_v").collect().toSeq
  }

  test("GML posList and coordinates features ingest; Point/empty skipped") {
    val edges = GmlIngest.readEdges(spark, Seq(write("roads.gml", gml)))
    assert(edges.count() == 4) // 2 line features x forward+reverse
    assert(edges.schema("width").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(edges.schema("lanes").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(edges.filter(col("surface") === "gravel").count() == 2)
  }

  test("GML ingest is row-identical to the GeoJSON ingest of the same features") {
    val viaGml = GmlIngest.readEdges(spark, Seq(write("roads.gml", gml)))
    val viaGeo = GeoJsonIngest.readEdges(spark,
      Seq(write("roads.geojson", geojsonForGml)))
    assert(viaGml.columns.sorted.toSeq == viaGeo.columns.sorted.toSeq)
    assert(rows(viaGml) == rows(viaGeo))
  }

  test("3-D posList drops altitude (srsDimension=3)") {
    val gml3d = gml.replace(
      """srsDimension="2">-122.3144401 47.6598872 -122.3141965 47.6598870""",
      """srsDimension="3">-122.3144401 47.6598872 12.0 -122.3141965 47.6598870 13.5""")
    val viaGml = GmlIngest.readEdges(spark, Seq(write("roads.gml", gml3d)))
    val viaGeo = GeoJsonIngest.readEdges(spark,
      Seq(write("roads.geojson", geojsonForGml)))
    assert(rows(viaGml) == rows(viaGeo))
  }

  test("OSM ways resolve node refs; dangling and area ways are skipped") {
    val edges = OsmIngest.readEdges(spark, Seq(write("city.osm", osm)))
    assert(edges.count() == 4) // ways 101+102 x forward+reverse
    assert(edges.filter(col("name").contains("skipped")).count() == 0)
    assert(edges.schema("osm_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(edges.schema("lanes").dataType ==
      org.apache.spark.sql.types.LongType)
    // junction at node 2: shared endpoint produces a shared node id
    val us = edges.select("_u").collect().map(_.getString(0)).toSet
    val vs = edges.select("_v").collect().map(_.getString(0)).toSet
    assert(us.intersect(vs).nonEmpty)
  }

  test("OSM ingest is row-identical to the GeoJSON ingest of the same ways") {
    val viaOsm = OsmIngest.readEdges(spark, Seq(write("city.osm", osm)))
    val viaGeo = GeoJsonIngest.readEdges(spark,
      Seq(write("city.geojson", geojsonForOsm)))
    assert(viaOsm.columns.sorted.toSeq == viaGeo.columns.sorted.toSeq)
    assert(rows(viaOsm) == rows(viaGeo))
  }

  test("mixed-format build unions GML and OSM with GeoJSON under unique fids") {
    val g = PropertyGraph.fromGeoJson(spark, Seq(
      write("a.geojson", geojsonForGml),
      write("b.gml", gml),
      write("c.osm", osm)))
    assert(g.size() == 12) // 4 edges from each source
    val fids = g.edges.select("fid").collect().map(_.getLong(0))
    assert(fids.distinct.length == fids.length,
      "fids must stay unique across formats")
  }
}
