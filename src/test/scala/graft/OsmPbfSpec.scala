package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.util.zip.Deflater

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{GeoJsonIngest, OsmIngest, OsmPbfIngest}

/** OSM PBF ingest against an independent test-side encoder of the public
  * wire format: blob framing, zlib + raw blobs, OSMHeader skipping,
  * DenseNodes/Way delta coding, granularity/offset scaling, stringtable
  * tags — and row identity with the `.osm` XML reader and the GeoJSON
  * reader on the same data (all three converge on
  * GeoJsonIngest.fromFeatures).
  */
class OsmPbfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- minimal protobuf / PBF encoder (independent of the reader) ----
  private def varint(n: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var v = n
    do {
      val b = (v & 0x7f).toInt
      v = v >>> 7
      out.write(if (v != 0) b | 0x80 else b)
    } while (v != 0)
    out.toByteArray
  }
  private def zig(n: Long): Long = (n << 1) ^ (n >> 63)
  private def field(f: Int, wire: Int): Array[Byte] = varint((f << 3) | wire)
  private def vf(f: Int, v: Long): Array[Byte] = field(f, 0) ++ varint(v)
  private def bf(f: Int, b: Array[Byte]): Array[Byte] =
    field(f, 2) ++ varint(b.length) ++ b
  private def packed(f: Int, vs: Seq[Long]): Array[Byte] =
    bf(f, vs.toArray.flatMap(varint))
  private def deltas(vs: Seq[Long]): Seq[Long] =
    vs.zip(0L +: vs.dropRight(1)).map { case (a, b) => a - b }

  private def stringTable(strings: Seq[String]): Array[Byte] =
    strings.toArray.flatMap(s => bf(1, s.getBytes("UTF-8")))

  /** A PrimitiveGroup body holding one DenseNodes message. */
  private def denseGroup(nodes: Seq[(Long, Long, Long)]): Array[Byte] =
    bf(2, packed(1, deltas(nodes.map(_._1)).map(zig)) ++
      packed(8, deltas(nodes.map(_._2)).map(zig)) ++
      packed(9, deltas(nodes.map(_._3)).map(zig)))

  /** A PrimitiveGroup body holding the given Way messages. */
  private def wayGroup(ways: Seq[Array[Byte]]): Array[Byte] =
    ways.toArray.flatMap(w => bf(3, w))

  private def way(id: Long, refs: Seq[Long], kv: Seq[(Int, Int)]): Array[Byte] =
    vf(1, id) ++ packed(2, kv.map(_._1.toLong)) ++
      packed(3, kv.map(_._2.toLong)) ++ packed(8, deltas(refs).map(zig))

  private def block(strings: Seq[String], groups: Seq[Array[Byte]],
      granularity: Long = 100L, latOff: Long = 0L, lonOff: Long = 0L): Array[Byte] =
    bf(1, stringTable(strings)) ++
      groups.toArray.flatMap(g => bf(2, g)) ++
      vf(17, granularity) ++ vf(19, latOff) ++ vf(20, lonOff)

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val buf = new Array[Byte](b.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private def blob(body: Array[Byte], compress: Boolean): Array[Byte] =
    if (compress) vf(2, body.length) ++ bf(3, deflate(body))
    else bf(1, body)

  private def framed(blobType: String, blobBytes: Array[Byte]): Array[Byte] = {
    val header = bf(1, blobType.getBytes("UTF-8")) ++ vf(3, blobBytes.length)
    val len = header.length
    Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte) ++ header ++ blobBytes
  }

  private def writePbf(name: String, parts: Array[Byte]*): String = {
    val dir = Files.createTempDirectory("osmpbf-spec")
    val p = dir.resolve(name)
    Files.write(p, parts.toArray.flatten)
    p.toString
  }

  private def nano(deg: String): Long =
    new java.math.BigDecimal(deg).movePointRight(9).longValueExact

  // the GmlOsmSpec city: 6 nodes, ways 101/102 (lines), 103 (dangling
  // ref), 104 (closed area=yes) — encoded with granularity 100
  private val strings = Seq("", "name", "surface", "width", "lanes", "area",
    "west segment", "asphalt", "2.5", "2", "east segment", "gravel",
    "dangling, skipped", "yes", "a plaza, skipped")
  private def s(v: String): Int = strings.indexOf(v)

  private val cityNodes = Seq(
    (1L, nano("47.6598872"), nano("-122.3144401")),
    (2L, nano("47.6598870"), nano("-122.3141965")),
    (3L, nano("47.6598762"), nano("-122.3132940")),
    (10L, nano("47.66"), nano("-122.32")),
    (11L, nano("47.661"), nano("-122.32")),
    (12L, nano("47.661"), nano("-122.319"))).map { case (id, la, lo) =>
    (id, la / 100L, lo / 100L)
  }

  private val cityWays = Seq(
    way(101L, Seq(1L, 2L), Seq(s("name") -> s("west segment"),
      s("surface") -> s("asphalt"), s("width") -> s("2.5"),
      s("lanes") -> s("2"))),
    way(102L, Seq(2L, 3L), Seq(s("name") -> s("east segment"),
      s("surface") -> s("gravel"))),
    way(103L, Seq(1L, 999L), Seq(s("name") -> s("dangling, skipped"))),
    way(104L, Seq(10L, 11L, 12L, 10L), Seq(s("area") -> s("yes"),
      s("name") -> s("a plaza, skipped"))))

  private val osmXml =
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
      |</osm>""".stripMargin

  private def writeText(name: String, content: String): String = {
    val dir = Files.createTempDirectory("osmpbf-spec")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = {
    val cols = df.columns.sorted.map(col).toSeq
    df.select(cols: _*).orderBy("_u", "_v").collect().toSeq
  }

  test("PBF ingest is row-identical to the XML ingest of the same city") {
    // header blob first (must be skipped); nodes and ways in SEPARATE
    // data blobs — way resolution must cross blob boundaries (the
    // distributed join, not a per-blob map); nodes zlib, ways raw
    val pbf = writePbf("city.osm.pbf",
      framed("OSMHeader", blob(block(Seq(""), Nil), compress = true)),
      framed("OSMData", blob(block(strings, Seq(denseGroup(cityNodes))),
        compress = true)),
      framed("OSMData", blob(block(strings, Seq(wayGroup(cityWays))),
        compress = false)))
    val viaPbf = OsmPbfIngest.readEdges(spark, Seq(pbf))
    val viaXml = OsmIngest.readEdges(spark, Seq(writeText("city.osm", osmXml)))
    assert(viaPbf.columns.sorted.toSeq == viaXml.columns.sorted.toSeq)
    assert(rows(viaPbf) == rows(viaXml))
    assert(viaPbf.count() == 4) // ways 101/102 × forward+reverse
  }

  test("granularity and lat/lon offsets scale coordinates exactly") {
    // granularity 1000 with offsets: node coords reconstruct to the
    // decimal values below, bit-equal to text-parsed doubles
    val latOff = 500000000L // +0.5 degrees
    val lonOff = -2000000L // -0.002 degrees
    def raw(deg: String, off: Long) = (nano(deg) - off) / 1000L
    val nodes = Seq(
      (5L, raw("47.159887", latOff), raw("-122.314", lonOff)),
      (6L, raw("47.159997", latOff), raw("-122.313", lonOff)))
    val ways = wayGroup(Seq(way(7L, Seq(5L, 6L), Nil)))
    val pbf = writePbf("scaled.osm.pbf",
      framed("OSMData", blob(block(strings, Seq(denseGroup(nodes), ways),
        granularity = 1000L, latOff = latOff, lonOff = lonOff),
        compress = true)))
    val geojson =
      """{"type":"FeatureCollection","features":[
        |  {"type":"Feature","properties":{"osm_id":7},
        |   "geometry":{"type":"LineString","coordinates":[[-122.314,47.159887],[-122.313,47.159997]]}}
        |]}""".stripMargin
    val viaPbf = OsmPbfIngest.readEdges(spark, Seq(pbf))
    val viaGeo = GeoJsonIngest.readEdges(spark,
      Seq(writeText("scaled.geojson", geojson)))
    assert(rows(viaPbf) == rows(viaGeo))
  }

  test("plain (non-dense) Node messages decode too") {
    def plainNode(id: Long, lat: Long, lon: Long): Array[Byte] =
      vf(1, zig(id)) ++ vf(8, zig(lat)) ++ vf(9, zig(lon))
    val nodes = Seq(
      bf(1, plainNode(20L, nano("47.66") / 100, nano("-122.32") / 100)),
      bf(1, plainNode(21L, nano("47.67") / 100, nano("-122.31") / 100)))
    // plain nodes live INSIDE one PrimitiveGroup as repeated field 1
    val group = nodes.toArray.flatten
    val ways = wayGroup(Seq(way(30L, Seq(20L, 21L),
      Seq(s("name") -> s("west segment")))))
    val pbf = writePbf("plain.osm.pbf",
      framed("OSMData", blob(block(strings, Seq(group, ways)), compress = true)))
    val edges = OsmPbfIngest.readEdges(spark, Seq(pbf))
    assert(edges.count() == 2)
    assert(edges.select("name").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("west segment"))
  }

  test("mixed-format build accepts .osm.pbf beside other formats") {
    val pbf = writePbf("city.osm.pbf",
      framed("OSMData", blob(block(strings,
        Seq(denseGroup(cityNodes), wayGroup(cityWays))), compress = true)))
    val g = graft.graph.PropertyGraph.fromGeoJson(spark,
      Seq(writeText("city.osm", osmXml), pbf))
    assert(g.size() == 8) // 4 edges from each source
    val fids = g.edges.select("fid").collect().map(_.getLong(0))
    assert(fids.distinct.length == fids.length)
  }
}
