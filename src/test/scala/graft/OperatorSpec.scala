package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Wkb
import graft.ingest.GeoJsonIngest
import graft.operators.AsOfJoin

class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- G7: WKB / GeoPackage-binary codec round-trips ----
  test("WKB LineString and Point round-trip through GeoPackage binary") {
    val line = Seq(Seq(-122.3141965, 47.6598870), Seq(-122.3132940, 47.6598762))
    val gp = Wkb.encodeGpkg(Wkb.encodeLineString(line))
    assert(gp(0) == 'G'.toByte && gp(1) == 'P'.toByte)
    val (srid, wkb) = Wkb.decodeGpkg(gp)
    assert(srid == 4326)
    val (tpe, coords) = Wkb.decode(wkb)
    assert(tpe == 2 && coords == line)

    val p = Wkb.decode(Wkb.decodeGpkg(Wkb.encodeGpkg(Wkb.encodePoint(Seq(1.5, -2.5))))._2)
    assert(p == ((1, Seq(Seq(1.5, -2.5)))))
  }

  test("WKB codec works as columns over a graph's geometry") {
    val g = graft.graph.PropertyGraph.fromGeoJson(spark, Seq(Fixture.path))
    val rt = g.edges
      .select(col("_u"), col("geom.coordinates").as("orig"),
        Wkb.lineToGpkg(col("geom.coordinates")).as("gp"))
      .select(col("_u"), col("orig"), Wkb.gpkgToCoords(col("gp")).as("back"))
    assert(rt.filter(col("orig") =!= col("back")).count() == 0)
  }

  // ---- as-of join ----
  test("backward as-of join attaches the latest earlier right row per key") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 15L, "e3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 5L, "r5"), (1L, 20L, "r20"), (2L, 16L, "r16"))
      .toDF("k", "ts", "payload")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts")
      .orderBy("k", "ts").collect()
    assert(out.map(r => (r.getAs[Long]("k"), r.getAs[Long]("ts"), r.getAs[String]("payload"))).toSeq ==
      Seq((1L, 10L, "r5"), (1L, 20L, "r20"), (2L, 15L, null)))
  }

  test("as-of join carries whole right rows, never a per-column stitch") {
    val left = Seq((1L, 3L)).toDF("k", "ts")
    val right = Seq(
      (1L, 1L, Some(5.0), 1L),
      (1L, 2L, None: Option[Double], 2L)).toDF("k", "ts", "price", "qty")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts").collect().head
    // the latest right row (ts=2) has price=null — that null must survive,
    // not be backfilled from the ts=1 row
    assert(out.getAs[Any]("price") == null)
    assert(out.getAs[Long]("qty") == 2L)
  }

  test("as-of join breaks (key, ts) ties deterministically across input orders") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val dups = Seq((1L, 5L, "p1"), (1L, 5L, "p2"), (1L, 5L, "p3"))
    val picks = Seq(dups, dups.reverse, Seq(dups(1), dups(2), dups(0))).map { order =>
      val right = order.toDF("k", "ts", "payload").repartition(3)
      AsOfJoin.backward(left, right, Seq("k"), "ts").collect().head.getAs[String]("payload")
    }
    // all three right rows tie at ts=5; the carried one must not depend on
    // input order or partitioning
    assert(picks.distinct.size == 1)
  }

  test("as-of join accepts MapType carry columns (tie-break skips unhashable types)") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, Map("a" -> "b"), "p5"), (1L, 7L, Map("c" -> "d"), "p7"))
      .toDF("k", "ts", "attrs", "payload")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts").collect().head
    assert(out.getAs[Map[String, String]]("attrs") == Map("c" -> "d"))
    assert(out.getAs[String]("payload") == "p7")
  }

  test("as-of join refuses colliding carry column names") {
    val left = Seq((1L, 3L, 9.9)).toDF("k", "ts", "price")
    val right = Seq((1L, 1L, 5.0)).toDF("k", "ts", "price")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("price"))
  }

  test("GeoPackage blobs with an envelope decode correctly") {
    val line = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    val wkb = Wkb.encodeLineString(line)
    // hand-build a GP blob with envelope indicator 1 (32-byte xy envelope,
    // 4 doubles: minx, maxx, miny, maxy), as GDAL/QGIS writers emit
    val b2 = java.nio.ByteBuffer.allocate(8 + 32 + wkb.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b2.put('G'.toByte).put('P'.toByte).put(0.toByte)
      .put((0x01 | (1 << 1)).toByte) // little-endian + envelope=1
      .putInt(4326)
    Seq(1.0, 3.0, 2.0, 4.0).foreach(b2.putDouble)
    b2.put(wkb)
    val (srid, wkbOut) = Wkb.decodeGpkg(b2.array())
    assert(srid == 4326)
    assert(Wkb.decode(wkbOut) == ((2, line)))
  }

  test("as-of join equals the window formulation on the events table (e3)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("sec", unix_timestamp(col("ts")))
      .select("user_id", "event_id", "event_type", "sec")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("sec"), col("sec").as("signup_sec"))
    // disambiguate ties: as-of at equal ts includes the signup itself, same
    // as the running-max window form
    val viaAsof = AsOfJoin.backward(ev, signups, Seq("user_id"), "sec", Seq("signup_sec"))
      .select("event_id", "signup_sec")
    val viaWindow = SparkEntry.queries("e3_asof_last_signup")(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("last_signup"))
    val joined = viaAsof.join(viaWindow, "event_id")
    assert(joined.filter(not(col("signup_sec") <=> col("last_signup"))).count() == 0)
  }

  // ---- ingest: schema evolution + changes-sign ----
  private def writeGeoJson(name: String, features: String): String = {
    val dir = Files.createTempDirectory("graft-ing")
    val p = dir.resolve(name)
    Files.writeString(p, s"""{"type": "FeatureCollection", "features": [$features]}""")
    p.toString
  }

  test("multi-file ingest merges differing property schemas (dynamic schema)") {
    val f1 = writeGeoJson("a.geojson",
      """{"type":"Feature","properties":{"surface":"concrete","width":1.5},
         "geometry":{"type":"LineString","coordinates":[[0.0,0.0],[0.001,0.0]]}}""")
    val f2 = writeGeoJson("b.geojson",
      """{"type":"Feature","properties":{"incline":0.25,"width":2},
         "geometry":{"type":"LineString","coordinates":[[0.001,0.0],[0.002,0.0]]}}""")
    val edges = GeoJsonIngest.readEdges(spark, Seq(f1, f2))
    assert(edges.count() == 4)
    val cols = edges.columns.toSet
    assert(Set("surface", "width", "incline").subsetOf(cols))
    // width observed as long in one file, double in the other → promoted
    assert(edges.schema("width").dataType.typeName == "double")
    // property absent in the other file is null there
    assert(edges.filter(col("_layer") === "a" && col("incline").isNotNull).count() == 0)
  }

  test("newline-delimited GeoJSON (splittable scale path) matches FeatureCollection ingest") {
    val dir = Files.createTempDirectory("graft-seq")
    val features = Seq(
      """{"type":"Feature","properties":{"surface":"concrete"},"geometry":{"type":"LineString","coordinates":[[0.0,0.0],[0.001,0.0]]}}""",
      """{"type":"Feature","properties":{"surface":"gravel"},"geometry":{"type":"LineString","coordinates":[[0.001,0.0],[0.002,0.0]]}}""")
    val seqPath = dir.resolve("net.geojsonl")
    Files.writeString(seqPath, features.mkString("\n"))
    val fcPath = dir.resolve("net.geojson")
    Files.writeString(fcPath,
      s"""{"type":"FeatureCollection","features":[${features.mkString(",")}]}""")

    val seqEdges = GeoJsonIngest.readEdgesSeq(spark, Seq(seqPath.toString))
    val fcEdges = GeoJsonIngest.readEdges(spark, Seq(fcPath.toString))
    assert(seqEdges.count() == 4 && fcEdges.count() == 4)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("_u", "_v", "surface", "_length").orderBy("_u", "_v")
        .collect().map(_.toSeq).toSeq
    assert(canon(seqEdges) == canon(fcEdges))
  }

  test("mixed FeatureCollection + ndjson builds keep fids unique") {
    val dir = Files.createTempDirectory("graft-mixed")
    val fc = dir.resolve("a.geojson")
    Files.writeString(fc,
      """{"type":"FeatureCollection","features":[
        {"type":"Feature","properties":{},"geometry":{"type":"LineString","coordinates":[[0.0,0.0],[0.001,0.0]]}}]}""")
    val nd = dir.resolve("b.geojsonl")
    Files.writeString(nd,
      """{"type":"Feature","properties":{},"geometry":{"type":"LineString","coordinates":[[0.002,0.0],[0.003,0.0]]}}""")
    val g = graft.graph.PropertyGraph.fromGeoJson(spark, Seq(fc.toString, nd.toString))
    assert(g.size() == 4)
    val fids = g.edges.select("fid").collect().map(_.getLong(0))
    assert(fids.distinct.length == 4, s"fids not unique: ${fids.mkString(",")}")
  }

  test("ndjson features without a properties key ingest cleanly") {
    val dir = Files.createTempDirectory("graft-noprop")
    val nd = dir.resolve("bare.geojsonl")
    Files.writeString(nd,
      """{"type":"Feature","geometry":{"type":"LineString","coordinates":[[0.0,0.0],[0.001,0.0]]}}""")
    val edges = GeoJsonIngest.readEdgesSeq(spark, Seq(nd.toString))
    assert(edges.count() == 2)
    assert(edges.columns.contains("_length"))
  }

  test("changes-sign negates listed columns on reverse edges (io.py:47-49)") {
    val f = writeGeoJson("c.geojson",
      """{"type":"Feature","properties":{"incline":0.25,"width":2.0},
         "geometry":{"type":"LineString","coordinates":[[0.0,0.0],[0.001,0.0]]}}""")
    val edges = GeoJsonIngest.readEdges(spark, Seq(f),
      GeoJsonIngest.Options(changesSign = Seq("incline")))
    val byU = edges.select("_u", "incline", "width").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byU("0.0, 0.0") == ((0.25, 2.0)))     // forward
    assert(byU("0.001, 0.0") == ((-0.25, 2.0)))  // reverse: incline flipped, width not
  }

  // ---- reference performance contracts (same order of magnitude on local) ----
  test("batch update of 1000 edges completes well within the reference's envelope") {
    val n = 1000
    val base = (0 until n).map(i => (s"u$i", s"v$i", i.toDouble))
      .toDF("_u", "_v", "w")
    val g = new graft.graph.PropertyGraph(
      base.select(col("_u").as("_n")).distinct(), base)
    val updates = (0 until n).map(i => (s"u$i", s"v$i", 5.4)).toDF("_u", "_v", "weight")
    val t0 = System.nanoTime()
    val updated = g.updateEdges(updates)
    val cnt = updated.edges.filter(col("weight") === 5.4).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(cnt == n)
    // reference: 1000 row-updates < 0.5 s on SQLite; our batch join path
    // must land in the same order of magnitude including Spark job overhead
    assert(sec < 5.0, s"batch update took $sec s")
  }

  test("bulk build of ~11k edges completes well within the reference's envelope") {
    // reference: 100 × 113-feature imports (~11.3k inserts) < 10 s.
    // Equivalent batch workload (shared with GraphBenchQueries): one file
    // with 5650 features → 11.3k edges (reversals) in a single plan.
    val f = graft.queries.GraphBenchQueries.bulkFile // generate outside the timed region
    val t0 = System.nanoTime()
    val g = graft.graph.PropertyGraph.fromGeoJson(spark, Seq(f))
    val e = g.size()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(e == 11300L)
    assert(sec < 30.0, s"bulk build took $sec s")
  }
}
